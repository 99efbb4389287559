"""Velocity-space absorption spectra vs brute-force oracles."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import Cosmology
from astro_sph_tools_tpu.ops.spectra import absorption_spectra, doppler_parameter_kms
from astro_sph_tools_tpu.kernels import integrated_kernel_lookup, integrated_kernel_table
import jax.numpy as jnp


class TestDopplerParameter:
    def test_hydrogen_at_1e4K(self):
        # b(H, 1e4 K) = sqrt(2 kT/m_H) ~ 12.85 km/s
        b = doppler_parameter_kms(1.0e4, 1.008)
        assert b == pytest.approx(12.85, rel=0.01)

    def test_scales_with_mass_and_T(self):
        assert doppler_parameter_kms(4e4, 1.0) == pytest.approx(
            2 * doppler_parameter_kms(1e4, 1.0), rel=1e-6
        )
        assert doppler_parameter_kms(1e4, 16.0) == pytest.approx(
            doppler_parameter_kms(1e4, 1.0) / 4, rel=1e-6
        )


class TestAbsorptionSpectra:
    def test_matches_bruteforce_oracle(self, rng):
        n, n_bins = 300, 128
        box = 10.0
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.2, 0.5, n)
        vals = rng.uniform(0.5, 2.0, n)
        v_pec = rng.normal(0, 80.0, n)
        T = 10.0 ** rng.uniform(4, 6, n)
        cosmo = Cosmology.from_redshift(0.5, 0.6777, 0.04825)
        rx = np.array([3.0, 7.0])
        ry = np.array([5.0, 2.0])

        spectra, v_centres = absorption_spectra(
            pos, h, vals, v_pec, T, rx, ry,
            cosmology=cosmo, box_size=box, n_bins=n_bins, chunk=256,
        )
        spectra = np.asarray(spectra)
        assert spectra.shape == (2, n_bins)

        # brute-force oracle
        dv_dx = cosmo.hubble_rate() * cosmo.a
        v_eff = pos[:, 2] * dv_dx + v_pec
        v_box = box * dv_dx
        b_dopp = np.maximum(doppler_parameter_kms(T, 1.008), 1e-3)
        table = integrated_kernel_table("cubic_spline")
        for r in range(2):
            dx = pos[:, 0] - rx[r]; dx -= np.round(dx / box) * box
            dy = pos[:, 1] - ry[r]; dy -= np.round(dy / box) * box
            b2 = dx**2 + dy**2
            w = np.asarray(
                integrated_kernel_lookup(jnp.asarray(table), jnp.asarray(np.sqrt(b2)), jnp.asarray(h), 2.0)
            ) * vals
            w[b2 >= (2 * h) ** 2] = 0.0
            expected = np.zeros(n_bins)
            for bi, vc in enumerate(v_centres):
                dvv = vc - v_eff
                dvv -= np.round(dvv / v_box) * v_box
                phi = np.exp(-((dvv / b_dopp) ** 2)) / (np.sqrt(np.pi) * b_dopp)
                expected[bi] = np.sum(w * phi)
            np.testing.assert_allclose(spectra[r], expected, rtol=5e-4, atol=expected.max() * 1e-5)

    def test_velocity_integral_conserves_column(self, rng):
        """Integral of tau over velocity equals the plain column total."""
        from astro_sph_tools_tpu.ops.sightlines import column_integrate

        n = 400
        box = 10.0
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.2, 0.4, n)
        vals = rng.uniform(0.5, 2.0, n)
        v_pec = rng.normal(0, 50.0, n)
        T = np.full(n, 1e5)
        cosmo = Cosmology.from_redshift(0.5, 0.6777, 0.04825)
        rx = np.array([5.0]); ry = np.array([5.0])
        spectra, v_centres = absorption_spectra(
            pos, h, vals, v_pec, T, rx, ry,
            cosmology=cosmo, box_size=box, n_bins=1024, chunk=256,
        )
        dv = v_centres[1] - v_centres[0]
        integral = float(np.asarray(spectra)[0].sum() * dv)
        col = float(column_integrate(pos[:, 0], pos[:, 1], h, vals, rx, ry,
                                     projection="integrated", periodic_box=box)[0])
        assert integral == pytest.approx(col, rel=2e-3)

    def test_thermal_broadening_widens_lines(self, rng):
        """Hotter gas -> broader, lower-peak features."""
        n = 50
        box = 10.0
        pos = np.column_stack([
            np.full(n, 5.0), np.full(n, 5.0), rng.uniform(4.9, 5.1, n)
        ])
        h = np.full(n, 0.3)
        vals = np.ones(n)
        v_pec = np.zeros(n)
        rx = np.array([5.0]); ry = np.array([5.0])
        cosmo = Cosmology.from_redshift(0.5, 0.6777, 0.04825)
        cold, v = absorption_spectra(pos, h, vals, v_pec, np.full(n, 1e4), rx, ry,
                                     cosmology=cosmo, box_size=box, n_bins=512, chunk=64)
        hot, _ = absorption_spectra(pos, h, vals, v_pec, np.full(n, 1e6), rx, ry,
                                    cosmology=cosmo, box_size=box, n_bins=512, chunk=64)
        cold = np.asarray(cold)[0]; hot = np.asarray(hot)[0]
        assert cold.max() > hot.max() * 2  # 10x temperature ratio -> ~3.2x b
        # same integrated column
        assert cold.sum() == pytest.approx(hot.sum(), rel=1e-2)


class TestBinnedSpectra:
    """Cell-binned spectra engine vs the dense engine (identical physics)."""

    @pytest.mark.parametrize("periodic", [True, False])
    def test_matches_dense(self, rng, periodic):
        from astro_sph_tools_tpu.data_structures.cosmology import Cosmology
        from astro_sph_tools_tpu.ops.spectra import (
            absorption_spectra,
            absorption_spectra_binned,
        )

        n, R = 2500, 120
        box = 10.0
        pos = rng.uniform(0, box, (n, 3))
        h = 10.0 ** rng.uniform(-1.3, -0.3, n)
        m = rng.uniform(0.5, 2.0, n)
        vlos = rng.normal(0, 80, n)
        T = 10.0 ** rng.uniform(3.5, 6.0, n)
        rx = rng.uniform(0, box, R)
        ry = rng.uniform(0, box, R)
        rx[:20] = rng.uniform(0, 0.02, 20)  # periodic edge rays
        kwargs = dict(n_bins=96)
        if periodic:
            cos = Cosmology(
                hubble_param=0.6777, omega_baryon=0.04825, redshift=0.5,
                expansion_factor=1 / 1.5,
            )
            kwargs.update(cosmology=cos, box_size=box, periodic=True)
        else:
            kwargs.update(box_size=None, periodic=False)
        a, vca = absorption_spectra(pos, h, m, vlos, T, rx, ry, **kwargs)
        b, vcb = absorption_spectra_binned(pos, h, m, vlos, T, rx, ry, **kwargs)
        np.testing.assert_allclose(vca, vcb)
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5


class TestVoigtProfile:
    """Voigt damping wings (VERDICT r4 item 5): engine profile="voigt"
    against the exact Faddeeva function and an f64 dense oracle."""

    GAMMA_LYA = 6.265e8  # 1/s
    LAMBDA_LYA = 1215.67  # Angstrom

    def test_hjerting_matches_faddeeva(self):
        """voigt_hjerting vs Re[wofz] in f64: <= 1e-5 relative over the
        full astrophysical damping-parameter range."""
        from scipy.special import wofz

        from astro_sph_tools_tpu.ops.spectra import voigt_hjerting

        x = np.concatenate([np.linspace(0, 7, 2001), np.geomspace(7, 300, 800)])
        for a in (1e-6, 1e-5, 1e-4, 1e-3, 3e-3):
            exact = wofz(x + 1j * a).real
            got = voigt_hjerting(a, x)
            rel = np.abs(got - exact) / np.abs(exact)
            assert rel.max() < 1e-5, (a, rel.max())

    def test_hjerting_f32_and_jit(self):
        """The f32/jit path (what the engines trace) stays within 1e-5 of
        the f64 evaluation — no cancellation blowups in the line core."""
        import jax
        import jax.numpy as jnp

        from astro_sph_tools_tpu.ops.spectra import voigt_hjerting

        x = np.linspace(0.0, 40.0, 20001)
        r64 = voigt_hjerting(1e-3, x)
        r32 = np.asarray(
            jax.jit(voigt_hjerting)(jnp.float32(1e-3), jnp.asarray(x, jnp.float32))
        ).astype(np.float64)
        rel = np.abs(r32 - r64) / np.maximum(np.abs(r64), 1e-12)
        assert rel.max() < 1e-5

    def test_voigt_spectrum_matches_f64_faddeeva_oracle(self, rng):
        """Full engine run with profile="voigt" against a dense f64 oracle
        built on scipy.wofz (the EXACT Voigt profile, not the engine's
        expansion) — validates physics and numerics together."""
        from scipy.special import wofz

        from astro_sph_tools_tpu.kernels.splines import (
            integrated_kernel_lookup,
            integrated_kernel_table,
        )

        n, n_bins = 200, 128
        box = 10.0
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.2, 0.5, n)
        vals = rng.uniform(0.5, 2.0, n)
        v_pec = rng.normal(0, 60.0, n)
        T = 10.0 ** rng.uniform(3.8, 5.5, n)
        cosmo = Cosmology.from_redshift(0.5, 0.6777, 0.04825)
        rx = np.array([3.0, 7.0])
        ry = np.array([5.0, 2.0])

        spectra, v_centres = absorption_spectra(
            pos, h, vals, v_pec, T, rx, ry,
            cosmology=cosmo, box_size=box, n_bins=n_bins, chunk=256,
            profile="voigt", gamma=self.GAMMA_LYA,
            rest_wavelength_angstrom=self.LAMBDA_LYA,
        )
        spectra = np.asarray(spectra)

        dv_dx = cosmo.hubble_rate() * cosmo.a
        v_eff = pos[:, 2] * dv_dx + v_pec
        v_box = box * dv_dx
        b_dopp = np.maximum(doppler_parameter_kms(T, 1.008), 1e-3)
        a_damp = (
            self.GAMMA_LYA * self.LAMBDA_LYA * 1e-8 / (4 * np.pi) / 1e5
        ) / b_dopp
        table = integrated_kernel_table("cubic_spline")
        for r in range(2):
            dx = pos[:, 0] - rx[r]; dx -= np.round(dx / box) * box
            dy = pos[:, 1] - ry[r]; dy -= np.round(dy / box) * box
            b2 = dx**2 + dy**2
            w = np.asarray(
                integrated_kernel_lookup(
                    jnp.asarray(table), jnp.asarray(np.sqrt(b2)),
                    jnp.asarray(h), 2.0,
                )
            ) * vals
            w[b2 >= (2 * h) ** 2] = 0.0
            expected = np.zeros(n_bins)
            for bi, vc in enumerate(v_centres):
                dvv = vc - v_eff
                dvv -= np.round(dvv / v_box) * v_box
                phi = np.zeros(n)
                for k in range(-3, 4):
                    x = (dvv + k * v_box) / b_dopp
                    phi += wofz(x + 1j * a_damp).real
                phi /= np.sqrt(np.pi) * b_dopp
                expected[bi] = np.sum(w * phi)
            np.testing.assert_allclose(
                spectra[r], expected, rtol=5e-4, atol=expected.max() * 1e-5
            )

    def test_saturated_line_wings(self):
        """A single strong absorber: the Gaussian profile is ~zero a few
        Doppler widths out; the Voigt wings carry tau ~ a/(sqrt(pi) x^2).
        This is the scientifically critical case for saturated systems."""
        from scipy.special import wofz

        box = 10.0
        pos = np.array([[5.0, 5.0, 5.0]])
        h = np.array([0.4])
        vals = np.array([1.0e6])  # strong (saturated) column
        v_pec = np.array([0.0])
        T = np.array([1.0e4])  # b ~ 12.8 km/s
        rx = ry = np.array([5.0])
        cosmo = Cosmology.from_redshift(0.5, 0.6777, 0.04825)

        kwargs = dict(cosmology=cosmo, box_size=box, n_bins=256, chunk=256)
        tau_g, vc = absorption_spectra(
            pos, h, vals, v_pec, T, rx, ry, **kwargs
        )
        tau_v, _ = absorption_spectra(
            pos, h, vals, v_pec, T, rx, ry,
            profile="voigt", gamma=self.GAMMA_LYA, **kwargs
        )
        tau_g, tau_v = np.asarray(tau_g)[0], np.asarray(tau_v)[0]

        dv_dx = cosmo.hubble_rate() * cosmo.a
        v_line = 5.0 * dv_dx
        b = float(doppler_parameter_kms(T, 1.008)[0])
        x = np.abs(vc - v_line) / b
        wing = x > 8.0  # far past the Gaussian core
        assert wing.any()
        # Gaussian profile has decayed to nothing; Voigt wings have not
        assert tau_v[wing].max() > 50 * max(tau_g[wing].max(), 1e-30)
        # wing shape matches the exact Faddeeva evaluation
        a_damp = self.GAMMA_LYA * self.LAMBDA_LYA * 1e-8 / (4 * np.pi) / 1e5 / b
        v_box = box * dv_dx
        expect = np.zeros(wing.sum())
        dvv = (vc[wing] - v_line)
        dvv -= np.round(dvv / v_box) * v_box
        for k in range(-3, 4):
            expect += wofz((dvv + k * v_box) / b + 1j * a_damp).real
        w0 = tau_v[np.argmin(np.abs(vc - v_line))]  # scale-free check below
        expect /= np.sqrt(np.pi) * b
        ratio = tau_v[wing] / expect
        # per-particle normalisation identical for all bins -> ratio const
        assert np.allclose(ratio, ratio.mean(), rtol=1e-3)
        assert w0 > tau_v[wing].max()  # the core still dominates

    @pytest.mark.slow
    def test_binned_voigt_matches_dense(self, rng):
        from astro_sph_tools_tpu.ops.spectra import absorption_spectra_binned

        n, R = 800, 40
        box = 10.0
        pos = rng.uniform(0, box, (n, 3))
        h = 10.0 ** rng.uniform(-1.2, -0.4, n)
        m = rng.uniform(0.5, 2.0, n)
        vlos = rng.normal(0, 60, n)
        T = 10.0 ** rng.uniform(3.8, 5.5, n)
        rx = rng.uniform(0, box, R)
        ry = rng.uniform(0, box, R)
        cos = Cosmology.from_redshift(0.5, 0.6777, 0.04825)
        kwargs = dict(
            cosmology=cos, box_size=box, n_bins=96, profile="voigt",
            gamma=self.GAMMA_LYA,
        )
        a, _ = absorption_spectra(pos, h, m, vlos, T, rx, ry, **kwargs)
        b, _ = absorption_spectra_binned(pos, h, m, vlos, T, rx, ry, **kwargs)
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

    def test_voigt_requires_gamma(self):
        with pytest.raises(ValueError, match="damping rate"):
            absorption_spectra(
                np.zeros((4, 3)), np.ones(4), np.ones(4), np.zeros(4),
                np.full(4, 1e4), np.array([1.0]), np.array([1.0]),
                box_size=10.0, profile="voigt",
            )
        with pytest.raises(ValueError, match="unknown line profile"):
            absorption_spectra(
                np.zeros((4, 3)), np.ones(4), np.ones(4), np.zeros(4),
                np.full(4, 1e4), np.array([1.0]), np.array([1.0]),
                box_size=10.0, profile="lorentz",
            )
