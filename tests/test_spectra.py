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
