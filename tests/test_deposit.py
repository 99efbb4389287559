"""Deposit engine vs the dense NumPy oracle (north-star fidelity: <=1e-5 rel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from astro_sph_tools_tpu.ops.deposit import (
    MapSpec,
    STENCIL_LEVELS,
    bin_particles_by_footprint,
    deposit_2d,
    deposit_2d_fixed_h,
    deposit_weighted_mean,
)
from oracles import project_oracle


def make_particles(rng, n, box=10.0, h_range=(0.1, 0.5)):
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = rng.uniform(*h_range, n)
    m = rng.uniform(0.5, 2.0, n)
    return x, y, h, m


def rel_err(got, expected):
    scale = np.abs(expected).max()
    return np.abs(got - expected).max() / scale


class TestDeposit2D:
    def test_matches_oracle_fixed_h(self, rng):
        """BASELINE config 1 (scaled down): uniform box -> surface-density map."""
        x, y, h, m = make_particles(rng, 4000, h_range=(0.3, 0.3))
        spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_matches_oracle_adaptive_h(self):
        """Adaptive h spanning ~2 dex exercises multiple stencil levels.

        Resolved smoothing lengths (h >= ~0.5 px) hold the 1e-5 budget in
        f32; sub-pixel h is precision-limited by f32 coordinate quantization
        (a few 1e-5 worst-case — see the f64 validation test below).
        """
        rng = np.random.default_rng(2024)
        x, y, _, m = make_particles(rng, 3000)
        h = 10.0 ** rng.uniform(-1.1, 0.5, 3000)  # 0.08 (0.5 px) .. 3.2
        spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_adaptive_h_f64_validation_mode(self):
        """Full 4-dex h range in the f64 validation mode: exact to ~1e-12."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        x, y, _, m = make_particles(rng, 1500)
        h = 10.0 ** rng.uniform(-1.5, 0.5, 1500)  # incl. sub-pixel h
        spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        jax.config.update("jax_enable_x64", True)
        try:
            got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024, dtype=jnp.float64))
        finally:
            jax.config.update("jax_enable_x64", False)
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-10

    def test_reference_corner_convention(self, rng):
        """pixel_origin='corner' reproduces the reference's sample points."""
        x, y, h, m = make_particles(rng, 1000)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0), pixel_origin="corner")
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, pixel_origin="corner")
        assert rel_err(got, expected) < 1e-5

    def test_periodic_wrap(self, rng):
        """Particles near the box edge contribute across the boundary."""
        n = 500
        x = rng.uniform(0, 10.0, n)
        y = rng.uniform(0, 10.0, n)
        # pin some particles right at the edge
        x[:50] = rng.uniform(0, 0.2, 50)
        y[50:100] = rng.uniform(9.8, 10.0, 50)
        h = np.full(n, 0.4)
        m = np.ones(n)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0), periodic_wrap=True)
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(got, expected) < 1e-5

    def test_oversize_particles_dense_path(self, rng):
        """Footprints beyond the largest stencil go through the dense pass."""
        n = 64
        x, y, _, m = make_particles(rng, n)
        h = np.full(n, 0.2)
        h[:5] = 8.0  # support 16 world units on a 10-unit box: oversize
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))
        per_level, oversize = bin_particles_by_footprint(h, spec.pixel_size, 2.0)
        assert oversize.size == 5
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_multifield_matches_per_field(self, rng):
        x, y, h, m = make_particles(rng, 800)
        t = rng.uniform(1e4, 1e6, 800)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))
        both = np.asarray(deposit_2d(x, y, h, np.stack([m, m * t], axis=1), spec, chunk=1024))
        m_only = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        mt_only = np.asarray(deposit_2d(x, y, h, m * t, spec, chunk=1024))
        np.testing.assert_allclose(both[..., 0], m_only, rtol=1e-6)
        np.testing.assert_allclose(both[..., 1], mt_only, rtol=1e-6)

    def test_wendland_kernel(self, rng):
        x, y, h, m = make_particles(rng, 1000)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_2d(x, y, h, m, spec, kernel="wendland_c2", chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, kernel="wendland_c2")
        assert rel_err(got, expected) < 1e-5

    def test_rectangular_map_and_extent(self, rng):
        x, y, h, m = make_particles(rng, 1000)
        spec = MapSpec(shape=(24, 48), extent=(2.0, 8.0, 1.0, 9.0))
        got = np.asarray(deposit_2d(x, y, h, m, spec, chunk=1024))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_integrated_projection_mass_conservation(self, rng):
        """Line-integrated kernel: total map * pixel_area == total mass for
        particles fully inside the map."""
        n = 2000
        x = rng.uniform(3.0, 7.0, n)
        y = rng.uniform(3.0, 7.0, n)
        h = rng.uniform(0.1, 0.3, n)
        m = rng.uniform(0.5, 2.0, n)
        spec = MapSpec(shape=(256, 256), extent=(0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_2d(x, y, h, m, spec, projection="integrated", chunk=1024))
        pixel_area = spec.pixel_size[0] * spec.pixel_size[1]
        assert abs(got.sum() * pixel_area / m.sum() - 1.0) < 1e-2


class TestFixedHJittable:
    def test_matches_general_path(self, rng):
        n = 4096
        # K=8 stencil requires 2 * (2h/px) + 2 <= 8, i.e. h <= 1.5 px = 0.234
        x, y, h, m = make_particles(rng, n, h_range=(0.1, 0.2))
        spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        got = np.asarray(
            deposit_2d_fixed_h(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(h), jnp.asarray(m),
                spec, K=8, chunk=1024,
            )
        )
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_jit_traceable(self, rng):
        import jax

        n = 1024
        x, y, h, m = make_particles(rng, n, h_range=(0.2, 0.3))
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))

        @jax.jit
        def render(x, y, h, m):
            return deposit_2d_fixed_h(x, y, h, m, spec, K=8, chunk=256)

        out = render(jnp.asarray(x), jnp.asarray(y), jnp.asarray(h), jnp.asarray(m))
        assert out.shape == (32, 32)
        assert np.isfinite(np.asarray(out)).all()


class TestWeightedMean:
    def test_uniform_quantity_recovers_value(self, rng):
        """A weighted mean of a constant field must equal that constant."""
        x, y, h, m = make_particles(rng, 2000, h_range=(0.3, 0.6))
        t = np.full(2000, 1.0e5)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))
        mean, weight = deposit_weighted_mean(x, y, h, t, m, spec, chunk=1024)
        mean = np.asarray(mean)
        weight = np.asarray(weight)
        covered = weight > weight.max() * 1e-3
        np.testing.assert_allclose(mean[covered], 1.0e5, rtol=1e-4)

    def test_matches_oracle_ratio(self, rng):
        x, y, h, m = make_particles(rng, 1500)
        t = rng.uniform(1e3, 1e6, 1500)
        spec = MapSpec(shape=(32, 32), extent=(0.0, 10.0, 0.0, 10.0))
        mean, _ = deposit_weighted_mean(x, y, h, t, m, spec, chunk=1024)
        num = project_oracle(x, y, h, m * t, spec.shape, spec.extent)
        den = project_oracle(x, y, h, m, spec.shape, spec.extent)
        expected = np.where(den > 0, num / np.maximum(den, 1e-300), 0.0)
        got = np.asarray(mean)
        mask = den > den.max() * 1e-6
        assert np.abs((got[mask] - expected[mask]) / expected[mask]).max() < 1e-4


class TestBinning:
    def test_levels_cover_range(self):
        h = np.array([0.001, 0.1, 0.5, 2.0, 10.0])
        per_level, oversize = bin_particles_by_footprint(h, (0.3125, 0.3125), 2.0)
        assert sum(len(i) for i in per_level) + len(oversize) == len(h)

    def test_footprint_fits_level(self, rng):
        """Every binned particle's support must fit its assigned stencil."""
        h = 10.0 ** rng.uniform(-3, 1, 1000)
        ps = (0.1, 0.1)
        per_level, _ = bin_particles_by_footprint(h, ps, 2.0)
        for K, idx in zip(STENCIL_LEVELS, per_level):
            if idx.size:
                s_pix = 2.0 * h[idx] / ps[0]
                assert (2 * s_pix + 2 <= K + 1e-9).all()


def test_fast_oracle_matches_gather_oracle(rng):
    # the scatter f64 oracle (used for large-n fidelity artifacts) must agree
    # with the reference-parity per-pixel gather oracle to fp precision
    from oracles import project_oracle, project_oracle_fast

    n = 1200
    box = 10.0
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = 10.0 ** rng.uniform(-1.2, 1.2, n)
    m = rng.uniform(0.5, 2.0, n)
    for periodic in (False, True):
        a = project_oracle(x, y, h, m, (48, 48), (0, box, 0, box), periodic=periodic)
        b = project_oracle_fast(x, y, h, m, (48, 48), (0, box, 0, box), periodic=periodic)
        assert np.abs(a - b).max() / a.max() < 1e-12
