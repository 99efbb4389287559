"""Pallas fused deposit vs dense oracle (interpret mode on CPU).

Compiled-mode fidelity/throughput is exercised on real TPU hardware by
bench.py; these tests pin the kernel's numerics via the Pallas interpreter.
"""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.ops.deposit_pallas import (
    PALLAS_LEVELS,
    deposit_2d_auto,
    deposit_2d_pallas,
)
from oracles import project_oracle

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def rel_err(got, expected):
    return np.abs(got - expected).max() / np.abs(expected).max()


def particles(rng, n, box, h_lo, h_hi):
    return (
        rng.uniform(0, box, n),
        rng.uniform(0, box, n),
        rng.uniform(h_lo, h_hi, n),
        rng.uniform(0.5, 2.0, n),
    )


class TestPallasDeposit:
    def test_k8_matches_oracle(self, rng):
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        x, y, h, m = particles(rng, 2000, box, 0.5 * px, 1.4 * px)
        got = np.asarray(deposit_2d_pallas(x, y, h, m, spec, precision="f32"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_bf16x2_within_budget(self, rng):
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        x, y, h, m = particles(rng, 2000, box, 0.5 * px, 1.4 * px)
        got = np.asarray(deposit_2d_pallas(x, y, h, m, spec, precision="bf16x2"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_k16_level(self, rng):
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        x, y, h, m = particles(rng, 1000, box, 1.6 * px, 3.4 * px)
        got = np.asarray(
            deposit_2d_pallas(x, y, h, m, spec, precision="f32", level=PALLAS_LEVELS[1])
        )
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_multifield(self, rng):
        box = 10.0
        spec = MapSpec(shape=(32, 32), extent=(0.0, box, 0.0, box))
        px = box / 32
        x, y, h, m = particles(rng, 800, box, 0.5 * px, 1.3 * px)
        t = rng.uniform(1e4, 1e6, 800)
        fields = np.stack([m, m * t], axis=0)  # (F, N)
        got = np.asarray(deposit_2d_pallas(x, y, h, fields, spec, precision="f32"))
        assert got.shape == (2, 32, 32)
        exp_m = project_oracle(x, y, h, m, spec.shape, spec.extent)
        exp_mt = project_oracle(x, y, h, m * t, spec.shape, spec.extent)
        assert rel_err(got[0], exp_m) < 1e-5
        assert rel_err(got[1], exp_mt) < 1e-5

    def test_periodic(self, rng):
        box = 8.0
        # 64 cols: periodic needs tx | nx; level K=8 default tx=120 -> falls to 64
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box), periodic_wrap=True)
        px = box / 64
        n = 600
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        x[:60] = rng.uniform(0, 0.1, 60)  # edge hugging
        h = rng.uniform(0.8, 1.4, n) * px
        m = np.ones(n)
        got = np.asarray(deposit_2d_pallas(x, y, h, m, spec, precision="f32"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(got, expected) < 1e-5

    def test_auto_mixed_footprints(self, rng):
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        n = 1500
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = 10.0 ** rng.uniform(-0.3, 1.2, n) * px  # spans K=8..32 + oversize
        m = rng.uniform(0.5, 2.0, n)
        got = np.asarray(deposit_2d_auto(x, y, h, m, spec, precision="f32"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_wendland_kernel(self, rng):
        box = 10.0
        spec = MapSpec(shape=(32, 32), extent=(0.0, box, 0.0, box))
        px = box / 32
        x, y, h, m = particles(rng, 600, box, 0.5 * px, 1.3 * px)
        got = np.asarray(
            deposit_2d_pallas(x, y, h, m, spec, precision="f32", kernel="wendland_c2")
        )
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, kernel="wendland_c2")
        assert rel_err(got, expected) < 1e-5

    def test_empty_level_and_corner_origin(self, rng):
        box = 10.0
        spec = MapSpec(shape=(32, 32), extent=(0.0, box, 0.0, box), pixel_origin="corner")
        px = box / 32
        x, y, h, m = particles(rng, 500, box, 0.5 * px, 1.3 * px)
        got = np.asarray(deposit_2d_pallas(x, y, h, m, spec, precision="f32"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, pixel_origin="corner")
        assert rel_err(got, expected) < 1e-5


class TestAdviceRegressions:
    def test_auto_periodic_odd_shape_falls_back(self, rng):
        # ADVICE r1 #2: a periodic 100x100 map (ny % 8 != 0) must route to the
        # XLA fallback instead of crashing inside deposit_2d_pallas
        box = 5.0
        spec = MapSpec(shape=(100, 100), extent=(0.0, box, 0.0, box), periodic_wrap=True)
        px = box / 100
        n = 400
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = rng.uniform(0.8, 1.3, n) * px
        m = np.ones(n)
        got = np.asarray(deposit_2d_auto(x, y, h, m, spec, precision="f32"))
        expected = project_oracle(x, y, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(got, expected) < 1e-5


class TestTiledLayout:
    def test_non_pow2_padding_stays_out_of_oversize(self, rng):
        # pow2 padding parks in the smallest level (weight 0), never in the
        # oversize fallback, and the oversize slice excludes the slack region
        from astro_sph_tools_tpu.ops.deposit_pallas import deposit_tiled, tile_particles

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        n = 3000  # not a power of two
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = 10.0 ** rng.uniform(-0.3, 1.2, n) * px  # includes real oversize
        m = rng.uniform(0.5, 2.0, n)
        tp = tile_particles(x, y, h, m, spec)
        n_real_oversize = int((2.0 * h / px > 31).sum())  # beyond K=64 window
        assert tp.n_oversize == n_real_oversize
        got = np.asarray(deposit_tiled(tp, precision="f32"))[0]
        exp = project_oracle(x, y, h, m, spec.shape, spec.extent)
        assert rel_err(got, exp) < 1e-5

    def test_with_values_reuses_layout(self, rng):
        from astro_sph_tools_tpu.ops.deposit_pallas import deposit_tiled, tile_particles

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        n = 2500
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = 10.0 ** rng.uniform(-0.3, 0.8, n) * px
        m = rng.uniform(0.5, 2.0, n)
        tp = tile_particles(x, y, h, m, spec)
        m2 = rng.uniform(1.0, 3.0, n)
        got = np.asarray(deposit_tiled(tp.with_values(m2), precision="f32"))[0]
        exp = project_oracle(x, y, h, m2, spec.shape, spec.extent)
        assert rel_err(got, exp) < 1e-5

    def test_need_perm_false_renders_identically(self, rng):
        from astro_sph_tools_tpu.ops.deposit_pallas import deposit_tiled, tile_particles

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        n = 2500
        x = rng.uniform(0, box, n)
        y = rng.uniform(0, box, n)
        h = 10.0 ** rng.uniform(-0.3, 0.8, n) * px
        m = rng.uniform(0.5, 2.0, n)
        tp_full = tile_particles(x, y, h, m, spec)
        tp_lean = tile_particles(x, y, h, m, spec, need_perm=False)
        assert tp_lean.perm is None
        a = np.asarray(deposit_tiled(tp_full, precision="f32"))
        b = np.asarray(deposit_tiled(tp_lean, precision="f32"))
        np.testing.assert_array_equal(a, b)
        with pytest.raises(ValueError, match="need_perm"):
            tp_lean.with_values(m)


def test_integrated_projection_matches_xla():
    """projection='integrated' (line-integrated kernel) in the fused pass."""
    import numpy as np
    from astro_sph_tools_tpu.ops.deposit import MapSpec, deposit_2d
    from astro_sph_tools_tpu.ops.deposit_pallas import (
        deposit_2d_auto,
        deposit_2d_pallas,
    )

    rng = np.random.default_rng(2)
    n, box = 20000, 10.0
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = np.exp(rng.normal(np.log(0.08), 0.6, n)).clip(0.03, 1.0)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)

    ref = np.asarray(deposit_2d(x, y, h, m, spec, projection="integrated"))
    got = np.asarray(deposit_2d_auto(x, y, h, m, spec, projection="integrated"))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-5

    # integrated columns conserve mass (kernel3d, the reference convention,
    # deliberately does not)
    px = box / 128
    assert abs(got.sum() * px * px - m.sum()) / m.sum() < 5e-3

    hs = np.full(n, 0.1)
    refs = np.asarray(deposit_2d(x, y, hs, m, spec, projection="integrated"))
    gots = np.asarray(deposit_2d_pallas(x, y, hs, m, spec, projection="integrated"))
    assert np.abs(gots - refs).max() / np.abs(refs).max() < 2e-5


def test_unknown_precision_rejected():
    import pytest
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_pallas import deposit_2d_auto, deposit_2d_pallas

    spec = MapSpec(shape=(64, 64), extent=(0.0, 1.0, 0.0, 1.0))
    x = np.array([0.5]); h = np.array([0.05]); m = np.array([1.0])
    with pytest.raises(ValueError, match="unknown precision"):
        deposit_2d_pallas(x, x, h, m, spec, precision="fp32")
    with pytest.raises(ValueError, match="unknown precision"):
        deposit_2d_auto(x, x, h, m, spec, precision="bf16x22")
