"""Fused 3D Pallas deposit vs dense f64 oracle (interpret mode)."""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.grid3d import GridSpec
from astro_sph_tools_tpu.ops.grid3d_pallas import (
    PALLAS_3D_LEVELS,
    deposit_3d_auto,
    deposit_3d_pallas,
)
from oracles import grid3d_oracle

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def rel_err(got, expected):
    return np.abs(got - expected).max() / np.abs(expected).max()


class TestPallas3D:
    def test_k4_matches_oracle(self, rng):
        box = 8.0
        spec = GridSpec(shape=(32, 32, 32), extent=(0.0, box) * 3)
        vox = box / 32
        n = 1000
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.3, 0.45, n) * vox  # s_vox <= 0.9 -> K=4
        m = rng.uniform(0.5, 2.0, n)
        got = np.asarray(deposit_3d_pallas(pos, h, m, spec, precision="f32"))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_k8_bf16x2(self, rng):
        box = 8.0
        spec = GridSpec(shape=(32, 32, 32), extent=(0.0, box) * 3)
        vox = box / 32
        n = 600
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.6, 1.4, n) * vox  # K=8 level
        m = rng.uniform(0.5, 2.0, n)
        got = np.asarray(
            deposit_3d_pallas(pos, h, m, spec, precision="bf16x2", level=PALLAS_3D_LEVELS[1])
        )
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_periodic(self, rng):
        box = 8.0
        spec = GridSpec(shape=(16, 16, 16), extent=(0.0, box) * 3, periodic_wrap=True)
        vox = box / 16
        n = 400
        pos = rng.uniform(0, box, (n, 3))
        pos[:60, 2] = rng.uniform(0, 0.05, 60)  # z-edge hugging
        pos[60:120, 0] = rng.uniform(box - 0.05, box, 60)  # x-edge
        h = rng.uniform(0.35, 0.45, n) * vox
        m = np.ones(n)
        got = np.asarray(deposit_3d_pallas(pos, h, m, spec, precision="f32"))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(got, expected) < 1e-5

    def test_multifield(self, rng):
        box = 8.0
        spec = GridSpec(shape=(16, 16, 16), extent=(0.0, box) * 3)
        vox = box / 16
        n = 300
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.3, 0.45, n) * vox
        m = rng.uniform(0.5, 2.0, n)
        vx = rng.normal(0, 100, n)
        got = np.asarray(
            deposit_3d_pallas(pos, h, np.stack([m, m * vx], 0), spec, precision="f32")
        )
        assert got.shape == (2, 16, 16, 16)
        exp_m = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        exp_mv = grid3d_oracle(pos, h, m * vx, spec.shape, spec.extent)
        assert rel_err(got[0], exp_m) < 1e-5
        assert np.abs(got[1] - exp_mv).max() / np.abs(exp_mv).max() < 1e-5

    def test_auto_mixed(self, rng):
        box = 8.0
        spec = GridSpec(shape=(16, 16, 16), extent=(0.0, box) * 3)
        vox = box / 16
        n = 500
        pos = rng.uniform(0, box, (n, 3))
        h = 10.0 ** rng.uniform(-0.5, 0.9, n) * vox * 0.4  # spans K=4..16 + oversize
        m = rng.uniform(0.5, 2.0, n)
        got = np.asarray(deposit_3d_auto(pos, h, m, spec, precision="f32"))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_auto_mixed_periodic_multifield(self, rng):
        """Device-resident multi-level layout: periodic wrap + 2 fields +
        off-extent positions through the one-fused-sort path."""
        box = 8.0
        spec = GridSpec(
            shape=(16, 16, 16), extent=(0.0, box) * 3, periodic_wrap=True
        )
        vox = box / 16
        n = 700  # non-pow2: exercises the pow2 pad slot routing
        pos = rng.uniform(-box, 2 * box, (n, 3))  # wraps into the box
        h = 10.0 ** rng.uniform(-0.5, 0.7, n) * vox * 0.4
        m = rng.uniform(0.5, 2.0, n)
        fields = np.stack([m, m * rng.uniform(1, 2, n)])
        got = np.asarray(deposit_3d_auto(pos, h, fields, spec, precision="f32"))
        assert got.shape == (2, 16, 16, 16)
        wrapped = np.mod(pos, box)
        for f in range(2):
            expected = grid3d_oracle(
                wrapped, h, fields[f], spec.shape, spec.extent, periodic=True
            )
            assert rel_err(got[f], expected) < 1e-5

    def test_adapted_tile_heights_fit_smem(self):
        """512^3 at 2^24 particles (the config-3 bench shape) must adapt
        every level's tile heights until the scalar-prefetch tables fit the
        ~1 MiB SMEM; the unadapted K=16 level (131k tiles) overflows it on
        hardware (AOT error: 'prefetched SMEM operand 0' > 1048576 B)."""
        from astro_sph_tools_tpu.ops.grid3d_pallas import (
            _SMEM_BUDGET_BYTES,
            _adapt_cfg_3d,
            _geometry_3d,
            _smem_table_bytes_3d,
        )

        shape = (512, 512, 512)
        periodic = (True, True, True)
        n_rows_bound = (1 << 24) // 512
        for cfg in PALLAS_3D_LEVELS:
            adapted = _adapt_cfg_3d(cfg, shape, periodic, n_rows_bound)
            g = _geometry_3d(adapted, shape, periodic)
            assert (
                _smem_table_bytes_3d(g.n_tiles, n_rows_bound)
                <= _SMEM_BUDGET_BYTES
            ), (cfg.K, adapted.TZ, adapted.TY, g.n_tiles)
            assert adapted.K == cfg.K  # level assignment unchanged

    def test_grown_tile_heights_match_oracle(self, rng):
        """Kernel correctness is independent of TZ/TY (what the SMEM
        adaptation varies): render with deliberately grown tiles."""
        from astro_sph_tools_tpu.ops.grid3d_pallas import Pallas3DConfig

        box = 8.0
        spec = GridSpec(
            shape=(32, 32, 32), extent=(0.0, box) * 3, periodic_wrap=True
        )
        vox = box / 32
        n = 500
        pos = rng.uniform(0, box, (n, 3))
        h = rng.uniform(0.3, 0.45, n) * vox
        m = rng.uniform(0.5, 2.0, n)
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent, periodic=True)
        for tz, ty in ((16, 8), (16, 16), (32, 8)):
            got = np.asarray(
                deposit_3d_pallas(
                    pos, h, m, spec, precision="f32",
                    level=Pallas3DConfig(K=4, TZ=tz, TY=ty),
                )
            )
            assert rel_err(got, expected) < 1e-5, (tz, ty)

    def test_layout_reuse_and_meta(self, rng):
        """tile_particles_3d builds the layout once; deposit_3d_tiled renders
        from it, and per-level metas cover exactly the non-oversize count."""
        from astro_sph_tools_tpu.ops.grid3d_pallas import (
            deposit_3d_tiled,
            tile_particles_3d,
        )

        box = 8.0
        spec = GridSpec(shape=(16, 16, 16), extent=(0.0, box) * 3)
        vox = box / 16
        n = 400
        pos = rng.uniform(0, box, (n, 3))
        h = 10.0 ** rng.uniform(-0.5, 0.9, n) * vox * 0.4
        m = rng.uniform(0.5, 2.0, n)
        tp = tile_particles_3d(pos, h, np.stack([m]), spec)
        assert sum(meta[3] for meta in tp.geoms) + tp.n_oversize == tp.n_sorted
        got = np.asarray(deposit_3d_tiled(tp, precision="f32"))[0]
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5
