"""Sharded coherent-order deposit on the 8-virtual-device mesh: the
headline engine's multi-chip composition (three SPMD programs + psum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.ops.deposit_pallas import deposit_2d_auto
from astro_sph_tools_tpu.parallel import make_mesh
from astro_sph_tools_tpu.parallel.coherent import (
    deposit_2d_coherent_sharded,
    pad_particles_mesh,
)

from test_deposit_coherent import _coherent_set

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def rel_err(got, expected):
    return np.abs(got - expected).max() / np.abs(expected).max()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestShardedCoherent:
    @pytest.mark.parametrize("prep", ["pallas", "xla"])
    def test_matches_single_device_engine(self, mesh, rng, prep):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 128
        x, y, h, m = _coherent_set(rng, 50000, box, px)
        fields = np.stack([m, (m * rng.uniform(1, 2, x.size)).astype(np.float32)])
        ref = np.asarray(deposit_2d_auto(x, y, h, fields, spec, precision="f32"))
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, fields, spec, 8)
        img = np.asarray(
            deposit_2d_coherent_sharded(
                xp, yp, hp, vp, spec, mesh, precision="f32", prep=prep
            )
        )
        assert img.shape == ref.shape
        # not bit-identical: the 8-way partition sums each pixel's
        # contributions in a different f32 order than the single-device
        # engine (worst pixels ~100 ulps over 50k clustered particles)
        assert rel_err(img, ref) < 5e-5

    def test_incoherent_shards_still_exact(self, mesh, rng):
        """Random order: every row routes through the tail — correctness
        must not depend on coherence."""
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 20000, box, px, h_clip=8.0)
        p = rng.permutation(x.size)
        x, y, h, m = x[p], y[p], h[p], m[p]
        ref = np.asarray(
            deposit_2d_auto(x, y, h, np.stack([m]), spec, precision="f32")
        )
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        img = np.asarray(
            deposit_2d_coherent_sharded(xp, yp, hp, vp, spec, mesh, precision="f32")
        )
        assert rel_err(img[0], ref[0]) < 5e-5  # partition-order f32 class

    def test_nondivisible_rows_per_shard(self, mesh, rng):
        """12 rows per shard (not divisible by the prep's preferred 8-row
        block): RB must fall back to a divisor (8->4), or the trailing
        rows of every shard would silently carry garbage."""
        from astro_sph_tools_tpu.ops.deposit_pallas import _CHUNK

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        n = 8 * 12 * _CHUNK  # exactly 12 chunk rows per shard, no padding
        x, y, h, m = _coherent_set(rng, n, box, px, h_clip=8.0)
        ref = np.asarray(
            deposit_2d_auto(x, y, h, np.stack([m]), spec, precision="f32")
        )
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        assert xp.shape[0] == n  # already aligned: no pad rows
        img = np.asarray(
            deposit_2d_coherent_sharded(xp, yp, hp, vp, spec, mesh, precision="f32")
        )
        assert rel_err(img[0], ref[0]) < 5e-5

    def test_single_field_and_validation(self, mesh, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 9000, box, px, h_clip=6.0)
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        img = deposit_2d_coherent_sharded(xp, yp, hp, vp[0], spec, mesh, precision="f32")
        assert img.shape == (64, 64)
        from oracles import project_oracle

        exp = project_oracle(x, y, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(np.asarray(img), exp) < 5e-5
        with pytest.raises(ValueError, match="multiple of"):
            deposit_2d_coherent_sharded(
                xp[:-1], yp[:-1], hp[:-1], vp[:, :-1], spec, mesh
            )

    def test_all_coherent_no_tail(self, mesh, rng):
        """Sub-pixel h everywhere: every row is coherent, the tail is empty
        on every shard (metas_static == ()) — the render must still match."""
        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        n = 20000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        h = rng.uniform(0.1 * px, 0.9 * px, n).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        order = np.argsort((x // (8 * px)) * 64 + (y // (8 * px)))
        x, y, h, m = x[order], y[order], h[order], m[order]
        ref = np.asarray(
            deposit_2d_auto(x, y, h, np.stack([m]), spec, precision="f32")
        )
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        img = np.asarray(
            deposit_2d_coherent_sharded(xp, yp, hp, vp, spec, mesh, precision="f32")
        )
        assert rel_err(img[0], ref[0]) < 5e-5

    def test_oversize_raises(self, mesh, rng):
        box = 8.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        px = box / 64
        x, y, h, m = _coherent_set(rng, 9000, box, px)
        h = h.copy()
        h[::2000] = 50 * px  # beyond the largest Pallas level
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        with pytest.raises(ValueError, match="oversize"):
            deposit_2d_coherent_sharded(xp, yp, hp, vp, spec, mesh, precision="f32")


class TestShardedCoherentFused:
    def _caps_for_shards(self, x, y, h, fields, spec, n_dev):
        """Per-shard synced calibration merged with caps_union — the
        documented streaming pattern for the fused sharded engine."""
        from astro_sph_tools_tpu.ops.deposit_coherent import (
            caps_from_layout,
            caps_union,
            tile_particles_coherent,
        )

        fields2 = fields if fields.ndim == 2 else fields[None]
        per = x.size // n_dev
        caps = []
        for d in range(n_dev):
            sl = slice(d * per, (d + 1) * per)
            lay = tile_particles_coherent(
                x[sl], y[sl], h[sl], fields2[:, sl], spec
            )
            caps.append(caps_from_layout(lay))
        return caps_union(*caps)

    def test_matches_synced_sharded(self, mesh, rng):
        from astro_sph_tools_tpu.parallel.coherent import (
            deposit_2d_coherent_sharded_fused,
        )

        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        x, y, h, m = _coherent_set(rng, 50000, box, box / 128)
        fields = np.stack([m, (m * rng.uniform(1, 2, x.size)).astype(np.float32)])
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, fields, spec, 8)
        ref = np.asarray(
            deposit_2d_coherent_sharded(xp, yp, hp, vp, spec, mesh, precision="f32")
        )
        caps = self._caps_for_shards(xp, yp, hp, vp, spec, 8)
        img, ok = deposit_2d_coherent_sharded_fused(
            xp, yp, hp, vp, spec, mesh, caps, precision="f32"
        )
        assert bool(ok)
        # same per-shard partition and math: tight agreement
        assert rel_err(np.asarray(img), ref) < 1e-6

    def test_overflow_flag_sharded(self, mesh, rng):
        from astro_sph_tools_tpu.ops.deposit_coherent import CoherentCaps
        from astro_sph_tools_tpu.parallel.coherent import (
            deposit_2d_coherent_sharded_fused,
        )

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0, box, 0, box), periodic_wrap=True)
        x, y, h, m = _coherent_set(rng, 20000, box, box / 64)
        xp, yp, hp, vp = pad_particles_mesh(x, y, h, m, spec, 8)
        tiny = CoherentCaps(
            b0=4096, bucket_caps=tuple(0 for _ in range(12)),
            level_caps=(0, 0, 0, 0),
        )
        _, ok = deposit_2d_coherent_sharded_fused(
            xp, yp, hp, vp, spec, mesh, tiny, precision="f32"
        )
        assert not bool(ok)
