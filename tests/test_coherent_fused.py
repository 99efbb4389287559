"""Zero-sync fused coherent render: exact equivalence to the synced engine
whenever the capacities fit, and a truthful on-device overflow flag when
they don't."""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.ops.deposit_coherent import (
    CoherentCaps,
    caps_from_layout,
    deposit_2d_coherent_fused,
    deposit_coherent,
    tile_particles_coherent,
)

from test_deposit_coherent import _coherent_set  # noqa: F401 (helper)

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _ref_and_caps(x, y, h, fields, spec, **kw):
    lay = tile_particles_coherent(x, y, h, fields, spec, **kw)
    return np.asarray(deposit_coherent(lay)), caps_from_layout(lay)


class TestCoherentFused:
    def test_matches_synced_engine_coherent_order(self, rng):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        x, y, h, m = _coherent_set(rng, 60000, box, box / 128)
        fields = np.stack([m, (m * rng.uniform(1, 2, x.size)).astype(np.float32)])
        ref, caps = _ref_and_caps(x, y, h, fields, spec)
        img, ok = deposit_2d_coherent_fused(x, y, h, fields, spec, caps)
        assert bool(ok)
        assert np.abs(np.asarray(img) - ref).max() / np.abs(ref).max() < 1e-6

    def test_matches_synced_engine_random_order(self, rng):
        # incoherent input: every row heavy, everything through the tail
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        n = 30000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        h = np.clip(
            0.5 * (box / 128) * np.exp(0.6 * rng.normal(size=n)),
            0.05 * box / 128,
            10 * box / 128,
        ).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        ref, caps = _ref_and_caps(x, y, h, m, spec)
        img, ok = deposit_2d_coherent_fused(x, y, h, m, spec, caps)
        assert bool(ok)
        assert img.shape == (128, 128)  # single field unpacks
        assert np.abs(np.asarray(img) - ref).max() / np.abs(ref).max() < 1e-6

    def test_no_tail_case(self, rng):
        # all sub-pixel h: no routed tail, zero tail capacity is exact
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        x, y, h, m = _coherent_set(rng, 20000, box, box / 128, h_clip=0.9)
        ref, caps = _ref_and_caps(x, y, h, m, spec)
        assert not any(caps.level_caps[1:])
        img, ok = deposit_2d_coherent_fused(x, y, h, m, spec, caps)
        assert bool(ok)
        assert np.abs(np.asarray(img) - ref).max() / np.abs(ref).max() < 1e-6

    def test_overflow_flag(self, rng):
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        x, y, h, m = _coherent_set(rng, 30000, box, box / 128)
        tiny = CoherentCaps(
            b0=4096,
            bucket_caps=tuple(0 for _ in range(12)),
            level_caps=(0, 0, 0, 0),
        )
        _, ok = deposit_2d_coherent_fused(x, y, h, m, spec, tiny)
        assert not bool(ok)

    def test_caps_reuse_across_chunks(self, rng):
        # the streaming pattern: caps from chunk 0 serve chunk 1 (same
        # distribution), and the render stays exact
        box = 10.0
        spec = MapSpec(shape=(128, 128), extent=(0, box, 0, box), periodic_wrap=True)
        x0, y0, h0, m0 = _coherent_set(rng, 40000, box, box / 128)
        _, caps = _ref_and_caps(x0, y0, h0, m0, spec)
        x1, y1, h1, m1 = _coherent_set(rng, 40000, box, box / 128)
        lay1 = tile_particles_coherent(x1, y1, h1, m1, spec)
        ref1 = np.asarray(deposit_coherent(lay1))
        img1, ok1 = deposit_2d_coherent_fused(x1, y1, h1, m1, spec, caps)
        assert bool(ok1)  # slack=1.3 absorbs same-distribution drift
        assert np.abs(np.asarray(img1) - ref1).max() / np.abs(ref1).max() < 1e-6
