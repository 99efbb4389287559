"""Distributed ID-matched reorder on the 8-virtual-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from astro_sph_tools_tpu.parallel.reorder import distributed_reorder
from astro_sph_tools_tpu.parallel.sharded import make_mesh

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestDistributedReorder:
    def test_full_permutation(self, mesh, rng):
        n = 8 * 64
        src_ids = rng.permutation(n).astype(np.int32)
        tgt_ids = rng.permutation(n).astype(np.int32)
        data = rng.normal(size=n).astype(np.float32)
        out, matched, overflow = distributed_reorder(
            jnp.asarray(src_ids), jnp.asarray(data), jnp.asarray(tgt_ids), mesh
        )
        assert not bool(overflow)
        assert bool(jnp.all(matched))
        lut = {i: v for i, v in zip(src_ids, data)}
        expected = np.array([lut[t] for t in tgt_ids], np.float32)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_partial_overlap_default(self, mesh, rng):
        n = 8 * 32
        src_ids = (rng.permutation(n * 2)[:n]).astype(np.int32)
        tgt_ids = (rng.permutation(n * 2)[:n]).astype(np.int32)
        data = rng.normal(size=n).astype(np.float32)
        out, matched, overflow = distributed_reorder(
            jnp.asarray(src_ids), jnp.asarray(data), jnp.asarray(tgt_ids), mesh,
            default_value=-99.0,
        )
        assert not bool(overflow)
        out = np.asarray(out)
        matched = np.asarray(matched)
        lut = {i: v for i, v in zip(src_ids, data)}
        for t, o, m in zip(tgt_ids, out, matched):
            if t in lut:
                assert m and o == pytest.approx(lut[t], rel=1e-6)
            else:
                assert not m and o == -99.0

    def test_vector_payload(self, mesh, rng):
        n = 8 * 16
        src_ids = rng.permutation(n).astype(np.int32)
        tgt_ids = rng.permutation(n).astype(np.int32)
        data = rng.normal(size=(n, 3)).astype(np.float32)
        out, matched, overflow = distributed_reorder(
            jnp.asarray(src_ids), jnp.asarray(data), jnp.asarray(tgt_ids), mesh
        )
        assert not bool(overflow)
        lut = {i: v for i, v in zip(src_ids, data)}
        expected = np.stack([lut[t] for t in tgt_ids])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_overflow_detection(self, mesh):
        # all IDs hash to owner 0 -> bucket overflow at small capacity
        n = 8 * 32
        src_ids = (np.arange(n, dtype=np.int32) * 8)  # all ids % 8 == 0
        tgt_ids = src_ids[::-1].copy()
        data = np.arange(n, dtype=np.float32)
        out, matched, overflow = distributed_reorder(
            jnp.asarray(src_ids), jnp.asarray(data), jnp.asarray(tgt_ids), mesh,
            capacity_factor=1.0,
        )
        assert bool(overflow)

    def test_matches_single_device_reference(self, mesh, rng):
        """Distributed result equals the host ArrayReorder."""
        from astro_sph_tools_tpu.ops.reorder import ArrayReorder

        n = 8 * 48
        src_ids = rng.permutation(n * 3)[:n].astype(np.int32)
        keep = rng.random(n) > 0.25
        tgt_pool = np.concatenate([src_ids[keep], (np.arange(50) + n * 10).astype(np.int32)])
        tgt_ids = rng.permutation(tgt_pool)[: 8 * 40].astype(np.int32)
        data = rng.normal(size=n).astype(np.float32)

        out, matched, overflow = distributed_reorder(
            jnp.asarray(src_ids), jnp.asarray(data), jnp.asarray(tgt_ids), mesh,
            default_value=np.nan,
        )
        assert not bool(overflow)
        ref = ArrayReorder.create(src_ids, tgt_ids)(data, default_value=np.nan)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, equal_nan=True)
        np.testing.assert_array_equal(np.asarray(matched), ~np.isnan(ref))


class TestInt64IDs:
    """int64 IDs beyond 2^32 travel as (hi, lo) int32 pairs (no x64 mode).

    Reference contract: int64 particle IDs
    (`io/data_structures/_SnapshotBase.py:28-41`)."""

    def test_ids_beyond_2_32(self, mesh, rng):
        from astro_sph_tools_tpu.ops.reorder import ArrayReorder

        n = 8 * 64
        base = np.int64(2) ** 40
        # unique int64 ids straddling 2^32 multiples (lo collisions across hi)
        src_ids = (base + rng.permutation(n).astype(np.int64) * (np.int64(2) ** 33 + 13))
        tgt_ids = rng.permutation(src_ids).astype(np.int64)
        data = rng.normal(size=n).astype(np.float32)
        out, matched, overflow = distributed_reorder(
            src_ids, jnp.asarray(data), tgt_ids, mesh
        )
        assert not bool(overflow)
        assert bool(np.asarray(matched).all())
        ref = ArrayReorder.create(src_ids, tgt_ids)(data)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    def test_lo_collisions_and_unmatched(self, mesh, rng):
        # ids sharing identical low 32 bits but different high words must NOT
        # cross-match; unmatched targets take the default
        n = 8 * 32
        lo = rng.permutation(n // 2).astype(np.int64)
        src_ids = np.concatenate([lo, lo + (np.int64(1) << 35)])
        perm = rng.permutation(n)
        tgt_ids = src_ids[perm].copy()
        tgt_ids[:16] = (np.int64(1) << 45) + np.arange(16)  # absent ids
        data = np.arange(n, dtype=np.float32)
        out, matched, overflow = distributed_reorder(
            src_ids, jnp.asarray(data), tgt_ids, mesh, default_value=-1.0
        )
        assert not bool(overflow)
        out = np.asarray(out); matched = np.asarray(matched)
        assert not matched[:16].any() and (out[:16] == -1.0).all()
        expect = np.full(n, -1.0, np.float32)
        lookup = {int(i): float(d) for i, d in zip(src_ids, data)}
        for k in range(16, n):
            expect[k] = lookup.get(int(tgt_ids[k]), -1.0)
        np.testing.assert_allclose(out, expect)
