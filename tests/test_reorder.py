"""ArrayReorder/ArrayMapping semantics vs reference behavior
(_ArrayReorder.py:813-1171), on NumPy and jax.numpy backends."""

import numpy as np
import jax.numpy as jnp
import pytest

from astro_sph_tools_tpu.ops.reorder import ArrayMapping, ArrayReorder, match_ids


@pytest.fixture(params=["numpy", "jnp"])
def xp(request):
    return np if request.param == "numpy" else jnp


class TestArrayReorder:
    def test_simple_permutation(self, xp):
        src_ids = np.array([10, 20, 30, 40])
        tgt_ids = np.array([30, 10, 40, 20])
        data = np.array([1.0, 2.0, 3.0, 4.0])
        op = ArrayReorder.create(src_ids, tgt_ids, xp=xp)
        np.testing.assert_array_equal(np.asarray(op(data)), [3.0, 1.0, 4.0, 2.0])
        assert op.lossless
        assert op.matched_items == 4

    def test_reverse_roundtrip(self, xp, rng):
        n = 500
        src_ids = rng.permutation(n) * 7
        tgt_ids = rng.permutation(n) * 7
        data = rng.normal(size=n)
        op = ArrayReorder.create(src_ids, tgt_ids, xp=xp)
        back = np.asarray(op.reverse(op(data)))
        np.testing.assert_allclose(back, data)

    def test_partial_overlap_with_default(self, xp):
        src_ids = np.array([1, 2, 3, 4])
        tgt_ids = np.array([3, 4, 5, 6])
        data = np.array([10.0, 20.0, 30.0, 40.0])
        op = ArrayReorder.create(src_ids, tgt_ids, xp=xp)
        out = np.asarray(op(data, default_value=-1.0))
        np.testing.assert_array_equal(out, [30.0, 40.0, -1.0, -1.0])
        assert op.matched_items == 2
        assert op.matches_are_reduction
        assert op.results_are_expansion

    def test_no_default_raises_on_expansion(self, xp):
        op = ArrayReorder.create(np.array([1, 2]), np.array([2, 3]), xp=xp)
        with pytest.raises(ValueError):
            op(np.array([1.0, 2.0]))

    def test_output_array_preserves_unmatched(self, xp):
        src_ids = np.array([1, 2])
        tgt_ids = np.array([2, 9])
        op = ArrayReorder.create(src_ids, tgt_ids, xp=xp)
        base = np.array([100.0, 200.0])
        out = np.asarray(op(np.array([1.0, 2.0]), output_array=base))
        np.testing.assert_array_equal(out, [2.0, 200.0])

    def test_source_filter_excludes(self, xp):
        src_ids = np.array([1, 2, 3])
        tgt_ids = np.array([1, 2, 3])
        src_filter = np.array([True, False, True])
        op = ArrayReorder.create(src_ids, tgt_ids, source_order_filter=src_filter, xp=xp)
        out = np.asarray(op(np.array([10.0, 20.0, 30.0]), default_value=0.0))
        np.testing.assert_array_equal(out, [10.0, 0.0, 30.0])

    def test_target_filter_excludes(self, xp):
        src_ids = np.array([1, 2, 3])
        tgt_ids = np.array([1, 2, 3])
        tgt_filter = np.array([True, True, False])
        op = ArrayReorder.create(src_ids, tgt_ids, target_order_filter=tgt_filter, xp=xp)
        out = np.asarray(op(np.array([10.0, 20.0, 30.0]), default_value=-5.0))
        np.testing.assert_array_equal(out, [10.0, 20.0, -5.0])

    def test_2d_payload(self, xp):
        src_ids = np.array([5, 6, 7])
        tgt_ids = np.array([7, 5, 6])
        data = np.arange(9.0).reshape(3, 3)
        op = ArrayReorder.create(src_ids, tgt_ids, xp=xp)
        out = np.asarray(op(data))
        np.testing.assert_array_equal(out, data[[2, 0, 1]])

    def test_subset_flags(self, xp):
        op = ArrayReorder.create(np.array([1, 2, 3, 4]), np.array([2, 4]), xp=xp)
        assert op.results_are_subset
        assert op.all_outputs_matched
        assert not op.uses_all_inputs


class TestArrayMapping:
    def test_duplicated_targets(self, xp):
        src_ids = np.array([1, 2, 3])
        tgt_ids = np.array([2, 2, 1, 3, 1])
        data = np.array([10.0, 20.0, 30.0])
        op = ArrayMapping(src_ids, tgt_ids, xp=xp)
        out = np.asarray(op(data))
        np.testing.assert_array_equal(out, [20.0, 20.0, 10.0, 30.0, 10.0])

    def test_duplicate_sources_raise(self, xp):
        with pytest.raises(IndexError):
            ArrayMapping(np.array([1, 1, 2]), np.array([1, 2]), xp=xp)

    def test_duplicate_sources_filtered_ok(self, xp):
        # duplicates excluded by the filter are fine
        op = ArrayMapping(
            np.array([1, 1, 2]),
            np.array([1, 2]),
            source_id_filter=np.array([True, False, True]),
            xp=xp,
        )
        out = np.asarray(op(np.array([10.0, 99.0, 20.0])))
        np.testing.assert_array_equal(out, [10.0, 20.0])

    def test_unmatched_targets_default(self, xp):
        op = ArrayMapping(np.array([1, 2]), np.array([1, 7, 2]), xp=xp)
        out = np.asarray(op(np.array([1.5, 2.5]), default_value=np.nan))
        assert out[0] == 1.5 and out[2] == 2.5 and np.isnan(out[1])


class TestMatchIds:
    def test_int64_ids_on_host(self):
        """EAGLE IDs are int64; host backend must stay exact above 2^32."""
        base = np.int64(2**40)
        src = base + np.array([3, 1, 2], dtype=np.int64)
        tgt = base + np.array([2, 3], dtype=np.int64)
        plan = match_ids(src, tgt, xp=np)
        assert plan.n_matched == 2
        np.testing.assert_array_equal(plan.gather_index, [2, 0])

    def test_large_random(self, rng):
        n = 20000
        src = rng.permutation(n * 3)[:n]
        keep = rng.random(n) > 0.3
        tgt = rng.permutation(src[keep])
        op = ArrayReorder.create(src, tgt, xp=np)
        data = rng.normal(size=n)
        out = op(data)
        # verify by dict lookup
        lut = {i: d for i, d in zip(src, data)}
        expected = np.array([lut[t] for t in tgt])
        np.testing.assert_allclose(np.asarray(out), expected)
