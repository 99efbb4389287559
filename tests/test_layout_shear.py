"""Shear grouping layout vs a NumPy reference grouping (exactness for
arbitrary key distributions, pad/stray cleanup, perm channel)."""

import numpy as np
import pytest

import jax.numpy as jnp

from astro_sph_tools_tpu.ops.layout_shear import _GANG, shear_tile_sort

STRIDE = 1 << 22


def _run(rng, n, level_n_tiles, order="random", n_fields=2, need_perm=True):
    n_levels = len(level_n_tiles)
    # particle -> (level, tile): skew levels like a real adaptive layout
    level = np.minimum(
        rng.geometric(0.97, n) - 1, n_levels  # mostly level 0; some oversize
    ).astype(np.int32)
    tile = np.zeros(n, np.int32)
    for li, nt in enumerate(level_n_tiles):
        sel = level == li
        if nt == 0:
            level[sel] = n_levels  # disabled level -> oversize
        else:
            tile[sel] = rng.integers(0, nt, sel.sum())
    key = level * STRIDE + tile
    if order == "sorted":
        key = np.sort(key)
        # keep the reference arrays consistent with the re-ordered keys
        level = np.minimum(key // STRIDE, n_levels).astype(np.int32)
        tile = (key - (key // STRIDE) * STRIDE).astype(np.int32)
    u = rng.uniform(0, 100, n).astype(np.float32)
    v = rng.uniform(0, 100, n).astype(np.float32)
    h = rng.uniform(0.1, 3.0, n).astype(np.float32)
    values = rng.uniform(1.0, 2.0, (n_fields, n)).astype(np.float32)

    s_tile, su, sv, sh, s_values, perm, counts = shear_tile_sort(
        jnp.asarray(key), jnp.asarray(u), jnp.asarray(v), jnp.asarray(h),
        jnp.asarray(values), level_stride=STRIDE,
        level_n_tiles=level_n_tiles, n_fields=n_fields,
        need_perm=need_perm, n_valid=n, interpret=True,
    )
    out = dict(
        s_tile=np.asarray(s_tile), su=np.asarray(su), sv=np.asarray(sv),
        sh=np.asarray(sh), s_values=np.asarray(s_values),
        perm=None if perm is None else np.asarray(perm),
        counts=np.asarray(counts),
    )
    return (key, level, tile, u, v, h, values), out


def _check_grouping(inputs, out, level_n_tiles):
    key, level, tile, u, v, h, values = inputs
    counts = out["counts"]
    n_levels = len(level_n_tiles)
    assert counts.shape == (n_levels + 1,)
    # valid slots are exactly those with nonzero payload (inputs are >= 1)
    lo = 0
    total_valid = 0
    for li in range(n_levels + 1):
        c = int(counts[li])
        assert c % _GANG == 0  # gang-aligned segments
        seg_tile = out["s_tile"][lo : lo + c]
        seg_val = out["s_values"][0, lo : lo + c]
        valid = seg_val != 0.0
        total_valid += valid.sum()
        # tiles ascending over the whole segment (pads carry their key's
        # tile, so monotonicity must hold across pad slots too)
        assert (np.diff(seg_tile) >= 0).all(), f"level {li} tiles not sorted"
        # the multiset of (tile, u, val) among valid slots matches the
        # reference grouping
        in_lvl = level == li if li < n_levels else level >= n_levels
        ref = sorted(zip(tile[in_lvl] if li < n_levels else np.zeros(in_lvl.sum(), np.int32),
                         u[in_lvl], values[0][in_lvl]))
        got = sorted(zip(seg_tile[valid], out["su"][lo : lo + c][valid],
                         seg_val[valid]))
        assert len(ref) == len(got), f"level {li}: {len(ref)} vs {len(got)}"
        for (rt, ru, rv), (gt, gu, gv) in zip(ref, got):
            assert rt == gt and ru == np.float32(gu) and rv == np.float32(gv)
        lo += c
    assert total_valid == key.shape[0]
    # invalid (pad/stray) slots beyond the data region are fully zeroed
    tail = out["s_values"][:, lo:]
    assert (tail == 0).all()


@pytest.mark.parametrize("order", ["random", "sorted"])
def test_shear_matches_reference_grouping(rng, order):
    level_n_tiles = (24, 12, 0, 4)
    inputs, out = _run(rng, 1 << 13, level_n_tiles, order=order)
    _check_grouping(inputs, out, level_n_tiles)


def test_perm_regathers_values(rng):
    level_n_tiles = (16, 8)
    n = 1 << 12
    inputs, out = _run(rng, n, level_n_tiles, n_fields=1)
    key, level, tile, u, v, h, values = inputs
    perm = out["perm"]
    assert perm is not None
    # with_values semantics: pad new values to perm length with zeros
    padded = np.concatenate([values[0], np.zeros(1, np.float32)])
    perm_c = np.minimum(perm, n)  # pads point at n (-> 0 after padding)
    regather = padded[perm_c]
    np.testing.assert_array_equal(regather, out["s_values"][0])


def test_single_key_degenerate(rng):
    """Everything in one tile: one giant run, still exact."""
    n = 1 << 12
    u = rng.uniform(0, 10, n).astype(np.float32)
    key = np.zeros(n, np.int32)
    s_tile, su, sv, sh, s_values, perm, counts = shear_tile_sort(
        jnp.asarray(key), jnp.asarray(u), jnp.asarray(u), jnp.asarray(u),
        jnp.asarray(rng.uniform(1, 2, (1, n)).astype(np.float32)),
        level_stride=STRIDE, level_n_tiles=(4,), n_fields=1,
        need_perm=False, n_valid=n, interpret=True,
    )
    counts = np.asarray(counts)
    assert int(counts[0]) >= n and int(counts[1]) == 0
    valid = np.asarray(s_values)[0, : int(counts[0])] != 0
    assert valid.sum() == n
    got = np.sort(np.asarray(su)[: int(counts[0])][valid])
    np.testing.assert_array_equal(got, np.sort(u))


class TestShearEndToEnd:
    @pytest.mark.slow
    def test_render_matches_sort_layout_and_oracle(self, rng):
        """Full pipeline: device-path tile_particles(layout='shear') renders
        the same map as the lax.sort layout and the dense oracle — incl.
        multi-level footprints, oversize fallback, and with_values."""
        from astro_sph_tools_tpu.ops.deposit import MapSpec
        from astro_sph_tools_tpu.ops.deposit_pallas import (
            deposit_tiled,
            tile_particles,
        )
        from oracles import project_oracle

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
        px = box / 64
        n = 3000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        h = (10.0 ** rng.uniform(-0.3, 1.2, n) * px).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        args = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(h), jnp.asarray(m))
        tp_shear = tile_particles(*args, spec, layout="shear")
        tp_sort = tile_particles(*args, spec, layout="sort")
        assert tp_shear.n_oversize >= tp_sort.n_oversize  # pads included
        a = np.asarray(deposit_tiled(tp_shear, precision="f32"))[0]
        b = np.asarray(deposit_tiled(tp_sort, precision="f32"))[0]
        exp = project_oracle(x, y, h, m, spec.shape, spec.extent)
        for got, name in ((a, "shear"), (b, "sort")):
            err = np.abs(got - exp).max() / exp.max()
            assert err < 1e-5, (name, err)
        # with_values re-render through the shear perm channel
        m2 = rng.uniform(1.0, 3.0, n).astype(np.float32)
        c = np.asarray(
            deposit_tiled(tp_shear.with_values(jnp.asarray(m2)),
                          precision="f32")
        )[0]
        exp2 = project_oracle(x, y, h, m2, spec.shape, spec.extent)
        assert np.abs(c - exp2).max() / exp2.max() < 1e-5


def test_shear_donated_build(rng):
    """The donated stage-A variant (production/bench path) builds and
    renders; on CPU donation is a no-op but the code path must trace."""
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_pallas import tile_particles

    box = 10.0
    spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box))
    n = 2048
    x = jnp.asarray(rng.uniform(0, box, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, box, n), jnp.float32)
    h = jnp.asarray(rng.uniform(0.1, 0.4, n), jnp.float32)
    m = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    tp = tile_particles(x, y, h, m, spec, layout="shear", donate=True,
                        need_perm=False)
    assert tp.perm is None
    assert int(np.asarray(tp.sorted_values).sum() > 0)


@pytest.mark.slow
class TestBucketedDeposit:
    @pytest.mark.parametrize("order", ["random", "sorted_x"])
    def test_matches_oracle_and_sorted_engine(self, rng, order):
        """deposit_2d_bucketed (coarse shear -> coherent engine) is exact
        for any order, including its zero-value pad slots."""
        from oracles import project_oracle
        from astro_sph_tools_tpu.ops.deposit import MapSpec
        from astro_sph_tools_tpu.ops.layout_shear import deposit_2d_bucketed

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box),
                       periodic_wrap=True)
        px = box / 64
        n = 5000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        if order == "sorted_x":
            o = np.argsort(x)
            x, y = x[o], y[o]
        h = (10.0 ** rng.uniform(-0.4, 1.0, n) * px).astype(np.float32)
        m = rng.uniform(0.5, 2.0, n).astype(np.float32)
        img = np.asarray(
            deposit_2d_bucketed(x, y, h, m, spec, precision="f32")
        )
        exp = project_oracle(x, y, h, m, spec.shape, spec.extent,
                             periodic=True)
        assert np.abs(img - exp).max() / exp.max() < 1e-5

    def test_multifield(self, rng):
        from oracles import project_oracle
        from astro_sph_tools_tpu.ops.deposit import MapSpec
        from astro_sph_tools_tpu.ops.layout_shear import deposit_2d_bucketed

        box = 10.0
        spec = MapSpec(shape=(64, 64), extent=(0.0, box, 0.0, box),
                       periodic_wrap=True)
        n = 4000
        x = rng.uniform(0, box, n).astype(np.float32)
        y = rng.uniform(0, box, n).astype(np.float32)
        h = rng.uniform(0.1, 0.5, n).astype(np.float32)
        vals = rng.uniform(0.5, 2.0, (2, n)).astype(np.float32)
        img = np.asarray(deposit_2d_bucketed(x, y, h, vals, spec,
                                             precision="f32"))
        for f in range(2):
            exp = project_oracle(x, y, h, vals[f], spec.shape, spec.extent,
                                 periodic=True)
            assert np.abs(img[f] - exp).max() / exp.max() < 1e-5
