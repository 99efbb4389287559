"""Fused Pallas row-prep for the coherent deposit engine.

Stage A of the coherent engine (:mod:`.deposit_coherent`) spends its wall in
four XLA programs over the full particle array: the level/tile assignment
pass, a 6-operand batched row sort, the distinct-key classification pass,
and the channel-stacking pack pass. This module collapses all four into ONE
Pallas kernel that streams each (RB, C) row block through VMEM exactly once.

The key observation is that the coherent deposit kernel masks lanes by key
*equality* (``deposit_coherent._deposit_kernel_coherent``), so the row sort
is overkill: the engine only needs

1. every row's level>=1 lanes compacted to the row END (the bucketed tail
   gather slices the last ``tail_eff`` lanes as one window),
2. key <-> payload lane alignment for the in-place coherent pass, and
3. each row's distinct level-0 keys (the candidate list, <= d_max of them).

(1) is a *monotone two-sided partition*, not a sort. A stable partition
moves heads left / tails right by per-lane distances that are monotone in
the lane index, and a monotone route needs only log2(C) butterfly stages
per side (roll + select), never colliding (for two lanes i < j with the
stage-s bit of the remaining distance set on j and clear on i, landing both
on one lane would force dest_j <= dest_i, contradicting order preservation
— so a collision cannot occur). That is ~6x fewer compare-exchange stages
than the 66-stage bitonic network ``lax.sort`` pays at C=2048, and the
payload channels ride only 22 stages instead of 66.

(3) drops out of d_max iterated min-extractions over the masked key vector
instead of sorted-order first-occurrence logic.

Everything else (candidate global sort, bucket grouping, counts vector) is
tiny (n_rows-sized) and stays in XLA inside the same jit.

Reference behavioral spec: the sorted-engine layout this replaces mirrors
`/root/reference/src/astro_sph_tools/tools/_ArrayReorder.py` ordering
semantics only in spirit; fidelity is pinned against the XLA stage A
(`deposit_coherent._assign_and_rowsort`) by tests.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deposit_pallas import _CHUNK, _multi_level_assign

Array = jax.Array

# K4 classification bound — import would be circular at definition time for
# some import orders, so the value is mirrored from
# deposit_coherent._K4_MAX_S and pinned equal by tests
_K4_MAX_S = 1.0

# aux column layout (f32, exact for all stored integers < 2^24)
_AUX_W = 128  # lane-aligned aux row width


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _prefix_sum_lanes(x, C):
    """Inclusive prefix sum along the lane axis via log2(C) roll stages."""
    lane = _lane_iota(x.shape)
    n = 1
    while n < C:
        shifted = pltpu.roll(x, n, 1)
        x = x + jnp.where(lane >= n, shifted, 0)
        n *= 2
    return x


def _compact(channels, live_i, dist, C, *, direction):
    """Monotone stable compaction: move live lanes (``live_i`` int32 0/1)
    by ``dist`` lanes left (direction=-1) or right (+1). Returns routed
    channels.

    ``dist`` must be monotone non-decreasing (left) / non-increasing
    (right) over live lanes — the partition distances are (see module
    docstring) — which guarantees the butterfly never collides. Masks stay
    int32 throughout (Mosaic lane rolls want vector-register dtypes, not
    i1)."""
    s = 1
    while s < C:
        move = live_i * (jnp.bitwise_and(dist, s) != 0).astype(jnp.int32)
        # roll(x, C - s) reads lane+s (left move); roll(x, s) reads lane-s
        shift = (C - s) if direction < 0 else s
        incoming = pltpu.roll(move, shift, 1)
        take = incoming != 0
        channels = [
            jnp.where(take, pltpu.roll(ch, shift, 1), ch) for ch in channels
        ]
        dist = jnp.where(take, pltpu.roll(dist, shift, 1) - s, dist)
        live_i = incoming | (live_i & (1 - move))
        s *= 2
    return channels


def _prep_kernel(
    x_ref, y_ref, h_ref, *val_refs_and_outs,
    n_fields: int,
    C: int,
    shape, extent, periodic,
    bounds, geom_tuples, support_factor,
    bases, n_levels: int, d_max: int,
):
    val_refs = val_refs_and_outs[:n_fields]
    packed_ref, aux_ref = val_refs_and_outs[n_fields:]

    ny, nx = shape
    x0, x1, y0, y1 = extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny

    x = x_ref[...]
    y = y_ref[...]
    h = h_ref[...]
    vals = [r[...] for r in val_refs]

    # --- assignment (identical expression order to _assign_and_rowsort) ---
    u = (x - x0) / psx
    v = (y - y0) / psy
    if periodic:
        u = jnp.mod(u, nx)
        v = jnp.mod(v, ny)
    s_pix = support_factor * h / min(psx, psy)
    level, tile, u_loc, v_loc = _multi_level_assign(
        u, v, s_pix, bounds, *geom_tuples, jnp
    )
    lev_cap = jnp.minimum(level, n_levels)
    # static per-level bases: select chain (tiny n_levels) — no gather
    ckey = jnp.where(level < n_levels, tile, 0)
    for li in range(1, n_levels + 1):
        if bases[li]:
            ckey = jnp.where(
                lev_cap == li, ckey + jnp.int32(bases[li]), ckey
            )
    ckey_f = ckey.astype(jnp.float32)

    is_tail = ckey >= bases[1]
    tail_i = is_tail.astype(jnp.int32)
    head_i = 1 - tail_i
    incl = _prefix_sum_lanes(tail_i, C)
    n_tail_row = incl[:, C - 1 : C]  # (RB, 1)
    lane = _lane_iota(x.shape)
    tail_rank_excl = incl - tail_i  # tails strictly before this lane

    chans = [u_loc, v_loc, h] + vals + [ckey_f]

    # heads move LEFT to their head rank (= lane - tails before lane)
    dist_l = head_i * tail_rank_excl
    head_chans = _compact(chans, head_i, dist_l, C, direction=-1)
    # tails move RIGHT to C - n_tail + rank
    dist_r = tail_i * ((C - n_tail_row) + tail_rank_excl - lane)
    tail_chans = _compact(chans, tail_i, dist_r, C, direction=+1)

    in_tail_zone = lane >= (C - n_tail_row)
    combined = [
        jnp.where(in_tail_zone, t, hd)
        for hd, t in zip(head_chans, tail_chans)
    ]

    # --- packed (RB, 8, C) ---
    nch = len(combined)  # 4 + n_fields
    for ci in range(8):
        if ci < nch:
            packed_ref[:, ci, :] = combined[ci]
        else:
            packed_ref[:, ci, :] = jnp.zeros_like(u)

    # --- candidates: d_max iterated min-extractions over head keys ---
    pad_key_f = float(bases[n_levels] + 1)
    masked = jnp.where(is_tail, pad_key_f, ckey_f)
    # level-0 lanes whose footprint exceeds the K4 column window — any such
    # lane in a candidate's key group forces the full-K column loop
    big = (~is_tail) & (s_pix > _K4_MAX_S)
    cand_cols = []
    k4_cols = []
    for _ in range(d_max):
        m = jnp.min(masked, axis=1, keepdims=True)  # (RB, 1)
        cand_cols.append(m)
        any_big = jnp.max(
            jnp.where((ckey_f == m) & big, 1.0, 0.0), axis=1, keepdims=True
        )
        k4_cols.append(1.0 - any_big)
        masked = jnp.where(masked == m, pad_key_f, masked)
    leftover = jnp.min(masked, axis=1, keepdims=True)
    heavy = leftover < float(bases[1])  # > d_max distinct level-0 keys

    n_l0 = (C - n_tail_row).astype(jnp.float32)
    tail_eff = jnp.where(
        heavy, float(C), n_tail_row.astype(jnp.float32)
    )
    cand = jnp.concatenate(cand_cols, axis=1)  # (RB, d_max) ascending
    cand = jnp.where(heavy, pad_key_f, cand)

    lev_cols = [
        (lev_cap == li).sum(axis=1, keepdims=True).astype(jnp.float32)
        for li in range(1, n_levels + 1)
    ]
    aux_row = jnp.concatenate(
        [
            cand,
            tail_eff,
            n_l0,
            heavy.astype(jnp.float32),
        ]
        + lev_cols
        + [jnp.concatenate(k4_cols, axis=1)],
        axis=1,
    )  # (RB, 2*d_max + 3 + n_levels)
    w = aux_row.shape[1]
    aux_ref[:, :w] = aux_row
    aux_ref[:, w:] = jnp.zeros((x.shape[0], _AUX_W - w), jnp.float32)


def _prep_call(
    x2, y2, h2, vals2,
    *,
    n_rows, C, RB, n_fields,
    shape, extent, periodic, bounds, geom_tuples, support_factor,
    bases, n_levels, d_max, interpret,
):
    kern = partial(
        _prep_kernel,
        n_fields=n_fields, C=C,
        shape=shape, extent=extent, periodic=periodic,
        bounds=bounds, geom_tuples=geom_tuples,
        support_factor=support_factor,
        bases=bases, n_levels=n_levels, d_max=d_max,
    )
    grid = (n_rows // RB,)
    row_blk = pl.BlockSpec((RB, C), lambda r: (r, 0))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_blk, row_blk, row_blk] + [row_blk] * n_fields,
        out_specs=[
            pl.BlockSpec((RB, 8, C), lambda r: (r, 0, 0)),
            pl.BlockSpec((RB, _AUX_W), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _AUX_W), jnp.float32),
        ],
        interpret=interpret,
    )(x2, y2, h2, *[vals2[f] for f in range(n_fields)])


def _stage_a_pallas(
    x, y, h, values,
    *,
    shape, extent, periodic, bounds, geom_tuples, support_factor,
    n_fields, n_levels, bases, d_max, n_rows, C, RB, interpret,
    tail_buckets,
):
    """Drop-in traced replacement for
    :func:`deposit_coherent._assign_and_rowsort` (same output tuple), with
    the per-particle work in one fused Pallas pass."""
    to2 = lambda a: a.reshape(n_rows, C)
    packed, aux = _prep_call(
        to2(x), to2(y), to2(h), values.reshape(n_fields, n_rows, C),
        n_rows=n_rows, C=C, RB=RB, n_fields=n_fields,
        shape=shape, extent=extent, periodic=periodic, bounds=bounds,
        geom_tuples=geom_tuples, support_factor=support_factor,
        bases=bases, n_levels=n_levels, d_max=d_max, interpret=interpret,
    )

    cand_keys = aux[:, :d_max].astype(jnp.int32)  # ascending + pad sentinel
    tail_eff = aux[:, d_max].astype(jnp.int32)
    n_l0 = aux[:, d_max + 1].astype(jnp.int32)
    heavy = aux[:, d_max + 2] > 0.5
    lev_counts = [
        aux[:, d_max + 3 + li].astype(jnp.int32).sum()
        for li in range(n_levels)
    ]
    cand_k4 = aux[
        :, d_max + 3 + n_levels : 2 * d_max + 3 + n_levels
    ].astype(jnp.int32)

    cand_rows = jnp.broadcast_to(
        jnp.arange(n_rows, dtype=jnp.int32)[:, None], (n_rows, d_max)
    )
    sk, sr, sk4 = jax.lax.sort(
        [cand_keys.reshape(-1), cand_rows.reshape(-1), cand_k4.reshape(-1)],
        num_keys=1, is_stable=False,
    )
    n_cand = jnp.searchsorted(sk, jnp.int32(bases[1])).astype(jnp.int32)
    n_heavy = heavy.sum().astype(jnp.int32)
    n_tail = tail_eff.sum().astype(jnp.int32)

    thr = jnp.asarray(tail_buckets, jnp.int32)
    bucket = jnp.searchsorted(thr, tail_eff, side="left").astype(jnp.int32)
    bucket = jnp.where(tail_eff > 0, bucket, len(tail_buckets))
    _, rows_by_bucket = jax.lax.sort(
        [bucket, jnp.arange(n_rows, dtype=jnp.int32)], num_keys=1,
        is_stable=False,
    )
    nb = (
        bucket[None, :]
        == jnp.arange(len(tail_buckets), dtype=jnp.int32)[:, None]
    ).sum(axis=1).astype(jnp.int32)

    lc0 = jnp.where(heavy, n_l0, 0).sum().astype(jnp.int32)
    counts = jnp.concatenate(
        [
            jnp.stack([n_cand, n_heavy, n_tail]),
            nb,
            jnp.stack([lc0, *lev_counts]),
        ]
    )
    return packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts


@lru_cache(maxsize=256)
def cached_stage_a_pallas(
    shape, extent, periodic, bounds, geom_tuples, support_factor, n_fields,
    n_levels, bases, d_max, n_rows, C, tail_buckets,
    RB=16, interpret: Optional[bool] = None, donate=False,
):
    # RB=16 measured best on the chip (PREP_AB.json: 0.0546 s vs 0.0586 s
    # at RB=8 and 0.0555 s at RB=32 for 2^26 particles)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    while n_rows % RB:
        RB //= 2  # grid must cover every row block exactly
    fn = partial(
        _stage_a_pallas,
        shape=shape, extent=extent, periodic=periodic, bounds=bounds,
        geom_tuples=geom_tuples, support_factor=support_factor,
        n_fields=n_fields, n_levels=n_levels, bases=bases, d_max=d_max,
        n_rows=n_rows, C=C, RB=RB, interpret=interpret,
        tail_buckets=tail_buckets,
    )
    return jax.jit(fn, donate_argnums=(0, 1, 2, 3) if donate else ())
