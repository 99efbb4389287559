"""Coherent-order fused deposit: exploit snapshot ordering instead of a
global sort.

Real EAGLE/SWIFT/TNG snapshots store particles in space-filling-curve order
(Peano-Hilbert domain cells; cf. pyread_eagle's hash-cell chunk reads,
`/root/reference/src/astro_sph_tools/io/EAGLE/_SnapshotEAGLE.py:115-130`), so
consecutive particles are spatially adjacent. The sorted-layout engine
(:mod:`.deposit_pallas`) pays a 6-operand global ``lax.sort`` (~70% of the
render wall at 1e8 particles) to group particles by (level, tile); this
engine replaces it with work that scales with *chunk count*, not particle
count:

1. **Row sort**: view the input as (n_rows, C=2048) chunks and sort each row
   by the composite (level, tile) key — a batched small sort, ~5x cheaper
   than the global sort (log^2 C vs log^2 N bitonic passes).
2. **Row classification**: a row whose smallest-footprint-level particles
   touch <= D distinct level-0 tiles (coherent input: 1-3) is *coherent* —
   its level-0 lanes deposit in place. Rows whose level-0 lanes are spread
   over many tiles (incoherent input) are *heavy* and route whole.
3. **Coherent pass**: one Pallas work-list step per (tile, row) candidate.
   Steps serve their tile's accumulator exactly like the sorted engine, but
   read the row-sorted chunk **in place** and mask lanes by key equality —
   no particle data moves. The schedule packs (work, tile, row) into one
   int32 per step in SMEM.
4. **Bucketed tail extraction**: each row's *tail* — its level>=1 lanes
   (large-h particles; the row sort parks them at the row's end), or all C
   lanes for a heavy row — is pulled out by a row-granularity gather sized
   to the next half-octave tail bucket (32..2048 lanes in x1.5/x1.33
   steps; element gathers are latency-bound on TPU, row-window slices are
   DMA-friendly). For real
   snapshots this shrinks the global tail sort to ~1.5x the true level>=1
   lane count (3-5% of N) instead of the 30%+ that fixed-slab/whole-row
   routing paid, and the per-level tail bodies see proportionally fewer
   particles. The sorted tail then renders through the existing per-level
   pipeline, K=8..64 plus the dense oversize fallback.

Degradation is graceful: fully random input classifies every row as heavy
and the engine becomes the sorted engine plus a cheap row sort. Fidelity is
identical to :func:`deposit_pallas.deposit_tiled` (same `_chunk_contrib`
math, same precision modes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.splines import get_kernel, integrated_kernel_chebyshev
from .deposit import MapSpec
from .deposit_pallas import (
    _CHUNK,
    PALLAS_LEVELS,
    PallasDepositConfig,
    _as_field_matrix,
    _check_precision,
    _chunk_contrib,
    _layout_level_body,
    _level_geometry,
    _LevelGeometry,
    _multi_level_assign,
    _next_size_class,
    _pad_particles_pow2,
)

Array = jax.Array

_D_MAX = 8  # distinct coherent-level tiles a row may touch before routing
# tail-extraction windows: a row's tail lanes are gathered as the last
# T lanes of the row for the smallest T covering them (T = C routes the row
# whole — heavy rows and rows with no level-0 lanes). Half-octave spacing
# (x1.5 intermediates between the pow2 sizes): pow2-only buckets left up to
# ~50% dead lanes per row just past a boundary (measured 1.63x slack in the
# global tail-sort volume at 2^27), and the sort is the expensive consumer.
_TAIL_BUCKETS = (
    32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048
)
# largest support radius (pixels) the K4 column window serves: 2s + 2 <= 4,
# and the rounded anchor (col0 = round(u) - 2) covers u +- 1.5 px. Windows
# whose lanes are all below this bound run a 4-iteration column loop in the
# deposit kernel instead of the full K=8 (61% of particles in the
# north-star h distribution are sub-pixel).
_K4_MAX_S = 1.0
_K4 = 4


def _ckey_bases(geoms) -> tuple[int, ...]:
    """Cumulative tile-offset key bases per level + [oversize, pad] tails.

    Composite keys ``base[level] + tile`` stay far below 2^24, so they are
    exact in the f32 channel the kernel compares against (the
    level * 2^22 + tile keys of the sorted engine are not)."""
    bases = [0]
    for g in geoms:
        bases.append(bases[-1] + (g.n_tiles if g is not None else 0))
    # bases[n_levels] = oversize key, +1 = padding sentinel
    return tuple(bases)


@dataclass(frozen=True)
class CoherentLayout:
    """Row-sorted channel layout + schedules for the coherent deposit."""

    spec: MapSpec
    kernel: str
    geom0: _LevelGeometry  # coherent (smallest footprint) level geometry
    packed: Array  # (n_rows, 8, C): [u, v, h, val.., ckey]
    cand_tile: Array  # (B0,) tile of each coherent candidate (pad: n_tiles)
    cand_row: Array  # (B0,) chunk row of each candidate
    n_cand: int
    tail: tuple  # sorted routed-tail arrays (u, v, h, vals, tile) or None
    tail_metas: tuple  # per populated tail level: (geom, lo, bucket, count)
    n_tail_oversize: int
    n_tail_sorted: int  # real (non-slack) tail length
    n_fields: int
    n_valid: int
    stats: dict  # row/candidate diagnostics (coherent_fraction etc.)
    window: int = 0  # W-lane window steps (0 = whole-row steps)
    cand_win: tuple = ()  # (wb0, nw, k4n) per candidate, window mode only
    b0w: int = 0  # window-step schedule capacity (size-classed)
    cand_k4: Optional[Array] = None  # (B0,) 1 = all lanes sub-pixel (K4)


def _assign_and_rowsort(
    x, y, h, values, *, shape, extent, periodic, bounds, geom_tuples,
    support_factor, n_fields, n_levels, bases, d_max, n_rows, C,
    window: int = 0,
):
    """Stage A (traced): key assignment, per-row sort, row classification,
    candidate extraction, candidate sort, mixed-row index list.

    With ``window`` = W (a power of two dividing C, 0 = whole-row mode) the
    candidate list additionally carries per-candidate W-lane *window step*
    geometry — (first window, window count, count of leading sub-pixel-only
    windows) — and the row sort refines the composite key with a sub-level
    bit (s_pix > K4 bound) so each candidate segment is [small | big]. The
    stored key channel stays ``ckey`` (the refinement bit is shifted out),
    so tail extraction, the kernel's key mask, and every other consumer are
    unchanged."""
    ny, nx = shape
    x0, x1, y0, y1 = extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    u = (x - x0) / psx
    v = (y - y0) / psy
    if periodic:
        u = jnp.mod(u, nx)
        v = jnp.mod(v, ny)
    s_pix = support_factor * h / min(psx, psy)
    level, tile, u_loc, v_loc = _multi_level_assign(
        u, v, s_pix, bounds, *geom_tuples, jnp
    )
    base_arr = jnp.asarray(bases[: n_levels + 1], jnp.int32)
    ckey = base_arr[jnp.minimum(level, n_levels)] + jnp.where(
        level < n_levels, tile, 0
    )

    to2 = lambda a: a.reshape(n_rows, C)
    # pre-sort copies for the per-candidate K4 classification (the lane set
    # with a given key in a row is sort-invariant)
    ck2 = to2(ckey)
    big2 = to2((level == 0) & (s_pix > _K4_MAX_S))
    if window:
        # sub-level refinement bit: level-0 lanes with footprint too wide
        # for the K4 column window sort after their sub-pixel peers
        big = (level == 0) & (s_pix > _K4_MAX_S)
        rkey = ckey * 2 + big.astype(jnp.int32)
        ops2 = [to2(rkey), to2(u_loc), to2(v_loc), to2(h)] + [
            to2(values[f]) for f in range(n_fields)
        ]
        sorted2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
        cls2 = sorted2[0] & 1
        sorted2 = [sorted2[0] >> 1, *sorted2[1:]]
    else:
        ops2 = [to2(ckey), to2(u_loc), to2(v_loc), to2(h)] + [
            to2(values[f]) for f in range(n_fields)
        ]
        sorted2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
    k2 = sorted2[0]

    is_first = jnp.concatenate(
        [jnp.ones((n_rows, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1
    )
    is_l0 = k2 < bases[1]
    # head = the row's coherent-level prefix (deposits in place when it
    # touches few tiles); tail = everything after — the level>=1 lanes the
    # row sort parked at the row's end, extracted by the bucketed tail
    # gather. Only "heavy" rows — incoherent input whose level-0 lanes are
    # spread over many tiles — route whole (tail = all C lanes).
    head_distinct = (is_first & is_l0).sum(axis=1)
    coherent = head_distinct <= d_max
    tail_eff = jnp.where(coherent, C - is_l0.sum(axis=1), C).astype(jnp.int32)

    pad_key = jnp.int32(bases[n_levels] + 1)
    live_first = is_first & is_l0 & coherent[:, None]
    masked = jnp.where(live_first, k2, pad_key)
    # first d_max distinct head keys per row: each appears once in `masked`
    # (at its first lane), the rest are the pad sentinel
    cand_keys = -jax.lax.top_k(-masked, d_max)[0]  # (n_rows, D) ascending
    cand_rows = jnp.broadcast_to(
        jnp.arange(n_rows, dtype=jnp.int32)[:, None], (n_rows, d_max)
    )
    # per-candidate K4 class: 1 iff NO lane with this key has a footprint
    # wider than the short column loop serves (s_pix > _K4_MAX_S). The
    # deposit kernel's kclass bit selects a 4-iteration column loop for
    # those steps — about half the VPU/MXU work on sub-pixel-dominated
    # (real-snapshot) h distributions.
    cand_k4 = jnp.stack(
        [
            ~((ck2 == cand_keys[:, j : j + 1]) & big2).any(axis=1)
            for j in range(d_max)
        ],
        axis=1,
    ).astype(jnp.int32)  # (n_rows, D)
    cand_win: tuple = ()
    n_wsteps = jnp.int32(0)
    if window:
        # per-candidate lane geometry. The row is key-sorted, so ascending
        # candidate keys == ascending first lanes: the top_k of masked first
        # lanes aligns 1:1 with cand_keys.
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, C), 1)
        masked_lane = jnp.where(live_first, lane, jnp.int32(C))
        starts = -jax.lax.top_k(-masked_lane, d_max)[0]  # (n_rows, D) asc
        head_len = (C - tail_eff)[:, None]  # l0 lane count (coherent rows)
        ends = jnp.minimum(
            jnp.concatenate(
                [starts[:, 1:], jnp.full((n_rows, 1), C, jnp.int32)], axis=1
            ),
            head_len,
        )
        real = starts < head_len
        # class boundary: lanes below `mid` are sub-pixel (the refined sort
        # key parks them first within the candidate's segment), so the
        # small count per candidate is one lane-axis prefix sum differenced
        # at the segment bounds (small_l0 is zero outside l0 segments)
        small_l0 = is_l0 & (cls2 == 0) & coherent[:, None]
        spre = jnp.concatenate(
            [
                jnp.zeros((n_rows, 1), jnp.int32),
                jnp.cumsum(small_l0.astype(jnp.int32), axis=1),
            ],
            axis=1,
        )  # spre[:, j] = # small lanes in [0, j)
        mids = starts + (
            jnp.take_along_axis(spre, ends, axis=1)
            - jnp.take_along_axis(spre, starts, axis=1)
        )
        wb0 = jnp.where(real, starts, 0) // window
        nw = jnp.where(real, (ends - 1) // window - wb0 + 1, 0)
        # leading windows whose lane span is entirely sub-pixel take the K4
        # column loop; a candidate that is all-small K4s every window
        k4n = jnp.where(
            ends <= mids, nw, jnp.clip(mids // window - wb0, 0, nw)
        )
        sk, sr, sk4, swb0, snw, sk4n = jax.lax.sort(
            [
                cand_keys.reshape(-1), cand_rows.reshape(-1),
                cand_k4.reshape(-1),
                wb0.reshape(-1), nw.reshape(-1), k4n.reshape(-1),
            ],
            num_keys=1, is_stable=False,
        )
        cand_win = (swb0, snw, sk4n)
        n_wsteps = nw.sum(dtype=jnp.int32)
    else:
        sk, sr, sk4 = jax.lax.sort(
            [cand_keys.reshape(-1), cand_rows.reshape(-1),
             cand_k4.reshape(-1)],
            num_keys=1, is_stable=False,
        )
    n_cand = jnp.searchsorted(sk, jnp.int32(bases[1])).astype(jnp.int32)

    n_heavy = (~coherent).sum().astype(jnp.int32)
    n_tail = tail_eff.sum().astype(jnp.int32)

    # group rows by half-octave tail bucket (tail-free rows sort past the last
    # bucket); the gather stage slices each bucket's rows contiguously
    thr = jnp.asarray(_TAIL_BUCKETS, jnp.int32)
    bucket = jnp.searchsorted(thr, tail_eff, side="left").astype(jnp.int32)
    bucket = jnp.where(tail_eff > 0, bucket, len(_TAIL_BUCKETS))
    _, rows_by_bucket = jax.lax.sort(
        [bucket, jnp.arange(n_rows, dtype=jnp.int32)], num_keys=1,
        is_stable=False,
    )
    nb = (bucket[None, :] == jnp.arange(len(_TAIL_BUCKETS), dtype=jnp.int32)[
        :, None
    ]).sum(axis=1).astype(jnp.int32)

    packed = jnp.stack(
        list(sorted2[1:4])
        + list(sorted2[4:])
        + [k2.astype(jnp.float32)]
        + [jnp.zeros((n_rows, C), jnp.float32)] * (8 - 4 - n_fields),
        axis=1,
    )  # (n_rows, 8, C): u, v, h, vals..., ckey, zero-pad

    # per-level ROUTED-TAIL counts, computed here rather than from the
    # sorted tail (the sort only orders lanes, it cannot change the
    # totals): level-0 tail lanes are exactly the heavy rows' level-0
    # lanes; level>=1 lanes are all in some row's tail. Shipping these in
    # the same counts vector removes the second host sync the layout used
    # to pay (a ~30 ms round-trip through the axon tunnel per render) —
    # gather, tail sort, and render dispatch back-to-back.
    lev = jnp.minimum(level, n_levels)
    lc0 = (is_l0 & ~coherent[:, None]).sum().astype(jnp.int32)
    lev_counts = [
        (lev == li).sum().astype(jnp.int32) for li in range(1, n_levels + 1)
    ]
    counts = jnp.concatenate(
        [
            jnp.stack([n_cand, n_heavy, n_tail]),
            nb,
            jnp.stack([lc0, *lev_counts]),
            jnp.stack([n_wsteps]),
        ]
    )
    return packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts, cand_win


@lru_cache(maxsize=256)
def _cached_stage_a(
    shape, extent, periodic, bounds, geom_tuples, support_factor, n_fields,
    n_levels, bases, d_max, n_rows, C, donate=False, window=0,
):
    fn = partial(
        _assign_and_rowsort,
        shape=shape, extent=extent, periodic=periodic, bounds=bounds,
        geom_tuples=geom_tuples, support_factor=support_factor,
        n_fields=n_fields, n_levels=n_levels, bases=bases, d_max=d_max,
        n_rows=n_rows, C=C, window=window,
    )
    return jax.jit(fn, donate_argnums=(0, 1, 2, 3) if donate else ())


def _tail_gather(packed, rows_by_bucket, tail_eff, los, nbv, *, caps,
                 n_fields, bases, n_levels, C):
    """Stage B1 (traced): pull every row's tail lanes out of ``packed`` in
    one fused program (per-program dispatch costs 30-45 ms through the
    tunnel — composition stays inside the jit).

    The T0 bucket is a static strided slice of every row's last T0 lanes —
    a near-HBM-bandwidth memcpy instead of one sub-1KB DMA per row
    (per-slice latency dominates at the T0 bucket's row counts); rows
    outside it are masked to the pad key, their dead lanes costing far less
    in the sort than their DMAs would in a gather. Each larger bucket pulls
    its rows' last ``T`` lanes as (1, CH, T) ``dynamic_slice`` row-windows
    (never element gathers: a clipped element gather cost ~6 s at 33M
    particles on v5e; see deposit_pallas._layout_level_body).

    ``los``/``nbv`` (bucket start offsets / true row counts) are *dynamic*
    operands; only ``caps`` — each bucket's class-rounded row capacity
    (:func:`deposit_pallas._next_size_class`) — is static. Program variety is therefore bounded by the capped vector
    (stable across chunks of a snapshot) instead of one program per
    observed bucket-count vector, and a resident service stops recompiling
    after the first few chunks. Slots past a bucket's true count re-read
    row 0 and mask to the pad key. Output is padded to a size class so the expensive
    sort program (stage B2) compiles once per class."""
    CH = 4 + n_fields  # u, v, h, vals..., ckey — contiguous channel prefix
    pad_key_f = float(bases[n_levels] + 1)
    n_rows = packed.shape[0]
    key_parts, chan_parts = [], [[] for _ in range(3 + n_fields)]

    T0 = _TAIL_BUCKETS[0]
    slab = packed[:, :CH, C - T0 :]  # (n_rows, CH, T0)
    keep = (
        (tail_eff > 0) & (tail_eff <= T0)
    )[:, None] & (
        jnp.arange(T0)[None, :] >= (T0 - tail_eff)[:, None]
    )
    key_parts.append(
        jnp.where(keep, slab[:, 3 + n_fields, :], pad_key_f).reshape(-1)
    )
    for ci in range(3 + n_fields):
        chan_parts[ci].append(slab[:, ci, :].reshape(-1))
    v_real = n_rows * T0

    for bi, (T, n_cap) in enumerate(zip(_TAIL_BUCKETS[1:], caps)):
        if n_cap == 0:
            continue
        slot = jnp.arange(n_cap, dtype=jnp.int32)
        live = slot < nbv[bi]
        idx = jnp.clip(los[bi] + slot, 0, n_rows - 1)
        rows_b = jnp.where(live, jnp.take(rows_by_bucket, idx), 0)
        blk = jax.vmap(
            lambda r: jax.lax.dynamic_slice(packed, (r, 0, C - T), (1, CH, T))
        )(rows_b).reshape(n_cap, CH, T)
        te_b = jnp.where(live, jnp.take(tail_eff, rows_b), 0)
        keep = jnp.arange(T)[None, :] >= (T - te_b)[:, None]
        key_parts.append(
            jnp.where(keep, blk[:, 3 + n_fields, :], pad_key_f).reshape(-1)
        )
        for ci in range(3 + n_fields):
            chan_parts[ci].append(blk[:, ci, :].reshape(-1))
        v_real += T * n_cap
    v_pad = max(C, _next_size_class(v_real)) - v_real
    key = jnp.concatenate(
        key_parts + [jnp.full((v_pad,), pad_key_f, jnp.float32)]
    ).astype(jnp.int32)
    chans = [
        jnp.concatenate(parts + [jnp.zeros((v_pad,), jnp.float32)])
        for parts in chan_parts
    ]
    return (key, *chans)


@lru_cache(maxsize=256)
def _cached_tail_gather(caps, n_fields, bases, n_levels, C):
    fn = partial(
        _tail_gather, caps=caps, n_fields=n_fields, bases=bases,
        n_levels=n_levels, C=C,
    )
    return jax.jit(fn)


def _tail_sort_dense(key, u, v, h, vals, *, bases, n_levels, C):
    """Stage B2 (traced): global sort of the compact tail + per-level counts
    + slack padding. Compiles per size class."""
    ops = [key, u, v, h] + list(vals)
    skey, su, sv, sh, *s_vals = jax.lax.sort(ops, num_keys=1, is_stable=False)
    s_values = jnp.stack(s_vals, axis=0)

    base_arr = jnp.asarray(bases, jnp.int32)  # (n_levels+1,)
    starts = jnp.searchsorted(skey, base_arr).astype(jnp.int32)
    end_oversize = jnp.searchsorted(skey, jnp.int32(bases[n_levels] + 1)).astype(
        jnp.int32
    )
    counts = jnp.concatenate(
        [starts[1:] - starts[:-1], (end_oversize - starts[n_levels])[None]]
    )
    # level-local tiles: subtract the key base of each particle's level
    lev = jnp.searchsorted(base_arr[1:], skey, side="right").astype(jnp.int32)
    s_tile = skey - base_arr[jnp.minimum(lev, n_levels)]
    # slack so per-level bucketed reads stay dynamic_slices: buckets are
    # chunk-multiple size classes, bucket <= 9*(c + C)/8, and lo <= n - c,
    # so lo + bucket < n + n//8 + 2C + 1 for any level split (n is itself
    # a class value)
    n = skey.shape[0]
    slack = max(n // 8, C) + 2 * C
    pad1 = lambda a: jnp.pad(a, (0, slack))
    return (
        pad1(s_tile), pad1(su), pad1(sv), pad1(sh),
        jnp.pad(s_values, ((0, 0), (0, slack))), counts,
    )


@lru_cache(maxsize=128)
def _cached_tail_sort_dense(v_tot, n_fields, bases, n_levels, C):
    fn = partial(_tail_sort_dense, bases=bases, n_levels=n_levels, C=C)
    return jax.jit(lambda key, u, v, h, vals: fn(key, u, v, h, vals))


def tile_particles_coherent(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    levels: tuple[PallasDepositConfig, ...] = PALLAS_LEVELS,
    d_max: int = _D_MAX,
    donate: bool = False,
    prep: Optional[str] = None,
    window: int = 0,
) -> CoherentLayout:
    """Build the coherent-order layout. ONE small host sync: the stage-A
    counts vector carries candidate/heavy/bucket counts AND the per-level
    routed-tail counts, so the tail gather, tail sort, and render programs
    all dispatch without another round-trip.

    ``window``: 0 renders each candidate as one whole-row (C-lane) Pallas
    step; a power of two < C schedules W-lane window steps over the
    candidate's lane segment instead — dead lanes outside the segment are
    never touched, and windows whose lanes are all sub-pixel run a K4
    column loop (~half the per-lane work). Exact for any value.

    ``prep``: stage-A engine. ``None`` (default) resolves to the fused
    Pallas prep on TPU (1.8-1.9x the XLA stage A — PREP_AB.json) and the
    XLA stage A elsewhere (interpret-mode Pallas is emulation-slow) or in
    window mode (the Pallas prep does not emit window-step geometry)."""
    kspec = get_kernel(kernel)
    values, _ = _as_field_matrix(values)
    if values.shape[0] > 4:
        raise ValueError(
            "coherent deposit carries at most 4 fields (the key channel "
            "uses the 8th slot); use the sorted engine for more"
        )
    n_valid = int(values.shape[1])
    pad_h = 0.1 * min(spec.pixel_size)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    x, y, h, values = _pad_particles_pow2(x, y, h, values, spec, pad_h=pad_h)
    n = int(h.shape[0])
    C = _CHUNK
    if n % C:
        raise AssertionError("pow2 padding must be chunk-aligned")
    n_rows = n // C

    geoms: list[Optional[_LevelGeometry]] = []
    for cfg in levels:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)
    if geoms[0] is None:
        raise ValueError(
            "coherent deposit requires the smallest footprint level to tile "
            "the map"
        )
    bases = _ckey_bases(geoms)
    bounds = tuple(
        (g.cfg.max_s_pix if g is not None else -1.0) for g in geoms
    )
    geom_tuples = (
        tuple(g.n_tiles_x if g else 1 for g in geoms),
        tuple(g.cfg.TY if g else 1 for g in geoms),
        tuple(g.tx if g else 1 for g in geoms),
        tuple(g.n_tiles_y if g else 1 for g in geoms),
        tuple(g.cfg.M if g else 0 for g in geoms),
    )
    extent = tuple(float(e) for e in spec.extent)
    n_fields = values.shape[0]

    if prep is None:
        prep = (
            "pallas"
            if jax.default_backend() == "tpu" and not window
            else "xla"
        )
    if window:
        if window & (window - 1) or not 128 <= window < C:
            # the deposit reads (1, 8, W) blocks; Mosaic lane blocks below
            # 128 don't lower on TPU
            raise ValueError(f"window must be a power of two in [128, {C})")
        if prep == "pallas":
            raise ValueError(
                "window mode requires prep='xla' (the Pallas stage-A prep "
                "does not emit window-step geometry yet)"
            )
    if prep == "pallas":
        from .coherent_prep_pallas import cached_stage_a_pallas

        stage_a = cached_stage_a_pallas(
            spec.shape, extent, spec.periodic_wrap, bounds, geom_tuples,
            kspec.support_factor, n_fields, len(levels), bases, d_max,
            n_rows, C, _TAIL_BUCKETS, donate=donate,
        )
    elif prep == "xla":
        stage_a = _cached_stage_a(
            spec.shape, extent, spec.periodic_wrap, bounds, geom_tuples,
            kspec.support_factor, n_fields, len(levels), bases, d_max,
            n_rows, C, donate, window,
        )
    else:
        raise ValueError(f"unknown prep engine {prep!r}; use 'pallas'|'xla'")
    outs = stage_a(x, y, h, values)
    packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts = outs[:7]
    cand_win_full = outs[7] if len(outs) > 7 else ()
    cvec = np.asarray(counts)  # the ONLY host sync
    n_cand, n_heavy, n_tail = (int(v) for v in cvec[:3])
    n_buckets = len(_TAIL_BUCKETS)
    nbs = tuple(int(v) for v in cvec[3 : 3 + n_buckets])
    lc = cvec[3 + n_buckets : 3 + n_buckets + len(levels) + 1]
    n_wsteps = int(cvec[-1]) if window else 0

    # 4096-step granularity, not pow2: schedule steps past n_cand are dead
    # (zero work but ~1.6us each on v5e), and pow2 rounding added up to
    # n_cand dead steps at 1e8 scale (0.1 s class); coarse granularity still
    # bounds the compiled-program variety
    b0 = min(max(4096, -(-n_cand // 4096) * 4096), n_rows * d_max) if n_cand else 0
    cand_tile = cand_rowv = cand_k4v = None
    if b0:
        n_tiles0 = geoms[0].n_tiles
        ck = jax.lax.dynamic_slice(sk, (0,), (b0,))
        live = jnp.arange(b0) < n_cand
        cand_tile = jnp.where(live, ck, n_tiles0).astype(jnp.int32)
        cand_rowv = jnp.where(
            live, jax.lax.dynamic_slice(sr, (0,), (b0,)), 0
        ).astype(jnp.int32)
        cand_k4v = jnp.where(
            live, jax.lax.dynamic_slice(sk4, (0,), (b0,)), 0
        ).astype(jnp.int32)

    cand_win: tuple = ()
    b0w = 0
    if b0 and window:
        cand_win = tuple(
            jnp.where(
                live, jax.lax.dynamic_slice(a, (0,), (b0,)), 0
            ).astype(jnp.int32)
            for a in cand_win_full
        )
        b0w = min(
            max(4096, -(-n_wsteps // 4096) * 4096),
            n_rows * d_max * (C // window),
        )

    tail = None
    tail_metas: tuple = ()
    n_tail_oversize = 0
    n_tail_sorted = 0
    if n_tail:
        # class-capped bucket row counts: the static part of the gather key
        nbs_tail = nbs[1:]
        caps = tuple(_next_size_class(nb) if nb else 0 for nb in nbs_tail)
        los = np.concatenate([[nbs[0]], np.cumsum(nbs_tail)[:-1] + nbs[0]])
        tail_chans = _cached_tail_gather(
            caps, n_fields, bases, len(levels), C
        )(packed, rows_by_bucket, tail_eff,
          jnp.asarray(los, jnp.int32), jnp.asarray(nbs_tail, jnp.int32))
        v_tot = int(tail_chans[0].shape[0])
        t_tile, tu, tv, th, t_values, _lcounts = _cached_tail_sort_dense(
            v_tot, n_fields, bases, len(levels), C
        )(tail_chans[0], tail_chans[1], tail_chans[2], tail_chans[3],
          tuple(tail_chans[4:]))
        # metas come from stage A's level counts (the sort cannot change
        # the totals) — no second host sync; gather, sort, and the render
        # program dispatch back-to-back
        metas = []
        lo = 0
        for li, g in enumerate(geoms):
            c = int(lc[li])
            if g is not None and c > 0:
                metas.append((g, lo, C * _next_size_class(-(-c // C)), c))
            lo += c
        tail_metas = tuple(metas)
        n_tail_oversize = int(lc[len(geoms)])
        n_tail_sorted = int(lc.sum())
        tail = (tu, tv, th, t_values, t_tile)

    n_coh_rows = n_rows - n_heavy
    return CoherentLayout(
        spec=spec, kernel=kernel, geom0=geoms[0], packed=packed,
        cand_tile=cand_tile, cand_row=cand_rowv, cand_k4=cand_k4v,
        n_cand=n_cand,
        tail=tail, tail_metas=tail_metas, n_tail_oversize=n_tail_oversize,
        n_tail_sorted=n_tail_sorted, n_fields=n_fields, n_valid=n_valid,
        stats={
            "n_rows": n_rows,
            "coherent_rows": n_coh_rows,
            "coherent_fraction": n_coh_rows / max(1, n_rows),
            "n_candidates": n_cand,
            "candidates_per_coherent_row": n_cand / max(1, n_coh_rows),
            "heavy_rows": n_heavy,
            "tail_particles": n_tail,
            "routed_particles": n_tail_sorted,
            "tail_bucket_rows": dict(zip(_TAIL_BUCKETS, nbs)),
            # per-level routed-tail particle counts (+ oversize last) — the
            # fused engine's caps_from_layout reads these
            "level_tail_counts": [int(v) for v in lc],
            "n_window_steps": n_wsteps,
        },
        window=window, cand_win=cand_win, b0w=b0w,
    )


def _deposit_kernel_coherent(
    sched_ref,  # (n_steps,) packed: work << 30 | [kcls << 29] | tile | row | wb
    chunk_ref,  # (1, 8, W) row-sorted channel block (read in place)
    acc_ref,  # (1, F*R, S)
    *,
    cfg: PallasDepositConfig,
    C: int,  # lane width of one block (= the window W)
    n_fields: int,
    row_bits: int,
    wb_bits: int,
    kernel_name: str,
    support_factor: float,
    psx: float,
    psy: float,
    offset: float,
    precision: str,
    projection: str,
    cheb: tuple[float, ...],
    has_kclass: bool = False,
):
    s = pl.program_id(0)
    word = sched_ref[s]
    shift = row_bits + wb_bits
    # window words and kclass-tagged whole-row words carry a kclass bit at 29
    tile_hi = 29 if (wb_bits or has_kclass) else 30
    tile_of = lambda w: (w >> shift) & ((1 << (tile_hi - shift)) - 1)
    t = tile_of(word)
    t_prev = tile_of(sched_ref[jnp.maximum(s - 1, 0)])
    first = (s == 0) | (t != t_prev)
    work = (word >> 30) & 1
    kernel = get_kernel(kernel_name)

    @pl.when(first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(work == 1)
    def _work():
        data = chunk_ref[0]
        # lanes of other tiles/levels in this row are masked by key match;
        # ckey values are < 2^24, exact in the f32 channel
        key_chan = data[3 + n_fields : 4 + n_fields, :]
        valid = key_chan == t.astype(jnp.float32)
        # sub-pixel-only windows/candidates run the short K4 column loop
        # (dynamic trip count; the footprint anchor tracks k_eff)
        k_eff = (
            jnp.where((word >> 29) & 1 == 0, _K4, cfg.K)
            if (wb_bits or has_kclass)
            else None
        )
        acc_ref[0] += _chunk_contrib(
            data, valid, cfg=cfg, C=C, n_fields=n_fields,
            kernel=kernel, support_factor=support_factor, psx=psx, psy=psy,
            offset=offset, precision=precision, projection=projection,
            cheb=cheb, k_eff=k_eff,
        )


@lru_cache(maxsize=256)
def _cached_coherent_call(
    cfg, n_tiles, n_steps, n_rows, n_fields, row_bits,
    kernel, support_factor, psx, psy, offset, precision, interpret, projection,
    wb_bits=0, has_kclass=False,
):
    W = _CHUNK >> wb_bits
    n_wb = _CHUNK // W

    def in_idx(s, sched):
        row = (sched[s] >> wb_bits) & ((1 << row_bits) - 1)
        wb = sched[s] & ((1 << wb_bits) - 1)
        return (jnp.clip(row, 0, n_rows - 1), 0, jnp.clip(wb, 0, n_wb - 1))

    def out_idx(s, sched):
        tile_hi = 29 if (wb_bits or has_kclass) else 30
        shift = row_bits + wb_bits
        t = (sched[s] >> shift) & ((1 << (tile_hi - shift)) - 1)
        return (jnp.clip(t, 0, n_tiles - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, 8, W), in_idx)],
        out_specs=pl.BlockSpec((1, n_fields * cfg.R, cfg.S), out_idx),
    )
    kern = partial(
        _deposit_kernel_coherent,
        cfg=cfg, C=W, n_fields=n_fields, row_bits=row_bits, wb_bits=wb_bits,
        has_kclass=has_kclass,
        kernel_name=kernel, support_factor=support_factor, psx=psx, psy=psy,
        offset=offset, precision=precision, projection=projection,
        cheb=(
            integrated_kernel_chebyshev(kernel)
            if projection == "integrated"
            else ()
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_fields * cfg.R, cfg.S), jnp.float32
        ),
        interpret=interpret,
    )


def _tile_steps(cand_tile, n_tiles: int, n_steps: int, nch_of):
    """Shared schedule-step expansion: every tile gets max(nch, 1)
    consecutive steps, where ``nch = nch_of(cstart, cend)`` is its work-step
    count over the tile-sorted candidate list. Empty tiles get one non-work
    step so their accumulator block is zeroed; trailing dead steps re-target
    the last tile with no effect. Returns (cstart, nch, tile_c, j_in, work)."""
    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    cstart = jnp.searchsorted(cand_tile, tile_range).astype(jnp.int32)
    cend = jnp.searchsorted(cand_tile, tile_range, side="right").astype(
        jnp.int32
    )
    nch = nch_of(cstart, cend)
    nch1 = jnp.maximum(nch, 1)
    cum = jnp.cumsum(nch1)
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    tile = jnp.searchsorted(cum, steps, side="right").astype(jnp.int32)
    live = tile < n_tiles
    tile_c = jnp.minimum(tile, n_tiles - 1)
    tile_off = (cum - nch1).astype(jnp.int32)
    j_in = steps - tile_off[tile_c]
    work = live & (j_in < nch[tile_c])
    return cstart, nch, tile_c, j_in, work


def _coherent_schedule(cand_tile, cand_row, n_tiles: int, n_steps: int,
                       row_bits: int, cand_k4=None):
    """Packed (work, [kclass,] tile, row) schedule words over tile-sorted
    candidates: one whole-row step per candidate. With ``cand_k4`` the word
    carries a kclass bit at 29 (0 = every lane of the candidate is
    sub-pixel, so the step's column loop runs K4 iterations instead of K)."""
    cstart, _, tile_c, j_in, work = _tile_steps(
        cand_tile, n_tiles, n_steps, lambda cs, ce: ce - cs
    )
    ci = jnp.clip(cstart[tile_c] + j_in, 0, cand_tile.shape[0] - 1)
    row = jnp.where(work, cand_row[ci], 0)
    word = (
        (work.astype(jnp.int32) << 30)
        | (tile_c << row_bits)
        | row
    )
    if cand_k4 is not None:
        kcls = jnp.where(work & (cand_k4[ci] == 1), 0, 1)
        word = word | (kcls << 29)
    return word.astype(jnp.int32)


def _coherent_schedule_windows(
    cand_tile, cand_row, cand_wb0, cand_nw, cand_k4n,
    n_tiles: int, n_steps: int, row_bits: int, wb_bits: int,
):
    """Packed (work, kclass, tile, row, window) schedule words: tile-sorted
    candidates expand into per-window steps (window t of candidate i reads
    lane block ``cand_wb0[i] + t``; the first ``cand_k4n[i]`` windows hold
    only sub-pixel lanes and take the K4 column loop)."""
    B = cand_tile.shape[0]
    cnw0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cand_nw, dtype=jnp.int32)]
    )
    cstart, _, tile_c, j_in, work = _tile_steps(
        cand_tile, n_tiles, n_steps, lambda cs, ce: cnw0[ce] - cnw0[cs]
    )
    # global window-step index -> candidate (zero-width pad candidates are
    # skipped by the right-side search) -> window-within-candidate
    g = cnw0[cstart[tile_c]] + jnp.where(work, j_in, 0)
    ci = jnp.clip(
        jnp.searchsorted(cnw0, g, side="right") - 1, 0, B - 1
    ).astype(jnp.int32)
    t_in = g - cnw0[ci]
    wb = jnp.where(work, cand_wb0[ci] + t_in, 0)
    row = jnp.where(work, cand_row[ci], 0)
    kcls = jnp.where(work & (t_in < cand_k4n[ci]), 0, 1)
    return (
        (work.astype(jnp.int32) << 30)
        | (kcls << 29)
        | (tile_c << (row_bits + wb_bits))
        | (row << wb_bits)
        | wb
    ).astype(jnp.int32)


def _coherent_body(
    packed, cand_tile, cand_row, tail, tail_los, tail_counts,
    cand_win=(), cand_k4=None,
    *,
    geom0, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, projection,
    b0, n_rows, tail_metas_static, window=0, b0w=0,
):
    from .deposit_pallas import _overlap_add

    ny, nx = shape
    x0, x1, y0, y1 = extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    total = jnp.zeros((n_fields, ny, nx), jnp.float32)

    if b0:
        cfg, tx = geom0.cfg, geom0.tx
        n_tiles = geom0.n_tiles
        row_bits = max(1, (max(1, n_rows - 1)).bit_length())
        tile_bits = max(1, n_tiles.bit_length())
        has_kclass = False
        if window:
            wb_bits = (_CHUNK // window).bit_length() - 1
            if row_bits + tile_bits + wb_bits > 29:
                raise ValueError(
                    "coherent window-schedule word overflow (particle count "
                    "x tile count too large for the kclass bit); use "
                    "window=0 or the sorted engine"
                )
            n_steps = b0w + n_tiles
            sched = _coherent_schedule_windows(
                cand_tile, cand_row, *cand_win, n_tiles, n_steps, row_bits,
                wb_bits,
            )
        else:
            wb_bits = 0
            if row_bits + tile_bits > 30:
                raise ValueError(
                    "coherent schedule word overflow (particle count x tile "
                    "count too large); use the sorted engine"
                )
            # per-candidate kclass needs a free bit at 29; when the word is
            # too tight every step falls back to the full-K column loop
            has_kclass = (
                cand_k4 is not None and row_bits + tile_bits <= 29
            )
            n_steps = b0 + n_tiles
            sched = _coherent_schedule(
                cand_tile, cand_row, n_tiles, n_steps, row_bits,
                cand_k4 if has_kclass else None,
            )
        tiles = _cached_coherent_call(
            cfg, n_tiles, n_steps, n_rows, n_fields, row_bits,
            kernel, support_factor, psx, psy, offset, precision, interpret,
            projection, wb_bits, has_kclass,
        )(sched, packed)
        total = total + _overlap_add(
            tiles, cfg, tx, geom0.n_tiles_y, geom0.n_tiles_x, n_fields,
            ny, nx, periodic,
        )

    if tail is not None:
        tu, tv, th, t_values, t_tile = tail
        for i, (geom, bucket) in enumerate(tail_metas_static):
            total = total + _layout_level_body(
                geom, shape, extent, periodic, offset, n_fields, kernel,
                support_factor, precision, interpret, bucket, projection,
                tu, tv, th, t_values, t_tile, tail_los[i], tail_counts[i],
            )
    return total


@lru_cache(maxsize=256)
def _cached_coherent_render(
    geom0, shape, extent, periodic, offset, n_fields, kernel,
    support_factor, precision, interpret, projection, b0, n_rows,
    tail_metas_static, has_tail, window=0, b0w=0,
):
    def run(packed, cand_tile, cand_row, tail, tail_los, tail_counts,
            cand_win, cand_k4):
        return _coherent_body(
            packed, cand_tile, cand_row, tail if has_tail else None,
            tail_los, tail_counts, cand_win, cand_k4,
            geom0=geom0, shape=shape, extent=extent, periodic=periodic,
            offset=offset, n_fields=n_fields, kernel=kernel,
            support_factor=support_factor, precision=precision,
            interpret=interpret, projection=projection, b0=b0, n_rows=n_rows,
            tail_metas_static=tail_metas_static, window=window, b0w=b0w,
        )

    return jax.jit(run)


def deposit_coherent(
    layout: CoherentLayout,
    *,
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
) -> Array:
    """Render the full adaptive map stack from a :class:`CoherentLayout`.
    Returns (F, ny, nx)."""
    _check_precision(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = layout.spec
    ny, nx = spec.shape
    b0 = int(layout.cand_tile.shape[0]) if layout.cand_tile is not None else 0
    n_rows = int(layout.packed.shape[0])
    metas_static = tuple((m[0], m[2]) for m in layout.tail_metas)
    has_tail = layout.tail is not None and bool(layout.tail_metas)

    dummy = jnp.zeros((1,), jnp.int32)
    tail = layout.tail if has_tail else (dummy, dummy, dummy, dummy, dummy)
    los = jnp.asarray(
        [int(m[1]) for m in layout.tail_metas] or [0], jnp.int32
    )
    cnts = jnp.asarray(
        [int(m[3]) for m in layout.tail_metas] or [0], jnp.int32
    )
    total = _cached_coherent_render(
        layout.geom0, spec.shape, tuple(float(e) for e in spec.extent),
        spec.periodic_wrap, spec.sample_offset, layout.n_fields,
        layout.kernel, get_kernel(layout.kernel).support_factor, precision,
        interpret, projection, b0, n_rows, metas_static, has_tail,
        layout.window, layout.b0w,
    )(
        layout.packed,
        layout.cand_tile if b0 else jnp.zeros((1,), jnp.int32),
        layout.cand_row if b0 else jnp.zeros((1,), jnp.int32),
        tail, los, cnts,
        layout.cand_win if (b0 and layout.window) else (),
        layout.cand_k4 if b0 else None,
    )

    if layout.n_tail_oversize:
        from .deposit import deposit_2d  # late import: sibling module

        tu, tv, th, t_values, _ = layout.tail
        x0, x1, y0, y1 = spec.extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        sl = slice(
            layout.n_tail_sorted - layout.n_tail_oversize, layout.n_tail_sorted
        )
        xo = np.asarray(tu[sl]) * psx + x0
        yo = np.asarray(tv[sl]) * psy + y0
        ho = np.asarray(th[sl])
        vo = np.asarray(t_values[:, sl])
        img = deposit_2d(
            xo, yo, ho, vo.T, spec, kernel=layout.kernel, projection=projection
        )
        total = total + jnp.moveaxis(
            img if img.ndim == 3 else img[..., None], -1, 0
        )
    return total


@dataclass(frozen=True)
class CoherentCaps:
    """Static capacities for the zero-sync fused coherent render.

    The host-orchestrated engine (:func:`tile_particles_coherent` +
    :func:`deposit_coherent`) pays ONE host round-trip per render to read
    the data-dependent counts that size its Pallas schedules — ~0.1 s
    through the axon tunnel at north-star scale, plus one extra program
    dispatch group. With capacities pinned ahead of time the whole
    pipeline (stage A -> tail gather -> tail sort -> render) traces into a
    SINGLE jitted program with zero host syncs: counts flow as dynamic
    operands exactly like the multi-chip engine
    (:func:`..parallel.coherent.deposit_2d_coherent_sharded`), which
    already maxes static sizes over shards for the same reason.

    Capacities are stable across the macro-chunks of a snapshot: derive
    them from a first (synced) render via :func:`caps_from_layout` and
    reuse. The fused render reports truth-vs-capacity as an on-device
    ``ok`` flag — check it lazily (with the map fetch), and re-render
    through the synced engine on overflow (exact, just slower).
    """

    b0: int  # candidate schedule capacity (steps incl. 4096 granularity)
    bucket_caps: tuple[int, ...]  # rows per tail bucket _TAIL_BUCKETS[1:]
    level_caps: tuple[int, ...]  # routed-tail particles per footprint level


def caps_from_layout(layout: CoherentLayout, *,
                     slack: Optional[float] = None,
                     levels=PALLAS_LEVELS) -> CoherentCaps:
    """Derive fused-render capacities from a synced first render, with
    headroom for chunk-to-chunk drift.

    ``slack=None`` (default) sizes each capacity from its own measured
    occupancy: count + ``6 * sqrt(count)`` + a small floor. Chunk-to-chunk
    drift of a count that aggregates ~10^4-10^6 independent row/particle
    events is sqrt-scale, so six sigmas of headroom holds overflow to
    ~never while inflating capacities only ~1-3% at production scales —
    the old flat 1.3x multiplier inflated the candidate schedule and tail
    volumes by 30-45% and was the fused engine's entire gap to the synced
    engine (NORTHSTAR_FUSED r3: 0.9313 s vs 0.7359 s). A float ``slack``
    keeps the multiplicative behavior for workloads whose chunk statistics
    genuinely drift (e.g. calibrating on a small first chunk).

    Floors: a populated bucket (or one adjacent to a populated bucket —
    rows drift across half-octave boundaries) never caps below 8 rows, and
    every level up to the deepest populated one gets at least one chunk of
    tail capacity. The floors cost ~100 KB of extra tail-sort volume —
    noise at production chunk sizes — and make capacities derived from a
    small first chunk safe to reuse."""
    if slack is None:
        grow = lambda v: int(v + 6.0 * np.sqrt(v) + 8) if v else 0
        bucket_grow = lambda v: grow(v) + 8
    else:
        grow = lambda v: int(np.ceil(v * slack)) if v else 0
        # keep the legacy additive sqrt headroom: float slack is the
        # escape hatch for genuinely drifting chunk statistics, where
        # small buckets need the extra rows most
        bucket_grow = lambda v: grow(v) + 8 + int(2.0 * np.sqrt(v))
    stats = layout.stats
    b0 = max(4096, -(-grow(stats["n_candidates"]) // 4096) * 4096)
    raw = [stats["tail_bucket_rows"][t] for t in _TAIL_BUCKETS[1:]]
    nb = len(raw)
    active = [
        any(raw[j] for j in range(max(0, i - 1), min(nb, i + 2)))
        for i in range(nb)
    ]
    bucket_caps = tuple(
        bucket_grow(v) if act else 0 for v, act in zip(raw, active)
    )
    lc = stats["level_tail_counts"][: len(levels)]
    lmax = max((li for li, v in enumerate(lc) if v), default=-1)
    level_caps = tuple(
        (grow(v) + _CHUNK) if li <= lmax else 0 for li, v in enumerate(lc)
    )
    return CoherentCaps(b0=b0, bucket_caps=bucket_caps, level_caps=level_caps)


def caps_union(*all_caps: CoherentCaps) -> CoherentCaps:
    """Elementwise max of capacities — merge per-shard (or per-chunk)
    calibrations into one set every program can share."""
    if not all_caps:
        raise ValueError("caps_union needs at least one CoherentCaps")
    for name in ("bucket_caps", "level_caps"):
        lengths = {len(getattr(c, name)) for c in all_caps}
        if len(lengths) > 1:
            # zip would silently truncate to the shortest — an
            # under-capacity union that drops deep-level tail work
            raise ValueError(
                f"caps_union: mismatched {name} lengths {sorted(lengths)} "
                "(calibrate every shard with the same levels)"
            )
    return CoherentCaps(
        b0=max(c.b0 for c in all_caps),
        bucket_caps=tuple(
            max(vs) for vs in zip(*(c.bucket_caps for c in all_caps))
        ),
        level_caps=tuple(
            max(vs) for vs in zip(*(c.level_caps for c in all_caps))
        ),
    )


def _fused_coherent_body(
    x, y, h, values,
    *,
    shape, extent, periodic, offset, bounds, geom_tuples, geoms_sel, bases,
    support_factor, n_fields, n_levels, d_max, n_rows, C,
    b0, gather_caps, metas_static, level_sel, any_tail,
    kernel, precision, interpret, projection, n_tiles0,
    prep="xla",
):
    """The whole coherent render as ONE traced function (zero host syncs).

    ``metas_static``: ((geom, bucket), ...) for levels with nonzero static
    capacity; ``level_sel``: their level indices (for the dynamic lo/count
    operands). Returns (map stack, ok flag)."""
    if prep == "pallas":
        from .coherent_prep_pallas import _stage_a_pallas

        rb = 16
        while n_rows % rb:  # grid must cover every row block exactly
            rb //= 2
        outs = _stage_a_pallas(
            x, y, h, values,
            shape=shape, extent=extent, periodic=periodic, bounds=bounds,
            geom_tuples=geom_tuples, support_factor=support_factor,
            n_fields=n_fields, n_levels=n_levels, bases=bases, d_max=d_max,
            n_rows=n_rows, C=C, RB=rb, interpret=interpret,
            tail_buckets=_TAIL_BUCKETS,
        )
    else:
        outs = _assign_and_rowsort(
            x, y, h, values,
            shape=shape, extent=extent, periodic=periodic, bounds=bounds,
            geom_tuples=geom_tuples, support_factor=support_factor,
            n_fields=n_fields, n_levels=n_levels, bases=bases, d_max=d_max,
            n_rows=n_rows, C=C,
        )
    packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts = outs[:7]
    n_buckets = len(_TAIL_BUCKETS)
    n_cand = counts[0]
    nbs = counts[3 : 3 + n_buckets]
    # per-level routed tail + oversize (the trailing element is the
    # window-step count, unused by the whole-row fused path)
    lc = counts[3 + n_buckets : 3 + n_buckets + n_levels + 1]

    ok = n_cand <= b0
    cap_rows = jnp.asarray(
        [_next_size_class(c) if c else 0 for c in gather_caps], jnp.int32
    )
    ok &= jnp.all(nbs[1:] <= cap_rows)
    if metas_static:
        sel = jnp.asarray(level_sel, jnp.int32)
        lev_caps_arr = jnp.asarray([m[1] for m in metas_static], jnp.int32)
        ok &= jnp.all(lc[sel] <= lev_caps_arr)
    # levels outside the static selection (cap 0) and oversize must be empty
    unsel = np.ones(n_levels + 1, bool)
    unsel[list(level_sel)] = False
    ok &= jnp.all(jnp.where(jnp.asarray(unsel), lc == 0, True))

    if b0:
        live = jnp.arange(b0, dtype=jnp.int32) < n_cand
        cand_tile = jnp.where(
            live, jax.lax.dynamic_slice(sk, (0,), (b0,)), n_tiles0
        ).astype(jnp.int32)
        cand_row = jnp.where(
            live, jax.lax.dynamic_slice(sr, (0,), (b0,)), 0
        ).astype(jnp.int32)
        cand_k4 = jnp.where(
            live, jax.lax.dynamic_slice(sk4, (0,), (b0,)), 0
        ).astype(jnp.int32)
    else:
        cand_tile = cand_row = cand_k4 = None

    tail = None
    tail_los = tail_cnts = jnp.zeros((1,), jnp.int32)
    if any_tail:
        nbv = nbs[1:]
        los = jnp.concatenate(
            [nbs[:1], nbs[0] + jnp.cumsum(nbv)[:-1]]
        ).astype(jnp.int32)
        classed = tuple(
            _next_size_class(c) if c else 0 for c in gather_caps
        )
        chans = _tail_gather(
            packed, rows_by_bucket, tail_eff, los, nbv,
            caps=classed, n_fields=n_fields, bases=bases,
            n_levels=n_levels, C=C,
        )
        t_tile, tu, tv, th, t_values, _ = _tail_sort_dense(
            chans[0], chans[1], chans[2], chans[3], tuple(chans[4:]),
            bases=bases, n_levels=n_levels, C=C,
        )
        # extra slack (cf. parallel.coherent._run_b_local): level buckets
        # are sized from static caps, not this render's truth, so
        # lo + bucket can pass the single-render slack bound; dynamic_slice
        # would clamp the start and misalign the live mask
        v = int(chans[0].shape[0])
        extra = v + 2 * C
        pad1 = lambda a: jnp.pad(a, (0, extra))
        tail = (
            pad1(tu), pad1(tv), pad1(th),
            jnp.pad(t_values, ((0, 0), (0, extra))), pad1(t_tile),
        )
        if metas_static:
            lev_lo = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(lc[:-1])]
            ).astype(jnp.int32)
            sel = jnp.asarray(level_sel, jnp.int32)
            tail_los = lev_lo[sel]
            tail_cnts = lc[sel].astype(jnp.int32)
    else:
        ok &= counts[2] == 0  # n_tail must be zero without tail capacity

    total = _coherent_body(
        packed, cand_tile, cand_row, tail if metas_static else None,
        tail_los, tail_cnts, cand_k4=cand_k4,
        geom0=geoms_sel[0], shape=shape, extent=extent, periodic=periodic,
        offset=offset, n_fields=n_fields, kernel=kernel,
        support_factor=support_factor, precision=precision,
        interpret=interpret, projection=projection, b0=b0, n_rows=n_rows,
        tail_metas_static=metas_static,
    )
    return total, ok


@lru_cache(maxsize=128)
def _cached_fused_render(statics, donate=False):
    kw = dict(statics)
    fn = partial(_fused_coherent_body, **kw)
    return jax.jit(
        lambda x, y, h, values: fn(x, y, h, values),
        donate_argnums=(0, 1, 2, 3) if donate else (),
    )


def deposit_2d_coherent_fused(
    x, y, h, values, spec: MapSpec, caps: CoherentCaps,
    *,
    kernel: str = "cubic_spline",
    levels: tuple[PallasDepositConfig, ...] = PALLAS_LEVELS,
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
    d_max: int = _D_MAX,
    donate: bool = False,
    prep: Optional[str] = None,
):
    """Zero-host-sync coherent render with pinned capacities.

    Returns ``(maps, ok)`` where ``ok`` is an on-device bool: True iff
    every data-dependent count fit ``caps`` (and no oversize smoothing
    lengths appeared), i.e. the map is exact. **Callers MUST check
    ``ok``** — an over-capacity render silently truncates deposits, so a
    caller that ignores the flag gets a corrupt map with no other signal.
    On ``ok == False`` re-render through :func:`deposit_2d_coherent`
    (synced, always exact) and derive fresh capacities via
    :func:`caps_from_layout`.

    Streaming loops over macro-chunks: the default ``caps_from_layout``
    headroom (+6 sigma) models Poisson chunk-to-chunk drift, but
    macro-chunks of a spatially-ordered snapshot sample systematically
    different regions — caps calibrated on chunk 0 alone can overflow far
    more often than "never" on later chunks. Calibrate on a few
    representative chunks and combine with :func:`caps_union`, and treat
    the synced re-render fallback as the correctness backstop, not a
    rare event.

    The per-render host cost is dispatch-only — counts never come back to
    the host — so a streaming loop over macro-chunks runs the layout AND
    render of chunk k+1 while the host is still free to prefetch chunk
    k+2 (cf. ROADMAP seam: sync1 measured ~0.1 s/render through the axon
    tunnel at 2^26).
    """
    _check_precision(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    values, single = _as_field_matrix(values)
    if values.shape[0] > 4:
        raise ValueError(
            "coherent deposit carries at most 4 fields (the key channel "
            "uses the 8th slot); use the sorted engine for more"
        )
    pad_h = 0.1 * min(spec.pixel_size)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    x, y, h, values = _pad_particles_pow2(x, y, h, values, spec, pad_h=pad_h)
    n = int(h.shape[0])
    n_rows = n // _CHUNK
    statics = _build_fused_statics(
        spec, caps, kernel=kernel, levels=levels, d_max=d_max,
        n_rows=n_rows, n_fields=int(values.shape[0]), precision=precision,
        interpret=interpret, projection=projection, prep=prep,
    )
    total, ok = _cached_fused_render(statics, donate)(x, y, h, values)
    return (total[0] if single else total), ok


def _build_fused_statics(
    spec: MapSpec, caps: CoherentCaps, *, kernel, levels, d_max, n_rows,
    n_fields, precision, interpret, projection, prep=None,
):
    """Static keyword tuple for :func:`_fused_coherent_body` (hashable —
    keys the jit caches of both the single-chip and sharded fused paths)."""
    kspec = get_kernel(kernel)
    C = _CHUNK
    geoms: list[Optional[_LevelGeometry]] = []
    for cfg in levels:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)
    if geoms[0] is None:
        raise ValueError(
            "coherent deposit requires the smallest footprint level to tile "
            "the map"
        )
    bases = _ckey_bases(geoms)
    bounds = tuple(
        (g.cfg.max_s_pix if g is not None else -1.0) for g in geoms
    )
    geom_tuples = (
        tuple(g.n_tiles_x if g else 1 for g in geoms),
        tuple(g.cfg.TY if g else 1 for g in geoms),
        tuple(g.tx if g else 1 for g in geoms),
        tuple(g.n_tiles_y if g else 1 for g in geoms),
        tuple(g.cfg.M if g else 0 for g in geoms),
    )

    b0 = min(caps.b0, n_rows * d_max)
    metas, level_sel = [], []
    for li, g in enumerate(geoms):
        cap = caps.level_caps[li] if li < len(caps.level_caps) else 0
        if g is not None and cap > 0:
            metas.append((g, C * _next_size_class(-(-cap // C))))
            level_sel.append(li)
    any_tail = bool(metas) or any(caps.bucket_caps)

    return (
        ("shape", spec.shape),
        ("extent", tuple(float(e) for e in spec.extent)),
        ("periodic", spec.periodic_wrap),
        ("offset", spec.sample_offset),
        ("bounds", bounds),
        ("geom_tuples", geom_tuples),
        ("geoms_sel", tuple(geoms[li] for li in ([0] + level_sel))),
        ("bases", bases),
        ("support_factor", kspec.support_factor),
        ("n_fields", n_fields),
        ("n_levels", len(levels)),
        ("d_max", d_max),
        ("n_rows", n_rows),
        ("C", C),
        ("b0", b0),
        ("gather_caps", tuple(caps.bucket_caps)),
        ("metas_static", tuple(metas)),
        ("level_sel", tuple(level_sel)),
        ("any_tail", any_tail),
        ("kernel", kernel),
        ("precision", precision),
        ("interpret", interpret),
        ("projection", projection),
        ("n_tiles0", geoms[0].n_tiles),
        # fused stage-A engine: Pallas prep when compiled (PREP_AB.json),
        # XLA stage A under interpret-mode emulation
        ("prep", prep if prep is not None else ("xla" if interpret else "pallas")),
    )


def deposit_2d_coherent(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
    d_max: int = _D_MAX,
    window: int = 0,
):
    """Adaptive-h deposit for snapshot-ordered input: coherent rows deposit
    in place (no global sort), the rest route through the sorted pipeline.
    Correct for any input order; fastest when consecutive particles are
    spatially adjacent. Returns (ny, nx) or (F, ny, nx)."""
    values, single = _as_field_matrix(values)
    layout = tile_particles_coherent(
        x, y, h, values, spec, kernel=kernel, d_max=d_max, window=window
    )
    total = deposit_coherent(
        layout, precision=precision, interpret=interpret, projection=projection
    )
    return total[0] if single else total
