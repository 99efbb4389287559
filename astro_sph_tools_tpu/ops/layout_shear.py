"""Shear (two-pass) grouping layout: the random-order global-sort killer.

``tile_particles`` groups particles by composite (level, tile) key. For
shuffled input the 6-operand global ``lax.sort`` costs 1.13 s at 2^27 on
v5e (SORT_MICRO.json) — 70 % of the random-order render wall. This module
replaces it with work XLA and the DMA engines do well:

1. **Pass 1 — row sort** (0.16 s): view the operands as (N/2048, 2048)
   and sort each row by key. Independent bitonic networks: log^2(2048)
   passes, not log^2(N).
2. **Transpose** (0.08 s): column j of every row-sorted row is that row's
   j-th order statistic ~ the global j/2048 quantile. After transposing
   to (2048, N/2048), each new row spans a narrow quantile *band* of the
   key distribution (~60 of ~3650 keys for uniform-random input).
3. **Pass 2 — band sort** (0.33 s): sort each band row. Runs of equal
   key are now long (~1e3 records) and there are few of them (~1e5).
4. **Run append** (0.10 s, APPEND_MICRO.json): a Pallas kernel streams
   each (band row, key) run into its key's contiguous destination region
   with chained HBM->HBM DMAs over a *gang* layout — records packed as
   (G, 8, 128) so one gang = 128 consecutive records x 8 field channels
   = 4 KB contiguous, and dim-0 slab DMAs need no tile alignment.

Runs are located by exact per-band histograms (byte-split one-hot MXU
matmuls — no scatter, no searchsorted over the data), so the grouping is
EXACT for any input distribution; only the run count (and hence append
time) is data-dependent. Gang-granularity appends leave bounded garbage
inside the destination — head *strays* (neighbouring records sharing the
run's first source gang) and tail pads — which a vectorised cleanup pass
zeroes using run metadata expanded by cumsum-scatter (no per-position
searchsorted). Pad slots carry their key's tile id (the tile channel is
rebuilt from the run structure), zero payloads, and ``perm`` pointing
past the valid range so ``with_values`` re-gathers them as zero.

The output contract matches ``deposit_pallas._tile_sort_tail``: per-level
segments contiguous and tile-sorted, per-level counts (HERE including
intra-segment pad slots — the deposit renders them at zero value), and
N/2 tail slack so every level segment is a ``lax.dynamic_slice``.

Reference frame: the reference never needed this — its projector was
O(N_pix * N_part) per pixel (`tools/projections/_projector.py:53-71`) and
its only layout tool was an MPI all-to-all reorder
(`tools/_ArrayReorder.py`).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_C0 = 2048  # pass-1 row length (also the deposit chunk)
_GANG = 128  # records per gang (one (8, 128) f32 tile, 4 KB)
_WG = 16  # gangs per DMA slab (64 KB: 109 GB/s chained, APPEND_MICRO)
_RPB = 512  # sub-runs per pallas grid block (schedule slice in SMEM)
_SLOTS = 8  # in-flight DMA semaphore slots


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


# ---------------------------------------------------------------------------
# Program A: sorts + run geometry + gang packing
# ---------------------------------------------------------------------------


def _band_histogram(key2: Array, n_keys: int) -> Array:
    """Exact per-band key counts via byte-split one-hot MXU matmuls.

    ``key2``: (B, L) band-sorted int32 keys in [0, n_keys). Returns
    (B, n_keys) float32 counts (exact: 0/1 products, f32 accumulation,
    counts < 2^24). A direct one-hot would materialise (B, L, n_keys);
    splitting the key into hi/lo parts turns it into a batched
    (KH, slab) @ (slab, KL) contraction over column slabs.
    """
    B, L = key2.shape
    KL = 128
    KH = -(-n_keys // KL)
    slab = min(L, 512)
    n_slabs = L // slab
    lo = (key2 % KL).reshape(B, n_slabs, slab)
    hi = (key2 // KL).reshape(B, n_slabs, slab)
    kh = jnp.arange(KH, dtype=jnp.int32)
    kl = jnp.arange(KL, dtype=jnp.int32)

    def body(acc, inputs):
        hi_s, lo_s = inputs  # (B, slab)
        oh_hi = (hi_s[:, :, None] == kh[None, None, :]).astype(jnp.bfloat16)
        oh_lo = (lo_s[:, :, None] == kl[None, None, :]).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (B, KH, KL)
        return acc, None

    acc0 = jnp.zeros((B, KH, KL), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0,
        (hi.transpose(1, 0, 2), lo.transpose(1, 0, 2)),
    )
    return acc.reshape(B, KH * KL)[:, :n_keys]


def _shear_stage_a_impl(ops, *, n_keys: int, assign=None):
    """Assignment + sorts + transpose + run geometry + gang packing.

    ``ops``: list of (N,) arrays. With ``assign=None``, ops[0] is already
    the int32 compact key and the rest are payload channels (f32, or i32
    ``perm`` riding bit-cast). With a static ``assign`` callable, ops are
    raw ``(x, y, h, *fields, [perm])`` and the key + tile-local coords are
    computed in-program — fusing the assignment lets XLA alias the donated
    raw inputs straight into the sort buffers (the separate-assign form
    kept x/y alive across the sorts and OOMed at 2^27 on 16 GB). The key
    does NOT ride into the gangs: the tile channel is rebuilt from the run
    structure in stage B, freeing a payload slot.
    """
    if assign is not None:
        x, y, h = ops[0], ops[1], ops[2]
        key, u_loc, v_loc = assign(x, y, h)
        ops = [key, u_loc, v_loc, h, *ops[3:]]
    N = ops[0].shape[0]
    R0 = N // _C0  # pass-1 rows; also pass-2 band length
    B = _C0  # pass-2 band count

    rows = [o.reshape(R0, _C0) for o in ops]
    rows = jax.lax.sort(rows, num_keys=1, dimension=-1, is_stable=False)
    bands = [r.T for r in rows]  # (B, R0)
    bands = jax.lax.sort(bands, num_keys=1, dimension=-1, is_stable=False)
    key2 = bands[0]

    counts = _band_histogram(key2, n_keys)  # (B, n_keys) f32, exact

    # run geometry, (key-major, band) order: run index = k * B + r
    counts_i = counts.astype(jnp.int32)
    start_in_band = jnp.cumsum(counts_i, axis=1) - counts_i  # (B, n_keys)
    src_rec = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * R0 + start_in_band
    ).T.reshape(-1)  # (n_keys * B,)
    cnt = counts_i.T.reshape(-1)
    src_gang = src_rec // _GANG
    head = src_rec - src_gang * _GANG
    ngang = jnp.where(cnt > 0, (head + cnt + _GANG - 1) // _GANG, 0)
    cum_ngang = jnp.cumsum(ngang)  # inclusive
    nsub = (ngang + _WG - 1) // _WG
    cum_nsub = jnp.cumsum(nsub)
    n_gang_total = cum_ngang[-1]
    n_sub_total = cum_nsub[-1]

    # per-level slot counts (pads included): runs are key-major, so a
    # level's gangs are the cum_ngang difference at its key boundaries
    per_key_gangs = jnp.diff(jnp.concatenate([jnp.zeros(1, ngang.dtype),
                                              cum_ngang[B - 1 :: B]]))

    # pack payload channels (key excluded) into gangs (G, 8, 128); the
    # trailing _WG zero gangs absorb sub-run source-window overruns
    pay = [
        (jax.lax.bitcast_convert_type(b, jnp.float32)
         if b.dtype != jnp.float32 else b)
        for b in bands[1:]
    ]
    pay += [jnp.zeros((B, R0), jnp.float32)] * (8 - len(pay))
    gangs = jnp.pad(
        jnp.stack([p.reshape(N // _GANG, _GANG) for p in pay], axis=1),
        ((0, _WG), (0, 0), (0, 0)),
    )

    return (
        gangs, src_gang.astype(jnp.int32), head.astype(jnp.int32),
        ngang.astype(jnp.int32), cum_ngang.astype(jnp.int32),
        cnt, cum_nsub.astype(jnp.int32), per_key_gangs.astype(jnp.int32),
        n_gang_total.astype(jnp.int32), n_sub_total.astype(jnp.int32),
    )


# donation invalidates the caller's input buffers — production builds
# (regenerating or streaming callers) opt in; tests and layout-reusing
# callers keep their arrays
_shear_stage_a = jax.jit(
    _shear_stage_a_impl, static_argnames=("n_keys", "assign")
)
_shear_stage_a_donated = jax.jit(
    _shear_stage_a_impl, static_argnames=("n_keys", "assign"),
    donate_argnums=(0,),
)


# ---------------------------------------------------------------------------
# Program B: sub-run schedule + chained DMA append + cleanup
# ---------------------------------------------------------------------------


def _append_kernel(sched_ref, src_ref, dst_ref, sem):
    """Chained HBM->HBM gang-slab appends (APPEND_MICRO 'chain' variant:
    1.3M sub-runs/s, 109 GB/s at this slab size). The schedule orders
    sub-runs by destination, so each slab's <= WG-gang overshoot lands in
    the next run's region and is overwritten by a later (chained) DMA;
    dead schedule slots copy to a dump slab past the data."""

    def copy(i, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(sched_ref[0, i, 0], _WG)],
            dst_ref.at[pl.ds(sched_ref[0, i, 1], _WG)],
            sem.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, _SLOTS)

        @pl.when(i > 0)
        def _():
            copy(i, jax.lax.rem(i + _SLOTS - 1, _SLOTS)).wait()

        copy(i, slot).start()
        return 0

    jax.lax.fori_loop(0, _RPB, body, 0)
    copy(_RPB - 1, (_RPB - 1) % _SLOTS).wait()


@lru_cache(maxsize=64)
def _cached_append(sub_cap: int, g_src: int, g_alloc: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(sub_cap // _RPB,),
        in_specs=[
            pl.BlockSpec((1, _RPB, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_SLOTS,))],
    )
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_alloc, 8, _GANG), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )


@partial(
    jax.jit,
    static_argnames=("sub_cap", "g_alloc", "interpret"),
    donate_argnums=(0,),
)
def _shear_append(
    gangs, src_gang, ngang, cum_ngang, cum_nsub,
    *, sub_cap: int, g_alloc: int, interpret: bool,
):
    """Sub-run schedule + the chained-DMA append. A separate program from
    the cleanup so the 4.3 GB gang source is dead (donated) before the
    cleanup's output channels allocate — as one program, the concurrent
    liveness of gangs + dest + outputs ran a 16 GB chip out of HBM at
    2^27."""
    NRUNS = ngang.shape[0]
    g_src = gangs.shape[0]

    # sub-run -> run expansion (monotone searchsorted over cum counts)
    j = jnp.arange(sub_cap, dtype=jnp.int32)
    run = jnp.searchsorted(cum_nsub, j, side="right").astype(jnp.int32)
    live_sub = run < NRUNS
    run_c = jnp.minimum(run, NRUNS - 1)
    within = j - jnp.where(run_c > 0, cum_nsub[run_c - 1], 0)
    dest_gang_start = cum_ngang - ngang
    src_j = src_gang[run_c] + within * _WG
    dst_j = dest_gang_start[run_c] + within * _WG
    # dead slots: copy gang 0 onto the dump slab past all data
    src_j = jnp.where(live_sub, src_j, 0)
    dst_j = jnp.where(live_sub, dst_j, g_alloc - _WG)
    # clamp against slack so a malformed schedule cannot DMA out of range
    src_j = jnp.clip(src_j, 0, g_src - _WG)
    dst_j = jnp.clip(dst_j, 0, g_alloc - _WG)
    sched = jnp.stack([src_j, dst_j], axis=1).reshape(sub_cap // _RPB, _RPB, 2)

    if interpret:
        return pl.pallas_call(
            _append_kernel,
            grid_spec=_interp_grid(sub_cap, g_alloc),
            out_shape=jax.ShapeDtypeStruct((g_alloc, 8, _GANG), jnp.float32),
            interpret=True,
        )(sched, gangs)
    return _cached_append(sub_cap, g_src, g_alloc)(sched, gangs)


@partial(
    jax.jit,
    static_argnames=(
        "n_fields", "need_perm", "n_valid", "level_key_bases",
    ),
    donate_argnums=(0,),
)
def _shear_cleanup(
    dest, head, ngang, cum_ngang, cnt,
    *, n_fields: int, need_perm: bool, n_valid: int, level_key_bases: tuple,
):
    """Metadata expansion + stray/pad zeroing + channel extraction."""
    NRUNS = ngang.shape[0]
    g_alloc = dest.shape[0]

    # ---- per-gang run metadata by cumsum-scatter (no per-gang search) ----
    n_gang_total = cum_ngang[-1]
    gs = cum_ngang - ngang
    live_run = cnt > 0
    dump = g_alloc  # scatter dump index (dropped)
    garr = jnp.arange(g_alloc, dtype=jnp.int32)

    # key_of_gang: scatter key deltas at run starts, cumsum over gangs.
    # Empty runs share gs with their successor; scatter-ADD collapses the
    # deltas correctly.
    key_r = jnp.arange(NRUNS, dtype=jnp.int32) // _C0
    delta = jnp.diff(key_r, prepend=jnp.int32(0))
    key_of_gang = jnp.zeros(g_alloc + 1, jnp.int32).at[gs].add(delta)[:-1]
    key_of_gang = jnp.cumsum(key_of_gang)

    # valid record span within each gang (head strays / tail pads)
    lo_of_gang = jnp.zeros(g_alloc + 1, jnp.int32).at[
        jnp.where(live_run, gs, dump)
    ].set(head)[:-1]
    hi_end = head + cnt - (ngang - 1) * _GANG
    hi_of_gang = jnp.where(garr < n_gang_total, _GANG, 0)
    hi_of_gang = jnp.asarray(hi_of_gang, jnp.int32).at[
        jnp.where(live_run, gs + jnp.maximum(ngang, 1) - 1, dump)
    ].set(jnp.where(live_run, hi_end, 0), mode="drop")[:g_alloc]

    # (level, tile) from compact key
    bases = jnp.asarray(level_key_bases, jnp.int32)  # (n_levels + 1,)
    level_of_gang = (
        jnp.searchsorted(bases[1:], key_of_gang, side="right")
    ).astype(jnp.int32)
    tile_of_gang = key_of_gang - bases[level_of_gang]

    lane = jnp.arange(_GANG, dtype=jnp.int32)
    valid = (lane[None, :] >= lo_of_gang[:, None]) & (
        lane[None, :] < hi_of_gang[:, None]
    )  # (g_alloc, 128)

    pad_h = jnp.float32(1e-6)
    u = jnp.where(valid, dest[:, 0, :], 0.0).reshape(-1)
    v = jnp.where(valid, dest[:, 1, :], 0.0).reshape(-1)
    h = jnp.where(valid, dest[:, 2, :], pad_h).reshape(-1)
    values = jnp.stack(
        [
            jnp.where(valid, dest[:, 3 + f, :], 0.0).reshape(-1)
            for f in range(n_fields)
        ],
        axis=0,
    )
    s_tile = jnp.broadcast_to(
        tile_of_gang[:, None], (g_alloc, _GANG)
    ).reshape(-1)
    if need_perm:
        perm = jax.lax.bitcast_convert_type(
            dest[:, 3 + n_fields, :], jnp.int32
        )
        # pad slots gather index n_valid: with_values zero-pads new values
        # beyond n_valid, so pads re-gather as 0
        perm = jnp.where(valid, perm, jnp.int32(n_valid)).reshape(-1)
    else:
        perm = None
    return s_tile, u, v, h, values, perm


def _interp_grid(sub_cap: int, g_alloc: int):
    """Interpret-mode grid spec (uncached: shapes vary in tests)."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(sub_cap // _RPB,),
        in_specs=[
            pl.BlockSpec((1, _RPB, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_SLOTS,))],
    )


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def shear_tile_sort(
    key_strided, u_loc, v_loc, h, values, *,
    level_stride: int, level_n_tiles: tuple, n_fields: int,
    need_perm: bool, n_valid: int, interpret: bool = False,
    raw_xy=None, assign=None, donate: bool = False,
):
    """Drop-in replacement for ``deposit_pallas._tile_sort_tail``.

    Parameters mirror the sort path: ``key_strided`` is the composite
    ``level * level_stride + tile`` key; ``level_n_tiles`` the per-level
    tile counts (0 for disabled levels), oversize implicit at the end.
    Alternatively pass ``raw_xy=(x, y)`` with a static ``assign`` callable
    producing the COMPACT key + tile-local coords in-program (and
    ``key_strided``/``u_loc``/``v_loc`` as None): the assignment then
    fuses into stage A and the raw inputs are donated — the memory-lean
    form for production-scale builds.

    Returns ``(s_tile, su, sv, sh, s_values, perm, counts)`` where counts
    (n_levels + 1,) INCLUDE the gang pad slots interleaved into each
    level segment (zero-value, rendered at no cost; the deposit's
    live-lane masking needs counts to cover the slots it must read).
    Host syncs TWO scalars (total gangs / sub-runs) to pick the static
    capacity buckets — the same sync round-trip the caller already pays
    for the level counts.
    """
    n_levels = len(level_n_tiles)
    bases = np.concatenate([[0], np.cumsum(level_n_tiles)]).astype(np.int64)
    n_keys = int(bases[-1]) + 1  # + oversize
    level_key_bases = tuple(int(b) for b in bases) + (n_keys,)

    if assign is not None:
        x, y = raw_xy
        ops = [x, y, h]
        n_payload = 3 + n_fields + int(need_perm)
    else:
        # strided -> compact key
        level = key_strided // level_stride
        compact = (
            jnp.asarray(bases, jnp.int32)[level] + key_strided
            - level * level_stride
        )
        ops = [compact, u_loc, v_loc, h]
        n_payload = len(ops) - 1 + n_fields + int(need_perm)
    ops += [values[f] for f in range(n_fields)]
    if need_perm:
        ops.append(jnp.arange(h.shape[0], dtype=jnp.int32))
    if n_payload > 8:
        raise ValueError(
            "shear layout carries at most 8 payload channels "
            f"(got {n_payload}); use the lax.sort layout"
        )

    import os as _os
    import time as _time

    profile = bool(_os.environ.get("ASTSPH_SHEAR_PROFILE"))
    t0 = _time.perf_counter() if profile else 0.0

    stage_a = _shear_stage_a_donated if donate else _shear_stage_a
    (gangs, src_gang, head, ngang, cum_ngang, cnt, cum_nsub,
     per_key_gangs, n_gang_total, n_sub_total) = stage_a(
        ops, n_keys=n_keys, assign=assign
    )
    if profile:
        jax.block_until_ready(gangs)
        t_a = _time.perf_counter()

    # host sync (piggybacks the caller's counts sync): static buckets
    per_key_g, n_gang_h, n_sub_h = jax.device_get(
        (per_key_gangs, n_gang_total, n_sub_total)
    )
    n_gang_h = int(n_gang_h)
    sub_cap = max(_next_pow2(int(n_sub_h)), _RPB)

    # exact slack for the level dynamic-slice contract: every level's
    # [lo, lo + max(CHUNK, next_pow2(c))) slice must stay in bounds
    lvl_gangs = np.zeros(n_levels + 1, np.int64)
    for li in range(n_levels):
        lvl_gangs[li] = per_key_g[int(bases[li]) : int(bases[li + 1])].sum()
    lvl_gangs[n_levels] = per_key_g[int(bases[-1])]
    from .deposit_pallas import _level_bucket

    lvl_lo = np.concatenate([[0], np.cumsum(lvl_gangs)[:-1]]) * _GANG
    need_slots = n_gang_h * _GANG
    for li in range(n_levels + 1):
        c = int(lvl_gangs[li]) * _GANG
        if c:
            need_slots = max(need_slots, int(lvl_lo[li]) + _level_bucket(c))
    g_alloc = -(-need_slots // _GANG) + _WG + 1  # + DMA dump slab

    if profile:
        t_sync = _time.perf_counter()
    dest = _shear_append(
        gangs, src_gang, ngang, cum_ngang, cum_nsub,
        sub_cap=sub_cap, g_alloc=g_alloc, interpret=interpret,
    )
    if profile:
        jax.block_until_ready(dest)
        t_app = _time.perf_counter()
    s_tile, su, sv, sh, s_values, perm = _shear_cleanup(
        dest, head, ngang, cum_ngang, cnt,
        n_fields=n_fields, need_perm=need_perm, n_valid=n_valid,
        level_key_bases=level_key_bases,
    )
    if profile:
        jax.block_until_ready(su)
        import json as _json

        print("SHEAR_PROFILE " + _json.dumps({
            "stage_a_s": round(t_a - t0, 4),
            "host_sync_s": round(t_sync - t_a, 4),
            "append_s": round(t_app - t_sync, 4),
            "cleanup_s": round(_time.perf_counter() - t_app, 4),
            "n_gang": int(n_gang_h), "n_sub": int(n_sub_h),
            "sub_cap": sub_cap, "g_alloc": g_alloc,
        }), flush=True)

    # per-level slot counts (pads included)
    counts = jnp.asarray(lvl_gangs * _GANG, jnp.int32)
    return s_tile, su, sv, sh, s_values, perm, counts


# ---------------------------------------------------------------------------
# Coarse spatial bucketing -> coherent engine (the production random path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_fields",), donate_argnums=(0,))
def _coarse_cleanup(dest, head, ngang, cum_ngang, cnt, *, n_fields: int):
    """Zero the stray/pad slots and unpack raw (x, y, h, fields)."""
    NRUNS = ngang.shape[0]
    g_alloc = dest.shape[0]
    n_gang_total = cum_ngang[-1]
    gs = cum_ngang - ngang
    live_run = cnt > 0
    dump = g_alloc
    garr = jnp.arange(g_alloc, dtype=jnp.int32)
    lo_of_gang = jnp.zeros(g_alloc + 1, jnp.int32).at[
        jnp.where(live_run, gs, dump)
    ].set(head)[:-1]
    hi_end = head + cnt - (ngang - 1) * _GANG
    hi_of_gang = jnp.where(garr < n_gang_total, _GANG, 0)
    hi_of_gang = jnp.asarray(hi_of_gang, jnp.int32).at[
        jnp.where(live_run, gs + jnp.maximum(ngang, 1) - 1, dump)
    ].set(jnp.where(live_run, hi_end, 0), mode="drop")[:g_alloc]
    lane = jnp.arange(_GANG, dtype=jnp.int32)
    valid = (lane[None, :] >= lo_of_gang[:, None]) & (
        lane[None, :] < hi_of_gang[:, None]
    )
    pad_h = jnp.float32(1e-6)
    x = jnp.where(valid, dest[:, 0, :], 0.0).reshape(-1)
    y = jnp.where(valid, dest[:, 1, :], 0.0).reshape(-1)
    h = jnp.where(valid, dest[:, 2, :], pad_h).reshape(-1)
    fields = jnp.stack(
        [
            jnp.where(valid, dest[:, 3 + f, :], 0.0).reshape(-1)
            for f in range(n_fields)
        ],
        axis=0,
    )
    return x, y, h, fields


@lru_cache(maxsize=64)
def _cached_coarse_assign(extent, periodic, n_cx, n_cy):
    """Stable (cached) assign callable: a fresh closure per call would
    miss the stage-A jit cache on every build."""
    x0, x1, y0, y1 = extent

    def assign(xx, yy, hh):
        u = (xx - x0) / (x1 - x0) * n_cx
        v = (yy - y0) / (y1 - y0) * n_cy
        if periodic:
            u = jnp.mod(u, n_cx)
            v = jnp.mod(v, n_cy)
        ci = jnp.clip(u.astype(jnp.int32), 0, n_cx - 1)
        cj = jnp.clip(v.astype(jnp.int32), 0, n_cy - 1)
        # the key ORDER is the output stream order: row-major cells keep
        # the stream spatially coherent for the coherent engine
        return cj * n_cx + ci, xx, yy

    return assign


def shear_coarse_group(
    x, y, h, values, spec, *,
    n_cy: int = 128, n_cx: int = 2, donate: bool = False,
    interpret: bool = False,
):
    """Group shuffled particles into coarse spatial cells (the shear
    machinery with a ~256-key space), returning RAW (x, y, h, fields)
    plus interleaved zero-value pad slots.

    The fine (level, tile) shear measured 366K runs / +34.5 % pad slots
    at 2^27 on a 1024^2 map — fragmentation that ate the sort savings.
    With a 128x2-cell key (each cell one K=8 tile-row tall) the bands
    stay ~15 keys wide: ~30K runs, ~3 % pads, and the output stream is
    coherent enough for :func:`..deposit_coherent.deposit_2d_coherent`'s
    in-place row machinery (<= ~6 distinct level-0 tiles per 2048-row)
    to do the fine grouping for free — its row sort replaces this
    module's fine pass entirely.
    """
    values, _ = _as_fields(values)
    n_fields = values.shape[0]
    if 3 + n_fields > 8:
        raise ValueError("coarse grouping carries at most 5 fields")
    assign = _cached_coarse_assign(
        tuple(float(e) for e in spec.extent), bool(spec.periodic_wrap),
        n_cx, n_cy,
    )
    n_keys = n_cy * n_cx
    n = int(h.shape[0])
    pad = (-n) % _C0
    if pad:
        # inert pad particles: extent origin, tiny h, zero payload — the
        # coherent engine deposits them at zero weight
        x0f, _, y0f, _ = (float(e) for e in spec.extent)
        x = jnp.pad(x, (0, pad), constant_values=x0f)
        y = jnp.pad(y, (0, pad), constant_values=y0f)
        h = jnp.pad(h, (0, pad), constant_values=1e-6)
        values = jnp.pad(values, ((0, 0), (0, pad)))
    ops = [x, y, h] + [values[f] for f in range(n_fields)]
    stage_a = _shear_stage_a_donated if donate else _shear_stage_a
    (gangs, src_gang, head, ngang, cum_ngang, cnt, cum_nsub,
     per_key_gangs, n_gang_total, n_sub_total) = stage_a(
        ops, n_keys=n_keys, assign=assign
    )
    n_gang_h, n_sub_h = (int(v) for v in jax.device_get(
        (n_gang_total, n_sub_total)
    ))
    sub_cap = max(_next_pow2(n_sub_h), _RPB)
    g_alloc = n_gang_h + _WG + 1
    dest = _shear_append(
        gangs, src_gang, ngang, cum_ngang, cum_nsub,
        sub_cap=sub_cap, g_alloc=g_alloc, interpret=interpret,
    )
    return _coarse_cleanup(
        dest, head, ngang, cum_ngang, cnt, n_fields=n_fields
    )


def deposit_2d_bucketed(
    x, y, h, values, spec, *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    interpret=None,
    projection: str = "kernel3d",
    donate: bool = False,
):
    """Random-order production render: coarse shear bucketing + the
    coherent engine.

    Exact for any input order (the coherent engine is order-agnostic;
    bucketing only restores the locality its whole-row schedule exploits).
    Pad slots ride as zero-value sub-pixel particles (~3 %). Returns
    (ny, nx) or (F, ny, nx) like :func:`..deposit_coherent.deposit_2d_coherent`.
    """
    from .deposit_coherent import deposit_2d_coherent

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    values, single = _as_fields(values)
    gx, gy, gh, gv = shear_coarse_group(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(h, jnp.float32), values, spec,
        donate=donate, interpret=interpret,
    )
    total = deposit_2d_coherent(
        gx, gy, gh, gv, spec, kernel=kernel, precision=precision,
        interpret=interpret, projection=projection,
    )
    return total[0] if single else total


def _as_fields(values):
    values = jnp.asarray(values, jnp.float32)
    if values.ndim == 1:
        return values[None, :], True
    return values, False
