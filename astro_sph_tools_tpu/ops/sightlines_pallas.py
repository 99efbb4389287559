"""Fused Pallas sightline engine — config 4's production inner loop.

Same semantics as :func:`ops.sightlines.column_integrate` /
``column_integrate_binned`` (per-ray column totals ``sum_i q_i * Y(b_i, h_i)``
with the line-integrated kernel, or the reference's 3D-kernel-at-projected-
radius convention, `tools/projections/_pixel_calculations.pyx:31-34`), rebuilt
on the flat work-list architecture of :mod:`ops.deposit_pallas`:

1. **Level/cell partition** (device): each particle is assigned a footprint
   level (support halving per level) and a cell under that level's grid
   (cell >= the level's max support, so a ray's candidates live in its own +
   1-ring cell rows); ONE ``lax.sort`` on the composite (level, cell) key
   leaves every level's cell-rows contiguous. Channels are packed once into
   (rows, 8, C) chunk blocks over the whole sorted array — per-level ranges
   need no alignment because the pass masks each step to its [lo, hi) span.
2. **Ray blocks**: rays are cell-sorted per level and processed in SMALL
   blocks (``B = 8``); each block's candidate spans are the x-windowed
   1-ring of its rays' cells — per wrapped row, the cell range
   [cx_min - 1, cx_max + 1] plus an x-wrap span — read from the per-cell
   boundary table. Small blocks with cell-granular windows are the
   performance story: wide row-span blocks scanned ~50x more particles
   than their rays could touch (0.6% of pair evaluations were inside
   kernel support at the config-4 shape).
3. **One Pallas pass** over a flat work-list covering ALL levels: one grid
   step per (ray-block span unit, particle chunk); the schedule rides scalar
   prefetch (empty units compacted so the tables fit SMEM), the chunk DMA is
   pipelined, and each block's (B, 128) accumulator stays VMEM-resident
   across its consecutive steps. Per step the kernel evaluates the (B rays x
   C particles) impact-parameter block on the VPU and reduces each field
   with an exact f32 lane reduction.

This replaces the ``lax.scan`` x ``fori_loop`` + ``dynamic_slice`` binned
engine whose thousands of serialized, DMA-latency-bound steps took ~74 s at
the BASELINE config-4 scale (1e4 rays x 1e7 particles). A single fused
program also matters on cold start: per-process program preparation is
expensive through the TPU tunnel, so 2 programs (prep + pass) beat the 13
the per-level formulation needed.

The line-integral shape y(u) is evaluated gather-free with a single
high-degree Chebyshev series in t = u^2 via the Clenshaw recurrence
(see :func:`kernels.splines.integrated_kernel_chebyshev`), max fit error
<=2.3e-6 of peak across kernels — inside the 1e-5 budget.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.splines import (
    clenshaw,
    get_kernel,
    integrated_kernel_chebyshev,
)

Array = jax.Array

_C = 1024  # particles per grid step
# Rays per block: the sublane dimension of the pair block. SMALL blocks are
# the whole performance story: a block's candidate span is the x-windowed
# 1-ring of its rays' cells, so at B = 128 (round-2 first cut) a block of
# cell-sorted rays covered ~2 full cell rows and scanned ~50x more particles
# than its rays could touch (measured 0.6% of pair evaluations valid at the
# config-4 shape). B = 8 keeps the accumulator at the (8, 128) f32 native
# tile while shrinking each block's window to a few cells.
_B = 8
_U = 10  # schedule units per ray block: 5 wrapped rows x (main + x-wrap)
_UNIT_MASK = (1 << 24) - 1
_WORK_BIT = 24
_ZERO_BIT = 25
_LEVEL_STRIDE = 1 << 25  # composite key: level * STRIDE + cell id
_MAX_LEVELS = 6
_MAX_GRID = 4096
_MAX_CELLS = 1 << 20  # per-level cell cap (bounds table stays searchable)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _choose_grids(Lx: float, Ly: float, s_max: float) -> tuple[tuple[int, int], ...]:
    """Per-level (ncx, ncy): power-of-two grids whose cells are >= the
    level's max support ``s_max / 2^level`` (so 1-ring coverage holds);
    power-of-two sizes keep compiled programs reusable across datasets."""
    grids = []
    for l in range(_MAX_LEVELS):
        cell = max(s_max, 1e-30) / (1 << l)
        ncx = min(_MAX_GRID, max(1, 1 << int(np.floor(np.log2(max(Lx / cell, 1.0))))))
        ncy = min(_MAX_GRID, max(1, 1 << int(np.floor(np.log2(max(Ly / cell, 1.0))))))
        # keep the per-cell bounds table (ncx*ncy + 1 entries) tractable;
        # coarser-than-support cells only widen candidate windows (still
        # correct, 1-ring coverage is preserved)
        while ncx * ncy > _MAX_CELLS:
            if ncx >= ncy:
                ncx //= 2
            else:
                ncy //= 2
        grids.append((ncx, ncy))
    return tuple(grids)


# ---------------------------------------------------------------------------
# Device prep: composite (level, cell) sort + channel pack + row tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=128)
def _cached_prep(grids, n_fields: int, support_factor: float, periodic: bool):
    """Jitted: assign (level, cell), one composite sort, pack channels, and
    emit every level's PER-CELL boundary table in one searchsorted (the
    x-windowed schedule needs cell granularity, not just row starts).

    ``extent`` rides as a traced (4,) array [x0, y0, Lx, Ly] so differing
    boxes reuse the compiled program.
    """
    n_levels = len(grids)
    # static boundary key offsets: level l contributes ncx_l*ncy_l + 1
    # entries (bounds of every cell, cell c's range = [keys[c], keys[c+1]))
    bound_keys = np.concatenate(
        [
            l * _LEVEL_STRIDE + np.arange(g[0] * g[1] + 1, dtype=np.int64)
            for l, g in enumerate(grids)
        ]
    ).astype(np.int32)

    @jax.jit
    def run(x, y, h, values, extent):
        x0, y0, Lx, Ly = extent[0], extent[1], extent[2], extent[3]
        if periodic:
            x = x - jnp.floor(x / Lx) * Lx + x0
            y = y - jnp.floor(y / Ly) * Ly + y0
        s = support_factor * h
        # finest level whose cells (both axes) still cover the support
        level = jnp.zeros(x.shape, jnp.int32)
        for l in range(1, n_levels):
            ncx, ncy = grids[l]
            # 0.999: a hair of slack so f32 cell assignment (vs the rays'
            # f64 host cells) cannot break 1-ring coverage at s == cell
            cellmin = 0.999 * jnp.minimum(Lx / ncx, Ly / ncy)
            level = jnp.where(s <= cellmin, jnp.int32(l), level)
        cid = jnp.zeros(x.shape, jnp.int32)
        for l in range(n_levels):
            ncx, ncy = grids[l]
            cx = jnp.clip(((x - x0) * (ncx / Lx)).astype(jnp.int32), 0, ncx - 1)
            cy = jnp.clip(((y - y0) * (ncy / Ly)).astype(jnp.int32), 0, ncy - 1)
            cid = jnp.where(level == l, cy * ncx + cx, cid)
        key = level * _LEVEL_STRIDE + cid
        # grouping only needs key order (is_stable=False: 28% faster on v5e)
        sorted_ops = jax.lax.sort(
            [key, x, y, h] + [values[:, f] for f in range(n_fields)],
            num_keys=1, is_stable=False,
        )
        bounds = jnp.searchsorted(sorted_ops[0], jnp.asarray(bound_keys)).astype(
            jnp.int32
        )
        n_rows = x.shape[0] // _C
        channels = [a.reshape(n_rows, _C) for a in sorted_ops[1:]]
        channels += [jnp.zeros((n_rows, _C), jnp.float32)] * (8 - len(channels))
        packed = jnp.stack(channels, axis=1)  # (n_rows, 8, C)
        return packed, bounds

    return run


# ---------------------------------------------------------------------------
# Host schedule: flat work-list over (ray-block span, particle chunk)
# ---------------------------------------------------------------------------


def _level_schedule(r_rows, r_cols, cells, ncx: int, ncy: int, periodic: bool,
                    B: int = _B):
    """Per-unit (lo, hi) sorted-particle spans for one level's ray blocks:
    ``_U`` units per block.

    A block of ``_B`` cell-sorted rays covers rows [r0-1, r1+1] and the x
    window [cx_min-1, cx_max+1]. Narrow blocks (<= 3 raw rows, the common
    case) emit per-row X-WINDOWED spans — up to 5 wrapped rows x (main +
    x-wrap) — which is what makes small ray blocks pay: the window is a few
    cells, not the full row. Wide blocks (coarse grids where >B rays share a
    row is false) fall back to one contiguous full-row span + y-wrap rows.

    ``cells`` is the level's per-cell boundary table (ncx*ncy + 1,).
    """
    nb = r_rows.shape[0] // B
    rr = r_rows.reshape(nb, B).astype(np.int64)
    rc = r_cols.reshape(nb, B).astype(np.int64)
    r0, r1 = rr[:, 0], rr[:, -1]  # rows are non-decreasing within a block
    cxlo = rc.min(axis=1) - 1
    cxhi = rc.max(axis=1) + 1
    full_x = (cxhi - cxlo + 1) >= ncx
    narrow = (r1 - r0) <= 2

    cells = cells.astype(np.int64)
    row_start = cells[np.arange(ncy, dtype=np.int64) * ncx]
    row_end = cells[(np.arange(ncy, dtype=np.int64) + 1) * ncx]

    lo = np.zeros((nb, _U), np.int64)
    hi = np.zeros((nb, _U), np.int64)

    # --- narrow blocks: per-row x-windowed spans ---------------------------
    a = np.where(full_x, 0, np.maximum(cxlo, 0))
    b = np.where(full_x, ncx - 1, np.minimum(cxhi, ncx - 1))
    # x-wrap window (periodic, not full width; an interval can only stick
    # out on ONE side without covering the whole row)
    wa = np.where(cxlo < 0, ncx + cxlo, 0)
    wb = np.where(cxlo < 0, ncx - 1, cxhi - ncx)
    x_wrap = (~full_x) & ((cxlo < 0) | (cxhi > ncx - 1)) if periodic else np.zeros(nb, bool)
    n_raw = r1 - r0 + 3  # raw 1-ring row count (distinct before wrapping)
    for i in range(5):
        rr_i = r0 - 1 + i
        if periodic:
            # first min(n_raw, ncy) consecutive rows stay distinct mod ncy
            act = narrow & (i < np.minimum(n_raw, ncy))
            wr = np.mod(rr_i, ncy)
        else:
            act = narrow & (i < n_raw) & (rr_i >= 0) & (rr_i < ncy)
            wr = np.clip(rr_i, 0, ncy - 1)
        base = wr * ncx
        mlo = cells[base + a]
        mhi = cells[base + b + 1]
        lo[:, 2 * i] = np.where(act, mlo, 0)
        hi[:, 2 * i] = np.where(act, np.maximum(mhi, mlo), 0)
        if periodic:
            wlo = cells[base + np.clip(wa, 0, ncx - 1)]
            whi = cells[base + np.clip(wb, -1, ncx - 1) + 1]
            actw = act & x_wrap
            lo[:, 2 * i + 1] = np.where(actw, wlo, 0)
            hi[:, 2 * i + 1] = np.where(actw, np.maximum(whi, wlo), 0)

    # --- wide blocks: contiguous full-row span + y wraps -------------------
    wide = ~narrow
    if wide.any():
        loA = row_start[np.maximum(r0 - 1, 0)]
        hiA = row_end[np.minimum(r1 + 1, ncy - 1)]
        lo[wide, 0] = loA[wide]
        hi[wide, 0] = np.maximum(hiA, loA)[wide]
        if periodic:
            top = wide & (r0 == 0) & (r1 + 1 < ncy - 1)
            bot = wide & (r1 == ncy - 1) & (r0 - 1 > 0)
            lo[top, 1] = row_start[ncy - 1]
            hi[top, 1] = max(row_end[ncy - 1], row_start[ncy - 1])
            lo[bot, 2] = row_start[0]
            hi[bot, 2] = max(row_end[0], row_start[0])
        lo[wide, 3:] = 0
        hi[wide, 3:] = 0

    return lo.ravel(), hi.ravel()


def _compact_units(lo, hi, block0: int):
    """Drop empty units so the SMEM unit tables stay small (the fixed
    ``_U``-per-block layout at config-4 scale overflowed the 1 MB SMEM
    budget). Each block's unit 0 survives even when empty — it anchors the
    accumulator zeroing step. Returns (lo, hi, block id) per kept unit."""
    nb = lo.shape[0] // _U
    keep = (hi > lo).reshape(nb, _U)
    keep[:, 0] = True
    blk = block0 + np.repeat(np.arange(nb, dtype=np.int64), _U)
    m = keep.ravel()
    return lo[m], hi[m], blk[m]


def _build_schedule(unit_lo, unit_hi, unit_blk):
    """Pack the flat work-list: one int32 word per step
    (unit | work<<24 | zero<<25). Every block's first unit gets at least one
    step so its accumulator is always zeroed."""
    lo = unit_lo
    hi = unit_hi
    c0 = lo // _C
    nch = np.where(hi > lo, (hi + _C - 1) // _C - c0, 0)
    first = np.ones(lo.shape[0], bool)
    first[1:] = unit_blk[1:] != unit_blk[:-1]
    nch1 = np.where(first, np.maximum(nch, 1), nch)
    off = np.concatenate([[0], np.cumsum(nch1)])
    n_steps = int(off[-1])
    unit = np.repeat(np.arange(nch1.shape[0], dtype=np.int64), nch1)
    j_in = np.arange(n_steps, dtype=np.int64) - off[unit]
    work = (j_in < nch[unit]).astype(np.int64)
    zero = ((j_in == 0) & first[unit]).astype(np.int64)
    sched = unit | (work << _WORK_BIT) | (zero << _ZERO_BIT)
    n_pad = _next_pow2(max(n_steps, 1))
    sched = np.pad(sched, (0, n_pad - n_steps), constant_values=int(unit[-1]))
    return sched.astype(np.int32), off[:-1].astype(np.int32), n_pad


# ---------------------------------------------------------------------------
# The Pallas pass
# ---------------------------------------------------------------------------


# schedule-word capacity: the unit index rides bits [0, _WORK_BIT); larger
# ray sets are processed in batches at the public entry points
_MAX_UNITS = 1 << _WORK_BIT
_RAY_BATCH = 1 << 20  # per-batch ray cap (worst case ~7.9M units < 2^24)


def _stage_ray_levels(rays, grids, bounds, x0, y0, Lx, Ly, periodic, B, n_rays):
    """Per populated level: cell-sort the rays and build the compacted
    x-windowed unit spans (shared by the columns and spectra engines).

    Returns (rorders, rx_blocks, ry_blocks, unit_lo, unit_hi, unit_blk, nb)
    with rorders the per-level ray sort orders, the ray blocks stacked over
    levels, and the unit tables concatenated in schedule order; rorders is
    empty when no level holds particles.
    """
    nb = max(1, (n_rays + B - 1) // B)
    if n_rays == 0:
        return [], None, None, None, None, None, nb
    r_pad = nb * B
    rorders = []
    rx_parts, ry_parts, lo_parts, hi_parts, blk_parts = [], [], [], [], []
    boff = 0
    for l in range(_MAX_LEVELS):
        ncx, ncy = grids[l]
        cells = bounds[boff : boff + ncx * ncy + 1]
        boff += ncx * ncy + 1
        if int(cells[-1] - cells[0]) == 0:
            continue
        rcx = np.clip(((rays[0] - x0) * (ncx / Lx)).astype(np.int64), 0, ncx - 1)
        rcy = np.clip(((rays[1] - y0) * (ncy / Ly)).astype(np.int64), 0, ncy - 1)
        rorder = np.argsort(rcy * ncx + rcx, kind="stable")
        rx_s = np.full(r_pad, rays[0][rorder[-1]], np.float32)
        ry_s = np.full(r_pad, rays[1][rorder[-1]], np.float32)
        rx_s[:n_rays] = rays[0][rorder]
        ry_s[:n_rays] = rays[1][rorder]
        r_rows = np.full(r_pad, rcy[rorder[-1]], np.int64)
        r_rows[:n_rays] = rcy[rorder]
        r_cols = np.full(r_pad, rcx[rorder[-1]], np.int64)
        r_cols[:n_rays] = rcx[rorder]
        lo, hi = _level_schedule(
            r_rows, r_cols, cells.astype(np.int64), ncx, ncy, periodic, B=B
        )
        lo, hi, blk = _compact_units(lo, hi, len(rorders) * nb)
        rorders.append(rorder)
        rx_parts.append(rx_s.reshape(nb, B))
        ry_parts.append(ry_s.reshape(nb, B))
        lo_parts.append(lo)
        hi_parts.append(hi)
        blk_parts.append(blk)
    if not rorders:
        return [], None, None, None, None, None, nb
    unit_lo = np.concatenate(lo_parts)
    unit_hi = np.concatenate(hi_parts)
    unit_blk = np.concatenate(blk_parts)
    if unit_lo.shape[0] >= _MAX_UNITS:  # pragma: no cover - capacity guard
        raise ValueError(
            f"{unit_lo.shape[0]} schedule units exceed the {_MAX_UNITS} "
            "unit-index capacity; batch the rays (the public entry points "
            f"do this automatically at {_RAY_BATCH} rays per pass)"
        )
    return (
        rorders,
        np.concatenate(rx_parts),
        np.concatenate(ry_parts),
        unit_lo,
        unit_hi,
        unit_blk,
        nb,
    )


def _columns_kernel(
    sched_ref, ub_ref, ulo_ref, uhi_ref, uoff_ref,  # scalar prefetch
    rays_ref,  # (1, 2, B, 128): [0] = ray x (lane-broadcast), [1] = ray y
    chunk_ref,  # (1, 8, C): channels [x, y, h, v0..v4]
    acc_ref,  # (1, B, 128): per-block accumulator, lane f = field f
    *,
    n_fields: int,
    kernel_name: str,
    projection: str,
    cheb: tuple[float, ...],
    periodic: bool,
    Lx: float,
    Ly: float,
):
    s = pl.program_id(0)
    w0 = sched_ref[s]
    u = w0 & _UNIT_MASK

    @pl.when(((w0 >> _ZERO_BIT) & 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(((w0 >> _WORK_BIT) & 1) == 1)
    def _work():
        kernel = get_kernel(kernel_name)
        S = kernel.support_factor
        data = chunk_ref[0]  # (8, C)
        xs = data[0:1, :]
        ys = data[1:2, :]
        hs = data[2:3, :]
        rblk = rays_ref[0]  # (2, B, 128)
        rx = rblk[0, :, 0:1]  # (B, 1)
        ry = rblk[1, :, 0:1]
        dx = rx - xs  # (B, C)
        dy = ry - ys
        if periodic:
            dx = dx - jnp.round(dx * (1.0 / Lx)) * Lx
            dy = dy - jnp.round(dy * (1.0 / Ly)) * Ly
        b2 = dx * dx + dy * dy

        base = (ulo_ref[u] // _C + (s - uoff_ref[u])) * _C
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        gidx = base + lane
        live = (gidx >= ulo_ref[u]) & (gidx < uhi_ref[u])  # (1, C)

        # hoist 1/h and the normalisation to (1, C) per-particle factors;
        # the (B, C) pair block stays divide-free (see deposit_pallas).
        # The support-and-live mask wraps the MULTIPLY: padding particles
        # carry h = 1e-20 whose inv_h^2/inv_h^3 overflow to inf, and an
        # unmasked 0 * inf would leak NaN into the lane reduction.
        inv_h = jnp.where(hs > 0.0, 1.0 / hs, 0.0)
        if projection == "integrated":
            inv_sh = inv_h * (1.0 / S)
            tq = b2 * (inv_sh * inv_sh)
            y = clenshaw(2.0 * jnp.clip(tq, 0.0, 1.0) - 1.0, cheb)
            w = jnp.where((tq < 1.0) & live, y * (inv_h * inv_h), 0.0)
        else:
            qn = jnp.sqrt(b2) * inv_h
            fac = (kernel.norm_3d * inv_h) * (inv_h * inv_h)
            w = jnp.where((qn < S) & live, kernel.shape_q(qn) * fac, 0.0)

        for f in range(n_fields):
            red = jnp.sum(w * data[3 + f : 4 + f, :], axis=1, keepdims=True)
            acc_ref[0, :, f : f + 1] += red


@lru_cache(maxsize=256)
def _cached_engine(
    n_blocks: int,
    n_steps: int,
    n_rows: int,
    n_fields: int,
    kernel_name: str,
    projection: str,
    periodic: bool,
    Lx: float,
    Ly: float,
    n_pop: int,
    nb: int,
    n_rays: int,
    interpret: bool,
):
    """One jitted program: ray-block broadcast + the fused Pallas pass over
    every level's work list + the device-side per-level unsort-and-sum (a
    host unsort would force a sync per call and serialize sharded loops)."""
    cheb = (
        integrated_kernel_chebyshev(kernel_name)
        if projection == "integrated"
        else ()
    )

    def chunk_idx(s, sched, ub, ulo, uhi, uoff):
        u = sched[s] & _UNIT_MASK
        # block index MUST be clamped: blocks are DMA'd even for skipped
        # steps, and an out-of-range read crashes the device
        row = ulo[u] // _C + (s - uoff[u])
        return (jnp.clip(row, 0, n_rows - 1), 0, 0)

    def rays_idx(s, sched, ub, ulo, uhi, uoff):
        return (ub[sched[s] & _UNIT_MASK], 0, 0, 0)

    def acc_idx(s, sched, ub, ulo, uhi, uoff):
        return (ub[sched[s] & _UNIT_MASK], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 2, _B, 128), rays_idx),
            pl.BlockSpec((1, 8, _C), chunk_idx),
        ],
        out_specs=pl.BlockSpec((1, _B, 128), acc_idx),
    )
    kern = partial(
        _columns_kernel,
        n_fields=n_fields,
        kernel_name=kernel_name,
        projection=projection,
        cheb=cheb,
        periodic=periodic,
        Lx=Lx,
        Ly=Ly,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, _B, 128), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def run(sched, ub, ulo, uhi, uoff, rx, ry, packed, inv_orders):
        # rx, ry: (n_blocks, B) -> lane-broadcast ray blocks on device
        rays = jnp.stack([rx, ry], axis=1)[..., None]  # (n_blocks, 2, B, 1)
        rays = jnp.broadcast_to(rays, (n_blocks, 2, _B, 128))
        out = call(sched, ub, ulo, uhi, uoff, rays, packed)
        out = out[:, :, :n_fields].reshape(n_pop, nb * _B, n_fields)
        totals = jnp.zeros((n_rays, n_fields), jnp.float32)
        for i in range(n_pop):
            totals = totals + jnp.take(out[i], inv_orders[i], axis=0)
        return totals.T  # (F, n_rays)

    return run


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def column_integrate_pallas(
    x, y, h, values, ray_x, ray_y,
    *,
    kernel: str = "cubic_spline",
    projection: str = "integrated",
    periodic_box: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Per-ray column totals at BASELINE config-4 scale (fused Pallas pass).

    Matches :func:`ops.sightlines.column_integrate`; ``values`` (N,) or
    (N, F) with F <= 5; returns (R,) or (F, R).
    """
    n_rays_in = np.asarray(ray_x).shape[0]
    if n_rays_in == 0:
        # read ndim/shape as metadata — np.asarray on a device array here
        # would force a full device-to-host copy just for this edge path
        v = values if hasattr(values, "ndim") else np.asarray(values)
        zero = jnp.zeros((0,) if v.ndim == 1 else (v.shape[1], 0), jnp.float32)
        return zero
    if n_rays_in > _RAY_BATCH:
        # schedule unit indices ride 24 bits; huge ray sets batch cleanly
        # (columns are independent per ray)
        parts = [
            column_integrate_pallas(
                x, y, h, values,
                np.asarray(ray_x)[i : i + _RAY_BATCH],
                np.asarray(ray_y)[i : i + _RAY_BATCH],
                kernel=kernel, projection=projection,
                periodic_box=periodic_box, interpret=interpret,
            )
            for i in range(0, n_rays_in, _RAY_BATCH)
        ]
        return jnp.concatenate(parts, axis=-1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # device-resident fast path: jax-array particle inputs stay on device
    # (no host bounce; only scalars and the small bounds table sync) — this
    # is what streamed / sharded pipelines call with
    on_device = isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer)
    xp = jnp if on_device else np
    x = xp.asarray(x, xp.float32)
    y = xp.asarray(y, xp.float32)
    h_np = xp.asarray(h, xp.float32)
    values = xp.asarray(values, xp.float32)
    single = values.ndim == 1
    if single:
        values = values[:, None]
    if values.shape[1] > 5:
        raise ValueError("pallas sightlines support at most 5 fields per pass")
    n_fields = values.shape[1]
    kspec = get_kernel(kernel)

    n_rays = np.asarray(ray_x).shape[0]
    rays = np.stack([np.asarray(ray_x, np.float64), np.asarray(ray_y, np.float64)])

    s_max = kspec.support_factor * float(h_np.max()) if h_np.size else 1.0
    if periodic_box is not None:
        x0 = y0 = 0.0
        Lx = Ly = float(periodic_box)
        rays = np.mod(rays, Lx)
    else:
        pad = s_max if h_np.size else 1.0
        x0 = min(float(x.min()) if x.size else 0.0, rays[0].min()) - pad
        y0 = min(float(y.min()) if y.size else 0.0, rays[1].min()) - pad
        Lx = max(float(x.max()) if x.size else 1.0, rays[0].max()) + pad - x0
        Ly = max(float(y.max()) if y.size else 1.0, rays[1].max()) + pad - y0
    grids = _choose_grids(Lx, Ly, s_max)

    # pow2-pad particles (pads park at the domain origin with tiny h -> the
    # finest level's first cell, zero-valued)
    n = x.shape[0]
    n_bucket = max(_C, _next_pow2(n))
    if n_bucket != n:
        padn = n_bucket - n
        x = xp.pad(x, (0, padn), constant_values=x0)
        y = xp.pad(y, (0, padn), constant_values=y0)
        h_np = xp.pad(h_np, (0, padn), constant_values=1e-20)
        values = xp.pad(values, ((0, padn), (0, 0)))

    extent = jnp.asarray([x0, y0, Lx, Ly], jnp.float32)
    packed, bounds = _cached_prep(
        grids, n_fields, kspec.support_factor, periodic_box is not None
    )(jnp.asarray(x), jnp.asarray(y), jnp.asarray(h_np), jnp.asarray(values), extent)
    bounds = np.asarray(bounds)

    # per-level cell tables -> ray sort -> compacted unit spans; all levels
    # share one schedule / one Pallas launch; results unsort on device
    rorders, rx_blocks, ry_blocks, unit_lo, unit_hi, unit_blk, nb = (
        _stage_ray_levels(
            rays, grids, bounds, x0, y0, Lx, Ly,
            periodic_box is not None, _B, n_rays,
        )
    )
    if not rorders:
        zero = jnp.zeros((n_fields, n_rays), jnp.float32)
        return zero[0] if single else zero
    sched, uoff, n_steps = _build_schedule(unit_lo, unit_hi, unit_blk)
    n_pop = len(rorders)
    r_pad = nb * _B
    inv_orders = np.zeros((n_pop, max(n_rays, 1)), np.int32)
    for i, rorder in enumerate(rorders):
        inv = np.empty(n_rays, np.int64)
        inv[rorder] = np.arange(n_rays)
        inv_orders[i, :n_rays] = inv
    result = _cached_engine(
        n_pop * nb, n_steps, n_bucket // _C, n_fields, kernel, projection,
        periodic_box is not None, Lx, Ly, n_pop, nb, n_rays, interpret,
    )(
        jnp.asarray(sched), jnp.asarray(unit_blk.astype(np.int32)),
        jnp.asarray(unit_lo.astype(np.int32)),
        jnp.asarray(unit_hi.astype(np.int32)), jnp.asarray(uoff),
        jnp.asarray(rx_blocks), jnp.asarray(ry_blocks),
        packed, jnp.asarray(inv_orders),
    )
    return result[0] if single else result
