"""Fused Pallas 3D voxel deposit (BASELINE config 3 at speed).

The 2D fused-deposit architecture (``deposit_pallas``) generalised to voxel
cubes: particles are binned to (TZ, TY, TX)-voxel tiles, one device sort
groups them, and a Pallas **flat work-list grid** (one packed int32 schedule
word per step — see ``deposit_pallas._step_schedule``) accumulates each
tile's extended block (TZ+K, TY+K, TX+K) in VMEM: fully traceable (no host
sync), no dead steps for sparse tiles, composable with ``shard_map``. The
accumulator flattens (z, y) into the sublane dimension — rows r decode to
(rz = r // Ry, ry = r % Ry) with pure 2D integer ops, so the kernel never
builds >2D tensors (a Mosaic-friendliness lesson from the 2D kernel). Column
placement is the same exact one-hot MXU matmul; halo resolution is a 27-band
(3 axes) overlap-add of regular slices with **per-axis** periodicity (the
slab-sharded multi-chip path wraps x/y locally while z rides the ppermute
ring).

Numerics: grid value = sum_i value_i * W(|r_i|, h_i) with the full 3D kernel
at the true voxel-sample distance — identical to ``ops.grid3d`` and the f64
oracle. Precision modes as in 2D (default split-bf16, <=1e-5 class).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.splines import get_kernel
from .deposit_pallas import (
    _LEVEL_STRIDE,
    _TILE_MASK,
    _as_field_matrix,
    _next_pow2,
    _step_schedule,
    _tile_ranges,
)
from .grid3d import GridSpec

Array = jax.Array

_CHUNK = 512
_LANES = 128


@dataclass(frozen=True)
class Pallas3DConfig:
    """Static geometry of one 3D footprint level."""

    K: int  # voxel window per axis = max footprint diameter + slack
    TZ: int = 4
    TY: int = 4
    S: int = _LANES

    @property
    def M(self) -> int:
        return self.K // 2

    @property
    def RZ(self) -> int:
        return self.TZ + self.K

    @property
    def RY(self) -> int:
        return self.TY + self.K

    @property
    def R(self) -> int:
        return self.RZ * self.RY

    @property
    def default_tx(self) -> int:
        return self.S - self.K

    @property
    def max_s_vox(self) -> float:
        return (self.K - 2) / 2


# Preferred (smallest-accumulator) tile heights per level. The flat
# work-list grid prefetches one int32 schedule word per step plus FOUR
# per-tile tables (block_start / tile_off / pstart / pcount) into SMEM
# (~1 MiB on v5e): a 512^3 grid at 4x4 tiles is 131k tiles = 2 MiB of
# tables alone, and every tile costs one (zeroing) grid step even when
# empty. :func:`_adapt_cfg_3d` grows TZ/TY per grid shape until the
# tables fit, so these are starting points, not hard geometry.
PALLAS_3D_LEVELS: tuple[Pallas3DConfig, ...] = (
    Pallas3DConfig(K=4, TZ=8, TY=8),
    Pallas3DConfig(K=8, TZ=8, TY=8),
    Pallas3DConfig(K=16, TZ=4, TY=4),
)

_SMEM_BUDGET_BYTES = 768 * 1024  # headroom under the ~1 MiB SMEM
# cap on one level's halo'd tile-stack (the Pallas output, overlap-added
# afterwards): at 512^3 the K=8/K=16 stacks at base tile heights reach
# 4.3/6.4 GB ((RZ/TZ)(RY/TY)(S/tx) halo ratios of 4.5-7.5x the grid) and
# the all-levels program exhausted the 15.75 GB HBM at runtime. Growing
# TZ/TY divides the stack (fewer, taller tiles amortise the halo) at the
# price of more VPU work per particle at that level — paid only by the
# big-grid levels that would otherwise not run at all.
_HBM_STACK_BUDGET_BYTES = 3584 * 2**20


def _smem_table_bytes_3d(n_tiles: int, n_rows_bound: int) -> int:
    """int32 bytes of the scalar-prefetch operands for one level pass:
    sched (n_rows + 2*n_tiles words) + 4 per-tile tables."""
    return 4 * (n_rows_bound + 6 * n_tiles)


def _hbm_stack_bytes_3d(g: "_Geometry3D", n_fields: int) -> int:
    """f32 bytes of one level's (n_tiles, F*R, S) halo'd tile stack."""
    return 4 * g.n_tiles * n_fields * g.cfg.R * g.cfg.S



def _check_precision_3d(precision: str) -> str:
    if precision not in ("f32", "bf16", "bf16x2"):
        raise ValueError(
            f"unknown precision {precision!r}; expected f32 | bf16 | bf16x2"
        )
    return precision


def _deposit3d_kernel(
    # scalar prefetch (5): packed flat work-list (see deposit_pallas)
    sched_ref,  # (n_steps,) tile id | work bit << 29
    block_start_ref,  # (n_tiles,)
    tile_off_ref,  # (n_tiles,)
    pstart_ref,  # (n_tiles,)
    pcount_ref,  # (n_tiles,)
    chunk_ref,  # (1, 8, C): channels [u, v, w, h, val0..val3]
    acc_ref,  # (1, F*R, S)
    *,
    cfg: Pallas3DConfig,
    C: int,
    n_fields: int,
    n_tiles_x: int,
    n_tiles_y: int,
    tx: int,
    kernel_name: str,
    psx: float,
    psy: float,
    psz: float,
    offset: float,
    precision: str,
):
    s = pl.program_id(0)
    t = sched_ref[s] & _TILE_MASK
    K, R, RZ, RY, S, TZ, TY, M = (
        cfg.K, cfg.R, cfg.RZ, cfg.RY, cfg.S, cfg.TZ, cfg.TY, cfg.M,
    )
    kernel = get_kernel(kernel_name)

    t_prev = sched_ref[jnp.maximum(s - 1, 0)] & _TILE_MASK
    first = (s == 0) | (t != t_prev)
    work = (sched_ref[s] >> 29) & 1

    @pl.when(first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(work == 1)
    def _work():
        data = chunk_ref[0]  # (8, C)
        # TILE-LOCAL voxel coordinates (see deposit_pallas: storing global
        # coordinates costs ~f32-ulp-of-grid-size of quantization). Every
        # contributing particle this step belongs to tile t (valid mask).
        u_loc = data[0:1, :]
        v_loc = data[1:2, :]
        w_loc = data[2:3, :]
        h = data[3:4, :]  # world-unit smoothing length

        base = (block_start_ref[t] + (s - tile_off_ref[t])) * C
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        gidx = base + lane
        valid = (gidx >= pstart_ref[t]) & (gidx < pstart_ref[t] + pcount_ref[t])

        col0 = jnp.floor(u_loc - offset + 0.5).astype(jnp.int32) - (K // 2)

        # hoist 1/h, the kernel normalisation, and the validity mask to
        # per-particle (1, C) factors; the (R, C) block stays divide-free
        # (see deposit_pallas._chunk_contrib): W(r,h)*val =
        # shape_q(r/h) * [val * norm / h^3]
        inv_h = jnp.where(h > 0.0, 1.0 / h, 0.0)
        vals = data[4 : 4 + n_fields, :]
        val_scale = (kernel.norm_3d * inv_h) * (inv_h * inv_h)
        vals_eff = jnp.where(valid, vals * val_scale, 0.0)

        # (R, C): row r decodes to (rz, ry) with 2D integer ops only
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        rz = (r_iota // RY).astype(jnp.float32)
        ry = (r_iota % RY).astype(jnp.float32)
        dzn = (rz + offset - w_loc) * (psz * inv_h)
        dyn = (ry + offset - v_loc) * (psy * inv_h)
        dyz2n = dzn * dzn + dyn * dyn

        col0_s = col0.reshape(C, 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)
        # one-hot placement built once, anchored at the wrapped lane with
        # out-of-range columns zeroed by a (1, C) weight mask; the column
        # offset k applies on the OUTPUT side Horner-style — each step
        # lane-rolls the small (F*R, S) f32 accumulator by one instead of
        # the (C, S) one-hot operand (see deposit_pallas._chunk_contrib)
        P_dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
        P0 = (s_iota == jnp.mod(col0_s, S)).astype(P_dtype)

        def k_step(j, contrib):
            k = (K - 1) - j
            rolled = pltpu.roll(contrib, 1, 1)
            colk = col0 + k
            col_ok = ((colk >= 0) & (colk < S)).astype(jnp.float32)
            dxn = (colk.astype(jnp.float32) + offset - u_loc) * (psx * inv_h)
            q = jnp.sqrt(dyz2n + dxn * dxn)
            wk = kernel.shape_q(q) * col_ok  # zero outside support/lanes
            w_rows = jnp.concatenate(
                [wk * vals_eff[f : f + 1, :] for f in range(n_fields)], axis=0
            )
            if precision == "f32":
                return rolled + jnp.dot(
                    w_rows, P0,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            if precision == "bf16":
                return rolled + jnp.dot(
                    w_rows.astype(jnp.bfloat16), P0,
                    preferred_element_type=jnp.float32,
                )
            # one row-concatenated limb dot: shares P0 and doubles the MXU
            # row occupancy vs two (F*R, C) x (C, S) dots (see
            # deposit_pallas._chunk_contrib)
            hi = w_rows.astype(jnp.bfloat16)
            lo = (w_rows - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            d = jnp.dot(
                jnp.concatenate([hi, lo], axis=0), P0,
                preferred_element_type=jnp.float32,
            )
            nr = w_rows.shape[0]
            return rolled + d[:nr] + d[nr:]

        contrib = jax.lax.fori_loop(
            0, K, k_step, jnp.zeros((n_fields * R, S), jnp.float32)
        )
        acc_ref[0] += contrib


def _bands(margin: int, period: int):
    out = []
    o = -margin
    while o < period + margin:
        p = o // period
        end = min((p + 1) * period, period + margin)
        out.append((o + margin, end - o, p, o - p * period))
        o = end
    return out


def _overlap_add_3d(
    tiles: Array,  # (n_tiles, F*R, S)
    cfg: Pallas3DConfig,
    tx: int,
    ntz: int,
    nty: int,
    ntx: int,
    n_fields: int,
    nz: int,
    ny: int,
    nx: int,
    periodic: tuple[bool, bool, bool],  # (x, y, z)
) -> Array:
    RZ, RY, TZ, TY, M = cfg.RZ, cfg.RY, cfg.TZ, cfg.TY, cfg.M
    per_x, per_y, per_z = periodic
    SX = tx + 2 * M
    # z-major tile layout: one z-row of tiles at a time. Materializing the
    # full halo'd stack as one 7D transpose + 27 band copies OOM'd at 512^3
    # on the K=16 level (halo ratio (RZ/TZ)(RY/TY)(SX/tx) ~ 7.5x the grid;
    # the transpose temp alone was 6 GB padded). Per-z-row slabs bound the
    # overlap-add temps at nty*ntx*F*RZ*RY*SX elements (~tens of MB).
    t_all = tiles.reshape(ntz, nty, ntx, n_fields, RZ, RY, cfg.S)

    def shift(a, axis, p, wrap):
        if p == 0:
            return a
        if wrap:
            return jnp.roll(a, p, axis=axis)
        pad = [(0, 0)] * a.ndim
        idx = [slice(None)] * a.ndim
        if p > 0:
            pad[axis] = (p, 0)
            idx[axis] = slice(0, a.shape[axis])
        else:
            pad[axis] = (0, -p)
            idx[axis] = slice(-p, a.shape[axis] - p)
        return jnp.pad(a, pad)[tuple(idx)]

    # overlap in z is a plain additive scatter of each z-row's RZ extended
    # planes at global offset iz*TZ - M (mod nz when periodic; RZ > nz folds
    # duplicate rows correctly through the add-scatter). Non-periodic
    # out-of-range planes divert to a sentinel row (negative indices would
    # wrap under JAX indexing, so `mode="drop"` alone is not enough).
    nzp = nz if per_z else nz + 1

    def body(iz, img):
        blk = jax.lax.dynamic_slice_in_dim(t_all, iz, 1, 0)[0]
        blk = blk[..., :SX]  # (nty, ntx, F, RZ, RY, SX) lane pad dropped
        blk = blk.transpose(2, 3, 0, 4, 1, 5)  # (F, RZ, nty, RY, ntx, SX)
        slab = jnp.zeros(
            (n_fields, RZ, nty, TY, ntx, tx), dtype=tiles.dtype
        )
        for y0, yh, yps, yoff in _bands(M, TY):
            for x0, xw, xps, xoff in _bands(M, tx):
                band = blk[:, :, :, y0 : y0 + yh, :, x0 : x0 + xw]
                band = shift(band, 2, yps, per_y)
                band = shift(band, 4, xps, per_x)
                slab = slab.at[
                    :, :, :, yoff : yoff + yh, :, xoff : xoff + xw
                ].add(band)
        slab = slab.reshape(n_fields, RZ, nty * TY, ntx * tx)[:, :, :ny, :nx]
        zrows = iz * TZ - M + jnp.arange(RZ)
        if per_z:
            zrows = jnp.mod(zrows, nz)
        else:
            zrows = jnp.where((zrows >= 0) & (zrows < nz), zrows, nz)
        return img.at[:, zrows, :, :].add(slab)

    img = jax.lax.fori_loop(
        0, ntz, body, jnp.zeros((n_fields, nzp, ny, nx), dtype=tiles.dtype)
    )
    return img[:, :nz]


def _choose_tx_3d(cfg: Pallas3DConfig, nx: int, periodic: bool) -> int:
    if not periodic:
        return cfg.default_tx
    tx = min(cfg.default_tx, nx)
    while tx > cfg.M and nx % tx != 0:
        tx -= 1
    if tx <= cfg.M or nx % tx:
        raise ValueError(f"no valid periodic tile width for nx={nx}, level K={cfg.K}")
    return tx


@dataclass(frozen=True)
class _Geometry3D:
    cfg: Pallas3DConfig
    tx: int
    ntx: int
    nty: int
    ntz: int

    @property
    def n_tiles(self) -> int:
        return self.ntx * self.nty * self.ntz


def _geometry_3d(
    cfg: Pallas3DConfig, spec_shape, periodic: tuple[bool, bool, bool]
) -> _Geometry3D:
    nz, ny, nx = spec_shape
    per_x, per_y, per_z = periodic
    tx = _choose_tx_3d(cfg, nx, per_x)
    if per_y and ny % cfg.TY:
        raise ValueError("periodic-y 3D pallas deposit requires TY | ny")
    if per_z and nz % cfg.TZ:
        raise ValueError("periodic-z 3D pallas deposit requires TZ | nz")
    return _Geometry3D(
        cfg=cfg, tx=tx,
        ntx=(nx + tx - 1) // tx,
        nty=(ny + cfg.TY - 1) // cfg.TY,
        ntz=(nz + cfg.TZ - 1) // cfg.TZ,
    )


def _adapt_cfg_3d(
    cfg: Pallas3DConfig,
    spec_shape,
    periodic: tuple[bool, bool, bool],
    n_rows_bound: int,
    n_fields: int = 1,
) -> Pallas3DConfig:
    """Grow a level's tile heights until its scalar-prefetch tables fit
    SMEM and its halo'd tile stack fits the HBM budget.

    Doubling TZ/TY divides the tile count by 2 without changing level
    assignment (``max_s_vox`` depends only on K), so adapted geometry is a
    pure scheduling choice. Candidates that fail the periodic divisibility
    check are skipped; if nothing fits the budget, the largest valid
    geometry wins (better a tight compile than a disabled level).
    """
    tz, ty = cfg.TZ, cfg.TY
    best: Optional[Pallas3DConfig] = None
    while True:
        cand = replace(cfg, TZ=tz, TY=ty)
        try:
            g = _geometry_3d(cand, spec_shape, periodic)
        except ValueError:
            g = None
        if g is not None:
            best = cand
            if (
                _smem_table_bytes_3d(g.n_tiles, n_rows_bound)
                <= _SMEM_BUDGET_BYTES
                and _hbm_stack_bytes_3d(g, n_fields)
                <= _HBM_STACK_BUDGET_BYTES
            ):
                return cand
        if tz >= 64 and ty >= 64:
            return best if best is not None else cfg
        if ty <= tz and ty < 64:
            ty *= 2
        else:
            tz *= 2


def _deposit_3d_pallas_traced(
    cx, cy, cz, h, values,  # (N,) x4 + (F, N); N a multiple of _CHUNK
    *,
    geom: _Geometry3D,
    spec_shape, spec_extent, periodic: tuple[bool, bool, bool], offset,
    n_fields: int,
    kernel: str,
    precision: str,
    interpret: bool,
) -> Array:
    """Fully traceable 3D fused deposit: sort -> schedule -> pallas ->
    overlap-add, no host sync. Safe under jit / shard_map."""
    C = _CHUNK
    cfg, tx = geom.cfg, geom.tx
    nz, ny, nx = spec_shape
    x0, x1, y0, y1, z0, z1 = spec_extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    psz = (z1 - z0) / nz
    per_x, per_y, per_z = periodic

    u = (cx - x0) / psx
    v = (cy - y0) / psy
    w_ = (cz - z0) / psz
    if per_x:
        u = jnp.mod(u, nx)
    if per_y:
        v = jnp.mod(v, ny)
    if per_z:
        w_ = jnp.mod(w_, nz)

    txi = jnp.clip((u / tx).astype(jnp.int32), 0, geom.ntx - 1)
    tyi = jnp.clip((v / cfg.TY).astype(jnp.int32), 0, geom.nty - 1)
    tzi = jnp.clip((w_ / cfg.TZ).astype(jnp.int32), 0, geom.ntz - 1)
    tile_id = ((tzi * geom.nty + tyi) * geom.ntx + txi).astype(jnp.int32)
    # tile-local coordinates ride the sort (see deposit_pallas)
    u_loc = u - (txi * tx - cfg.M)
    v_loc = v - (tyi * cfg.TY - cfg.M)
    w_loc = w_ - (tzi * cfg.TZ - cfg.M)

    operands = [tile_id, u_loc, v_loc, w_loc, h] + [values[f] for f in range(n_fields)]
    # grouping only needs key order (is_stable=False: 28% faster on v5e)
    sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=False)

    n = u.shape[0]
    n_rows = n // C
    n_tiles = geom.n_tiles
    pstart, pcount, block_start, nchunks = _tile_ranges(sorted_ops[0], n_tiles, C)
    n_steps = n_rows + 2 * n_tiles
    sched, tile_off = _step_schedule(nchunks, n_tiles, n_steps)

    def pack(a):
        return a.reshape(n_rows, C)

    channels = [pack(sorted_ops[1]), pack(sorted_ops[2]), pack(sorted_ops[3]), pack(sorted_ops[4])]
    channels += [pack(sorted_ops[5 + f]) for f in range(n_fields)]
    channels += [jnp.zeros((n_rows, C), jnp.float32)] * (8 - len(channels))
    packed = jnp.stack(channels, axis=1)

    tiles = _cached_3d_call(
        cfg, geom.ntx, geom.nty, n_steps, n_rows, n_fields, tx,
        kernel, psx, psy, psz, offset, precision, interpret,
        geom.ntz,
    )(sched, block_start, tile_off, pstart, pcount, packed)

    return _overlap_add_3d(
        tiles, cfg, tx, geom.ntz, geom.nty, geom.ntx, n_fields, nz, ny, nx,
        periodic,
    )


@lru_cache(maxsize=256)
def _cached_3d_call(
    cfg, ntx, nty, n_steps, n_rows, n_fields, tx,
    kernel, psx, psy, psz, offset, precision, interpret, ntz,
):
    n_tiles = ntx * nty * ntz

    def in_idx(s, sched, bs, toff, ps, pc):
        # clamp: blocks are DMA'd even for skipped steps
        t = sched[s] & _TILE_MASK
        return (jnp.clip(bs[t] + (s - toff[t]), 0, n_rows - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, 8, _CHUNK), in_idx)],
        out_specs=pl.BlockSpec(
            (1, n_fields * cfg.R, cfg.S),
            lambda s, sched, bs, toff, ps, pc: (sched[s] & _TILE_MASK, 0, 0),
        ),
    )
    kern = partial(
        _deposit3d_kernel,
        cfg=cfg, C=_CHUNK, n_fields=n_fields,
        n_tiles_x=ntx, n_tiles_y=nty, tx=tx,
        kernel_name=kernel, psx=psx, psy=psy, psz=psz,
        offset=offset, precision=precision,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_fields * cfg.R, cfg.S), jnp.float32),
        interpret=interpret,
    )


@lru_cache(maxsize=256)
def _cached_3d_pipeline(
    geom, shape, extent, periodic, offset, n_fields, kernel, precision, interpret,
):
    fn = partial(
        _deposit_3d_pallas_traced,
        geom=geom, spec_shape=shape, spec_extent=extent, periodic=periodic,
        offset=offset, n_fields=n_fields, kernel=kernel, precision=precision,
        interpret=interpret,
    )
    return jax.jit(fn)


def deposit_3d_pallas(
    pos, h, values, spec: GridSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    level: Optional[Pallas3DConfig] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Single-level fused 3D deposit: (nz, ny, nx) or (F, nz, ny, nx).

    Footprints must fit the level (``support_factor * h / voxel <=
    level.max_s_vox``); use :func:`deposit_3d_auto` for mixed footprints.
    """
    cfg = level or PALLAS_3D_LEVELS[0]
    _check_precision_3d(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    periodic = (spec.periodic_wrap,) * 3
    n_rows_bound = max(_CHUNK, _next_pow2(int(pos.shape[0]))) // _CHUNK
    nf = 1 if np.ndim(values) == 1 else int(np.shape(values)[0])
    cfg = _adapt_cfg_3d(cfg, spec.shape, periodic, n_rows_bound, nf)
    geom = _geometry_3d(cfg, spec.shape, periodic)

    pos = jnp.asarray(pos, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    if values.ndim == 1:
        values = values[None, :]
    n_fields = values.shape[0]
    if n_fields > 4:
        raise ValueError("3D pallas deposit supports at most 4 fields per pass")

    n = pos.shape[0]
    n_bucket = max(_CHUNK, _next_pow2(n))
    if n_bucket != n:
        pad = n_bucket - n
        x1 = float(spec.extent[1])
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=x1)
        h = jnp.pad(h, (0, pad), constant_values=1.0)
        values = jnp.pad(values, ((0, 0), (0, pad)))

    grid = _cached_3d_pipeline(
        geom, spec.shape, tuple(float(e) for e in spec.extent), periodic,
        spec.sample_offset, n_fields, kernel, precision, interpret,
    )(pos[:, 0], pos[:, 1], pos[:, 2], h, values)
    return grid[0] if n_fields == 1 else grid


@dataclass(frozen=True)
class Tiled3DParticles:
    """Device-resident multi-level 3D tile-sorted layout (the 3D analogue
    of :class:`deposit_pallas.TiledParticles`): one fused composite-key
    sort assigns every particle a footprint level and a tile under that
    level's geometry; per-level segments are pow2-bucketed so the compiled
    programs are shared across snapshots. The only host sync is the
    per-level counts vector."""

    spec: GridSpec
    kernel: str
    geoms: tuple  # per populated level: (_Geometry3D, lo, bucket, count)
    sorted_u: Array  # voxel-space coords, (level, tile)-sorted + N/2 slack
    sorted_v: Array
    sorted_w: Array
    sorted_h: Array
    sorted_values: Array  # (F, N + slack)
    sorted_tile: Array  # level-local tile ids
    n_sorted: int
    n_oversize: int
    n_valid: int

    @property
    def n_fields(self) -> int:
        return self.sorted_values.shape[0]


def _multi_level_assign_3d(
    u, v, w, s_vox, bounds, ntx_t, nty_t, ntz_t, ty_t, tz_t, tx_t, m_t, xp
):
    """(level, tile id, tile-LOCAL voxel coords) per particle under each
    level's 3D geometry. Oversize/disabled-level particles keep GLOBAL
    voxel coordinates (tile 0) so the dense fallback can recover world
    positions (mirrors :func:`deposit_pallas._multi_level_assign`)."""
    n_levels = len(bounds)
    level = xp.full(u.shape, n_levels, xp.int32)
    for li in range(n_levels - 1, -1, -1):
        if bounds[li] >= 0:
            level = xp.where(s_vox <= bounds[li], xp.int32(li), level)
    tile = xp.zeros(u.shape, xp.int32)
    u_loc, v_loc, w_loc = u, v, w
    for li in range(n_levels):
        if bounds[li] < 0:
            continue
        txi = xp.clip((u / tx_t[li]).astype(xp.int32), 0, ntx_t[li] - 1)
        tyi = xp.clip((v / ty_t[li]).astype(xp.int32), 0, nty_t[li] - 1)
        tzi = xp.clip((w / tz_t[li]).astype(xp.int32), 0, ntz_t[li] - 1)
        sel = level == li
        tile = xp.where(sel, (tzi * nty_t[li] + tyi) * ntx_t[li] + txi, tile)
        u_loc = xp.where(sel, u - (txi * tx_t[li] - m_t[li]), u_loc)
        v_loc = xp.where(sel, v - (tyi * ty_t[li] - m_t[li]), v_loc)
        w_loc = xp.where(sel, w - (tzi * tz_t[li] - m_t[li]), w_loc)
    return level, tile, u_loc, v_loc, w_loc


@lru_cache(maxsize=256)
def _cached_tile_sort_3d(
    shape, extent, periodic, bounds, ntx_t, nty_t, ntz_t, ty_t, tz_t, tx_t,
    m_t, support_factor, n_fields, donate=False,
):
    n_levels = len(bounds)

    def run(cx, cy, cz, h, values):
        nz, ny, nx = shape
        x0, x1, y0, y1, z0, z1 = extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        psz = (z1 - z0) / nz
        u = (cx - x0) / psx
        v = (cy - y0) / psy
        w = (cz - z0) / psz
        per_x, per_y, per_z = periodic
        if per_x:
            u = jnp.mod(u, nx)
        if per_y:
            v = jnp.mod(v, ny)
        if per_z:
            w = jnp.mod(w, nz)
        s_vox = support_factor * h / min(psx, psy, psz)
        level, tile, u_loc, v_loc, w_loc = _multi_level_assign_3d(
            u, v, w, s_vox, bounds, ntx_t, nty_t, ntz_t, ty_t, tz_t, tx_t,
            m_t, jnp,
        )
        key = level * _LEVEL_STRIDE + tile
        operands = [key, u_loc, v_loc, w_loc, h] + [
            values[f] for f in range(n_fields)
        ]
        sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=False)
        skey, su, sv, sw, sh = sorted_ops[:5]
        s_values = jnp.stack(sorted_ops[5:], axis=0)
        lv = jnp.arange(n_levels + 1, dtype=jnp.int32) * _LEVEL_STRIDE
        starts = jnp.searchsorted(skey, lv).astype(jnp.int32)
        ends = jnp.searchsorted(
            skey, lv + (_LEVEL_STRIDE - 1), side="right"
        ).astype(jnp.int32)
        counts = ends - starts
        s_tile = skey - (skey // _LEVEL_STRIDE) * _LEVEL_STRIDE
        # N/2 slack: per-level (lo, pow2-bucket) reads stay dynamic_slices
        # (same bound argument as deposit_pallas._tile_sort_tail)
        n = u.shape[0]
        slack = max(n // 2, _CHUNK)
        pad1 = lambda a: jnp.pad(a, (0, slack))
        return (
            pad1(s_tile), pad1(su), pad1(sv), pad1(sw), pad1(sh),
            jnp.pad(s_values, ((0, 0), (0, slack))), counts,
        )

    return jax.jit(run, donate_argnums=(0, 1, 2, 3, 4) if donate else ())


def tile_particles_3d(
    pos, h, values, spec: GridSpec,
    *,
    kernel: str = "cubic_spline",
    levels: tuple[Pallas3DConfig, ...] = PALLAS_3D_LEVELS,
    donate: bool = False,
) -> Tiled3DParticles:
    """Build the device-resident multi-level 3D layout with ONE fused sort
    (replaces the former host-side level split: np.nonzero + fancy indexing
    + one global sort per level cost seconds at 1e8 scale)."""
    kspec = get_kernel(kernel)
    values, _ = _as_field_matrix(values)
    n_valid = int(values.shape[1])
    pos = jnp.asarray(pos, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    n_fields = int(values.shape[0])
    if n_fields > 4:
        raise ValueError("3D pallas deposit supports at most 4 fields per pass")

    periodic = (spec.periodic_wrap,) * 3
    n = int(pos.shape[0])
    n_bucket = max(_CHUNK, _next_pow2(n))
    levels = tuple(
        _adapt_cfg_3d(cfg, spec.shape, periodic, n_bucket // _CHUNK, n_fields)
        for cfg in levels
    )
    geoms: list[Optional[_Geometry3D]] = []
    for cfg in levels:
        try:
            geoms.append(_geometry_3d(cfg, spec.shape, periodic))
        except ValueError:
            geoms.append(None)
    for g in geoms:
        if g is not None and g.n_tiles >= _LEVEL_STRIDE:
            raise ValueError(
                f"{g.n_tiles} tiles at the K={g.cfg.K} level exceed the "
                f"composite-key stride ({_LEVEL_STRIDE}); grid the cube in "
                "sub-extents"
            )
    bounds = tuple(
        (g.cfg.max_s_vox if g is not None else -1.0) for g in geoms
    )
    geom_tuples = (
        tuple(g.ntx if g else 1 for g in geoms),
        tuple(g.nty if g else 1 for g in geoms),
        tuple(g.ntz if g else 1 for g in geoms),
        tuple(g.cfg.TY if g else 1 for g in geoms),
        tuple(g.cfg.TZ if g else 1 for g in geoms),
        tuple(g.tx if g else 1 for g in geoms),
        tuple(g.cfg.M if g else 0 for g in geoms),
    )
    extent = tuple(float(e) for e in spec.extent)

    # pow2 pad: parks at the extent max with sub-voxel h (lands in the
    # smallest level, weight 0)
    if n_bucket != n:
        pad = n_bucket - n
        pad_h = 0.1 * min(spec.voxel_size)
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=float(extent[1]))
        h = jnp.pad(h, (0, pad), constant_values=pad_h)
        values = jnp.pad(values, ((0, 0), (0, pad)))

    s_tile, su, sv, sw, sh, s_values, counts = _cached_tile_sort_3d(
        spec.shape, extent, periodic, bounds, *geom_tuples,
        kspec.support_factor, n_fields, donate,
    )(pos[:, 0], pos[:, 1], pos[:, 2], h, values)

    counts_host = np.asarray(counts)  # host sync: len(levels)+1 ints
    level_meta = []
    lo = 0
    for li, g in enumerate(geoms):
        c = int(counts_host[li])
        if g is not None and c > 0:
            level_meta.append((g, lo, max(_CHUNK, _next_pow2(c)), c))
        lo += c

    return Tiled3DParticles(
        spec=spec, kernel=kernel, geoms=tuple(level_meta),
        sorted_u=su, sorted_v=sv, sorted_w=sw, sorted_h=sh,
        sorted_values=s_values, sorted_tile=s_tile,
        n_sorted=int(h.shape[0]),
        n_oversize=int(counts_host[len(geoms)]),
        n_valid=n_valid,
    )


def _layout_level_body_3d(
    geom, shape, extent, periodic, offset, n_fields, kernel, precision,
    interpret, bucket,
    su, sv, sw, sh, s_values, s_tile, lo, count,
):
    """Traced: render one 3D level from the sorted layout (bucketed
    dynamic_slice segment -> flat-grid Pallas pass -> 27-band overlap-add)."""
    C = _CHUNK
    cfg, tx = geom.cfg, geom.tx
    nz, ny, nx = shape
    x0, x1, y0, y1, z0, z1 = extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    psz = (z1 - z0) / nz
    n_rows = bucket // C
    n_tiles = geom.n_tiles
    n_steps = n_rows + 2 * n_tiles

    live = jnp.arange(bucket, dtype=jnp.int32) < count
    u = jax.lax.dynamic_slice(su, (lo,), (bucket,))
    v = jax.lax.dynamic_slice(sv, (lo,), (bucket,))
    w = jax.lax.dynamic_slice(sw, (lo,), (bucket,))
    h = jnp.where(live, jax.lax.dynamic_slice(sh, (lo,), (bucket,)), 1.0)
    vals = jnp.where(
        live[None, :],
        jax.lax.dynamic_slice(s_values, (0, lo), (s_values.shape[0], bucket)),
        0.0,
    )
    tile = jnp.where(
        live, jax.lax.dynamic_slice(s_tile, (lo,), (bucket,)), n_tiles
    ).astype(jnp.int32)

    pstart, pcount, block_start, nchunks = _tile_ranges(tile, n_tiles, C)
    sched, tile_off = _step_schedule(nchunks, n_tiles, n_steps)
    pack = lambda a: a.reshape(n_rows, C)
    channels = [pack(u), pack(v), pack(w), pack(h)]
    channels += [pack(vals[f]) for f in range(n_fields)]
    channels += [jnp.zeros((n_rows, C), jnp.float32)] * (8 - len(channels))
    packed = jnp.stack(channels, axis=1)

    tiles = _cached_3d_call(
        cfg, geom.ntx, geom.nty, n_steps, n_rows, n_fields, tx,
        kernel, psx, psy, psz, offset, precision, interpret, geom.ntz,
    )(sched, block_start, tile_off, pstart, pcount, packed)
    return _overlap_add_3d(
        tiles, cfg, tx, geom.ntz, geom.nty, geom.ntx, n_fields, nz, ny, nx,
        periodic,
    )


@lru_cache(maxsize=256)
def _cached_layout_all_levels_3d(
    metas_static, shape, extent, periodic, offset, n_fields, kernel,
    precision, interpret,
):
    """ONE jitted program rendering every populated 3D level (separate
    per-level programs each pay a dispatch round-trip through the tunnel)."""

    @jax.jit
    def run(su, sv, sw, sh, s_values, s_tile, los, counts):
        nz, ny, nx = shape
        total = jnp.zeros((n_fields, nz, ny, nx), jnp.float32)
        for i, (geom, bucket) in enumerate(metas_static):
            total = total + _layout_level_body_3d(
                geom, shape, extent, periodic, offset, n_fields, kernel,
                precision, interpret, bucket,
                su, sv, sw, sh, s_values, s_tile, los[i], counts[i],
            )
        return total

    return run


def deposit_3d_tiled(
    tp: Tiled3DParticles,
    *,
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
) -> Array:
    """Render the full adaptive-h voxel cube from a :class:`Tiled3DParticles`
    layout. Returns (F, nz, ny, nx)."""
    _check_precision_3d(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nz, ny, nx = tp.spec.shape
    periodic = (tp.spec.periodic_wrap,) * 3
    if tp.geoms:
        metas_static = tuple((meta[0], meta[2]) for meta in tp.geoms)
        los = jnp.asarray([int(meta[1]) for meta in tp.geoms], jnp.int32)
        counts = jnp.asarray([int(meta[3]) for meta in tp.geoms], jnp.int32)
        total = _cached_layout_all_levels_3d(
            metas_static, tp.spec.shape,
            tuple(float(e) for e in tp.spec.extent), periodic,
            tp.spec.sample_offset, tp.n_fields, tp.kernel, precision,
            interpret,
        )(tp.sorted_u, tp.sorted_v, tp.sorted_w, tp.sorted_h,
          tp.sorted_values, tp.sorted_tile, los, counts)
    else:
        total = jnp.zeros((tp.n_fields, nz, ny, nx), jnp.float32)

    if tp.n_oversize:
        from .grid3d import deposit_3d  # late import: sibling module

        # oversize stragglers kept GLOBAL voxel coords (assign default)
        x0, x1, y0, y1, z0, z1 = tp.spec.extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        psz = (z1 - z0) / nz
        sl = slice(tp.n_sorted - tp.n_oversize, tp.n_sorted)
        po = np.stack(
            [
                np.asarray(tp.sorted_u[sl]) * psx + x0,
                np.asarray(tp.sorted_v[sl]) * psy + y0,
                np.asarray(tp.sorted_w[sl]) * psz + z0,
            ],
            axis=1,
        )
        ho = np.asarray(tp.sorted_h[sl])
        vo = np.asarray(tp.sorted_values[:, sl])
        grid = np.asarray(
            deposit_3d(po, ho, vo.T, tp.spec, kernel=tp.kernel)
        )
        total = total + (
            jnp.asarray(grid)[None]
            if grid.ndim == 3
            else jnp.moveaxis(jnp.asarray(grid), -1, 0)
        )
    return total


def deposit_3d_auto(
    pos, h, values, spec: GridSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
):
    """Adaptive-h 3D deposit: device-resident level/tile partition (one
    fused sort), one fused program for every populated footprint level,
    oversize stragglers routed to the XLA dense path. Returns (nz, ny, nx)
    or (F, nz, ny, nx)."""
    values, single = _as_field_matrix(values)
    tp = tile_particles_3d(pos, h, values, spec, kernel=kernel)
    total = deposit_3d_tiled(tp, precision=precision, interpret=interpret)
    return total[0] if single else total
