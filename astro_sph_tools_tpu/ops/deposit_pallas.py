"""Fused Pallas TPU deposit pass — the north-star inner loop.

Replaces XLA scatter-add (measured ~1.6M particles/s on v5e: TPU scatter
serializes) with a scatter-free pipeline:

1. **Bin**: particles are assigned to image tiles (TY x TX pixels) by their
   *center*; no duplication. Footprint spill into neighbouring tiles is
   captured by a margin M = K/2 on every side of the tile accumulator.
2. **Sort**: one sort by tile id (``jax.lax.sort`` with payload operands) —
   amortised across all fields/maps rendered from the same particle set.
3. **Pallas pass** over a *flat work-list grid*: one grid step per
   (tile, particle-chunk) pair that actually exists. The schedule — which
   tile each step serves, which packed chunk row it DMAs, whether it must
   zero the accumulator — is computed on device and fed through scalar
   prefetch, so sparse/clustered tile histograms cost no dead steps and the
   whole pipeline is traceable (works under ``jit`` and ``shard_map`` with
   no host sync). Each step DMAs a chunk of C=512 particles (channel-packed
   SoA block), evaluates the SPH kernel on the (R = TY + K rows) x (K cols)
   x (C particles) footprint block with pure VPU polynomial work, and
   *places* the weighted contributions into the tile's extended accumulator
   — which lives in VMEM across all of the tile's steps — with a single MXU
   matmul against a one-hot column-placement matrix:
   acc[F*R, S] += W[F*R, K*C] @ P[K*C, S],  P[(k,c), s] = [s == col0(c)+k].
   The one-hot is exact, so matmul precision is set by the weight operand:
   ``precision='bf16x2'`` (default) splits W into two bf16 operands
   (hi + residual, ~2^-16 relative error — inside the 1e-5 budget once
   averaged over many contributions per pixel), 'f32' does an exact f32
   matmul (4x MXU passes), 'bf16' is fastest/loosest.
4. **Overlap-add**: extended tiles are summed into the image with nine
   static-sliced band adds (regular memory movement, no scatter).

Numerics match `tools/projections/_pixel_calculations.pyx:9-36` (3D kernel at
projected 2D radius, ``r^2 < (S_f h)^2`` mask) to the chosen precision, with
the same pixel conventions as ``ops.deposit``.

Multi-field: up to 5 fields ride one pass — the field axis is folded into the
matmul's row dimension, so a multi-field map stack costs barely more than a
single map (the north-star workload).

Adaptive h: :func:`tile_particles` builds a **device-resident multi-level
layout** (one fused sort by (footprint level, tile)); :func:`deposit_2d_auto`
renders all levels from it with no host round-trip of particle data (the only
host sync is the handful of per-level counts sizing the compiled programs).
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

from ..kernels.splines import clenshaw, get_kernel, integrated_kernel_chebyshev
from .deposit import MapSpec

Array = jax.Array

_CHUNK = 2048  # particles per Pallas grid step (v5e sweep: 1024 -> 80.1M
# deposits/s, 2048 -> 83.4M, 4096 -> 83.7M on the 33.5M bench shape; 2048
# takes ~all the step-overhead win at half the VMEM/compile cost of 4096)


_PRECISIONS = ("f32", "bf16", "bf16x2", "bf16x3")


def _check_precision(precision: str) -> str:
    """Unknown strings must fail loudly: the kernel's if-chain would
    otherwise silently treat a typo (or 'fp32') as bf16x2."""
    if precision not in _PRECISIONS:
        raise ValueError(
            f"unknown precision {precision!r}; expected one of {_PRECISIONS}"
        )
    return precision


_LANES = 128  # accumulator width S
_TILE_MASK = (1 << 29) - 1  # schedule word: tile id | work bit << 29


@dataclass(frozen=True)
class PallasDepositConfig:
    """Static geometry of one footprint level."""

    K: int  # column window = max footprint diameter + slack
    TY: int = 8  # tile output rows
    S: int = _LANES  # accumulator lane width

    @property
    def M(self) -> int:
        """Margin (pixels) on each side of the tile's output region."""
        return self.K // 2

    @property
    def R(self) -> int:
        """Accumulator rows: output rows plus both margins."""
        return self.TY + self.K

    @property
    def default_tx(self) -> int:
        """Tile output cols so the accumulator is exactly S lanes wide."""
        return self.S - self.K

    @property
    def max_s_pix(self) -> float:
        """Largest support radius (pixels) this level hosts: the K-window must
        cover the footprint diameter (2s + 2 <= K) and the margin the spill."""
        return (self.K - 2) / 2


# TY per level from the v5e sweep (BENCH notes, round 2): big-K levels carry
# margins M = K/2 >> 8 rows, so taller tiles cut the empty-tile schedule +
# overlap-add overhead (K=64: +71% at TY=32) while K<=16 is flat in TY.
# TYs are powers of two so periodic maps (TY | ny) keep every level.
PALLAS_LEVELS: tuple[PallasDepositConfig, ...] = (
    PallasDepositConfig(K=8),
    PallasDepositConfig(K=16),
    PallasDepositConfig(K=32, TY=16),
    PallasDepositConfig(K=64, TY=32),  # deep maps: 1024^2 over a full box puts
    # typical SPH footprints at 10-30 px; without this level they would
    # spill to the slow XLA dense path
)


def _deposit_kernel(
    # scalar prefetch (5): the flat work-list schedule + per-tile ranges.
    # The whole schedule lives in SMEM, so it is ONE packed int32 per step
    # (four separate per-step arrays blew the 1MB SMEM budget at 33M
    # particles); zeroing is derived from tile transitions, the DMA row from
    # per-tile offsets.
    sched_ref,  # (n_steps,) tile id | work bit << 29 (tiles non-decreasing)
    block_start_ref,  # (n_tiles,) first packed chunk row of each tile
    tile_off_ref,  # (n_tiles,) first schedule step of each tile
    pstart_ref,  # (n_tiles,) first sorted-particle index of each tile
    pcount_ref,  # (n_tiles,) particle count of each tile
    # input blocks
    chunk_ref,  # (1, 8, C): channels [u, v, h, val0..val4]
    # output blocks
    acc_ref,  # (1, F*R, S) extended tile accumulator (VMEM-resident per tile)
    *,
    cfg: PallasDepositConfig,
    C: int,
    n_fields: int,
    n_tiles_x: int,
    tx: int,
    kernel_name: str,
    support_factor: float,
    psx: float,
    psy: float,
    offset: float,
    precision: str,
    projection: str,
    cheb: tuple[float, ...],
):
    s = pl.program_id(0)
    t = sched_ref[s] & _TILE_MASK
    K, R, S, TY, M = cfg.K, cfg.R, cfg.S, cfg.TY, cfg.M
    kernel = get_kernel(kernel_name)

    # first step of a tile: the tile id changed (trailing dead steps keep the
    # last tile's id, so the last accumulator is never re-zeroed)
    t_prev = sched_ref[jnp.maximum(s - 1, 0)] & _TILE_MASK
    first = (s == 0) | (t != t_prev)
    work = (sched_ref[s] >> 29) & 1

    @pl.when(first)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(work == 1)
    def _work():
        data = chunk_ref[0]  # (8, C)
        # validity: this chunk window may over-read neighbours' particles;
        # the mask is folded into the per-particle value factors below
        base = (block_start_ref[t] + (s - tile_off_ref[t])) * C
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        gidx = base + lane
        valid = (gidx >= pstart_ref[t]) & (gidx < pstart_ref[t] + pcount_ref[t])
        acc_ref[0] += _chunk_contrib(
            data, valid, cfg=cfg, C=C, n_fields=n_fields,
            kernel=kernel, support_factor=support_factor, psx=psx, psy=psy,
            offset=offset, precision=precision, projection=projection,
            cheb=cheb,
        )


def _chunk_contrib(
    data,  # (8, C) channel block: [u, v, h, val0..val_{F-1}, ...]
    valid,  # (1, C) bool — which lanes belong to the step's tile
    *,
    cfg: PallasDepositConfig,
    C: int,
    n_fields: int,
    kernel,
    support_factor: float,
    psx: float,
    psy: float,
    offset: float,
    precision: str,
    projection: str,
    cheb: tuple[float, ...],
    k_eff=None,
):
    """Contribution of one chunk of C particles to one tile's (F*R, S)
    extended accumulator — shared by the sorted-layout and coherent-order
    deposit kernels (which differ only in how they derive ``valid`` and
    which chunk row each step reads).

    ``k_eff`` (traced int32 scalar, or None for the static ``cfg.K`` path)
    shrinks the column loop for steps whose lanes all have small support:
    the footprint anchor ``col0`` tracks it, so any ``k_eff`` whose window
    covers every valid lane's support diameter (2*s_pix + 2 <= k_eff) is
    exact — the coherent engine's window schedule guarantees that bound.

    TILE-LOCAL pixel coordinates (relative to the particle's own tile's
    extended origin, magnitude <= TY/tx + K): storing GLOBAL pixel
    coordinates cost ~6e-5 px of f32 quantization at 1024^2 — enough to
    bust the 1e-5 fidelity budget for sub-pixel smoothing lengths. Every
    particle this step deposits belongs to the step's tile (the valid
    mask), so its local frame is this tile's frame.
    """
    K, R, S = cfg.K, cfg.R, cfg.S
    k_hi = K if k_eff is None else k_eff
    u_loc = data[0:1, :]  # (1, C)
    v_loc = data[1:2, :]
    h = data[2:3, :]  # world-unit smoothing length

    # column window start (extended-tile coords), (1, C)
    col0 = jnp.floor(u_loc - offset + 0.5).astype(jnp.int32) - (k_hi // 2)

    # Everything per-particle — 1/h, the kernel normalisation, the
    # validity mask — is hoisted to (1, C) factors so the (R, C)
    # footprint block sees only divide-free polynomial work:
    # W(r, h) * val = shape_q(r/h) * [val * norm / h^3] (kernels.splines)
    inv_h = jnp.where(h > 0.0, 1.0 / h, 0.0)  # (1, C); pads carry h=0
    vals = data[3 : 3 + n_fields, :]  # (F, C)
    if projection == "integrated":
        # line-integrated kernel: Y(b, h) = y(b/(S h)) / h^2
        inv_n = inv_h * (1.0 / support_factor)
        val_scale = inv_h * inv_h
    else:
        inv_n = inv_h
        val_scale = (kernel.norm_3d * inv_h) * (inv_h * inv_h)
    vals_eff = jnp.where(valid, vals * val_scale, 0.0)  # (F, C)

    # normalized dy over (R, C): q_y = dy / h (or dy / (S h) integrated)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0).astype(jnp.float32)
    dyn = (r_iota + offset - v_loc) * (psy * inv_n)
    dy2n = dyn * dyn

    # particle-major copies for the placement matrix (C in sublanes)
    col0_s = col0.reshape(C, 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)

    # One-hot placement built ONCE, anchored at each particle's WRAPPED
    # start lane (off-extent particles on non-periodic maps — e.g. halo
    # cutouts — legitimately carry col0 < 0 or col0 + k >= S; a plain
    # compare would silently clip those columns, so each step's
    # out-of-range columns are zeroed through the cheap (1, C) col_ok
    # mask instead — exact for every input). Column offset k is applied
    # on the OUTPUT side: dot(W_k, roll(P0, k)) == roll(dot(W_k, P0), k),
    # and the sum over k telescopes Horner-style,
    #   sum_k roll(D_k, k) = D_0 + roll(D_1 + roll(D_2 + ..., 1), 1),
    # so each step lane-rolls the (F*R, S) f32 accumulator by ONE instead
    # of the (C, S) one-hot operand — ~C/(F*R) fewer vreg moves per step.
    P_dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
    P0 = (s_iota == jnp.mod(col0_s, S)).astype(P_dtype)  # (C, S) one-hot

    # Per column offset k: weights (F*R, C) dotted against the fixed
    # placement, accumulated over a fori_loop in REVERSE k order (keeps
    # Mosaic compile size flat in K — a fully unrolled+concatenated
    # variant compiled ~10x slower).
    # NOTE on matmul precision: one-hot operands are exact in bf16, and
    # TPU f32 dots default to bf16 multiplication, so 'f32' must request
    # Precision.HIGHEST explicitly.
    def k_step(j, contrib):
        k = (k_hi - 1) - j
        rolled = pltpu.roll(contrib, 1, 1)
        colk = col0 + k  # (1, C)
        # zero columns the wrapped one-hot would misplace (off-extent
        # support on non-periodic maps)
        col_ok = ((colk >= 0) & (colk < S)).astype(jnp.float32)
        dxn = (colk.astype(jnp.float32) + offset - u_loc) * (psx * inv_n)
        q2 = dy2n + dxn * dxn  # (R, C)
        if projection == "integrated":
            # physically-correct column: line-integrated kernel Y(b, h)
            # via the gather-free Clenshaw fit (see kernels.splines);
            # q2 here is (b / (S h))^2
            yv = clenshaw(2.0 * jnp.clip(q2, 0.0, 1.0) - 1.0, cheb)
            wk = jnp.where(q2 < 1.0, yv, 0.0)
        else:
            # reference convention: 3D kernel at the projected radius
            # (_pixel_calculations.pyx:32-33); shape is zero outside
            # support, so no extra mask is needed
            wk = kernel.shape_q(jnp.sqrt(q2))
        wk = wk * col_ok
        # field-stacked rows: (F*R, C)
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
        # bf16x2 / bf16x3: exact placement, split weights into bf16
        # limbs (hi + residuals). Two limbs carry ~16 mantissa bits —
        # a ~2^-17 per-contribution floor that a single sub-pixel
        # particle's pixel exposes directly (measured 1.06e-5 on the
        # adaptive mix); the third limb brings the floor to ~2^-25.
        # The limbs ride ONE row-concatenated dot: each (F*R, C) x (C, S)
        # limb dot has only F*R (~32) output rows against the 128-row MXU,
        # so separate dots run the systolic array ~F*R/128 utilized;
        # stacking the limbs along rows shares the P operand and doubles
        # (triples for bf16x3) the occupied rows for the same total MACs.
        hi = w_rows.astype(jnp.bfloat16)
        r1 = w_rows - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        if precision == "bf16x3":
            l3 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
            limbs = jnp.concatenate([hi, lo, l3], axis=0)
        else:
            limbs = jnp.concatenate([hi, lo], axis=0)
        d = jnp.dot(limbs, P0, preferred_element_type=jnp.float32)
        nr = w_rows.shape[0]
        part = d[:nr] + d[nr : 2 * nr]
        if precision == "bf16x3":
            part = part + d[2 * nr :]
        return rolled + part

    contrib = jax.lax.fori_loop(
        0, k_hi, k_step, jnp.zeros((n_fields * R, S), jnp.float32)
    )
    return contrib



def _overlap_add(
    tiles: Array,  # (n_tiles, F*R, S)
    cfg: PallasDepositConfig,
    tx: int,
    n_tiles_y: int,
    n_tiles_x: int,
    n_fields: int,
    ny: int,
    nx: int,
    periodic: bool,
) -> Array:
    """Sum extended tiles into the (F, ny, nx) image with 9 band adds."""
    R, TY, M = cfg.R, cfg.TY, cfg.M
    t = tiles.reshape(n_tiles_y, n_tiles_x, n_fields, R, cfg.S)
    t = t[:, :, :, :, : tx + 2 * M]  # drop lane padding
    t = t.transpose(2, 0, 1, 3, 4)  # (F, nty, ntx, R, tx+2M)

    img = jnp.zeros((n_fields, n_tiles_y, TY, n_tiles_x, tx), dtype=tiles.dtype)

    def bands(margin: int, period: int):
        """Partition accumulator offsets [-margin, period + margin) into
        period-aligned bands: (slice start in acc, height, period shift,
        sub-offset within period). Handles margins spanning multiple periods
        (e.g. the K=32 level whose M=16 exceeds TY=8)."""
        out = []
        o = -margin
        while o < period + margin:
            p = o // period  # floor division (negative-safe)
            end = min((p + 1) * period, period + margin)
            out.append((o + margin, end - o, p, o - p * period))
            o = end
        return out

    row_bands = bands(M, TY)
    col_bands = bands(M, tx)

    def shift(a, axis, p):
        if p == 0:
            return a
        if periodic:
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

    for r0, rh, rps, roff in row_bands:
        for c0, cw, cps, coff in col_bands:
            band = t[:, :, :, r0 : r0 + rh, c0 : c0 + cw]
            band = shift(band, 1, rps)
            band = shift(band, 2, cps)
            band = band.transpose(0, 1, 3, 2, 4)  # (F, nty, rh, ntx, cw)
            img = img.at[:, :, roff : roff + rh, :, coff : coff + cw].add(band)

    img = img.reshape(n_fields, n_tiles_y * TY, n_tiles_x * tx)
    return img[:, :ny, :nx]


def _choose_tx(cfg: PallasDepositConfig, nx: int, periodic: bool) -> int:
    """Tile output width. Non-periodic: S - K (accumulator exactly S lanes).
    Periodic overlap-add wraps whole tile periods, so tx must divide nx."""
    if not periodic:
        return cfg.default_tx
    tx = min(cfg.default_tx, nx)
    while tx > cfg.M and nx % tx != 0:
        tx -= 1
    if tx <= cfg.M or nx % tx:
        raise ValueError(
            f"no valid periodic tile width for nx={nx}, level K={cfg.K}"
        )
    return tx


@dataclass(frozen=True)
class _LevelGeometry:
    """Static per-level tiling geometry for one MapSpec."""

    cfg: PallasDepositConfig
    tx: int
    n_tiles_x: int
    n_tiles_y: int

    @property
    def n_tiles(self) -> int:
        return self.n_tiles_x * self.n_tiles_y


def _level_geometry(cfg: PallasDepositConfig, spec: MapSpec) -> _LevelGeometry:
    ny, nx = spec.shape
    tx = _choose_tx(cfg, nx, spec.periodic_wrap)
    if spec.periodic_wrap and ny % cfg.TY:
        raise ValueError("periodic pallas deposit requires TY | ny")
    return _LevelGeometry(
        cfg=cfg,
        tx=tx,
        n_tiles_x=(nx + tx - 1) // tx,
        n_tiles_y=(ny + cfg.TY - 1) // cfg.TY,
    )


def _tile_ranges(tile_sorted: Array, n_tiles: int, C: int):
    """Per-tile particle ranges + chunk-row ranges over a tile-sorted array."""
    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    pstart = jnp.searchsorted(tile_sorted, tile_range).astype(jnp.int32)
    pend = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    pcount = pend - pstart
    block_start = pstart // C
    nchunks = jnp.where(pcount > 0, (pend + C - 1) // C - block_start, 0)
    return pstart, pcount, block_start, nchunks


def _step_schedule(nchunks, n_tiles: int, n_steps: int):
    """Flat work-list: one packed int32 per step (tile | work bit << 29) plus
    the per-tile first-step offsets.

    ``n_steps`` is the static bound ``n_rows + 2 * n_tiles``: each tile adds
    at most ceil(pcount/C) + 1 chunk rows (boundary chunks are revisited once
    per adjoining tile) plus one schedule slot per empty tile (so every
    accumulator block is zeroed). Trailing dead steps re-target the last tile
    with no effect.
    """
    nchunks1 = jnp.maximum(nchunks, 1)
    cum = jnp.cumsum(nchunks1)
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    tile = jnp.searchsorted(cum, steps, side="right").astype(jnp.int32)
    live = tile < n_tiles
    tile_c = jnp.minimum(tile, n_tiles - 1)
    tile_off = (cum - nchunks1).astype(jnp.int32)  # first step of each tile
    j_in = steps - tile_off[tile_c]
    work = live & (j_in < nchunks[tile_c])  # False on the empty-tile pad step
    sched = tile_c | (work.astype(jnp.int32) << 29)
    return sched, tile_off


def _pack_channels(sorted_ops, n_fields: int, n_rows: int, C: int):
    """(u, v, h, val...) -> (n_rows, 8, C) channel-packed SoA blocks."""
    def pack(a):
        return a.reshape(n_rows, C)

    channels = [pack(sorted_ops[0]), pack(sorted_ops[1]), pack(sorted_ops[2])]
    channels += [pack(sorted_ops[3 + f]) for f in range(n_fields)]
    channels += [jnp.zeros((n_rows, C), jnp.float32)] * (8 - len(channels))
    return jnp.stack(channels, axis=1)  # (n_rows, 8, C)


def _tile_local_coords(x, y, geom: _LevelGeometry, spec_shape, spec_extent, periodic):
    """(tile id, tile-local pixel coords) for one level's geometry.

    Local coordinates are relative to the particle's own tile's EXTENDED
    origin (magnitude <= tx/TY + K) — global pixel coordinates at 1024^2
    carry ~6e-5 px of f32 quantization, which busts the 1e-5 budget for
    sub-pixel footprints. Works in whatever dtype x/y arrive in (pass f64
    NumPy from the host for full fidelity; see deposit wrappers).
    """
    cfg, tx = geom.cfg, geom.tx
    ny, nx = spec_shape
    x0, x1, y0, y1 = spec_extent
    xp = np if isinstance(x, np.ndarray) else jnp
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    u = (x - x0) / psx
    v = (y - y0) / psy
    if periodic:
        u = xp.mod(u, nx)
        v = xp.mod(v, ny)
    tx_i = xp.clip((u / tx).astype(xp.int32), 0, geom.n_tiles_x - 1)
    ty_i = xp.clip((v / cfg.TY).astype(xp.int32), 0, geom.n_tiles_y - 1)
    tile_id = (ty_i * geom.n_tiles_x + tx_i).astype(xp.int32)
    u_loc = (u - (tx_i * tx - cfg.M)).astype(xp.float32)
    v_loc = (v - (ty_i * cfg.TY - cfg.M)).astype(xp.float32)
    return tile_id, u_loc, v_loc


def _deposit_2d_pallas_traced(
    x, y, h, values,  # (N,), (N,), (N,), (F, N) — N a multiple of _CHUNK
    *,
    geom: _LevelGeometry,
    spec_shape, spec_extent, periodic, offset,
    n_fields: int,
    kernel: str,
    support_factor: float,
    precision: str,
    interpret: bool,
    local_coords=None,  # optional precomputed (tile_id, u_loc, v_loc)
    projection: str = "kernel3d",
) -> Array:
    """Fully traceable single-level fused deposit: sort -> schedule -> pallas
    -> overlap-add, with no host sync. Safe under jit / shard_map."""
    C = _CHUNK
    cfg, tx = geom.cfg, geom.tx
    ny, nx = spec_shape
    x0, x1, y0, y1 = spec_extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny

    if local_coords is None:
        tile_id, u_loc, v_loc = _tile_local_coords(
            x, y, geom, spec_shape, spec_extent, periodic
        )
    else:
        tile_id, u_loc, v_loc = local_coords

    # NOTE: payloads ride the sort as extra operands. A (key, idx) sort +
    # payload gathers compiles ~20x faster but runs ~6x SLOWER on TPU
    # (random gathers at 33M indices lose badly to the sort network's
    # sequential passes — measured 13 vs 80 M deposits/s).
    operands = [tile_id, u_loc, v_loc, h] + [values[f] for f in range(n_fields)]
    # grouping only needs key order, not stability: is_stable=False measured
    # 28% faster on v5e (still run-to-run deterministic for a fixed program)
    sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=False)

    n = h.shape[0]
    n_rows = n // C
    n_tiles = geom.n_tiles
    pstart, pcount, block_start, nchunks = _tile_ranges(sorted_ops[0], n_tiles, C)
    n_steps = n_rows + 2 * n_tiles
    sched, tile_off = _step_schedule(nchunks, n_tiles, n_steps)
    packed = _pack_channels(sorted_ops[1:], n_fields, n_rows, C)

    tiles = _cached_deposit_call(
        cfg, geom.n_tiles_x, geom.n_tiles_y, n_steps, n_rows, n_fields, tx,
        kernel, support_factor, psx, psy, offset, precision, interpret,
        projection,
    )(sched, block_start, tile_off, pstart, pcount, packed)

    return _overlap_add(
        tiles, cfg, tx, geom.n_tiles_y, geom.n_tiles_x, n_fields, ny, nx, periodic
    )


@lru_cache(maxsize=512)
def _cached_deposit_call(
    cfg, n_tiles_x, n_tiles_y, n_steps, n_rows, n_fields, tx,
    kernel, support_factor, psx, psy, offset, precision, interpret,
    projection="kernel3d",
):
    """Build (once per static configuration) the pallas call.

    ``pl.pallas_call`` constructs a fresh traced callable every invocation;
    without this cache every render re-traces the kernel (~0.5 s — 6x the
    actual 16M-particle deposit time).
    """
    n_tiles = n_tiles_x * n_tiles_y

    def in_idx(s, sched, bs, toff, ps, pc):
        # block index MUST be clamped: blocks are DMA'd even for skipped
        # steps, and an out-of-range read crashes the device
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
        _deposit_kernel,
        cfg=cfg,
        C=_CHUNK,
        n_fields=n_fields,
        n_tiles_x=n_tiles_x,
        tx=tx,
        kernel_name=kernel,
        support_factor=support_factor,
        psx=psx,
        psy=psy,
        offset=offset,
        precision=precision,
        projection=projection,
        cheb=(
            integrated_kernel_chebyshev(kernel)
            if projection == "integrated"
            else ()
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_fields * cfg.R, cfg.S), jnp.float32),
        interpret=interpret,
    )


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _level_bucket(c: int) -> int:
    """Static capacity for a level segment of ``c`` slots.

    Chunk-aligned size classes: pow2 rounding wastes up to 2x — at 2^27
    with the shear layout's pad slots pushing counts just past a power of
    two, the doubled bucket alone OOMed a 16 GB chip. 3-bit size classes
    bound the waste at 12.5 %; above 8 chunks they are automatically
    multiples of ``_CHUNK`` (the deposit requires bucket % 2048 == 0),
    below that pow2 keeps the alignment at negligible cost."""
    if c <= 8 * _CHUNK:
        return max(_CHUNK, _next_pow2(c))
    return _next_size_class(c)


def _next_size_class(n: int, bits: int = 3) -> int:
    """Smallest ``m * 2^e >= n`` with ``m`` carrying ``bits`` significant
    bits after the leading one (m in [2^bits, 2^(bits+1))).

    Static-capacity rounding: pow2 rounding wastes up to 2x on the arrays
    the expensive tail-sort programs see (measured 8.4M lanes for a 2.2M
    tail at 2^26); 3-bit classes bound the waste at 1/8 while keeping the
    compiled-program variety bounded (8 classes per octave, stable across
    the chunks of a snapshot). Monotone, and a fixed point on its own
    values (class(class(n)) == class(n)) — the slack bounds in
    deposit_coherent rely on both properties."""
    if n <= (1 << bits):
        return max(0, n)
    e = (n - 1).bit_length() - 1 - bits
    return -(-n >> e) << e


def _as_field_matrix(values) -> tuple[jnp.ndarray, bool]:
    values = jnp.asarray(values, jnp.float32)
    single = values.ndim == 1
    if single:
        values = values[None, :]
    if values.shape[0] > 5:
        raise ValueError("pallas deposit supports at most 5 fields per pass")
    return values, single


def _pad_particles_pow2(x, y, h, values, spec: MapSpec, pad_h: float = 1.0):
    """Pad the particle count to the next power of two so compiled programs
    are reused across snapshots/levels (data-dependent subset sizes would
    otherwise force a fresh ~70s XLA sort compile per render). Padding
    particles park at the extent max (clipped into the last tile) with
    weight 0 and smoothing length ``pad_h`` (pick a sub-pixel value when the
    padding must land in the smallest footprint level rather than the
    oversize fallback)."""
    n = x.shape[0]
    # chunk-aligned 12.5% size classes, not pow2: an input just past a
    # power of two (e.g. the coarse-bucketed stream's +3% pad slots after
    # 2^27) would otherwise DOUBLE every padded array and OOM the chip
    n_bucket = _level_bucket(n)
    if n_bucket != n:
        pad = n_bucket - n
        x0, x1, y0, y1 = spec.extent
        x = jnp.pad(x, (0, pad), constant_values=float(x1))
        y = jnp.pad(y, (0, pad), constant_values=float(y1))
        h = jnp.pad(h, (0, pad), constant_values=pad_h)
        values = jnp.pad(values, ((0, 0), (0, pad)))
    return x, y, h, values


def _is_host_f64(x) -> bool:
    return isinstance(x, np.ndarray) and x.dtype == np.float64


def _pad_host_f64(x, y, spec: MapSpec) -> tuple[np.ndarray, np.ndarray]:
    """pow2-pad f64 host coordinates (pads park at the extent max)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.shape[0]
    n_bucket = _level_bucket(n)
    if n_bucket != n:
        pad = n_bucket - n
        x = np.pad(x, (0, pad), constant_values=float(spec.extent[1]))
        y = np.pad(y, (0, pad), constant_values=float(spec.extent[3]))
    return x, y


def _pad_hv(h, values, n_bucket: int, pad_h: float = 1.0):
    """pow2-pad the smoothing-length and value channels (device arrays)."""
    h = jnp.asarray(h, jnp.float32)
    n = h.shape[0]
    if n_bucket != n:
        h = jnp.pad(h, (0, n_bucket - n), constant_values=pad_h)
        values = jnp.pad(values, ((0, 0), (0, n_bucket - n)))
    return h, values


def deposit_2d_pallas(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    level: Optional[PallasDepositConfig] = None,
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
) -> Array:
    """Single-level fused Pallas deposit.

    f64 NumPy coordinates take the quality path (tile-local pixel
    coordinates computed in f64 on the host, engine error ≤1e-5 class at
    any map size); f32/device arrays take the throughput path (device
    conversion, ~1e-4·(px/h)-class conversion noise at 1024^2).

    Every particle footprint must fit the level's K-window
    (``support_factor * h / pixel <= level.max_s_pix``); mixed-footprint
    callers should use :func:`deposit_2d_auto`. Returns (ny, nx) or (F, ny, nx).
    """
    cfg = level or PALLAS_LEVELS[0]
    _check_precision(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kspec = get_kernel(kernel)
    geom = _level_geometry(cfg, spec)
    extent = tuple(float(e) for e in spec.extent)

    values, single = _as_field_matrix(values)
    if _is_host_f64(x):
        # quality path: tile-local coordinates computed in f64 on the host
        # before any f32 cast — the global->local conversion in f32 carries
        # ~6e-5 px of noise at 1024^2, busting the 1e-5 budget for
        # sub-pixel footprints
        xh, yh = _pad_host_f64(x, y, spec)
        tile_id, u_loc, v_loc = _tile_local_coords(
            xh, yh, geom, spec.shape, extent, spec.periodic_wrap
        )
        h, values = _pad_hv(h, values, xh.shape[0])
        img = _cached_level_pipeline_local(
            geom, spec.shape, extent,
            spec.periodic_wrap, spec.sample_offset, values.shape[0],
            kernel, kspec.support_factor, precision, interpret, projection,
        )(jnp.asarray(tile_id), jnp.asarray(u_loc), jnp.asarray(v_loc), h, values)
        return img[0] if single else img

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    x, y, h, values = _pad_particles_pow2(x, y, h, values, spec)

    img = _cached_level_pipeline(
        geom, spec.shape, extent,
        spec.periodic_wrap, spec.sample_offset, values.shape[0],
        kernel, kspec.support_factor, precision, interpret, projection,
    )(x, y, h, values)
    return img[0] if single else img


@lru_cache(maxsize=512)
def _cached_level_pipeline(
    geom, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, projection="kernel3d",
):
    """One jitted program per static config: sort + schedule + pallas + add."""
    fn = partial(
        _deposit_2d_pallas_traced,
        geom=geom, spec_shape=shape, spec_extent=extent, periodic=periodic,
        offset=offset, n_fields=n_fields, kernel=kernel,
        support_factor=support_factor, precision=precision, interpret=interpret,
        projection=projection,
    )
    return jax.jit(fn)


@lru_cache(maxsize=512)
def _cached_level_pipeline_local(
    geom, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, projection="kernel3d",
):
    """As :func:`_cached_level_pipeline`, but taking precomputed tile-local
    coordinates (the host-f64 quality path)."""

    def fn(tile_id, u_loc, v_loc, h, values):
        return _deposit_2d_pallas_traced(
            None, None, h, values,
            geom=geom, spec_shape=shape, spec_extent=extent, periodic=periodic,
            offset=offset, n_fields=n_fields, kernel=kernel,
            support_factor=support_factor, precision=precision,
            interpret=interpret, local_coords=(tile_id, u_loc, v_loc),
            projection=projection,
        )

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Device-resident adaptive-h layout (TiledParticles)
# ---------------------------------------------------------------------------

_LEVEL_STRIDE = 1 << 22  # composite sort key: level * STRIDE + tile_id


@dataclass(frozen=True)
class TiledParticles:
    """Device-resident multi-level tile-sorted particle layout.

    Built once per (particle set, extent) by :func:`tile_particles`; every
    field/map rendered from the same positions reuses the sorted layout — a
    new field is a device gather through ``perm``, not a re-sort
    (``with_values``). Per-level segments are bucketed to powers of two so
    the compiled programs are shared across snapshots.
    """

    spec: MapSpec
    kernel: str
    geoms: tuple  # per populated level: (_LevelGeometry, lo, bucket, count)
    sorted_u: Array  # (2N,) pixel-space coords, (level, tile)-sorted; the
    # second half is slack so per-level reads are lax.dynamic_slice (a
    # clipped-index gather at this size costs seconds on TPU)
    sorted_v: Array
    sorted_h: Array
    sorted_values: Array  # (F, N + slack)
    sorted_tile: Array  # (N + slack,) tile id within the particle's own level
    perm: Optional[Array]  # (N + slack,) original index of each sorted slot
    # (pads: 0); None when built with need_perm=False (drops one operand
    # from the fused sort — with_values is then unavailable)
    n_sorted: int  # real sorted length N (pow2-padded particle count)
    n_oversize: int  # trailing segment routed to the XLA fallback
    n_valid: int  # real (non-padding) particle count

    @property
    def n_fields(self) -> int:
        return self.sorted_values.shape[0]

    def with_values(self, values) -> "TiledParticles":
        """Same layout, new deposit payloads (device gather, no re-sort)."""
        if self.perm is None:
            raise ValueError(
                "layout was built with need_perm=False; rebuild with "
                "tile_particles(..., need_perm=True) to re-render new fields"
            )
        values, _ = _as_field_matrix(values)
        n = values.shape[1]
        if n != self.n_valid:
            raise ValueError(f"expected {self.n_valid} per-particle values, got {n}")
        pad = self.perm.shape[0] - n
        values = jnp.pad(values, ((0, 0), (0, pad)))
        return TiledParticles(
            spec=self.spec, kernel=self.kernel, geoms=self.geoms,
            sorted_u=self.sorted_u, sorted_v=self.sorted_v, sorted_h=self.sorted_h,
            sorted_values=values[:, self.perm],
            sorted_tile=self.sorted_tile, perm=self.perm,
            n_sorted=self.n_sorted, n_oversize=self.n_oversize,
            n_valid=self.n_valid,
        )


def tile_particles(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    levels: tuple[PallasDepositConfig, ...] = PALLAS_LEVELS,
    need_perm: bool = True,
    donate: bool = False,
    layout: str = "auto",
) -> TiledParticles:
    """Build the device-resident multi-level layout.

    Each particle is assigned a footprint level (by ``support_factor * h`` in
    pixels) and its tile id under that level's geometry, then grouped by the
    composite key so every level's segment is internally tile-sorted. The
    only host syncs are the per-level counts (a handful of ints) sizing the
    compiled programs.

    ``layout`` picks the grouping engine on the device path:

    - ``"sort"``: one fused multi-operand ``lax.sort`` on the composite key
      (1.13 s at 2^27 on v5e — SORT_MICRO.json).
    - ``"shear"``: the two-pass row-sort/transpose/run-append grouping
      (:mod:`.layout_shear`) — same contract, ~2x faster at 1e8 scale for
      shuffled input; level segments carry interleaved zero-value pad
      slots (counts include them; the deposit renders them for free).
    - ``"auto"``: currently the sort (the fine key space fragments the
      shear appends at 1024^2-map scale — see layout_shear's docstring);
      random-order production renders should use
      :func:`.layout_shear.deposit_2d_bucketed` instead.
    """
    kspec = get_kernel(kernel)
    values, _ = _as_field_matrix(values)
    n_valid = int(np.asarray(h).shape[0]) if isinstance(h, np.ndarray) else int(h.shape[0])
    host_f64 = _is_host_f64(x)
    # sub-pixel pad h: padding must land in the smallest level's last tile
    # (weight 0), NOT inflate the oversize fallback
    pad_h = 0.1 * min(spec.pixel_size)

    # geometry per level; a level that cannot tile this (small/periodic) map
    # routes its particles to the oversize fallback
    geoms: list[Optional[_LevelGeometry]] = []
    for cfg in levels:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)

    # composite sort keys are level * _LEVEL_STRIDE + tile: a level whose
    # tile count reaches the stride would silently alias into the next
    # level's key range (possible from ~16k^2 maps up)
    for g in geoms:
        if g is not None and g.n_tiles >= _LEVEL_STRIDE:
            raise ValueError(
                f"{g.n_tiles} tiles at the K={g.cfg.K} level exceed the "
                f"composite-key stride ({_LEVEL_STRIDE}); render this map "
                "in sub-extents (the adaptive tile layout caps at "
                "2^22 tiles per level)"
            )

    bounds = tuple(
        (g.cfg.max_s_pix if g is not None else -1.0) for g in geoms
    )
    n_fields = values.shape[0]
    geom_tuples = (
        tuple(g.n_tiles_x if g else 1 for g in geoms),
        tuple(g.cfg.TY if g else 1 for g in geoms),
        tuple(g.tx if g else 1 for g in geoms),
        tuple(g.n_tiles_y if g else 1 for g in geoms),
        tuple(g.cfg.M if g else 0 for g in geoms),
    )
    extent = tuple(float(e) for e in spec.extent)

    if host_f64:
        # quality path: level/tile/local assignment in f64 on the host (see
        # deposit_2d_pallas — global->local in f32 costs ~6e-5 px at 1024^2)
        xh, yh = _pad_host_f64(x, y, spec)
        h_host = np.asarray(h, np.float32)
        if xh.shape[0] != h_host.shape[0]:
            h_host = np.pad(
                h_host, (0, xh.shape[0] - h_host.shape[0]), constant_values=pad_h
            )
        h, values = _pad_hv(h, values, xh.shape[0], pad_h=pad_h)
        ny, nx = spec.shape
        x0, x1, y0, y1 = extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        # fused single-pass native assignment (falls back to the multi-pass
        # NumPy formulation without a C toolchain; bit-identical otherwise)
        from .. import native as _native

        assigned = _native.assign_tiles_f64(
            xh, yh, h_host,
            x0=x0, y0=y0, psx=psx, psy=psy, nx=nx, ny=ny,
            periodic=spec.periodic_wrap, support_factor=kspec.support_factor,
            bounds=bounds, ntx=geom_tuples[0], nty=geom_tuples[3],
            tw=geom_tuples[2], th=geom_tuples[1], marg=geom_tuples[4],
            stride=_LEVEL_STRIDE,
        )
        if assigned is not None:
            key, u_loc, v_loc = assigned
        else:
            u = (xh - x0) / psx
            v = (yh - y0) / psy
            if spec.periodic_wrap:
                u = np.mod(u, nx)
                v = np.mod(v, ny)
            s_pix = kspec.support_factor * h_host.astype(np.float64) / min(psx, psy)
            level, tile, u_loc, v_loc = _multi_level_assign(
                u, v, s_pix, bounds, *geom_tuples, np
            )
            key = (level * _LEVEL_STRIDE + tile).astype(np.int32)
        sorted_key, su, sv, sh, s_values, perm, counts = _cached_tile_sort_local(
            len(bounds), n_fields, need_perm
        )(
            jnp.asarray(key), jnp.asarray(u_loc, jnp.float32),
            jnp.asarray(v_loc, jnp.float32), h, values,
        )
    else:
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        h = jnp.asarray(h, jnp.float32)
        x, y, h, values = _pad_particles_pow2(x, y, h, values, spec, pad_h=pad_h)
        # measured at 2^27 on a 1024^2 map (ROADMAP r5): the fine
        # (level, tile) key space fragments the gang appends — 366K runs,
        # +34.5% zero-value pad slots — eating the sort savings in append
        # issues and deposit lanes, and the destination no longer fits
        # 16 GB alongside the outputs. "auto" therefore keeps the global
        # sort; layout="shear" stays available for smaller key spaces
        # (e.g. <= 256^2 maps) where runs stay long. The production
        # random-order path is the coarse-bucket variant feeding the
        # coherent engine (ops.layout_shear.deposit_2d_bucketed).
        use_shear = layout == "shear"
        if use_shear:
            from .layout_shear import shear_tile_sort

            level_n_tiles = tuple(
                (g.n_tiles if g is not None else 0) for g in geoms
            )
            compact_bases = tuple(
                int(b) for b in np.concatenate([[0], np.cumsum(level_n_tiles)])
            )
            assign = _cached_assign(
                spec.shape, extent, spec.periodic_wrap, bounds,
                *geom_tuples, kspec.support_factor,
                compact_bases=compact_bases,
            )
            sorted_key, su, sv, sh, s_values, perm, counts = shear_tile_sort(
                None, None, None, h, values,
                raw_xy=(x, y), assign=assign,
                level_stride=_LEVEL_STRIDE,
                level_n_tiles=level_n_tiles,
                n_fields=n_fields, need_perm=need_perm, n_valid=n_valid,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            sorted_key, su, sv, sh, s_values, perm, counts = _cached_tile_sort(
                spec.shape, extent, spec.periodic_wrap,
                bounds, *geom_tuples,
                kspec.support_factor, n_fields, need_perm, donate,
            )(x, y, h, values)

    counts_host = np.asarray(counts)  # host sync: len(levels)+1 ints
    level_meta = []
    lo = 0
    for li, g in enumerate(geoms):
        c = int(counts_host[li])
        if g is not None and c > 0:
            level_meta.append((g, lo, _level_bucket(c), c))
        lo += c

    return TiledParticles(
        spec=spec, kernel=kernel, geoms=tuple(level_meta),
        sorted_u=su, sorted_v=sv, sorted_h=sh, sorted_values=s_values,
        sorted_tile=sorted_key, perm=perm,
        # shear-layout counts include interleaved zero-value pad slots, so
        # the data region is the counts total, not the padded input length
        n_sorted=int(counts_host.sum()),
        n_oversize=int(counts_host[len(geoms)]),
        n_valid=n_valid,
    )


def _multi_level_assign(u, v, s_pix, bounds, n_tiles_x_t, ty_t, tx_t, n_tiles_y_t, m_t, xp):
    """(level, tile id, tile-LOCAL coords) per particle, each under its own
    level's geometry. Oversize/disabled-level particles keep GLOBAL pixel
    coordinates (tile 0) so the dense fallback can recover world positions.
    Works in numpy (host f64 quality path) or jnp (device f32 path)."""
    n_levels = len(bounds)
    level = xp.full(u.shape, n_levels, xp.int32)
    for li in range(n_levels - 1, -1, -1):
        if bounds[li] >= 0:
            level = xp.where(s_pix <= bounds[li], xp.int32(li), level)
    tile = xp.zeros(u.shape, xp.int32)
    u_loc = u
    v_loc = v
    for li in range(n_levels):
        if bounds[li] < 0:
            continue
        tx_i = xp.clip((u / tx_t[li]).astype(xp.int32), 0, n_tiles_x_t[li] - 1)
        ty_i = xp.clip((v / ty_t[li]).astype(xp.int32), 0, n_tiles_y_t[li] - 1)
        sel = level == li
        tile = xp.where(sel, ty_i * n_tiles_x_t[li] + tx_i, tile)
        u_loc = xp.where(sel, u - (tx_i * tx_t[li] - m_t[li]), u_loc)
        v_loc = xp.where(sel, v - (ty_i * ty_t[li] - m_t[li]), v_loc)
    return level, tile, u_loc, v_loc


def _tile_sort_tail(key, u_loc, v_loc, h, values, n_levels, n_fields,
                    need_perm: bool = True):
    """Composite-key sort + per-level counts + N/2 slack padding."""
    # payloads ride the sort (see note in _deposit_2d_pallas_traced); the
    # original-index operand is optional — dropping it saves one sorted
    # operand (~10% of the sort wall) when re-rendering via with_values is
    # not needed (the streaming/benchmark hot paths)
    operands = [key, u_loc, v_loc, h]
    if need_perm:
        operands.append(jnp.arange(key.shape[0], dtype=jnp.int32))
    # is_stable=False: grouping only needs key order (28% faster on v5e)
    sorted_ops = jax.lax.sort(
        operands + [values[f] for f in range(n_fields)], num_keys=1,
        is_stable=False,
    )
    sorted_key, su, sv, sh = sorted_ops[:4]
    perm = sorted_ops[4] if need_perm else None
    s_vals = sorted_ops[4 + int(need_perm):]
    s_values = jnp.stack(s_vals, axis=0)
    lv = jnp.arange(n_levels + 1, dtype=jnp.int32) * _LEVEL_STRIDE
    starts = jnp.searchsorted(sorted_key, lv).astype(jnp.int32)
    ends = jnp.searchsorted(
        sorted_key, lv + (_LEVEL_STRIDE - 1), side="right"
    ).astype(jnp.int32)
    counts = ends - starts
    s_tile = sorted_key - (sorted_key // _LEVEL_STRIDE) * _LEVEL_STRIDE
    # N/2 slack so every level segment (offset lo, pow2 bucket) is a
    # lax.dynamic_slice, never a gather. lo + bucket <= N + slack always:
    # bucket = max(CHUNK, next_pow2(c)) and lo <= N - c; for
    # next_pow2(c) <= CHUNK the end is <= N + CHUNK, otherwise the overhang
    # next_pow2(c) - c < c <= N/2 for c <= N/2, and for c > N/2 bucket = N
    # with lo + N <= 2N - c < 1.5N.
    n = key.shape[0]
    slack = max(n // 2, _CHUNK)
    pad1 = lambda a: jnp.pad(a, (0, slack))
    return (
        pad1(s_tile), pad1(su), pad1(sv), pad1(sh),
        jnp.pad(s_values, ((0, 0), (0, slack))),
        pad1(perm) if need_perm else None, counts,
    )


@lru_cache(maxsize=256)
def _cached_assign(
    shape, extent, periodic, bounds, n_tiles_x_t, ty_t, tx_t, n_tiles_y_t,
    m_t, support_factor, compact_bases=None,
):
    """Key assignment only (the shear layout groups separately).

    ``compact_bases`` (per-level key starts) makes the key compact
    (``bases[level] + tile``) instead of strided; the returned callable is
    cached so it is a stable static argument for the shear stage-A jit
    (which traces through it to fuse assignment with the sorts)."""

    def run(x, y, h):
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
            u, v, s_pix, bounds, n_tiles_x_t, ty_t, tx_t, n_tiles_y_t, m_t, jnp
        )
        if compact_bases is not None:
            key = jnp.asarray(compact_bases, jnp.int32)[level] + tile
        else:
            key = level * _LEVEL_STRIDE + tile
        return key, u_loc, v_loc

    return run


@lru_cache(maxsize=256)
def _cached_tile_sort(
    shape, extent, periodic, bounds, n_tiles_x_t, ty_t, tx_t, n_tiles_y_t,
    m_t, support_factor, n_fields, need_perm=True, donate=False,
):
    """``donate=True`` lets XLA reuse the caller's input buffers as sort
    scratch — at 1e8-particle scale the layout + sort double-buffers brush
    the 16 GB HBM without it. Callers' arrays are invalidated."""
    n_levels = len(bounds)

    def run(x, y, h, values):
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
            u, v, s_pix, bounds, n_tiles_x_t, ty_t, tx_t, n_tiles_y_t, m_t, jnp
        )
        key = level * _LEVEL_STRIDE + tile
        return _tile_sort_tail(
            key, u_loc, v_loc, h, values, n_levels, n_fields, need_perm
        )

    return jax.jit(run, donate_argnums=(0, 1, 2, 3) if donate else ())


@lru_cache(maxsize=64)
def _cached_tile_sort_local(n_levels, n_fields, need_perm=True):
    """Sort tail for host-precomputed (key, local coords) — the f64 quality
    path computes the level/tile/local assignment on the host."""

    @jax.jit
    def run(key, u_loc, v_loc, h, values):
        return _tile_sort_tail(
            key, u_loc, v_loc, h, values, n_levels, n_fields, need_perm
        )

    return run


def _deposit_level_from_layout(
    tp: TiledParticles, meta, precision: str, interpret: bool,
    projection: str = "kernel3d",
) -> Array:
    """Render one level from the sorted layout: gather its (bucketed) segment
    and run the flat-grid pallas pass. Device-only."""
    geom, lo, bucket, count = meta
    return _cached_layout_level(
        geom, tp.spec.shape, tuple(float(e) for e in tp.spec.extent),
        tp.spec.periodic_wrap, tp.spec.sample_offset, tp.n_fields,
        tp.kernel, get_kernel(tp.kernel).support_factor, precision, interpret,
        bucket, projection,
    )(tp.sorted_u, tp.sorted_v, tp.sorted_h, tp.sorted_values, tp.sorted_tile,
      jnp.int32(lo), jnp.int32(count))


def _layout_level_body(
    geom, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, bucket, projection,
    su, sv, sh, s_values, s_tile, lo, count,
):
    """Traced body: render one level from the sorted layout (gather the
    level's bucketed segment, run the flat-grid Pallas pass, overlap-add)."""
    C = _CHUNK
    cfg, tx = geom.cfg, geom.tx
    ny, nx = shape
    x0, x1, y0, y1 = extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny
    n_rows = bucket // C
    n_tiles = geom.n_tiles
    n_steps = n_rows + 2 * n_tiles

    # contiguous dynamic_slice reads (the layout arrays carry 2N slack so
    # lo + bucket never overruns); a clipped-index gather here cost ~6 s
    # at 33M particles on v5e
    live = jnp.arange(bucket, dtype=jnp.int32) < count
    u = jax.lax.dynamic_slice(su, (lo,), (bucket,))
    v = jax.lax.dynamic_slice(sv, (lo,), (bucket,))
    h = jnp.where(live, jax.lax.dynamic_slice(sh, (lo,), (bucket,)), 1.0)
    vals = jnp.where(
        live[None, :],
        jax.lax.dynamic_slice(s_values, (0, lo), (s_values.shape[0], bucket)),
        0.0,
    )
    # pad slots sort to a synthetic tile past the last so ranges stay sorted
    tile = jnp.where(
        live,
        jax.lax.dynamic_slice(s_tile, (lo,), (bucket,)),
        n_tiles,
    ).astype(jnp.int32)

    pstart, pcount, block_start, nchunks = _tile_ranges(tile, n_tiles, C)
    sched, tile_off = _step_schedule(nchunks, n_tiles, n_steps)
    packed = _pack_channels(
        [u, v, h] + [vals[f] for f in range(n_fields)], n_fields, n_rows, C
    )
    tiles = _cached_deposit_call(
        cfg, geom.n_tiles_x, geom.n_tiles_y, n_steps, n_rows, n_fields, tx,
        kernel, support_factor, psx, psy, offset, precision, interpret,
        projection,
    )(sched, block_start, tile_off, pstart, pcount, packed)
    return _overlap_add(
        tiles, cfg, tx, geom.n_tiles_y, geom.n_tiles_x, n_fields, ny, nx,
        periodic,
    )


@lru_cache(maxsize=512)
def _cached_layout_level(
    geom, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, bucket,
    projection="kernel3d",
):
    @jax.jit
    def run(su, sv, sh, s_values, s_tile, lo, count):
        return _layout_level_body(
            geom, shape, extent, periodic, offset, n_fields, kernel,
            support_factor, precision, interpret, bucket, projection,
            su, sv, sh, s_values, s_tile, lo, count,
        )

    return run


@lru_cache(maxsize=256)
def _cached_layout_all_levels(
    metas_static, shape, extent, periodic, offset, n_fields,
    kernel, support_factor, precision, interpret, projection,
):
    """ONE jitted program rendering every populated level and summing the
    maps. Separate per-level programs each pay the execution-dispatch
    round-trip (60-100 ms through the axon tunnel — a K=64 level with 2k
    particles measured 0.11 s); fusing all levels into a single program
    makes the adaptive stack one dispatch."""

    @jax.jit
    def run(su, sv, sh, s_values, s_tile, los, counts):
        ny, nx = shape
        total = jnp.zeros((n_fields, ny, nx), jnp.float32)
        for i, (geom, bucket) in enumerate(metas_static):
            total = total + _layout_level_body(
                geom, shape, extent, periodic, offset, n_fields, kernel,
                support_factor, precision, interpret, bucket, projection,
                su, sv, sh, s_values, s_tile, los[i], counts[i],
            )
        return total

    return run


def deposit_tiled(
    tp: TiledParticles,
    *,
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
) -> Array:
    """Render the full adaptive-h map stack from a :class:`TiledParticles`
    layout. All levels run device-resident; only oversize-footprint
    stragglers (footprint > the largest K-window) fall back to the XLA dense
    path. Returns (F, ny, nx).
    """
    _check_precision(precision)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ny, nx = tp.spec.shape
    if tp.geoms:
        metas_static = tuple((meta[0], meta[2]) for meta in tp.geoms)
        los = jnp.asarray([int(meta[1]) for meta in tp.geoms], jnp.int32)
        counts = jnp.asarray([int(meta[3]) for meta in tp.geoms], jnp.int32)
        total = _cached_layout_all_levels(
            metas_static, tp.spec.shape,
            tuple(float(e) for e in tp.spec.extent), tp.spec.periodic_wrap,
            tp.spec.sample_offset, tp.n_fields, tp.kernel,
            get_kernel(tp.kernel).support_factor, precision, interpret,
            projection,
        )(tp.sorted_u, tp.sorted_v, tp.sorted_h, tp.sorted_values,
          tp.sorted_tile, los, counts)
    else:
        total = jnp.zeros((tp.n_fields, ny, nx), jnp.float32)

    if tp.n_oversize:
        from .deposit import deposit_2d  # late import: sibling module

        # oversize stragglers live at the end of the (real) sorted layout;
        # recover world coordinates from pixel space for the dense path
        x0, x1, y0, y1 = tp.spec.extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        sl = slice(tp.n_sorted - tp.n_oversize, tp.n_sorted)
        xo = np.asarray(tp.sorted_u[sl]) * psx + x0
        yo = np.asarray(tp.sorted_v[sl]) * psy + y0
        ho = np.asarray(tp.sorted_h[sl])
        vo = np.asarray(tp.sorted_values[:, sl])
        img = deposit_2d(
            xo, yo, ho, vo.T, tp.spec, kernel=tp.kernel, projection=projection
        )
        total = total + jnp.moveaxis(
            img if img.ndim == 3 else img[..., None], -1, 0
        )
    return total


def deposit_2d_auto(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    precision: Optional[str] = None,
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
):
    """Adaptive-h deposit: device-resident level/tile partition (one fused
    sort), one fused Pallas pass per populated footprint level, oversize
    stragglers routed to the XLA dense path.

    ``projection``: 'kernel3d' reproduces the reference convention (3D kernel
    at the projected radius); 'integrated' uses the analytically
    line-integrated kernel (physically-correct column densities).
    ``precision``: defaults to 'bf16x3' on the host-f64 quality path (the
    two-limb split's ~2^-17 per-contribution floor shows up as ~1.1e-5 on
    sub-pixel footprints; the third limb costs one extra matmul per column
    offset) and 'bf16x2' for device/f32 inputs (throughput mode, where f32
    input quantization dominates anyway).
    Returns (ny, nx) for single-field input, else (F, ny, nx).
    """
    if precision is None:
        precision = "bf16x3" if _is_host_f64(x) else "bf16x2"
    _check_precision(precision)
    values, single = _as_field_matrix(values)
    tp = tile_particles(x, y, h, values, spec, kernel=kernel)
    total = deposit_tiled(
        tp, precision=precision, interpret=interpret, projection=projection
    )
    return total[0] if single else total
