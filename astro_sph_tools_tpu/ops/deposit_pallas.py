"""Fused Pallas TPU deposit pass — the north-star inner loop.

Replaces XLA scatter-add (measured ~1.6M particles/s on v5e: TPU scatter
serializes) with a scatter-free pipeline:

1. **Bin**: particles are assigned to image tiles (TY x TX pixels) by their
   *center*; no duplication. Footprint spill into neighbouring tiles is
   captured by a margin M = K/2 on every side of the tile accumulator.
2. **Sort**: one sort by tile id (``jax.lax.sort`` with payload operands) —
   amortised across all fields/maps rendered from the same particle set.
3. **Pallas pass**: grid = (tile, chunk). Each step DMAs a chunk of C=512
   particles (channel-packed SoA block), evaluates the SPH kernel on the
   (R = TY + K rows) x (K cols) x (C particles) footprint block with pure VPU
   polynomial work, and *places* the weighted contributions into the tile's
   extended accumulator — which lives in VMEM across all of the tile's
   chunks — with a single MXU matmul against a one-hot column-placement
   matrix:  acc[F*R, S] += W[F*R, K*C] @ P[K*C, S],  P[(k,c), s] = [s == col0(c)+k].
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
matmul's row dimension (F*R <= 128 keeps the MXU tile full), so a multi-field
map stack costs barely more than a single map (the north-star workload).
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

from ..kernels.splines import get_kernel
from .deposit import MapSpec

Array = jax.Array

_CHUNK = 512  # particles per Pallas grid step
_LANES = 128  # accumulator width S


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


PALLAS_LEVELS: tuple[PallasDepositConfig, ...] = (
    PallasDepositConfig(K=8),
    PallasDepositConfig(K=16),
    PallasDepositConfig(K=32),
    PallasDepositConfig(K=64),  # deep maps: 1024^2 over a full box puts
    # typical SPH footprints at 10-30 px; without this level they would
    # spill to the slow XLA dense path
)


def _deposit_kernel(
    # scalar prefetch (4)
    block_start_ref,  # (n_tiles,) first particle-chunk row of each tile
    pstart_ref,  # (n_tiles,) first sorted-particle index of each tile
    pcount_ref,  # (n_tiles,) particle count of each tile
    nchunks_ref,  # (n_tiles,) chunks each tile must process
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
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    K, R, S, TY, M = cfg.K, cfg.R, cfg.S, cfg.TY, cfg.M
    kernel = get_kernel(kernel_name)

    @pl.when(j == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < nchunks_ref[t])
    def _work():
        data = chunk_ref[0]  # (8, C)
        u = data[0:1, :]  # (1, C) pixel-space x
        v = data[1:2, :]
        h = data[2:3, :]  # world-unit smoothing length

        # validity: this chunk window may over-read neighbours' particles;
        # padded lanes carry h = 0 whose NaN weights are also masked here
        base = (block_start_ref[t] + j) * C
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        gidx = base + lane
        valid = (gidx >= pstart_ref[t]) & (gidx < pstart_ref[t] + pcount_ref[t])

        # local pixel coordinates relative to the extended tile origin
        ty_i = t // n_tiles_x
        tx_i = t - ty_i * n_tiles_x
        u_loc = u - (tx_i * tx - M).astype(jnp.float32)
        v_loc = v - (ty_i * TY - M).astype(jnp.float32)

        # column window start (extended-tile coords), (1, C)
        col0 = jnp.floor(u_loc - offset + 0.5).astype(jnp.int32) - (K // 2)

        # dy over (R, C): world-unit y offsets of every accumulator row
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0).astype(jnp.float32)
        dyp = (r_iota + offset - v_loc) * psy
        dy2 = dyp * dyp

        # particle-major copies for the placement matrix (C in sublanes)
        col0_s = col0.reshape(C, 1)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (C, S), 1)

        vals = data[3 : 3 + n_fields, :]  # (F, C)

        # Per column offset k: weights (F*R, C) and one-hot placement (C, S),
        # accumulated over a fori_loop (keeps Mosaic compile size flat in K —
        # a fully unrolled+concatenated variant compiled ~10x slower).
        # NOTE on matmul precision: one-hot operands are exact in bf16, and
        # TPU f32 dots default to bf16 multiplication, so 'f32' must request
        # Precision.HIGHEST explicitly.
        def k_step(k, contrib):
            dxk = ((col0 + k).astype(jnp.float32) + offset - u_loc) * psx  # (1, C)
            r = jnp.sqrt(dy2 + dxk * dxk)
            wk = kernel.w(r, h)  # (R, C); zero outside support by definition
            wk = jnp.where(valid, wk, 0.0)
            # field-stacked rows: (F*R, C)
            w_rows = jnp.concatenate(
                [wk * vals[f : f + 1, :] for f in range(n_fields)], axis=0
            )
            Pk = s_iota == (col0_s + k)  # (C, S) exact one-hot
            if precision == "f32":
                return contrib + jnp.dot(
                    w_rows, Pk.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            if precision == "bf16":
                return contrib + jnp.dot(
                    w_rows.astype(jnp.bfloat16), Pk.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            # bf16x2: exact placement, split weights (hi + residual)
            Pb = Pk.astype(jnp.bfloat16)
            hi = w_rows.astype(jnp.bfloat16)
            lo = (w_rows - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (
                contrib
                + jnp.dot(hi, Pb, preferred_element_type=jnp.float32)
                + jnp.dot(lo, Pb, preferred_element_type=jnp.float32)
            )

        contrib = jax.lax.fori_loop(
            0, K, k_step, jnp.zeros((n_fields * R, S), jnp.float32)
        )
        acc_ref[0] += contrib


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


@partial(
    jax.jit,
    static_argnames=(
        "n_fields", "extent", "shape", "periodic", "tile_ty", "n_tiles_x", "n_tiles_y", "tx",
    ),
)
def _prepare_impl(
    x, y, h, values,
    *, n_fields, extent, shape, periodic, tile_ty, n_tiles_x, n_tiles_y, tx,
):
    C = _CHUNK
    x0, x1, y0, y1 = extent
    ny, nx = shape
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny

    u = (x - x0) / psx
    v = (y - y0) / psy
    if periodic:
        u = jnp.mod(u, nx)
        v = jnp.mod(v, ny)

    tx_i = jnp.clip((u / tx).astype(jnp.int32), 0, n_tiles_x - 1)
    ty_i = jnp.clip((v / tile_ty).astype(jnp.int32), 0, n_tiles_y - 1)
    tile_id = (ty_i * n_tiles_x + tx_i).astype(jnp.int32)

    operands = [tile_id, u, v, h] + [values[f] for f in range(n_fields)]
    sorted_ops = jax.lax.sort(operands, num_keys=1)
    tile_sorted = sorted_ops[0]
    n = x.shape[0]
    n_tiles = n_tiles_x * n_tiles_y

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    pstart = jnp.searchsorted(tile_sorted, tile_range).astype(jnp.int32)
    pend = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    pcount = pend - pstart
    block_start = pstart // C
    nchunks = (pend + C - 1) // C - block_start

    n_pad = max(C, ((n + C - 1) // C) * C)
    n_rows = n_pad // C

    def pack(a):
        return jnp.pad(a, (0, n_pad - n)).reshape(n_rows, C)

    channels = [pack(sorted_ops[1]), pack(sorted_ops[2]), pack(sorted_ops[3])]
    channels += [pack(sorted_ops[4 + f]) for f in range(n_fields)]
    channels += [jnp.zeros((n_rows, C), jnp.float32)] * (8 - len(channels))
    packed = jnp.stack(channels, axis=1)  # (n_rows, 8, C)
    return packed, block_start, pstart, pcount, nchunks


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def prepare_tiled_particles(
    x, y, h, values, spec: MapSpec, cfg: PallasDepositConfig,
    *, n_tiles_x: int, n_tiles_y: int, tx: int,
):
    """Sort particles by tile and pack channel blocks for the Pallas pass.

    One fused jit program (sort + ranges + pack); the only host sync is the
    jmax reduction sizing the grid — amortised over every field/map rendered
    from the same particle set.

    The particle count is padded to the next power of two so compiled
    programs are reused across snapshots/levels (data-dependent level-subset
    sizes would otherwise force a fresh ~70s XLA sort compile per render).
    Padding particles carry h = 1 with value 0 and sort to the last tile.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    if values.ndim == 1:
        values = values[None, :]
    n_fields = values.shape[0]
    if n_fields > 5:
        raise ValueError("pallas deposit supports at most 5 fields per pass")

    n = x.shape[0]
    n_bucket = max(_CHUNK, _next_pow2(n))
    if n_bucket != n:
        pad = n_bucket - n
        x0, x1, y0, y1 = spec.extent
        # park padding at the extent max: clipped into the last tile, weight 0
        x = jnp.pad(x, (0, pad), constant_values=float(x1))
        y = jnp.pad(y, (0, pad), constant_values=float(y1))
        h = jnp.pad(h, (0, pad), constant_values=1.0)
        values = jnp.pad(values, ((0, 0), (0, pad)))

    packed, block_start, pstart, pcount, nchunks = _prepare_impl(
        x, y, h, values,
        n_fields=n_fields,
        extent=tuple(float(e) for e in spec.extent),
        shape=spec.shape,
        periodic=spec.periodic_wrap,
        tile_ty=cfg.TY,
        n_tiles_x=n_tiles_x,
        n_tiles_y=n_tiles_y,
        tx=tx,
    )
    jmax = int(jnp.max(nchunks)) if x.shape[0] else 1  # host sync
    # bucket the grid's chunk dimension too: jmax is a static grid size, so
    # distinct values would recompile the pallas call (skipped steps are cheap)
    jmax = _next_pow2(max(jmax, 1))
    return packed, block_start, pstart, pcount, nchunks, jmax, n_fields


def deposit_2d_pallas(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    level: Optional[PallasDepositConfig] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Single-level fused Pallas deposit.

    Every particle footprint must fit the level's K-window
    (``support_factor * h / pixel <= level.max_s_pix``); mixed-footprint
    callers should use :func:`deposit_2d_auto`. Returns (ny, nx) or (F, ny, nx).
    """
    cfg = level or PALLAS_LEVELS[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kspec = get_kernel(kernel)
    ny, nx = spec.shape
    x0, x1, y0, y1 = spec.extent
    psx = (x1 - x0) / nx
    psy = (y1 - y0) / ny

    tx = _choose_tx(cfg, nx, spec.periodic_wrap)
    n_tiles_x = (nx + tx - 1) // tx
    n_tiles_y = (ny + cfg.TY - 1) // cfg.TY
    if spec.periodic_wrap and ny % cfg.TY:
        raise ValueError("periodic pallas deposit requires TY | ny")

    (packed, block_start, pstart, pcount, nchunks, jmax, n_fields) = (
        prepare_tiled_particles(
            x, y, h, values, spec, cfg,
            n_tiles_x=n_tiles_x, n_tiles_y=n_tiles_y, tx=tx,
        )
    )

    tiles = _cached_deposit_call(
        cfg, n_tiles_x, n_tiles_y, jmax, packed.shape[0], n_fields, tx,
        kernel, kspec.support_factor, psx, psy, spec.sample_offset, precision,
        interpret,
    )(block_start, pstart, pcount, nchunks, packed)

    img = _cached_overlap_add(cfg, tx, n_tiles_y, n_tiles_x, n_fields, ny, nx, spec.periodic_wrap)(
        tiles
    )
    return img[0] if n_fields == 1 else img


@lru_cache(maxsize=512)
def _cached_deposit_call(
    cfg, n_tiles_x, n_tiles_y, jmax, n_rows, n_fields, tx,
    kernel, support_factor, psx, psy, offset, precision, interpret,
):
    """Build (once per static configuration) the jitted pallas call.

    ``pl.pallas_call`` constructs a fresh traced callable every invocation;
    without this cache every render re-traces the kernel (~0.5 s — 6x the
    actual 16M-particle deposit time).
    """
    n_tiles = n_tiles_x * n_tiles_y
    # The input block is DMA'd for every grid step regardless of the
    # pl.when(j < nchunks) skip in the kernel body, so the block index MUST
    # be clamped: an out-of-range bs[t]+j on the trailing steps of sparse
    # tiles reads past the packed array and crashes the device.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles, jmax),
        in_specs=[
            pl.BlockSpec(
                (1, 8, _CHUNK),
                lambda t, j, bs, ps, pc, nc: (jnp.minimum(bs[t] + j, n_rows - 1), 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_fields * cfg.R, cfg.S), lambda t, j, bs, ps, pc, nc: (t, 0, 0)
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
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_fields * cfg.R, cfg.S), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(call)


@lru_cache(maxsize=512)
def _cached_overlap_add(cfg, tx, n_tiles_y, n_tiles_x, n_fields, ny, nx, periodic):
    return jax.jit(
        lambda tiles: _overlap_add(
            tiles, cfg, tx, n_tiles_y, n_tiles_x, n_fields, ny, nx, periodic
        )
    )


def deposit_2d_auto(
    x, y, h, values, spec: MapSpec,
    *,
    kernel: str = "cubic_spline",
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
):
    """Adaptive-h deposit: partition particles by footprint into Pallas levels,
    routing oversize footprints to the XLA stencil/dense path (host-side
    binning, one fused pass per populated level, images summed).

    Returns (ny, nx) for single-field input, else (F, ny, nx).
    """
    from .deposit import deposit_2d  # late import: sibling module

    x = np.asarray(x)
    y = np.asarray(y)
    h_np = np.asarray(h)
    values_np = np.asarray(values)
    single = values_np.ndim == 1
    if single:
        values_np = values_np[None, :]
    kspec = get_kernel(kernel)
    px = min(spec.pixel_size)
    s_pix = kspec.support_factor * h_np / px

    bounds = [cfg.max_s_pix for cfg in PALLAS_LEVELS]
    level_idx = np.searchsorted(np.asarray(bounds), s_pix, side="left")

    ny, nx = spec.shape
    total = jnp.zeros((values_np.shape[0], ny, nx), jnp.float32)
    for li, cfg in enumerate(PALLAS_LEVELS):
        idx = np.nonzero(level_idx == li)[0]
        if idx.size == 0:
            continue
        try:
            _choose_tx(cfg, nx, spec.periodic_wrap)
        except ValueError:
            # level cannot tile this (small) map: route to the XLA fallback
            level_idx[idx] = len(PALLAS_LEVELS)
            continue
        img = deposit_2d_pallas(
            x[idx], y[idx], h_np[idx], values_np[:, idx], spec,
            kernel=kernel, precision=precision, level=cfg, interpret=interpret,
        )
        total = total + (img[None] if img.ndim == 2 else img)

    oversize = np.nonzero(level_idx >= len(PALLAS_LEVELS))[0]
    if oversize.size:
        img = deposit_2d(
            x[oversize], y[oversize], h_np[oversize], values_np[:, oversize].T,
            spec, kernel=kernel,
        )
        total = total + jnp.moveaxis(img if img.ndim == 3 else img[..., None], -1, 0)

    return total[0] if single else total
