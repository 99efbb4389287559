"""Fused Pallas absorption-spectra engine (config 4 at scale).

Same physics as :func:`ops.spectra.absorption_spectra` (SpecWizard-style
velocity-space optical depth: kernel column weight at the ray's impact
parameter, Doppler/thermally smeared along velocity), executed on the flat
work-list architecture of :mod:`ops.sightlines_pallas`:

- particles ride the SAME composite (level, cell) sort and host schedule —
  the value channels are [column payload, v_eff, b_doppler];
- per (ray-block, particle-chunk) step the kernel evaluates the (B, C)
  column weights on the VPU (Clenshaw line-integral fit), builds the (C,
  n_bins) Gaussian velocity profile, and accumulates
  ``tau[B, n_bins] += w_col @ phi`` on the MXU. Both operands are split
  hi/lo bf16 (4 exact-product matmuls, f32 accumulate) so the matmul error
  stays ~2^-17 — inside the 1e-5 agreement budget with the dense engine.

The binned engine (`ops.spectra.absorption_spectra_binned`) remains the
portable oracle; this pass replaces its serialized scan/fori inner loop at
the 1e4-ray x 1e7-particle BASELINE config-4 scale.
"""

from __future__ import annotations

import math
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
from .spectra import _resolve_profile, doppler_parameter_kms, voigt_hjerting
from .sightlines_pallas import (
    _C,
    _RAY_BATCH,
    _UNIT_MASK,
    _WORK_BIT,
    _ZERO_BIT,
    _build_schedule,
    _cached_prep,
    _choose_grids,
    _next_pow2,
    _stage_ray_levels,
)

Array = jax.Array

# Rays per block. Unlike the sightline columns (B=8), the spectra kernel
# builds a (C, n_bins) Gaussian profile PER STEP that is amortised over the
# block's rays — larger blocks trade wider candidate windows (more scanned
# particles) for n_bins-profile reuse and better MXU fill in the
# (B, C) @ (C, n_bins) accumulation. v5e sweep at the config-4 shape:
# B=8 1.9 s, B=16 1.31 s, B=32 1.23 s, B=64 2.3 s steady.
_B = 32


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _spectra_kernel(
    sched_ref, ub_ref, ulo_ref, uhi_ref, uoff_ref, vparam_ref,  # scalar prefetch
    rays_ref,  # (1, 2, B, 128)
    chunk_ref,  # (1, 8, C): channels [x, y, h, N, v_eff, b_dopp]
    acc_ref,  # (1, B, n_bins)
    *,
    n_bins: int,
    kernel_name: str,
    cheb: tuple[float, ...],
    periodic: bool,
    Lx: float,
    Ly: float,
    n_vel_images: int,
    wrap_velocity: bool,
    profile: str = "gaussian",
    voigt_k: float = 0.0,
):
    s = pl.program_id(0)
    w0 = sched_ref[s]
    u = w0 & _UNIT_MASK

    @pl.when(((w0 >> _ZERO_BIT) & 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(((w0 >> _WORK_BIT) & 1) == 1)
    def _work():
        S = get_kernel(kernel_name).support_factor
        data = chunk_ref[0]  # (8, C)
        xs = data[0:1, :]
        ys = data[1:2, :]
        hs = data[2:3, :]
        rblk = rays_ref[0]
        rx = rblk[0, :, 0:1]  # (B, 1)
        ry = rblk[1, :, 0:1]
        dx = rx - xs
        dy = ry - ys
        if periodic:
            dx = dx - jnp.round(dx * (1.0 / Lx)) * Lx
            dy = dy - jnp.round(dy * (1.0 / Ly)) * Ly
        b2 = dx * dx + dy * dy  # (B, C)

        base = (ulo_ref[u] // _C + (s - uoff_ref[u])) * _C
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        gidx = base + lane
        live = (gidx >= ulo_ref[u]) & (gidx < uhi_ref[u])

        sh = S * hs
        tq = b2 / (sh * sh)
        y = clenshaw(2.0 * jnp.clip(tq, 0.0, 1.0) - 1.0, cheb)
        w_col = jnp.where((tq < 1.0) & live, y / (hs * hs), 0.0)
        w_col = w_col * data[3:4, :]  # x column payload N_i -> (B, C)

        # Gaussian velocity profile phi (C, n_bins), integral over v = 1
        v0 = vparam_ref[0]
        dv_bin = vparam_ref[1]
        v_box = vparam_ref[2]
        v_eff = data[4:5, :].reshape(_C, 1)  # (C, 1)
        b_dop = data[5:6, :].reshape(_C, 1)
        # integer iota -> f32: Mosaic's tpu.iota only produces integers
        bins = (
            jax.lax.broadcasted_iota(jnp.int32, (_C, n_bins), 1).astype(jnp.float32)
            + 0.5
        ) * dv_bin + v0  # (C, n_bins)
        dv = bins - v_eff
        inv_b = 1.0 / b_dop
        if wrap_velocity:
            # periodic velocity space: wrap to the principal zone, then sum
            # only the images the widest Gaussian can actually reach
            # (n_vel_images is sized from b_max at call time — for typical
            # Doppler widths it is 0 and phi is a single exp, not 7)
            dv = dv - jnp.round(dv * (1.0 / v_box)) * v_box
        if profile == "voigt":
            # Voigt damping wings (a = voigt_k / b per particle); same
            # second-order Hjerting expansion as the XLA oracle engine
            one = lambda z: voigt_hjerting(voigt_k * inv_b, z)
        else:
            one = lambda z: jnp.exp(-(z * z))
        if n_vel_images:
            phi = jnp.zeros((_C, n_bins), jnp.float32)
            for k in range(-n_vel_images, n_vel_images + 1):
                phi = phi + one((dv + k * v_box) * inv_b)
        else:
            phi = one(dv * inv_b)
        phi = phi * ((1.0 / math.sqrt(math.pi)) * inv_b)

        # tau += w_col @ phi with hi/lo bf16 splits (exact bf16 products,
        # f32 accumulate; residual ~2^-17)
        # the w limbs ride row-concatenated (2B rows) so each p-limb dot
        # fills twice the MXU rows a (B, C) x (C, n_bins) dot would
        w_hi, w_lo = _split_bf16(w_col)
        p_hi, p_lo = _split_bf16(phi)
        w2 = jnp.concatenate([w_hi, w_lo], axis=0)
        B = w_col.shape[0]
        d1 = jnp.dot(w2, p_hi, preferred_element_type=jnp.float32)
        d2 = jnp.dot(w2, p_lo, preferred_element_type=jnp.float32)
        acc_ref[0] += (d1[:B] + d1[B:]) + (d2[:B] + d2[B:])


@lru_cache(maxsize=128)
def _cached_spectra_engine(
    n_blocks: int,
    n_steps: int,
    n_rows: int,
    n_bins: int,
    kernel_name: str,
    periodic: bool,
    Lx: float,
    Ly: float,
    n_vel_images: int,
    wrap_velocity: bool,
    n_rays: int,
    n_pop: int,
    nb: int,
    interpret: bool,
    profile: str = "gaussian",
    voigt_k: float = 0.0,
):
    """One jitted program: ray-block broadcast + fused pass + per-level
    unsort-and-sum back to caller ray order."""
    cheb = integrated_kernel_chebyshev(kernel_name)

    def chunk_idx(s, sched, ub, ulo, uhi, uoff, vp):
        u = sched[s] & _UNIT_MASK
        row = ulo[u] // _C + (s - uoff[u])
        return (jnp.clip(row, 0, n_rows - 1), 0, 0)

    def rays_idx(s, sched, ub, ulo, uhi, uoff, vp):
        return (ub[sched[s] & _UNIT_MASK], 0, 0, 0)

    def acc_idx(s, sched, ub, ulo, uhi, uoff, vp):
        return (ub[sched[s] & _UNIT_MASK], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 2, _B, 128), rays_idx),
            pl.BlockSpec((1, 8, _C), chunk_idx),
        ],
        out_specs=pl.BlockSpec((1, _B, n_bins), acc_idx),
    )
    kern = partial(
        _spectra_kernel,
        n_bins=n_bins,
        kernel_name=kernel_name,
        cheb=cheb,
        periodic=periodic,
        Lx=Lx,
        Ly=Ly,
        n_vel_images=n_vel_images,
        wrap_velocity=wrap_velocity,
        profile=profile,
        voigt_k=voigt_k,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, _B, n_bins), jnp.float32),
        interpret=interpret,
    )

    @jax.jit
    def run(sched, ub, ulo, uhi, uoff, vparam, rx, ry, packed, inv_orders):
        rays = jnp.stack([rx, ry], axis=1)[..., None]
        rays = jnp.broadcast_to(rays, (n_blocks, 2, _B, 128))
        out = call(sched, ub, ulo, uhi, uoff, vparam, rays, packed)
        out = out.reshape(n_pop, nb * _B, n_bins)
        # per-level unsort (rows were in that level's cell order) and sum
        tau = jnp.zeros((n_rays, n_bins), jnp.float32)
        for i in range(n_pop):
            tau = tau + jnp.take(out[i], inv_orders[i], axis=0)
        return tau

    return run


def absorption_spectra_pallas(
    pos,
    h,
    values,
    velocities_los,
    temperatures,
    ray_x,
    ray_y,
    *,
    cosmology=None,
    box_size: Optional[float] = None,
    atomic_weight: float = 1.008,
    n_bins: int = 512,
    kernel: str = "cubic_spline",
    periodic: bool = True,
    interpret: Optional[bool] = None,
    profile: str = "gaussian",
    gamma: Optional[float] = None,
    rest_wavelength_angstrom: float = 1215.67,
) -> tuple[Array, np.ndarray]:
    """Per-ray velocity-space spectra — :func:`ops.spectra.absorption_spectra`
    semantics on the fused Pallas pass (incl. ``profile="voigt"`` damping
    wings). Returns (spectra (R, n_bins), velocity bin centres in km/s)."""
    voigt_k = _resolve_profile(profile, gamma, rest_wavelength_angstrom)
    n_rays_in = np.asarray(ray_x).shape[0]
    if n_rays_in > _RAY_BATCH:
        # schedule unit indices ride 24 bits; huge ray sets batch cleanly
        # (spectra rows are independent per ray)
        taus = []
        vc = None
        for i in range(0, n_rays_in, _RAY_BATCH):
            tau_i, vc = absorption_spectra_pallas(
                pos, h, values, velocities_los, temperatures,
                np.asarray(ray_x)[i : i + _RAY_BATCH],
                np.asarray(ray_y)[i : i + _RAY_BATCH],
                cosmology=cosmology, box_size=box_size,
                atomic_weight=atomic_weight, n_bins=n_bins,
                kernel=kernel, periodic=periodic, interpret=interpret,
                profile=profile, gamma=gamma,
                rest_wavelength_angstrom=rest_wavelength_angstrom,
            )
            taus.append(tau_i)
        return jnp.concatenate(taus, axis=0), vc
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_bins % 128:
        raise ValueError("pallas spectra need n_bins to be a multiple of 128")
    # device-resident fast path: jax-array inputs stay on device (only
    # scalars and the small bounds table sync)
    on_device = isinstance(pos, jax.Array) and not isinstance(pos, jax.core.Tracer)
    xp = jnp if on_device else np
    pos = xp.asarray(pos)
    h_np = xp.asarray(h, xp.float32)
    col_values = xp.asarray(values, xp.float32)
    v_pec = xp.asarray(velocities_los, xp.float32)
    temperature = xp.asarray(temperatures)
    if box_size is None and periodic:
        raise ValueError("periodic spectra need box_size")

    # effective velocity: proper Hubble flow across the box + peculiar
    if cosmology is not None:
        dv_dx = cosmology.hubble_rate() * cosmology.expansion_factor
    else:
        dv_dx = 0.0
    v_eff = (pos[:, 2] * dv_dx + v_pec).astype(xp.float32)
    v_box = float(box_size * dv_dx) if (box_size is not None and dv_dx > 0) else None
    # doppler_parameter_kms is pure ufunc math: numpy dispatches to jnp for
    # jax-array inputs, so the device path reuses the oracle's formula
    b_dopp = xp.maximum(
        doppler_parameter_kms(temperature, atomic_weight), 1e-3
    ).astype(xp.float32)
    if v_box is not None:
        v_edges = np.linspace(0.0, v_box, n_bins + 1)
    else:
        lo_v = float(v_eff.min() - 3 * b_dopp.max())
        hi_v = float(v_eff.max() + 3 * b_dopp.max())
        v_edges = np.linspace(lo_v, hi_v, n_bins + 1)
    v_centres = 0.5 * (v_edges[:-1] + v_edges[1:]).astype(np.float32)
    v0 = float(v_edges[0])
    dv_bin = float(v_edges[1] - v_edges[0])
    # periodic velocity space: after wrapping to the principal zone
    # (|dv| <= v_box/2), image k peaks at best (k - 0.5) * v_box away, so
    # only images with (k - 0.5) * v_box < 6 sigma_max matter (exp(-36)
    # beyond). Typical Doppler widths need zero images - one exp, not 7.
    wrap_velocity = periodic and v_box is not None
    if wrap_velocity:
        b_max = float(b_dopp.max()) if b_dopp.size else 1.0
        n_vel_images = min(3, max(0, int(math.ceil(6.0 * b_max / v_box + 0.5)) - 1))
    else:
        n_vel_images = 0

    kspec = get_kernel(kernel)
    x = xp.asarray(pos[:, 0], xp.float32)
    y = xp.asarray(pos[:, 1], xp.float32)
    n_rays = np.asarray(ray_x).shape[0]
    if n_rays == 0:
        return jnp.zeros((0, n_bins), jnp.float32), v_centres
    rays = np.stack([np.asarray(ray_x, np.float64), np.asarray(ray_y, np.float64)])

    s_max = kspec.support_factor * float(h_np.max()) if h_np.size else 1.0
    if periodic:
        x0 = y0 = 0.0
        Lx = Ly = float(box_size)
        rays = np.mod(rays, Lx)
    else:
        pad = s_max
        x0 = min(float(x.min()) if x.size else 0.0, rays[0].min()) - pad
        y0 = min(float(y.min()) if y.size else 0.0, rays[1].min()) - pad
        Lx = max(float(x.max()) if x.size else 1.0, rays[0].max()) + pad - x0
        Ly = max(float(y.max()) if y.size else 1.0, rays[1].max()) + pad - y0
    grids = _choose_grids(Lx, Ly, s_max)

    n = x.shape[0]
    n_bucket = max(_C, _next_pow2(n))
    vals3 = xp.stack([col_values, v_eff, b_dopp], axis=1)  # (N, 3)
    if n_bucket != n:
        padn = n_bucket - n
        x = xp.pad(x, (0, padn), constant_values=x0)
        y = xp.pad(y, (0, padn), constant_values=y0)
        h_np = xp.pad(h_np, (0, padn), constant_values=1e-20)
        # padding Doppler width 1.0 (not 0): avoid 1/0 in the kernel
        vals3 = xp.concatenate(
            [
                vals3,
                xp.stack(
                    [
                        xp.zeros(padn, xp.float32),
                        xp.zeros(padn, xp.float32),
                        xp.ones(padn, xp.float32),
                    ],
                    axis=1,
                ),
            ],
            axis=0,
        )

    extent = jnp.asarray([x0, y0, Lx, Ly], jnp.float32)
    packed, bounds = _cached_prep(grids, 3, kspec.support_factor, periodic)(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(h_np), jnp.asarray(vals3), extent
    )
    bounds = np.asarray(bounds)

    rorders, rx_blocks, ry_blocks, unit_lo, unit_hi, unit_blk, nb = (
        _stage_ray_levels(rays, grids, bounds, x0, y0, Lx, Ly, periodic, _B, n_rays)
    )
    if not rorders:
        return jnp.zeros((n_rays, n_bins), jnp.float32), v_centres

    sched, uoff, n_steps = _build_schedule(unit_lo, unit_hi, unit_blk)
    n_pop = len(rorders)
    inv_orders = np.zeros((n_pop, max(n_rays, 1)), np.int32)
    for i, rorder in enumerate(rorders):
        inv = np.empty(n_rays, np.int64)
        inv[rorder] = np.arange(n_rays)
        inv_orders[i, :n_rays] = inv
    vparam = np.asarray([v0, dv_bin, v_box if v_box else 1.0], np.float32)

    tau = _cached_spectra_engine(
        n_pop * nb, n_steps, n_bucket // _C, n_bins, kernel, periodic,
        Lx, Ly, n_vel_images, wrap_velocity, n_rays, n_pop, nb, interpret,
        profile, voigt_k,
    )(
        jnp.asarray(sched), jnp.asarray(unit_blk.astype(np.int32)),
        jnp.asarray(unit_lo.astype(np.int32)),
        jnp.asarray(unit_hi.astype(np.int32)), jnp.asarray(uoff),
        jnp.asarray(vparam),
        jnp.asarray(rx_blocks), jnp.asarray(ry_blocks),
        packed, jnp.asarray(inv_orders),
    )
    return tau, v_centres
