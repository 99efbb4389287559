"""Sightline integration: ray x particle SPH kernel integrals (config 4).

BASELINE config 4: "Line-of-sight absorption sightlines: 1e4 rays through a
snapshot with per-ray SPH kernel integration (SpecWizard-style)". The
reference ships LOS *file readers* but no integration engine; this module
supplies it, device-side:

- :func:`column_integrate` — per-ray column totals
  ``sum_i q_i * Y(b_i, h_i)`` with ``b`` the ray-particle impact parameter
  and ``Y`` the line-integrated kernel LUT (physical column densities), or
  the 3D-kernel-at-projected-radius convention
  (`tools/projections/_pixel_calculations.pyx:32-34`) for parity with maps.
- :func:`los_profiles` — per-ray 1-D profiles along the LOS axis, sampling
  the 3D kernel at the true 3D distance of each bin point (the map
  semantics extended to rays), e.g. density/temperature/velocity runs for
  absorption-spectrum synthesis.

Execution: a ``lax.scan`` over particle chunks evaluating dense (rays,
chunk) blocks on the VPU — O(R * N) but fully vectorized and memory-bounded.
Rays are few (1e4) and the scan fuses, so a 1e4 x 1e7 workload is ~1e11
flops-class — fine on a TPU chip; a tile-binned Pallas variant can later
reuse the deposit machinery for much larger ray counts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.splines import (
    get_kernel,
    integrated_kernel_lookup,
    integrated_kernel_table,
)

Array = jax.Array

_DEF_CHUNK = 2048


def _pad_chunk(arrays, chunk, h_index):
    n = arrays[0].shape[0]
    n_pad = max(chunk, ((n + chunk - 1) // chunk) * chunk)
    out = []
    for i, a in enumerate(arrays):
        fill = 1.0 if i == h_index else 0.0
        pad = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.asarray(np.pad(np.asarray(a), pad, constant_values=fill), jnp.float32))
    return out


_RAY_TILE = 1024


@partial(jax.jit, static_argnames=("kernel_name", "projection", "chunk", "periodic_box"))
def _column_integrate_impl(
    px, py, h, values, ray_x, ray_y, lut,
    *, kernel_name, projection, chunk, periodic_box,
):
    kernel = get_kernel(kernel_name)
    S = kernel.support_factor
    n_chunks = px.shape[0] // chunk
    reshape = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    # rays are tiled too: an unbounded (R, C) block at 1e4 rays x 8k chunk
    # is multi-GB of fused intermediates — enough to OOM-crash the device
    n_ray_tiles = ray_x.shape[0] // _RAY_TILE
    rx_t = ray_x.reshape(n_ray_tiles, _RAY_TILE)
    ry_t = ray_y.reshape(n_ray_tiles, _RAY_TILE)
    totals0 = jnp.zeros((values.shape[1], n_ray_tiles, _RAY_TILE), jnp.float32)

    def body(tot, inputs):
        cx, cy, ch, cv = inputs

        def ray_tile(rt, tot):
            dx = rx_t[rt][:, None] - cx[None, :]
            dy = ry_t[rt][:, None] - cy[None, :]
            if periodic_box is not None:
                box = periodic_box
                dx = dx - jnp.round(dx / box) * box
                dy = dy - jnp.round(dy / box) * box
            b2 = dx * dx + dy * dy  # (RT, C)
            b = jnp.sqrt(b2)
            if projection == "integrated":
                w = integrated_kernel_lookup(lut, b, ch[None, :], S)
            else:
                w = kernel.w(b, ch[None, :])
            w = jnp.where(b2 < (S * ch[None, :]) ** 2, w, 0.0)
            # (F, RT) += (F, C) @ (C, RT)
            return tot.at[:, rt, :].add(jnp.einsum("cf,rc->fr", cv, w))

        tot = jax.lax.fori_loop(0, n_ray_tiles, ray_tile, tot)
        return tot, None

    totals, _ = jax.lax.scan(
        body, totals0, (reshape(px), reshape(py), reshape(h), reshape(values))
    )
    return totals.reshape(values.shape[1], -1)


# Bounds on the work handed to one XLA program invocation. The dense ray
# sweep is compute-heavy; a single program spanning tens of seconds can trip
# device/tunnel watchdogs ("TPU worker crashed"), so both the particle axis
# and the ray axis are macro-batched at the Python level (per program:
# <= _MACRO_BATCH x _RAY_MACRO pair evaluations, ~1 s class on a v5e chip).
_MACRO_BATCH = 1 << 19
_RAY_MACRO = 2048


def column_integrate(
    x, y, h, values, ray_x, ray_y,
    *,
    kernel: str = "cubic_spline",
    projection: str = "integrated",
    chunk: int = _DEF_CHUNK,
    periodic_box: Optional[float] = None,
) -> Array:
    """Per-ray column totals over all particles.

    ``values`` (N,) or (N, F); returns (R,) or (F, R). With
    ``projection='integrated'`` and values = masses the result is the
    physical column density (mass / area); ``'kernel3d'`` reproduces the
    reference map convention.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    h = np.asarray(h)
    values = np.asarray(values)
    single = values.ndim == 1
    if single:
        values = values[:, None]
    lut = (
        jnp.asarray(integrated_kernel_table(kernel), jnp.float32)
        if projection == "integrated"
        else jnp.zeros(2, jnp.float32)
    )
    # pad rays to a tile multiple (padding rays are discarded afterwards)
    n_rays = np.asarray(ray_x).shape[0]
    n_ray_pad = max(_RAY_TILE, ((n_rays + _RAY_TILE - 1) // _RAY_TILE) * _RAY_TILE)
    rx = jnp.asarray(np.pad(np.asarray(ray_x, np.float32), (0, n_ray_pad - n_rays)))
    ry = jnp.asarray(np.pad(np.asarray(ray_y, np.float32), (0, n_ray_pad - n_rays)))

    n = x.shape[0]
    ray_blocks = []
    for r0 in range(0, n_ray_pad, _RAY_MACRO):
        r1 = min(r0 + _RAY_MACRO, n_ray_pad)
        block_totals = None
        for start in range(0, max(n, 1), _MACRO_BATCH):
            stop = min(start + _MACRO_BATCH, n)
            px, py, hh, vv = _pad_chunk(
                [x[start:stop], y[start:stop], h[start:stop], values[start:stop]],
                chunk, h_index=2,
            )
            part = _column_integrate_impl(
                px, py, hh, vv, rx[r0:r1], ry[r0:r1], lut,
                kernel_name=kernel, projection=projection, chunk=chunk,
                periodic_box=periodic_box,
            )
            block_totals = part if block_totals is None else block_totals + part
        ray_blocks.append(block_totals)
    totals = jnp.concatenate(ray_blocks, axis=1)[:, :n_rays]
    return totals[0] if single else totals


@partial(
    jax.jit,
    static_argnames=("kernel_name", "chunk", "n_bins", "periodic_box"),
)
def _los_profiles_impl(
    px, py, pz, h, values, ray_x, ray_y, z_edges,
    *, kernel_name, chunk, n_bins, periodic_box,
):
    kernel = get_kernel(kernel_name)
    S = kernel.support_factor
    n_chunks = px.shape[0] // chunk
    reshape = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    R = ray_x.shape[0]
    F = values.shape[1]
    z_centres = 0.5 * (z_edges[:-1] + z_edges[1:])  # (B,)
    prof0 = jnp.zeros((F, R, n_bins), jnp.float32)

    def body(prof, inputs):
        cx, cy, cz, ch, cv = inputs
        dx = ray_x[:, None] - cx[None, :]
        dy = ray_y[:, None] - cy[None, :]
        if periodic_box is not None:
            box = periodic_box
            dx = dx - jnp.round(dx / box) * box
            dy = dy - jnp.round(dy / box) * box
        b2 = dx * dx + dy * dy  # (R, C)
        dz = z_centres[:, None] - cz[None, :]  # (B, C)
        if periodic_box is not None:
            dz = dz - jnp.round(dz / periodic_box) * periodic_box
        r2 = b2[:, None, :] + (dz * dz)[None, :, :]  # (R, B, C)
        w = kernel.w(jnp.sqrt(r2), ch[None, None, :])
        w = jnp.where(r2 < (S * ch[None, None, :]) ** 2, w, 0.0)
        prof = prof + jnp.einsum("cf,rbc->frb", cv, w)
        return prof, None

    prof, _ = jax.lax.scan(
        body, prof0, (reshape(px), reshape(py), reshape(pz), reshape(h), reshape(values))
    )
    return prof


def los_profiles(
    pos, h, values, ray_x, ray_y,
    *,
    z_range: tuple[float, float],
    n_bins: int,
    kernel: str = "cubic_spline",
    chunk: int = 512,
    periodic_box: Optional[float] = None,
) -> Array:
    """1-D field profiles along each ray (projection axis = z; pre-rotate
    positions for other axes via ``CoordinateAxes.projection_plane``).

    Returns (R, B) for single-field input, else (F, R, B): the 3D kernel
    evaluated at each bin sample point, i.e. ``profile[r, b] = sum_i q_i *
    W(|ray_point_rb - pos_i|, h_i)`` — density-run semantics matching the
    map engine; divide weighted fields by a mass profile for averages.
    """
    pos = np.asarray(pos)
    values = np.asarray(values)
    single = values.ndim == 1
    if single:
        values = values[:, None]
    z_edges = jnp.linspace(z_range[0], z_range[1], n_bins + 1)
    px, py, pz, hh, vv = _pad_chunk(
        [pos[:, 0], pos[:, 1], pos[:, 2], h, values], chunk, h_index=3
    )
    prof = _los_profiles_impl(
        px, py, pz, hh, vv,
        jnp.asarray(ray_x, jnp.float32), jnp.asarray(ray_y, jnp.float32), z_edges,
        kernel_name=kernel, chunk=chunk, n_bins=n_bins, periodic_box=periodic_box,
    )
    return prof[0] if single else prof
