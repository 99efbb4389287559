"""Velocity-space absorption spectra (SpecWizard-style, config 4).

Synthesises per-sightline optical-depth spectra from SPH particles: each
particle contributes its kernel column weight at the ray's impact parameter,
smeared in velocity space by a Gaussian thermal/Doppler profile centred on
its effective velocity (Hubble flow along the LOS + peculiar velocity):

    tau(v) = sum_i  N_i(b_impact) * exp(-(v - v_i)^2 / b_i^2) / (sqrt(pi) b_i)

with ``N_i = value_i * Y(b_impact_i, h_i)`` (the line-integrated kernel LUT),
``v_i = H(z)/(1+z) * z_pos_i + v_pec,i`` (proper Hubble flow across the
co-moving box at the snapshot epoch) and ``b_i = sqrt(2 k_B T_i / m_ion)``
the Doppler parameter. This is the velocity-space generalisation of
``los_profiles`` — the reference ships LOS *file readers* only; the
SpecWizard-style synthesis is the capability BASELINE config 4 names.

Physical line normalisation (oscillator strength, cross-section) is the
caller's scalar: pass ``values = mass_fraction * sigma0 ...`` as desired;
the engine returns the kernel-weighted, Doppler-broadened velocity density.

Execution mirrors ``sightlines``: dense (rays x chunk) VPU blocks under
``lax.scan``, macro-batched over particles and rays to bound per-program
work.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..kernels.splines import (
    get_kernel,
    integrated_kernel_lookup,
    integrated_kernel_table,
)

Array = jax.Array

_DEF_CHUNK = 1024
_RAY_MACRO = 256
_MACRO_BATCH = 1 << 19


def doppler_parameter_kms(temperature_K, atomic_weight: float) -> np.ndarray:
    """b = sqrt(2 k_B T / m) in km/s for an ion of the given atomic weight."""
    m = atomic_weight * C.ATOMIC_MASS_UNIT_CGS
    return np.sqrt(2.0 * C.BOLTZMANN_CONSTANT_CGS * np.asarray(temperature_K) / m) / 1.0e5


@partial(
    jax.jit,
    static_argnames=("kernel_name", "chunk", "n_bins", "periodic_box", "periodic_velocity"),
)
def _spectra_impl(
    px, py, h, col_values, v_eff, b_dopp, ray_x, ray_y, v_centres, lut,
    *, kernel_name, chunk, n_bins, periodic_box, periodic_velocity,
):
    kernel = get_kernel(kernel_name)
    S = kernel.support_factor
    n_chunks = px.shape[0] // chunk
    reshape = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    R = ray_x.shape[0]
    tau0 = jnp.zeros((R, n_bins), jnp.float32)
    inv_sqrt_pi = 1.0 / math.sqrt(math.pi)

    def body(tau, inputs):
        cx, cy, ch, cN, cv, cb = inputs
        dx = ray_x[:, None] - cx[None, :]
        dy = ray_y[:, None] - cy[None, :]
        if periodic_box is not None:
            box = periodic_box
            dx = dx - jnp.round(dx / box) * box
            dy = dy - jnp.round(dy / box) * box
        b2 = dx * dx + dy * dy  # (R, C)
        w_col = integrated_kernel_lookup(lut, jnp.sqrt(b2), ch[None, :], S)
        w_col = jnp.where(b2 < (S * ch[None, :]) ** 2, w_col * cN[None, :], 0.0)  # (R, C)

        dv = v_centres[:, None] - cv[None, :]  # (B, C)
        if periodic_velocity is not None:
            # Hot gas can have Doppler widths comparable to (or wider than)
            # the box's velocity extent; a single minimum image loses the
            # Gaussian's tails, so sum over periodic velocity images.
            vbox = periodic_velocity
            dv = dv - jnp.round(dv / vbox) * vbox
            phi = jnp.zeros_like(dv)
            for k in (-3, -2, -1, 0, 1, 2, 3):
                dvk = dv + k * vbox
                phi = phi + jnp.exp(-((dvk / cb[None, :]) ** 2))
            phi = phi * (inv_sqrt_pi / cb[None, :])
        else:
            phi = (
                jnp.exp(-((dv / cb[None, :]) ** 2)) * (inv_sqrt_pi / cb[None, :])
            )  # (B, C), normalised: integral over v = 1

        # (R, B) += (R, C) @ (C, B)
        tau = tau + jnp.einsum("rc,bc->rb", w_col, phi)
        return tau, None

    tau, _ = jax.lax.scan(
        body, tau0,
        (reshape(px), reshape(py), reshape(h), reshape(col_values), reshape(v_eff), reshape(b_dopp)),
    )
    return tau


def absorption_spectra(
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
    chunk: int = _DEF_CHUNK,
    periodic: bool = True,
) -> tuple[Array, np.ndarray]:
    """Per-ray velocity-space spectra.

    Parameters
    ----------
    pos : (N, 3) co-moving positions (projection axis = z; pre-rotate
        otherwise). h : (N,) smoothing lengths. values : (N,) column payloads
        (e.g. ion masses or column-density weights).
    velocities_los : (N,) peculiar LOS velocities, km/s.
    temperatures : (N,) gas temperatures, K (sets the Doppler width).
    cosmology : Cosmology supplying the Hubble flow (H(z)); if None, no
        Hubble flow is added (pure peculiar-velocity space).
    box_size : co-moving box length for periodic wrapping (both spatial and
        the velocity extent of the box).
    atomic_weight : ion mass in amu for the Doppler parameter.

    Returns (spectra (R, n_bins), velocity bin centres (km/s)).
    """
    pos = np.asarray(pos)
    h_np = np.asarray(h, np.float32)
    values = np.asarray(values, np.float32)
    v_pec = np.asarray(velocities_los, np.float32)
    temperature = np.asarray(temperatures)

    if box_size is None and periodic:
        raise ValueError("periodic spectra need box_size")

    # effective velocity: proper Hubble flow across the box + peculiar
    if cosmology is not None:
        dv_dx = cosmology.hubble_rate() * cosmology.expansion_factor  # km/s per cMpc
    else:
        dv_dx = 0.0
    v_eff = (pos[:, 2] * dv_dx + v_pec).astype(np.float32)
    v_box = float(box_size * dv_dx) if (box_size is not None and dv_dx > 0) else None

    b_dopp = np.maximum(
        doppler_parameter_kms(temperature, atomic_weight), 1e-3
    ).astype(np.float32)

    # velocity bins spanning the box's velocity extent (or the data range)
    if v_box is not None:
        v_edges = np.linspace(0.0, v_box, n_bins + 1)
    else:
        lo, hi = float(v_eff.min() - 3 * b_dopp.max()), float(v_eff.max() + 3 * b_dopp.max())
        v_edges = np.linspace(lo, hi, n_bins + 1)
    v_centres = 0.5 * (v_edges[:-1] + v_edges[1:]).astype(np.float32)

    lut = jnp.asarray(integrated_kernel_table(kernel), jnp.float32)

    n_rays = np.asarray(ray_x).shape[0]
    rx_all = np.asarray(ray_x, np.float32)
    ry_all = np.asarray(ray_y, np.float32)
    n = pos.shape[0]

    def pad(a, n_pad, fill=0.0):
        return jnp.asarray(
            np.pad(np.asarray(a, np.float32), [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1),
                   constant_values=fill)
        )

    ray_blocks = []
    for r0 in range(0, n_rays, _RAY_MACRO):
        r1 = min(r0 + _RAY_MACRO, n_rays)
        rpad = max(_RAY_MACRO, r1 - r0)
        rx = pad(rx_all[r0:r1], rpad)
        ry = pad(ry_all[r0:r1], rpad)
        block = None
        for s0 in range(0, max(n, 1), _MACRO_BATCH):
            s1 = min(s0 + _MACRO_BATCH, n)
            m = s1 - s0
            n_pad = max(chunk, ((m + chunk - 1) // chunk) * chunk)
            part = _spectra_impl(
                pad(pos[s0:s1, 0], n_pad), pad(pos[s0:s1, 1], n_pad),
                pad(h_np[s0:s1], n_pad, fill=1.0), pad(values[s0:s1], n_pad),
                pad(v_eff[s0:s1], n_pad), pad(b_dopp[s0:s1], n_pad, fill=1.0),
                rx, ry, jnp.asarray(v_centres), lut,
                kernel_name=kernel, chunk=chunk, n_bins=n_bins,
                periodic_box=float(box_size) if periodic else None,
                periodic_velocity=v_box if periodic else None,
            )
            block = part if block is None else block + part
        ray_blocks.append(block[: r1 - r0])
    spectra = jnp.concatenate(ray_blocks, axis=0)
    return spectra, v_centres
