"""Multi-chip sightline columns and spectra (config 4 over a mesh).

Sightline columns and velocity-space spectra are *sums over particles*
(``total_r = sum_i q_i Y(b_ri, h_i)``), so the multi-chip decomposition is
data-parallel with no halo exchange: every process/chip integrates its local
particle shard against the full (replicated, tiny) ray set with the fused
single-chip Pallas engine, and the per-shard partials are reduced by
addition. This mirrors the reference's MPI data-parallel reads
(`io/EAGLE/_SnapshotEAGLE.py:119-130`) + root-gather pattern, with the
reduction expressed on device so it rides ICI when shards live on a mesh.

The deposit path needs ``ppermute`` halo rings because tiles are spatial;
rays are not tiled across chips, so this module is deliberately simple —
the engine itself (`ops.sightlines_pallas`) is the per-chip workhorse.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sightlines_pallas import column_integrate_pallas
from ..ops.spectra_pallas import absorption_spectra_pallas

Array = jax.Array


def column_integrate_sharded(
    shards: Sequence[tuple],  # per-shard (x, y, h, values) local arrays
    ray_x,
    ray_y,
    *,
    kernel: str = "cubic_spline",
    projection: str = "integrated",
    periodic_box: Optional[float] = None,
    devices: Optional[Sequence] = None,
    interpret: Optional[bool] = None,
) -> Array:
    """Per-ray columns from particle shards: run the fused engine per shard
    (on its device when ``devices`` is given), tree-sum the partials.

    In a multi-host deployment each process passes its single local shard
    (``shards=[local]``) and reduces across processes with
    ``jax.lax.psum`` / ``multihost_utils``; this entry point also serves the
    single-process many-device layout used by the CI mesh.
    """
    partials = []
    for si, (x, y, h, values) in enumerate(shards):
        if devices is not None:
            dev = devices[si % len(devices)]
            with jax.default_device(dev):
                part = column_integrate_pallas(
                    x, y, h, values, ray_x, ray_y,
                    kernel=kernel, projection=projection,
                    periodic_box=periodic_box, interpret=interpret,
                )
        else:
            part = column_integrate_pallas(
                x, y, h, values, ray_x, ray_y,
                kernel=kernel, projection=projection,
                periodic_box=periodic_box, interpret=interpret,
            )
        partials.append(part)
    total = partials[0]
    for p in partials[1:]:
        total = total + p
    return total


def absorption_spectra_sharded(
    shards: Sequence[tuple],  # per-shard (pos, h, values, v_los, T) locals
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
):
    """Per-ray spectra from particle shards (additive over particles).

    Requires a cosmology + box_size so every shard uses the same box-derived
    velocity bins; data-dependent bin ranges would differ per shard and the
    partials could not be summed.
    """
    if cosmology is None or box_size is None:
        raise ValueError(
            "sharded spectra need cosmology and box_size (shared, box-derived "
            "velocity bins); per-shard data-dependent ranges cannot be summed"
        )
    total = None
    v_centres = None
    for pos, h, values, v_los, T in shards:
        tau, v_centres = absorption_spectra_pallas(
            pos, h, values, v_los, T, ray_x, ray_y,
            cosmology=cosmology, box_size=box_size,
            atomic_weight=atomic_weight, n_bins=n_bins, kernel=kernel,
            periodic=periodic, interpret=interpret,
        )
        total = tau if total is None else total + tau
    return total, v_centres
