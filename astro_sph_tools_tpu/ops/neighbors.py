"""Nearest-neighbor queries: device brute-force + host KDTree dispatch.

The reference's neighbor workloads are (a) nearest-halo searches with scipy
``KDTree(boxsize=...)`` thread fan-out (`_scripts/find_nearest_haloes.py:212-215`)
and (b) k-NN smoothing lengths for SWIFT dark matter
(`io/SWIFT/_SnapshotSWIFT.py:58-85`). On TPU, tree walks are hostile
(data-dependent branching); instead:

- :func:`nearest_points_device` — chunked dense distance blocks on the VPU
  with periodic minimum-image handling and an ``argmin`` reduction:
  O(N_query x M_points) but fully vectorized. For the halo workload
  (M ~ 1e4-1e6 haloes), a 1e8-particle query sweep is ~1e13 flop-class —
  viable on-chip, and far simpler than emulating a tree.
- :func:`nearest_points` — dispatcher: device path when M is small enough
  to make dense blocks efficient, scipy KDTree (all cores) otherwise.

A shell-walking Pallas kernel over the :mod:`cells` structure is the planned
upgrade path for huge M.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_DEVICE_MAX_POINTS = 200_000


@partial(jax.jit, static_argnames=("chunk", "periodic_box"))
def _nearest_impl(queries, points, *, chunk, periodic_box):
    n = queries.shape[0]
    n_chunks = n // chunk

    def body(_, q):
        d = q[:, None, :] - points[None, :, :]  # (C, M, 3)
        if periodic_box is not None:
            box = periodic_box
            d = d - jnp.round(d / box) * box
        d2 = (d * d).sum(axis=-1)
        idx = jnp.argmin(d2, axis=1)
        return None, (idx.astype(jnp.int32), jnp.sqrt(d2[jnp.arange(chunk), idx]))

    _, (idx, dist) = jax.lax.scan(body, None, queries.reshape(n_chunks, chunk, 3))
    return idx.reshape(-1), dist.reshape(-1)


def nearest_points_device(
    queries, points, *, periodic_box: Optional[float] = None, chunk: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """(index, distance) of the nearest point for every query, on device."""
    queries = np.asarray(queries, np.float32)
    points = np.asarray(points, np.float32)
    n = queries.shape[0]
    n_pad = max(chunk, ((n + chunk - 1) // chunk) * chunk)
    q = np.pad(queries, [(0, n_pad - n), (0, 0)])
    idx, dist = _nearest_impl(
        jnp.asarray(q), jnp.asarray(points), chunk=chunk, periodic_box=periodic_box
    )
    return np.asarray(idx[:n]), np.asarray(dist[:n])


def nearest_points(
    queries, points, *, periodic_box: Optional[float] = None, prefer_device: Optional[bool] = None
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-point query dispatching between TPU dense blocks and scipy.

    Matches the reference pipeline's outputs (index into ``points`` and the
    periodic distance); chooses the device path when the point set is small
    enough for dense blocks (or when forced via ``prefer_device``).
    """
    points = np.asarray(points)
    if prefer_device is None:
        prefer_device = points.shape[0] <= _DEVICE_MAX_POINTS
    if prefer_device:
        return nearest_points_device(queries, points, periodic_box=periodic_box)
    from scipy.spatial import KDTree

    if periodic_box is not None:
        tree = KDTree(np.mod(points, periodic_box), boxsize=periodic_box)
        dist, idx = tree.query(np.mod(np.asarray(queries), periodic_box), workers=-1)
    else:
        tree = KDTree(points)
        dist, idx = tree.query(np.asarray(queries), workers=-1)
    return idx.astype(np.int64), dist


@partial(jax.jit, static_argnames=("k", "chunk", "periodic_box"))
def _knn_impl(queries, points, *, k, chunk, periodic_box):
    n = queries.shape[0]
    n_chunks = n // chunk

    def body(_, q):
        d = q[:, None, :] - points[None, :, :]
        if periodic_box is not None:
            box = periodic_box
            d = d - jnp.round(d / box) * box
        d2 = (d * d).sum(axis=-1)
        kth = -jax.lax.top_k(-d2, k)[0]  # (C, k) smallest distances, sorted asc
        return None, jnp.sqrt(kth)

    _, dists = jax.lax.scan(body, None, queries.reshape(n_chunks, chunk, 3))
    return dists.reshape(-1, k)


def knn_distances(
    queries, points, k: int, *, periodic_box: Optional[float] = None, chunk: int = 512
) -> np.ndarray:
    """Distances to the k nearest points (ascending), on device.

    The device analogue of the SWIFT DM smoothing-length derivation
    (32-nearest-neighbour distance, `_SnapshotSWIFT.py:58-85`).
    """
    queries = np.asarray(queries, np.float32)
    points = np.asarray(points, np.float32)
    n = queries.shape[0]
    n_pad = max(chunk, ((n + chunk - 1) // chunk) * chunk)
    q = np.pad(queries, [(0, n_pad - n), (0, 0)])
    d = _knn_impl(jnp.asarray(q), jnp.asarray(points), k=k, chunk=chunk, periodic_box=periodic_box)
    return np.asarray(d[:n])
