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
- :func:`nearest_points_grid` — the shell-walking grid query for huge M:
  statically-unrolled Chebyshev shells over a periodic cell grid with
  per-chunk early exit, a residual spill pass, and a dense void fallback;
  exact match vs scipy KDTree on clustered periodic boxes.
- :func:`knn_distances_grid` — the k-nearest generalization (fixed-k
  insertion into per-query best lists over the same shell walk), used for
  SWIFT dark-matter smoothing lengths at scale.
- :func:`nearest_points` — dispatcher: device path when M is small enough
  to make dense blocks efficient, scipy KDTree (all cores) otherwise.
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


_DENSE_MAX_POINTS = 20_000  # below this, dense blocks beat grid setup


def nearest_points(
    queries, points, *, periodic_box: Optional[float] = None,
    prefer_device: Optional[bool] = None, method: Optional[str] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-point query dispatching between the TPU engines and scipy.

    Matches the reference pipeline's outputs (index into ``points`` and the
    periodic distance). Device paths: dense VPU blocks for small point sets,
    the shell-walking grid query (:func:`nearest_points_grid`) for large
    ones — the scipy KDTree remains available via ``method="kdtree"`` as the
    host oracle.
    """
    points = np.asarray(points)
    if method is None:
        if prefer_device is False:
            method = "kdtree"
        elif points.shape[0] <= _DENSE_MAX_POINTS:
            method = "dense"
        else:
            method = "grid"
    if method == "dense":
        return nearest_points_device(queries, points, periodic_box=periodic_box)
    if method == "grid":
        return nearest_points_grid(queries, points, periodic_box=periodic_box)
    if method != "kdtree":
        raise ValueError(f"Unknown method {method!r} (dense | grid | kdtree)")
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


# ---------------------------------------------------------------------------
# Shell-walking grid query (huge point sets)
# ---------------------------------------------------------------------------

_GRID_CAP = 32  # points per cell bucket; spill goes to a dense residual pass
_GRID_CHUNK = 256
_R_CAP = 3  # statically unrolled shells; beyond -> dense fallback per chunk


def _shell_offsets(r: int) -> np.ndarray:
    """Cell offsets at Chebyshev radius exactly r, shape (n, 3)."""
    rng = np.arange(-r, r + 1)
    g = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1).reshape(-1, 3)
    cheb = np.abs(g).max(axis=1)
    return g[cheb == r].astype(np.int32)


@partial(
    jax.jit,
    static_argnames=("g", "cap", "chunk", "periodic", "cell", "origin", "m_pad"),
)
def _grid_query_impl(
    queries,  # (n_pad, 3)
    points,  # (m_pad, 3) — row m is an inf sentinel
    buckets,  # (g^3, cap) int32 point indices, sentinel = m_pad - 1
    residual_idx,  # (n_res_pad,) spilled point indices (sentinel-padded)
    *,
    g, cap, chunk, periodic, cell, origin, m_pad,
):
    n = queries.shape[0]
    n_chunks = n // chunk
    box = g * cell  # world size of the grid (periodic wrap length)

    def min_image(d):
        if periodic:
            return d - jnp.round(d / box) * box
        return d

    def chunk_fn(_, q):  # q: (chunk, 3)
        ci = jnp.floor((q - jnp.asarray(origin)) / cell).astype(jnp.int32)
        ci = jnp.mod(ci, g) if periodic else jnp.clip(ci, 0, g - 1)
        best_d2 = jnp.full((chunk,), jnp.inf, jnp.float32)
        best_i = jnp.full((chunk,), -1, jnp.int32)

        def probe(offs, carry):
            best_d2, best_i = carry
            cc = ci[:, None, :] + jnp.asarray(offs)[None, :, :]  # (C, O, 3)
            if periodic:
                cc = jnp.mod(cc, g)
                in_grid = jnp.ones(cc.shape[:2], bool)
            else:
                in_grid = ((cc >= 0) & (cc < g)).all(axis=-1)
                cc = jnp.clip(cc, 0, g - 1)
            flat = (cc[..., 2] * g + cc[..., 1]) * g + cc[..., 0]  # (C, O)
            cand = buckets[flat]  # (C, O, cap)
            cand = jnp.where(in_grid[..., None], cand, m_pad - 1)
            p = points[cand]  # (C, O, cap, 3)
            d = min_image(q[:, None, None, :] - p)
            d2 = (d * d).sum(-1)  # (C, O, cap)
            d2 = jnp.where(cand == m_pad - 1, jnp.inf, d2)
            d2f = d2.reshape(chunk, -1)
            cf = cand.reshape(chunk, -1)
            j = jnp.argmin(d2f, axis=1)
            ar = jnp.arange(chunk)
            better = d2f[ar, j] < best_d2
            return (
                jnp.where(better, d2f[ar, j], best_d2),
                jnp.where(better, cf[ar, j], best_i),
            )

        carry = (best_d2, best_i)
        for r in range(_R_CAP + 1):
            offs = _shell_offsets(r)
            if r == 0:
                carry = probe(offs, carry)
            else:
                # after finishing shell r-1, any unexplored point is at least
                # (r-1)*cell away; skip deeper shells once every query is
                # settled (runtime branch per chunk)
                settled = carry[0] <= ((r - 1) * cell) ** 2
                carry = jax.lax.cond(
                    jnp.all(settled),
                    lambda c: c,
                    lambda c: probe(offs, c),
                    carry,
                )

        # residual spill (bucket overflow) — always checked, usually tiny
        if residual_idx.shape[0] > 0:
            p = points[residual_idx]  # (n_res, 3)
            d = min_image(q[:, None, :] - p[None, :, :])
            d2 = (d * d).sum(-1)
            d2 = jnp.where(residual_idx[None, :] == m_pad - 1, jnp.inf, d2)
            j = jnp.argmin(d2, axis=1)
            ar = jnp.arange(chunk)
            better = d2[ar, j] < carry[0]
            carry = (
                jnp.where(better, d2[ar, j], carry[0]),
                jnp.where(better, residual_idx[j], carry[1]),
            )

        # dense fallback for queries still unsettled after R_CAP shells
        # (empty neighbourhoods — voids); runs per chunk only when needed
        def dense(carry):
            best_d2, best_i = carry
            pchunk = 4096
            n_pc = points.shape[0] // pchunk

            def body(c, carry):
                best_d2, best_i = carry
                p = jax.lax.dynamic_slice(points, (c * pchunk, 0), (pchunk, 3))
                d = min_image(q[:, None, :] - p[None, :, :])
                d2 = (d * d).sum(-1)
                gidx = c * pchunk + jnp.arange(pchunk)
                d2 = jnp.where(gidx[None, :] >= m_pad - 1, jnp.inf, d2)
                j = jnp.argmin(d2, axis=1)
                ar = jnp.arange(chunk)
                better = d2[ar, j] < best_d2
                return (
                    jnp.where(better, d2[ar, j], best_d2),
                    jnp.where(better, (c * pchunk + j).astype(jnp.int32), best_i),
                )

            return jax.lax.fori_loop(0, n_pc, body, carry)

        settled = carry[0] <= (_R_CAP * cell) ** 2
        carry = jax.lax.cond(jnp.all(settled), lambda c: c, dense, carry)
        return None, (carry[1], jnp.sqrt(carry[0]))

    _, (idx, dist) = jax.lax.scan(chunk_fn, None, queries.reshape(n_chunks, chunk, 3))
    return idx.reshape(-1), dist.reshape(-1)


def _build_cell_grid(queries, points_in, periodic_box, cap, chunk,
                     points_per_cell: float = 8.0):
    """Host-side one-pass grid build shared by the shell-walking queries.

    Returns (q_pad, pts_full, buckets, res_pad, geometry dict)."""
    m = points_in.shape[0]
    if periodic_box is not None:
        origin = (0.0, 0.0, 0.0)
        span = float(periodic_box)
        pts = np.mod(points_in, span)
        qs = np.mod(queries, span)
    else:
        lo = np.minimum(points_in.min(0), queries.min(0)) - 1e-4
        hi = np.maximum(points_in.max(0), queries.max(0)) + 1e-4
        origin = tuple(float(v) for v in lo)
        span = float((hi - lo).max())
        pts = points_in
        qs = queries

    g = int(np.clip(round((m / points_per_cell) ** (1 / 3)), 1, 128))
    cell = span / g

    cidx = np.floor((pts - np.asarray(origin, np.float32)) / cell).astype(np.int64)
    cidx = np.clip(cidx, 0, g - 1)
    flat = (cidx[:, 2] * g + cidx[:, 1]) * g + cidx[:, 0]
    order = np.argsort(flat, kind="stable")
    flat_sorted = flat[order]
    start = np.searchsorted(flat_sorted, np.arange(g**3))
    end = np.searchsorted(flat_sorted, np.arange(g**3), side="right")

    m_pad = m + 1  # sentinel row
    pts_pad = np.vstack([pts, np.full((1, 3), 1e30, np.float32)])
    buckets = np.full((g**3, cap), m_pad - 1, np.int32)
    residual = []
    counts = end - start
    take = np.minimum(counts, cap)
    for c in np.nonzero(counts)[0]:
        buckets[c, : take[c]] = order[start[c] : start[c] + take[c]]
        if counts[c] > cap:
            residual.append(order[start[c] + cap : end[c]])
    residual = (
        np.concatenate(residual).astype(np.int32)
        if residual
        else np.zeros(0, np.int32)
    )
    n_res_pad = 0 if residual.size == 0 else max(8, int(2 ** np.ceil(np.log2(residual.size))))
    res_pad = np.full(n_res_pad, m_pad - 1, np.int32)
    res_pad[: residual.size] = residual

    n = qs.shape[0]
    n_pad = max(chunk, ((n + chunk - 1) // chunk) * chunk)
    q_pad = np.zeros((n_pad, 3), np.float32)
    q_pad[:n] = qs
    # park padding queries on the first real point so they settle instantly
    q_pad[n:] = pts[0]

    # pad points to a multiple of the dense-fallback chunk
    pchunk = 4096
    m_full = max(pchunk, ((m_pad + pchunk - 1) // pchunk) * pchunk)
    pts_full = np.full((m_full, 3), 1e30, np.float32)
    pts_full[:m_pad] = pts_pad

    geom = dict(
        g=g, cell=float(cell), origin=origin, m_pad=m_pad,
        periodic=periodic_box is not None,
    )
    return q_pad, pts_full, buckets, res_pad, geom


def nearest_points_grid(
    queries,
    points,
    *,
    periodic_box: Optional[float] = None,
    chunk: int = _GRID_CHUNK,
    cap: int = _GRID_CAP,
) -> tuple[np.ndarray, np.ndarray]:
    """Shell-walking nearest-point query over an on-device cell grid.

    The TPU-native replacement for the reference's threaded KDTree
    (`_scripts/find_nearest_haloes.py:212-215`, SURVEY.md §2.8): points are
    bucketed into a cubic cell grid (host, one pass); each query chunk walks
    Chebyshev shells 0.._R_CAP (statically unrolled, runtime-skipped per
    chunk once every query's best distance proves no deeper shell can win),
    spilled bucket overflow rides one dense residual pass, and rare
    void-region chunks fall back to a dense sweep. O(N_query * shell
    candidates) instead of O(N_query * M).
    """
    queries = np.asarray(queries, np.float32)
    points_in = np.asarray(points, np.float32)
    if points_in.shape[0] == 0:
        raise ValueError("no points to query against")
    n = queries.shape[0]
    q_pad, pts_full, buckets, res_pad, geom = _build_cell_grid(
        queries, points_in, periodic_box, cap, chunk
    )
    idx, dist = _grid_query_impl(
        jnp.asarray(q_pad), jnp.asarray(pts_full), jnp.asarray(buckets),
        jnp.asarray(res_pad),
        cap=cap, chunk=chunk, **geom,
    )
    return np.asarray(idx[:n]).astype(np.int64), np.asarray(dist[:n])


@partial(
    jax.jit,
    static_argnames=("g", "cap", "chunk", "periodic", "cell", "origin", "m_pad", "k"),
)
def _grid_knn_impl(
    queries,  # (n_pad, 3)
    points,  # (m_pad_full, 3) — row m is an inf sentinel
    buckets,  # (g^3, cap) int32 point indices, sentinel = m_pad - 1
    residual_idx,  # (n_res_pad,)
    *,
    g, cap, chunk, periodic, cell, origin, m_pad, k,
):
    """k-nearest shell walk: per-query ascending best-k distance lists,
    merged with each shell's candidates via top_k; a chunk stops probing
    deeper shells once every query's k-th best distance proves no
    unexplored cell can contribute."""
    n = queries.shape[0]
    n_chunks = n // chunk
    box = g * cell

    def min_image(d):
        if periodic:
            return d - jnp.round(d / box) * box
        return d

    def merge(best_d2, new_d2):
        """(chunk, k) asc + (chunk, c) -> (chunk, k) asc smallest."""
        alld2 = jnp.concatenate([best_d2, new_d2], axis=1)
        return -jax.lax.top_k(-alld2, k)[0]

    def chunk_fn(_, q):  # q: (chunk, 3)
        ci = jnp.floor((q - jnp.asarray(origin)) / cell).astype(jnp.int32)
        ci = jnp.mod(ci, g) if periodic else jnp.clip(ci, 0, g - 1)
        best_d2 = jnp.full((chunk, k), jnp.inf, jnp.float32)

        def probe(offs, best_d2):
            cc = ci[:, None, :] + jnp.asarray(offs)[None, :, :]  # (C, O, 3)
            if periodic:
                cc = jnp.mod(cc, g)
                in_grid = jnp.ones(cc.shape[:2], bool)
            else:
                in_grid = ((cc >= 0) & (cc < g)).all(axis=-1)
                cc = jnp.clip(cc, 0, g - 1)
            flat = (cc[..., 2] * g + cc[..., 1]) * g + cc[..., 0]
            cand = buckets[flat]  # (C, O, cap)
            cand = jnp.where(in_grid[..., None], cand, m_pad - 1)
            p = points[cand]
            d = min_image(q[:, None, None, :] - p)
            d2 = (d * d).sum(-1)
            d2 = jnp.where(cand == m_pad - 1, jnp.inf, d2)
            return merge(best_d2, d2.reshape(chunk, -1))

        for r in range(_R_CAP + 1):
            offs = _shell_offsets(r)
            if r == 0:
                best_d2 = probe(offs, best_d2)
            else:
                # all k found within the radius shells 0..r-1 guarantee?
                settled = best_d2[:, -1] <= ((r - 1) * cell) ** 2
                best_d2 = jax.lax.cond(
                    jnp.all(settled),
                    lambda b: b,
                    lambda b: probe(offs, b),
                    best_d2,
                )

        if residual_idx.shape[0] > 0:
            p = points[residual_idx]
            d = min_image(q[:, None, :] - p[None, :, :])
            d2 = (d * d).sum(-1)
            d2 = jnp.where(residual_idx[None, :] == m_pad - 1, jnp.inf, d2)
            best_d2 = merge(best_d2, d2)

        def dense(_):
            # recompute from scratch: the sweep sees EVERY point, and merging
            # into the shell-probe best list would double-count points found
            # by both (duplicate distances displace real k-NN entries)
            pchunk = 4096
            n_pc = points.shape[0] // pchunk

            def body(c, best_d2):
                p = jax.lax.dynamic_slice(points, (c * pchunk, 0), (pchunk, 3))
                d = min_image(q[:, None, :] - p[None, :, :])
                d2 = (d * d).sum(-1)
                gidx = c * pchunk + jnp.arange(pchunk)
                d2 = jnp.where(gidx[None, :] >= m_pad - 1, jnp.inf, d2)
                return merge(best_d2, d2)

            return jax.lax.fori_loop(
                0, n_pc, body, jnp.full((chunk, k), jnp.inf, jnp.float32)
            )

        settled = best_d2[:, -1] <= (_R_CAP * cell) ** 2
        best_d2 = jax.lax.cond(jnp.all(settled), lambda b: b, dense, best_d2)
        return None, jnp.sqrt(best_d2)

    _, dist = jax.lax.scan(chunk_fn, None, queries.reshape(n_chunks, chunk, 3))
    return dist.reshape(-1, k)


def knn_distances_grid(
    queries,
    points,
    k: int,
    *,
    periodic_box: Optional[float] = None,
    chunk: int = 64,
    cap: int = _GRID_CAP,
) -> np.ndarray:
    """Distances to the k nearest points (ascending) via the shell-walking
    cell grid — the at-scale device path for SWIFT dark-matter smoothing
    lengths (`_SnapshotSWIFT.py:58-85`: 32-NN distance), where the dense
    :func:`knn_distances` is O(N*M).

    Exact: matches ``scipy.spatial.KDTree.query(k=k)`` distances (to f32).
    The cell resolution targets ~4k points per 3x3x3 neighbourhood so the
    r=1 shell usually settles k<=32; unsettled chunks walk deeper shells
    and, past ``_R_CAP``, a dense sweep.
    """
    queries = np.asarray(queries, np.float32)
    points_in = np.asarray(points, np.float32)
    m = points_in.shape[0]
    if m == 0:
        raise ValueError("no points to query against")
    if k > m:
        raise ValueError(f"k={k} exceeds the number of points ({m})")
    n = queries.shape[0]
    # denser cells than nearest-1 (need >= k candidates nearby): ~4*k per
    # 27-cell neighbourhood
    per_cell = max(8.0, 4.0 * k / 27.0)
    # a grid narrower than the full shell stencil would probe wrapped-
    # duplicate cells under periodicity (duplicate candidates corrupt a
    # k-list, unlike the nearest-1 min); tiny sets go dense instead
    g_est = int(np.clip(round((m / per_cell) ** (1 / 3)), 1, 128))
    if g_est < 2 * _R_CAP + 1:
        return knn_distances(queries, points_in, k, periodic_box=periodic_box)
    q_pad, pts_full, buckets, res_pad, geom = _build_cell_grid(
        queries, points_in, periodic_box, cap, chunk, points_per_cell=per_cell
    )
    dist = _grid_knn_impl(
        jnp.asarray(q_pad), jnp.asarray(pts_full), jnp.asarray(buckets),
        jnp.asarray(res_pad),
        cap=cap, chunk=chunk, k=k, **geom,
    )
    return np.asarray(dist[:n])
