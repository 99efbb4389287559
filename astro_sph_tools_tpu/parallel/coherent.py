"""Multi-chip coherent-order deposit: the headline engine over a device mesh.

The per-chip north-star engine (:mod:`..ops.deposit_coherent`) is host-
orchestrated — it syncs data-dependent counts to build static-shape Pallas
schedules. This module lifts it onto a ``jax.sharding.Mesh`` as true SPMD:
every chip runs the SAME three compiled programs on its particle shard
(real 1e9-particle snapshots arrive as per-process file splits that are
each in snapshot storage order, so every shard is coherent; cf. the
reference's rank-striped ``pyread_eagle`` reads,
`/root/reference/src/astro_sph_tools/io/EAGLE/_SnapshotEAGLE.py:115-130`
+ mpi4py reduction — here the reduction is one ``psum`` over ICI):

1. **Stage A** (`shard_map`): per-row sort, classification, candidate
   extraction on each shard; per-shard counts — including the per-level
   routed-tail counts the render schedule needs — come back as ONE
   stacked (n_dev, ...) host sync, the only one in the pipeline.
2. **Stage B** (`shard_map`): bucketed tail gather + tail sort per shard.
   Static sizes (candidate capacity, tail-bucket capacities, per-level
   buckets) are maxed over the shards so all chips share one executable;
   per-shard truth flows in as dynamic (n_dev, k) operands.
3. **Render** (`shard_map`): candidate schedule + in-place Pallas coherent
   pass + per-level tail bodies on each chip, then ``lax.psum`` of the
   (F, ny, nx) map stack over the mesh axis — the only collective; a map
   stack is a few MB, negligible next to the deposit.

One host sync total regardless of device count (the single-chip engine
pays the same one), and the map reduction rides ICI — this is the 8-chip
composition the <2 s @ 1e9 north star assumes, measured per-chip in
NORTHSTAR.json.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.splines import get_kernel
from ..ops.deposit import MapSpec
from ..ops.deposit_pallas import (
    _CHUNK,
    PALLAS_LEVELS,
    _as_field_matrix,
    _check_precision,
    _level_geometry,
    _next_size_class,
)
from ..ops.deposit_coherent import (
    _D_MAX,
    _TAIL_BUCKETS,
    CoherentCaps,
    _assign_and_rowsort,
    _build_fused_statics,
    _ckey_bases,
    _coherent_body,
    _fused_coherent_body,
    _tail_gather,
    _tail_sort_dense,
)

Array = jax.Array


def pad_particles_mesh(x, y, h, values, spec: MapSpec, n_dev: int):
    """Host-side: pad N to a multiple of ``n_dev * 2048`` (the coherent
    chunk) so the arrays shard evenly. Padding parks at the extent max with
    weight 0 and sub-pixel h (lands in the coherent level, contributes
    nothing). Keeps snapshot order — shard coherence is the point."""
    values, _ = _as_field_matrix(values)
    n = x.shape[0]
    unit = n_dev * _CHUNK
    n_pad = max(unit, ((n + unit - 1) // unit) * unit) - n
    if n_pad:
        x0, x1, y0, y1 = spec.extent
        pad_h = 0.1 * min(spec.pixel_size)
        x = np.concatenate([np.asarray(x, np.float32), np.full(n_pad, x1, np.float32)])
        y = np.concatenate([np.asarray(y, np.float32), np.full(n_pad, y1, np.float32)])
        h = np.concatenate([np.asarray(h, np.float32), np.full(n_pad, pad_h, np.float32)])
        values = np.concatenate(
            [np.asarray(values, np.float32), np.zeros((values.shape[0], n_pad), np.float32)],
            axis=1,
        )
    return x, y, h, values


def deposit_2d_coherent_sharded_fused(
    x: Array,
    y: Array,
    h: Array,
    values: Array,  # (N,) or (F, N)
    spec: MapSpec,
    mesh: Mesh,
    caps: CoherentCaps,
    *,
    kernel: str = "cubic_spline",
    levels=PALLAS_LEVELS,
    d_max: int = _D_MAX,
    axis_name: str = "data",
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
    prep: Optional[str] = None,
) -> tuple[Array, Array]:
    """Zero-host-sync multi-chip coherent render with pinned capacities.

    With capacities known ahead of time (``caps`` — derive per shard via
    :func:`..ops.deposit_coherent.caps_from_layout` on a synced first
    chunk and merge with :func:`..ops.deposit_coherent.caps_union`), the
    three SPMD stages of :func:`deposit_2d_coherent_sharded` collapse into
    ONE ``shard_map`` program: stage A, tail gather, tail sort, and render
    run back-to-back per shard and the map stack ``psum``s over ICI — no
    count ever returns to the host, so a streaming loop dispatches chunk
    after chunk with zero round-trips.

    Returns ``(maps, ok)``: ``ok`` (device bool) is True iff every shard's
    counts fit ``caps`` AND no oversize smoothing lengths appeared. On
    False, re-render the chunk through the synced sharded engine.
    """
    _check_precision(precision)
    values, single = _as_field_matrix(values)
    if values.shape[0] > 4:
        raise ValueError("coherent deposit carries at most 4 fields")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = int(x.shape[0])
    n_dev = mesh.shape[axis_name]
    if n % (n_dev * _CHUNK):
        raise ValueError(
            f"N={n} must be a multiple of mesh.size*{_CHUNK}; "
            "use pad_particles_mesh"
        )
    statics = _build_fused_statics(
        spec, caps, kernel=kernel, levels=levels, d_max=d_max,
        n_rows=n // (n_dev * _CHUNK), n_fields=int(values.shape[0]),
        precision=precision, interpret=interpret, projection=projection,
        prep=prep,
    )
    body = partial(_fused_coherent_body, **dict(statics))

    def _local(xs, ys, hs, vs):
        total, ok = body(xs, ys, hs, vs)
        return (
            jax.lax.psum(total, axis_name),
            jax.lax.psum(ok.astype(jnp.int32), axis_name),
        )

    run = partial(jax.shard_map, mesh=mesh, check_vma=False)(
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(None, axis_name)
        ),
        out_specs=(P(), P()),
    )(_local)
    total, n_ok = run(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(h, jnp.float32), jnp.asarray(values, jnp.float32),
    )
    return (total[0] if single else total), n_ok == n_dev


def deposit_2d_coherent_sharded(
    x: Array,
    y: Array,
    h: Array,
    values: Array,  # (N,) or (F, N)
    spec: MapSpec,
    mesh: Mesh,
    *,
    kernel: str = "cubic_spline",
    levels=PALLAS_LEVELS,
    d_max: int = _D_MAX,
    axis_name: str = "data",
    precision: str = "bf16x2",
    interpret: Optional[bool] = None,
    projection: str = "kernel3d",
    prep: Optional[str] = None,
) -> Array:
    """Particle-sharded coherent-order adaptive deposit; returns the
    psum-reduced (ny, nx) or (F, ny, nx) map stack (replicated).

    ``N`` must be a multiple of ``mesh.size * 2048`` (use
    :func:`pad_particles_mesh`); each shard should be in snapshot order
    (any order is *correct* — incoherent shards just route everything
    through the tail). Smoothing lengths must fit the Pallas levels
    (``h <= max_s_pix``); oversize particles raise — clip beforehand or
    use the single-device engine's dense fallback.
    """
    _check_precision(precision)
    values, single = _as_field_matrix(values)
    if values.shape[0] > 4:
        raise ValueError("coherent deposit carries at most 4 fields")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kspec = get_kernel(kernel)
    n_fields = int(values.shape[0])
    n = int(x.shape[0])
    n_dev = mesh.shape[axis_name]
    if n % (n_dev * _CHUNK):
        raise ValueError(
            f"N={n} must be a multiple of mesh.size*{_CHUNK}; "
            "use pad_particles_mesh"
        )
    n_rows_l = n // (n_dev * _CHUNK)  # rows per shard
    C = _CHUNK

    geoms = []
    for cfg in levels:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)
    if geoms[0] is None:
        raise ValueError("coherent deposit requires the smallest level to tile the map")
    bases = _ckey_bases(geoms)
    bounds = tuple((g.cfg.max_s_pix if g is not None else -1.0) for g in geoms)
    geom_tuples = (
        tuple(g.n_tiles_x if g else 1 for g in geoms),
        tuple(g.cfg.TY if g else 1 for g in geoms),
        tuple(g.tx if g else 1 for g in geoms),
        tuple(g.n_tiles_y if g else 1 for g in geoms),
        tuple(g.cfg.M if g else 0 for g in geoms),
    )
    extent = tuple(float(e) for e in spec.extent)
    n_levels = len(levels)

    if prep is None:
        # Pallas prep when compiled (1.8-1.9x the XLA stage A —
        # PREP_AB.json), XLA stage A under interpret-mode emulation
        prep = "xla" if interpret else "pallas"
    if prep == "pallas":
        from ..ops.coherent_prep_pallas import _stage_a_pallas

        rb = 16  # PREP_AB.json: RB=16 measured best
        while n_rows_l % rb:  # grid must cover every row block exactly
            rb //= 2
        stage_a = partial(
            _stage_a_pallas,
            shape=spec.shape, extent=extent, periodic=spec.periodic_wrap,
            bounds=bounds, geom_tuples=geom_tuples,
            support_factor=kspec.support_factor, n_fields=n_fields,
            n_levels=n_levels, bases=bases, d_max=d_max, n_rows=n_rows_l,
            C=C, RB=rb, interpret=interpret,
            tail_buckets=_TAIL_BUCKETS,
        )
    elif prep == "xla":
        stage_a = partial(
            _assign_and_rowsort,
            shape=spec.shape, extent=extent, periodic=spec.periodic_wrap,
            bounds=bounds, geom_tuples=geom_tuples,
            support_factor=kspec.support_factor, n_fields=n_fields,
            n_levels=n_levels, bases=bases, d_max=d_max, n_rows=n_rows_l,
            C=C,
        )
    else:
        raise ValueError(f"unknown prep engine {prep!r}; use 'pallas'|'xla'")

    shmap = partial(jax.shard_map, mesh=mesh, check_vma=False)

    def _run_a_local(xs, ys, hs, vs):
        outs = stage_a(xs, ys, hs, vs)  # xla prep adds an 8th (window) output
        packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts = outs[:7]
        return packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts[None]

    run_a = shmap(
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(None, axis_name)),
        out_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(axis_name),
            P(axis_name), P(axis_name), P(axis_name),
        ),
    )(_run_a_local)

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    packed, sk, sr, sk4, tail_eff, rows_by_bucket, counts_all = run_a(
        x, y, h, values
    )

    # the ONLY host sync: (n_dev, 3 + n_buckets + n_levels + 1) —
    # candidate/heavy/bucket counts AND per-level routed-tail counts
    # (stage A computes the latter; the tail sort cannot change totals)
    cvec = np.asarray(counts_all)
    n_cand_max = int(cvec[:, 0].max())
    n_buckets = len(_TAIL_BUCKETS)
    nbs_all = cvec[:, 3 : 3 + n_buckets].astype(np.int64)  # (n_dev, n_buckets)
    lc = cvec[:, 3 + n_buckets : 3 + n_buckets + n_levels + 1].astype(
        np.int64
    )  # (n_dev, n_levels + 1); the xla prep appends a window-step count

    # candidate capacity: 4096-step granularity (dead steps are cheap but
    # not free), shared by all shards
    b0 = (
        min(max(4096, -(-n_cand_max // 4096) * 4096), n_rows_l * d_max)
        if n_cand_max
        else 0
    )
    # tail-bucket capacities: size class of the max across shards
    caps = tuple(
        _next_size_class(int(nbs_all[:, 1 + i].max()))
        if nbs_all[:, 1 + i].max()
        else 0
        for i in range(len(_TAIL_BUCKETS) - 1)
    )
    # per-shard bucket offsets/counts (dynamic operands)
    nbv_all = nbs_all[:, 1:].astype(np.int32)  # (n_dev, n_buckets-1)
    los_all = (
        np.cumsum(np.concatenate([nbs_all[:, :1], nbs_all[:, 1:-1]], axis=1), axis=1)
    ).astype(np.int32)  # start offset of each tail bucket in rows_by_bucket

    tail_f = partial(
        _tail_gather, caps=caps, n_fields=n_fields, bases=bases,
        n_levels=n_levels, C=C,
    )
    sort_f = partial(_tail_sort_dense, bases=bases, n_levels=n_levels, C=C)

    def _run_b_local(packed_l, rbb_l, te_l, los_l, nbv_l):
        chans = tail_f(packed_l, rbb_l, te_l, los_l.reshape(-1), nbv_l.reshape(-1))
        t_tile, tu, tv, th, s_values, lcounts = sort_f(
            chans[0], chans[1], chans[2], chans[3], tuple(chans[4:])
        )
        # extra slack: per-level buckets are sized from the max over
        # SHARDS, so a shard whose own level count is small can see
        # lo + bucket beyond the single-device slack bound (dynamic_slice
        # would clamp the start and misalign the live mask — silent
        # corruption). Worst case lo + bucket <= v + 9*(v + C)/8; the sort
        # already pads max(v//8, C) + 2C, so another v + 2C covers it.
        v = chans[0].shape[0]
        extra = v + 2 * C
        pad1 = lambda a: jnp.pad(a, (0, extra))
        return (
            pad1(t_tile), pad1(tu), pad1(tv), pad1(th),
            jnp.pad(s_values, ((0, 0), (0, extra))), lcounts[None],
        )

    run_b = shmap(
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name),
            P(axis_name, None), P(axis_name, None),
        ),
        out_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(axis_name),
            P(axis_name, None), P(axis_name),
        ),
    )(_run_b_local)

    t_tile, tu, tv, th, t_values, _lcounts_all = run_b(
        packed, rows_by_bucket, tail_eff,
        jnp.asarray(los_all), jnp.asarray(nbv_all),
    )

    if int(lc[:, n_levels].max()) > 0:
        raise ValueError(
            "oversize smoothing lengths on the sharded path; clip h to the "
            "largest Pallas level or use the single-device engine"
        )
    metas_static = []
    meta_lo, meta_cnt = [], []
    lo_per_shard = np.zeros(n_dev, np.int64)
    for li, g in enumerate(geoms):
        cmax = int(lc[:, li].max())
        if g is not None and cmax > 0:
            metas_static.append((g, C * _next_size_class(-(-cmax // C))))
            meta_lo.append(lo_per_shard.copy())
            meta_cnt.append(lc[:, li].copy())
        lo_per_shard = lo_per_shard + lc[:, li]
    metas_static = tuple(metas_static)
    n_meta = max(1, len(metas_static))
    tail_los = np.zeros((n_dev, n_meta), np.int32)
    tail_cnts = np.zeros((n_dev, n_meta), np.int32)
    for i in range(len(metas_static)):
        tail_los[:, i] = meta_lo[i]
        tail_cnts[:, i] = meta_cnt[i]

    n_tiles0 = geoms[0].n_tiles
    body = partial(
        _coherent_body,
        geom0=geoms[0], shape=spec.shape, extent=extent,
        periodic=spec.periodic_wrap, offset=spec.sample_offset,
        n_fields=n_fields, kernel=kernel,
        support_factor=kspec.support_factor, precision=precision,
        interpret=interpret, projection=projection, b0=b0, n_rows=n_rows_l,
        tail_metas_static=metas_static,
    )

    def _run_c_local(packed_l, sk_l, sr_l, sk4_l, ncand_l, tail_l, los_l,
                     cnts_l):
        if b0:
            live = jnp.arange(b0, dtype=jnp.int32) < ncand_l.reshape(())
            cand_tile = jnp.where(live, sk_l[:b0], n_tiles0).astype(jnp.int32)
            cand_row = jnp.where(live, sr_l[:b0], 0).astype(jnp.int32)
            cand_k4 = jnp.where(live, sk4_l[:b0], 0).astype(jnp.int32)
        else:
            cand_tile = cand_row = cand_k4 = None
        total = body(
            packed_l, cand_tile, cand_row,
            tail_l if metas_static else None,
            los_l.reshape(-1), cnts_l.reshape(-1),
            cand_k4=cand_k4,
        )
        return jax.lax.psum(total, axis_name)

    run_c = shmap(
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(axis_name),
            P(axis_name),
            (P(axis_name), P(axis_name), P(axis_name), P(axis_name, None), P(axis_name)),
            P(axis_name, None), P(axis_name, None),
        ),
        out_specs=P(),
    )(_run_c_local)

    total = run_c(
        packed, sk, sr, sk4, jnp.asarray(cvec[:, 0].astype(np.int32)),
        (tu, tv, th, t_values, t_tile),
        jnp.asarray(tail_los), jnp.asarray(tail_cnts),
    )
    return total[0] if single else total
