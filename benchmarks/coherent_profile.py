"""Stage-level profile of the coherent-engine layout at north-star scale.

The north-star proxy (NORTHSTAR.json) splits the wall into layout
(0.50-0.58 s) + deposit (0.64-0.68 s) at 2^27; ROADMAP seam #2 says the
layout's non-sort remainder could halve with a fused prep kernel. This
script measures the actual sub-stage costs so that claim is grounded:

- stage A total  (assignment + row sort + classification + candidates)
- stage A pieces re-jitted standalone (fusion differs, so these are
  indicative, not additive): assignment chain, row sort, top_k candidate
  extraction, packed stack
- tail gather (stage B1) and tail sort (stage B2)
- deposit body

Each window closes with a host round-trip (tunnel can satisfy
block_until_ready early); best-of-N.

Writes COHERENT_PROFILE.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, close, repeats):
    best = 1e30
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        close(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> int:
    ap = argparse.ArgumentParser()
    # default 2^26: the sub-piece breakdown holds inputs + sort operands +
    # the packed stack alive at once, which brushes HBM at 2^27 (all stages
    # are bandwidth-bound, so the ratios carry; NORTHSTAR.json has the 2^27
    # totals)
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_bench_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from astro_sph_tools_tpu.kernels.splines import get_kernel
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        _CHUNK,
        _cached_stage_a,
        _ckey_bases,
        deposit_coherent,
        tile_particles_coherent,
    )
    from astro_sph_tools_tpu.ops.deposit_pallas import (
        PALLAS_LEVELS,
        _level_geometry,
        _multi_level_assign,
    )
    from benchmarks.northstar_proxy import build_particles

    n = args.n
    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)
    res: dict = {"n_particles": n, "backend": jax.default_backend()}

    gen = lambda: build_particles(n, box, shape, order="morton")
    x, y, h, fields = gen()

    # ---- full layout + deposit (ground truth totals) ----
    def full_layout():
        return tile_particles_coherent(x, y, h, fields, spec)

    t0 = time.perf_counter()
    tp = full_layout()
    _ = float(tp.packed[0, 0, 0])
    res["warm_layout_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out = deposit_coherent(tp, precision="bf16x2")
    _ = float(out[0].sum())
    res["warm_deposit_s"] = round(time.perf_counter() - t0, 3)

    # free the previous layout before each rebuild: two live layouts plus
    # the sort's working set brush HBM at 2^26 (nondeterministic OOM)
    del out
    best = 1e30
    for _ in range(args.repeats):
        del tp
        t0 = time.perf_counter()
        tp = full_layout()
        _ = float(tp.packed[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    res["layout_s"] = round(best, 4)
    best, _ = _timed(
        lambda: deposit_coherent(tp, precision="bf16x2"),
        lambda o: float(o[0].sum()),
        args.repeats,
    )
    res["deposit_s"] = round(best, 4)
    if tp.cand_k4 is not None:
        import dataclasses

        res["k4_candidates"] = int(np.asarray(tp.cand_k4).sum())
        tp_off = dataclasses.replace(tp, cand_k4=None)
        deposit_coherent(tp_off, precision="bf16x2")  # warm
        best, _ = _timed(
            lambda: deposit_coherent(tp_off, precision="bf16x2"),
            lambda o: float(o[0].sum()),
            args.repeats,
        )
        res["deposit_kclass_off_s"] = round(best, 4)
        del tp_off
    del tp

    # ---- stage A standalone (the jitted program the layout actually runs) ----
    kspec = get_kernel("cubic_spline")
    geoms = []
    for cfg in PALLAS_LEVELS:
        try:
            geoms.append(_level_geometry(cfg, spec))
        except ValueError:
            geoms.append(None)
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
    C = _CHUNK
    n_rows = n // C
    stage_a = _cached_stage_a(
        spec.shape, extent, True, bounds, geom_tuples, kspec.support_factor,
        2, len(PALLAS_LEVELS), bases, 8, n_rows, C,
    )
    fn = lambda: stage_a(x, y, h, fields)
    close = lambda o: float(o[0][0, 0, 0])
    fn()  # warm
    best, outs = _timed(fn, close, args.repeats)
    res["stage_a_s"] = round(best, 4)
    counts = np.asarray(outs[6])
    res["counts"] = {"n_cand": int(counts[0]), "n_heavy": int(counts[1]),
                     "n_tail": int(counts[2])}
    del outs

    # ---- fused Pallas stage A (the prep="pallas" engine) ----
    from astro_sph_tools_tpu.ops.coherent_prep_pallas import (
        cached_stage_a_pallas,
    )
    from astro_sph_tools_tpu.ops.deposit_coherent import _TAIL_BUCKETS

    stage_a_p = cached_stage_a_pallas(
        spec.shape, extent, True, bounds, geom_tuples, kspec.support_factor,
        2, len(PALLAS_LEVELS), bases, 8, n_rows, C, _TAIL_BUCKETS,
    )
    fnp = lambda: stage_a_p(x, y, h, fields)
    fnp()  # warm
    best, outs = _timed(fnp, close, args.repeats)
    res["stage_a_pallas_s"] = round(best, 4)
    del outs

    # ---- stage A sub-pieces, re-jitted standalone ----
    def assign_only(x_, y_, h_):
        ny, nx = spec.shape
        x0, x1, y0, y1 = extent
        psx = (x1 - x0) / nx
        psy = (y1 - y0) / ny
        u = jnp.mod((x_ - x0) / psx, nx)
        v = jnp.mod((y_ - y0) / psy, ny)
        s_pix = kspec.support_factor * h_ / min(psx, psy)
        level, tile, u_loc, v_loc = _multi_level_assign(
            u, v, s_pix, bounds, *geom_tuples, jnp
        )
        base_arr = jnp.asarray(bases[: len(PALLAS_LEVELS) + 1], jnp.int32)
        ckey = base_arr[jnp.minimum(level, len(PALLAS_LEVELS))] + jnp.where(
            level < len(PALLAS_LEVELS), tile, 0
        )
        return ckey, u_loc, v_loc

    jassign = jax.jit(assign_only)
    jassign(x, y, h)
    best, _ = _timed(lambda: jassign(x, y, h), lambda o: float(o[0][0]), args.repeats)
    res["sub_assign_s"] = round(best, 4)

    ckey, u_loc, v_loc = jassign(x, y, h)

    def rowsort_only(k_, u_, v_, h_, f_):
        to2 = lambda a: a.reshape(n_rows, C)
        ops2 = [to2(k_), to2(u_), to2(v_), to2(h_), to2(f_[0]), to2(f_[1])]
        return jax.lax.sort(ops2, num_keys=1, is_stable=False)

    jrow = jax.jit(rowsort_only)
    jrow(ckey, u_loc, v_loc, h, fields)
    best, _ = _timed(
        lambda: jrow(ckey, u_loc, v_loc, h, fields),
        lambda o: float(o[0][0, 0]),
        args.repeats,
    )
    res["sub_rowsort_s"] = round(best, 4)

    sorted2 = jrow(ckey, u_loc, v_loc, h, fields)
    k2 = sorted2[0]

    def classify_only(k2_):
        is_first = jnp.concatenate(
            [jnp.ones((n_rows, 1), bool), k2_[:, 1:] != k2_[:, :-1]], axis=1
        )
        is_l0 = k2_ < bases[1]
        head_distinct = (is_first & is_l0).sum(axis=1)
        coherent = head_distinct <= 8
        tail_eff = jnp.where(coherent, C - is_l0.sum(axis=1), C).astype(jnp.int32)
        pad_key = jnp.int32(bases[len(PALLAS_LEVELS)] + 1)
        masked = jnp.where(is_first & is_l0 & coherent[:, None], k2_, pad_key)
        cand_keys = -jax.lax.top_k(-masked, 8)[0]
        return cand_keys, tail_eff

    jcls = jax.jit(classify_only)
    jcls(k2)
    best, _ = _timed(lambda: jcls(k2), lambda o: float(o[0][0, 0]), args.repeats)
    res["sub_classify_topk_s"] = round(best, 4)

    # ---- tail stages: gather (B1), sort (B2), and the host syncs ----
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        _TAIL_BUCKETS,
        _cached_tail_gather,
        _cached_tail_sort_dense,
        _next_size_class,
    )

    outs = stage_a(x, y, h, fields)
    packed, _sk, _sr, _sk4, tail_eff, rows_by_bucket, counts_d = outs[:7]
    t0 = time.perf_counter()
    cvec = np.asarray(counts_d)
    res["sync1_s"] = round(time.perf_counter() - t0, 4)
    nbs = tuple(int(v) for v in cvec[3 : 3 + len(_TAIL_BUCKETS)])
    nbs_tail = nbs[1:]
    caps = tuple(_next_size_class(nb) if nb else 0 for nb in nbs_tail)
    los = np.concatenate([[nbs[0]], np.cumsum(nbs_tail)[:-1] + nbs[0]])
    gather = _cached_tail_gather(caps, 2, bases, len(PALLAS_LEVELS), C)
    g_args = (
        packed, rows_by_bucket, tail_eff,
        jnp.asarray(los, jnp.int32), jnp.asarray(nbs_tail, jnp.int32),
    )
    gather(*g_args)  # warm
    best, chans = _timed(
        lambda: gather(*g_args), lambda o: float(o[0][0]), args.repeats
    )
    res["sub_tail_gather_s"] = round(best, 4)
    res["tail_v_tot"] = int(chans[0].shape[0])
    sortf = _cached_tail_sort_dense(
        int(chans[0].shape[0]), 2, bases, len(PALLAS_LEVELS), C
    )
    s_args = (chans[0], chans[1], chans[2], chans[3], tuple(chans[4:]))
    sortf(*s_args)  # warm
    best, souts = _timed(
        lambda: sortf(*s_args), lambda o: float(o[0][0]), args.repeats
    )
    res["sub_tail_sort_s"] = round(best, 4)
    t0 = time.perf_counter()
    _ = np.asarray(souts[5])
    res["sync2_s"] = round(time.perf_counter() - t0, 4)
    del outs, packed, _sk, _sr, tail_eff, rows_by_bucket, chans, souts

    def pack_only(sorted2_):
        return jnp.stack(
            list(sorted2_[1:4]) + list(sorted2_[4:])
            + [sorted2_[0].astype(jnp.float32)]
            + [jnp.zeros((n_rows, C), jnp.float32)] * 2,
            axis=1,
        )

    jpack = jax.jit(pack_only)
    jpack(sorted2)
    best, _ = _timed(
        lambda: jpack(sorted2), lambda o: float(o[0, 0, 0]), args.repeats
    )
    res["sub_pack_s"] = round(best, 4)

    # ---- deposit split: clip h sub-pixel -> all level-0, no tail; the
    # remaining cost is the coherent Pallas pass + K=8 overlap-add. The
    # full-deposit minus this is the tail bodies + their overlap-adds.
    import jax.numpy as jnp2
    from astro_sph_tools_tpu.ops.deposit_pallas import _overlap_add

    g0 = geoms[0]
    h_clip = jnp.minimum(h, 0.9 * (box / shape[0]))
    tp0 = tile_particles_coherent(x, y, h_clip, fields, spec)
    t0 = time.perf_counter()
    out0 = deposit_coherent(tp0, precision="bf16x2")
    _ = float(out0[0].sum())
    res["warm_deposit_no_tail_s"] = round(time.perf_counter() - t0, 3)
    best, _ = _timed(
        lambda: deposit_coherent(tp0, precision="bf16x2"),
        lambda o: float(o[0].sum()),
        args.repeats,
    )
    res["deposit_no_tail_s"] = round(best, 4)
    res["no_tail_candidates"] = int(tp0.stats["n_candidates"])
    # kclass A/B: same layout with the per-candidate K4 classification
    # stripped (every step runs the full-K column loop)
    import dataclasses

    if tp0.cand_k4 is not None:
        res["no_tail_k4_candidates"] = int(np.asarray(tp0.cand_k4).sum())
        tp0_off = dataclasses.replace(tp0, cand_k4=None)
        deposit_coherent(tp0_off, precision="bf16x2")  # warm
        best, _ = _timed(
            lambda: deposit_coherent(tp0_off, precision="bf16x2"),
            lambda o: float(o[0].sum()),
            args.repeats,
        )
        res["deposit_no_tail_kclass_off_s"] = round(best, 4)
        del tp0_off
    del tp0, out0

    tiles0 = jax.random.normal(
        jax.random.PRNGKey(0), (g0.n_tiles, 2 * g0.cfg.R, g0.cfg.S), jnp.float32
    )
    ny, nx = shape
    ov = jax.jit(
        lambda t: _overlap_add(
            t, g0.cfg, g0.tx, g0.n_tiles_y, g0.n_tiles_x, 2, ny, nx, True
        )
    )
    ov(tiles0)
    best, _ = _timed(lambda: ov(tiles0), lambda o: float(o[0, 0, 0]), args.repeats)
    res["sub_overlap_add_k8_s"] = round(best, 4)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COHERENT_PROFILE.json",
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
