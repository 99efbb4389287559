"""A/B timing: fused Pallas stage A vs the XLA stage A of the coherent
engine, at bench scale on the current backend. Prints one JSON line and
appends nothing; used to decide the default `prep` engine.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax

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
        _TAIL_BUCKETS,
        _cached_stage_a,
        _ckey_bases,
    )
    from astro_sph_tools_tpu.ops.coherent_prep_pallas import (
        cached_stage_a_pallas,
    )
    from astro_sph_tools_tpu.ops.deposit_pallas import (
        PALLAS_LEVELS,
        _level_geometry,
    )
    from benchmarks.northstar_proxy import build_particles

    n = args.n
    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)
    res: dict = {"n_particles": n, "backend": jax.default_backend()}

    x, y, h, fields = build_particles(n, box, shape, order="morton")

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

    engines = {
        "xla": _cached_stage_a(
            spec.shape, extent, True, bounds, geom_tuples,
            kspec.support_factor, 2, len(PALLAS_LEVELS), bases, 8, n_rows, C,
        ),
        "pallas": cached_stage_a_pallas(
            spec.shape, extent, True, bounds, geom_tuples,
            kspec.support_factor, 2, len(PALLAS_LEVELS), bases, 8, n_rows, C,
            _TAIL_BUCKETS,
        ),
    }
    counts = {}
    for name, fn in engines.items():
        t0 = time.perf_counter()
        outs = fn(x, y, h, fields)
        cv = np.asarray(outs[6])
        res[f"warm_{name}_s"] = round(time.perf_counter() - t0, 3)
        counts[name] = cv
        best = 1e30
        for _ in range(args.repeats):
            del outs
            t0 = time.perf_counter()
            outs = fn(x, y, h, fields)
            _ = np.asarray(outs[6])
            best = min(best, time.perf_counter() - t0)
        res[f"{name}_stage_a_s"] = round(best, 4)
        del outs
    # RB sweep: larger row blocks amortise per-step grid overhead
    for rb in (16, 32):
        if n_rows % rb:
            continue
        fn = cached_stage_a_pallas(
            spec.shape, extent, True, bounds, geom_tuples,
            kspec.support_factor, 2, len(PALLAS_LEVELS), bases, 8, n_rows, C,
            _TAIL_BUCKETS, RB=rb,
        )
        outs = fn(x, y, h, fields)
        _ = np.asarray(outs[6])
        best = 1e30
        for _ in range(args.repeats):
            del outs
            t0 = time.perf_counter()
            outs = fn(x, y, h, fields)
            _ = np.asarray(outs[6])
            best = min(best, time.perf_counter() - t0)
        res[f"pallas_rb{rb}_s"] = round(best, 4)
        del outs

    # the xla prep appends a window-step count the pallas prep lacks
    res["counts_match"] = bool(
        np.array_equal(counts["xla"][: len(counts["pallas"])], counts["pallas"])
    )
    res["counts"] = {
        "n_cand": int(counts["xla"][0]),
        "n_heavy": int(counts["xla"][1]),
        "n_tail": int(counts["xla"][2]),
    }
    res["speedup"] = round(res["xla_stage_a_s"] / res["pallas_stage_a_s"], 3)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
