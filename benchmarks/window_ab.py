"""A/B the coherent-engine window schedule on hardware.

The whole-row coherent pass evaluates the full (R, C=2048) block per
candidate even though ~35% of lanes belong to other tiles/levels and 61%
of the north-star particles fit a K4 column loop (see
ops/deposit_coherent._K4_MAX_S). The W-lane window schedule trims both.
This script measures layout + deposit walls for window in {0, 1024, 512,
256} on the north-star workload and writes WINDOW_AB.json — flip the
production default to the winner.

Usage: python benchmarks/window_ab.py [--n 67108864] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from northstar_proxy import build_particles  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--windows", type=int, nargs="*", default=[0, 1024, 512, 256])
    ap.add_argument("--out", default=None)
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

    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        deposit_coherent,
        tile_particles_coherent,
    )

    n = args.n
    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)
    gen = lambda: build_particles(n, box, shape, order="morton")

    res = {"n_particles": n, "backend": jax.default_backend(), "cases": {}}
    ref_sum = None
    for W in args.windows:
        x, y, h, fields = gen()
        t0 = time.perf_counter()
        tp = tile_particles_coherent(
            x, y, h, fields, spec, donate=True, window=W
        )
        try:
            out = deposit_coherent(tp, precision="bf16x2")
        except ValueError as err:
            # schedule-word overflow: small windows spend their tile/row
            # bits on the window-block field at large n_rows x n_tiles
            res["cases"][f"window={W}"] = {"error": str(err)}
            print(json.dumps({f"window={W}": {"error": str(err)}}), flush=True)
            del tp
            continue
        s = float(out[0].sum())
        warm = time.perf_counter() - t0
        if ref_sum is None:
            ref_sum = s
        else:
            assert abs(s / ref_sum - 1) < 1e-4, (W, s, ref_sum)

        layout = deposit = 1e30
        for _ in range(args.repeats):
            del tp, out
            x, y, h, fields = gen()
            t0 = time.perf_counter()
            tp = tile_particles_coherent(
                x, y, h, fields, spec, donate=True, window=W
            )
            _ = float(tp.packed[0, 0, 0])
            layout = min(layout, time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = deposit_coherent(tp, precision="bf16x2")
            _ = float(out[0].sum())
            deposit = min(deposit, time.perf_counter() - t0)
        case = {
            "layout_s": round(layout, 4),
            "deposit_s": round(deposit, 4),
            "total_s": round(layout + deposit, 4),
            "warm_s": round(warm, 2),
        }
        if W:
            case["n_window_steps"] = tp.stats["n_window_steps"]
            case["n_candidates"] = tp.stats["n_candidates"]
        res["cases"][f"window={W}"] = case
        print(json.dumps({f"window={W}": case}), flush=True)
        del tp, out

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "WINDOW_AB.json",
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
