"""kclass A/B on a genuinely sub-pixel workload.

The per-candidate K4 classification (deposit_coherent kclass bit) is
neutral on the lognormal north-star h distribution — a candidate's
~1000-lane key group almost always holds one lane past the K4 bound
(COHERENT_PROFILE.json: 102/40820 candidates) — but fixed-h sub-pixel
workloads (surface-density maps at survey depth, config-1-style renders)
classify EVERY candidate K4 and halve the deposit's column iterations.
This measures that case: uniform Morton-ordered particles, h fixed at
s_pix = 0.9 (just under the K4 bound), 1024^2 2-field render, kclass on
vs off at 2^26.

Run on the chip: `python benchmarks/kclass_ab.py --n $((1<<26))`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--repeats", type=int, default=3)
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
    import numpy as np

    from benchmarks.northstar_proxy import build_particles
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        deposit_coherent,
        tile_particles_coherent,
    )

    n = args.n
    box = 25.0
    shape = (1024, 1024)
    px = box / shape[0]
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)
    x, y, _h, fields = build_particles(n, box, shape, order="morton")
    # fixed sub-pixel h: s_pix = support_factor * h / px = 2h/px = 0.9
    h = np.full(n, 0.45 * px, np.float32)

    res = {"n_particles": n, "backend": jax.default_backend()}
    lay = tile_particles_coherent(x, y, h, fields, spec)
    res["n_candidates"] = int(lay.n_cand)
    if lay.cand_k4 is None:  # all rows heavy (scale too small for coherence)
        res["k4_candidates"] = 0
        print(json.dumps(res))
        return 1
    res["k4_candidates"] = int(np.asarray(lay.cand_k4).sum())

    def timed(fn):
        fn()  # warm
        best = 1e30
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn()
            _ = float(out[0].sum())  # host round-trip closes the window
            best = min(best, time.perf_counter() - t0)
        return best

    res["deposit_kclass_on_s"] = round(
        timed(lambda: deposit_coherent(lay, precision="bf16x2")), 4
    )
    lay_off = dataclasses.replace(lay, cand_k4=None)
    res["deposit_kclass_off_s"] = round(
        timed(lambda: deposit_coherent(lay_off, precision="bf16x2")), 4
    )
    res["speedup"] = round(
        res["deposit_kclass_off_s"] / res["deposit_kclass_on_s"], 3
    )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "KCLASS_AB.json",
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
