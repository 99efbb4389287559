"""A/B the coherent-deposit matmul precision modes on the chip.

COHERENT_PROFILE.json characterizes the coherent pass as VPU-bound with the
bf16x2 limb split ~35% of the per-lane op chain (ROADMAP seam #1). The
'f32' mode removes the VPU limb split entirely (Mosaic lowers the f32
Precision.HIGHEST dot to multi-pass MXU limbs in hardware) at the price of
more MXU passes; 'bf16' bounds the ceiling of any limb-split saving (one
cast, no residual — too loose for the 1e-5 budget, timing reference only).

Workload: the north-star proxy distribution (Morton-coherent clustered
positions, density-correlated lognormal h). One layout build, then each
precision mode renders the SAME layout; per-mode wall is best-of-N with a
host round-trip closing each window. Accuracy is reported as the max
relative map error vs the f32/HIGHEST render (per-contribution error
~2^-24 — truth class at this scale).

Writes PRECISION_AB.json and prints one JSON line.
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
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--modes", default="f32,bf16x2,bf16x3,bf16",
        help="comma-separated precision modes to time",
    )
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

    from benchmarks.northstar_proxy import build_particles
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        deposit_coherent,
        tile_particles_coherent,
    )

    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)
    x, y, h, fields = build_particles(args.n, box, shape, order="morton")
    layout = tile_particles_coherent(x, y, h, fields, spec, donate=True)
    del x, y, h, fields

    result = {
        "n_particles": args.n,
        "backend": jax.default_backend(),
        "repeats": args.repeats,
        "modes": {},
    }

    maps = {}
    for mode in args.modes.split(","):
        mode = mode.strip()
        entry = {}
        try:
            t0 = time.perf_counter()
            out = deposit_coherent(layout, precision=mode)
            _ = float(out[0].sum())
            entry["warm_s"] = round(time.perf_counter() - t0, 3)
            best = 1e30
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out = deposit_coherent(layout, precision=mode)
                _ = float(out[0].sum())
                best = min(best, time.perf_counter() - t0)
            entry["deposit_s"] = round(best, 4)
            maps[mode] = np.asarray(out)
        except Exception as e:  # Mosaic lowering differences surface here
            entry["error"] = f"{type(e).__name__}: {e}"[:400]
        result["modes"][mode] = entry

    if "f32" in maps:
        ref = maps["f32"]
        scale = np.max(np.abs(ref), axis=(1, 2), keepdims=True)
        for mode, m in maps.items():
            err = float(np.max(np.abs(m - ref) / scale))
            result["modes"][mode]["max_rel_err_vs_f32"] = err

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PRECISION_AB.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
