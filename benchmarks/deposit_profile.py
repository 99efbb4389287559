"""Phase/scaling profile of the fused deposit on the real chip.

Answers the questions that decide where the next deposit optimisation goes:

1. bench-shape split: tile sort vs Pallas pass vs overlap-add wall-clock;
2. Pallas pass cost vs number of fields (does the matmul M dimension
   F*R < 128 cost proportionally, or is it padded to 128 — i.e. would
   packing several column-offset iterations into M be ~free?);
3. Pallas pass cost vs footprint level K at fixed contribution count.

Run on the TPU host: python benchmarks/deposit_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_bench_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_pallas import (
        PALLAS_LEVELS,
        _cached_level_pipeline,
        _level_geometry,
        deposit_2d_pallas,
    )

    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box))
    px = box / shape[0]
    rng = np.random.default_rng(7)
    out = {"backend": jax.default_backend(), "phases": {}, "fields": {}, "levels": {}}

    def timed(fn, *args, reps=3):
        fn(*args)  # warm (compile)
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*args)
            float(np.asarray(r).sum() if hasattr(r, "sum") else 0.0)
            best = min(best, time.perf_counter() - t0)
        return best

    # --- 1. bench-shape phase split (K=8, 2 fields, 33.5M) ----------------
    n = 1 << 25
    x = jnp.asarray(rng.uniform(0, box, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, box, n), jnp.float32)
    h = jnp.asarray(rng.uniform(0.5 * px, 1.45 * px, n), jnp.float32)
    vals = jnp.asarray(rng.uniform(0.5, 2.0, (2, n)), jnp.float32)
    jax.block_until_ready((x, y, h, vals))

    cfg = PALLAS_LEVELS[0]
    geom = _level_geometry(cfg, spec)
    extent = tuple(float(e) for e in spec.extent)

    # full pipeline
    pipe = _cached_level_pipeline(
        geom, spec.shape, extent, False, 0.5, 2, "cubic_spline", 2.0,
        "bf16x2", False,
    )
    # reduce on device: the 8 MB map D2H would otherwise add ~0.2 s of
    # tunnel transfer to the timing
    t_full = timed(lambda: jnp.sum(pipe(x, y, h, vals)))

    # sort alone (same operand mix the pipeline uses). The result MUST be
    # reduced on device: returning a 33M-element array makes the timing
    # measure a 134 MB D2H transfer through the tunnel, not the sort
    # (first version of this script reported 4.2 s for a 0.28 s sort).
    @jax.jit
    def sort_only(x, y, h, vals):
        tile = (x * 46.08).astype(jnp.int32)  # same key cardinality (~1152)
        ops = jax.lax.sort([tile, x, y, h, vals[0], vals[1]], num_keys=1)
        return sum(jnp.sum(a[::65536]) for a in ops[1:])

    t_sort = timed(lambda: sort_only(x, y, h, vals))
    out["phases"] = {
        "n": n, "full_pipeline_s": round(t_full, 4), "sort_only_s": round(t_sort, 4),
        "pass_plus_overlap_s": round(t_full - t_sort, 4),
        "deposits_per_sec": round(2 * n / t_full, 0),
    }
    print(json.dumps(out["phases"]), flush=True)

    # --- 2. field scaling at K=8 (M = F*R = 16F) ---------------------------
    n2 = 1 << 24
    x2 = jnp.asarray(rng.uniform(0, box, n2), jnp.float32)
    y2 = jnp.asarray(rng.uniform(0, box, n2), jnp.float32)
    h2 = jnp.asarray(rng.uniform(0.5 * px, 1.45 * px, n2), jnp.float32)
    for F in (1, 2, 3, 5):
        v = jnp.asarray(rng.uniform(0.5, 2.0, (F, n2)), jnp.float32)
        jax.block_until_ready(v)
        t = timed(lambda v=v, F=F: jnp.sum(deposit_2d_pallas(x2, y2, h2, v, spec)))
        out["fields"][f"F={F} (M={16*F})"] = round(t, 4)
        print(f"F={F}: {t:.4f} s", flush=True)

    # --- 3. K scaling at fixed contributions -------------------------------
    for cfg, log2n in zip(PALLAS_LEVELS, (24, 22, 20, 18)):
        nl = 1 << log2n
        xl = jnp.asarray(rng.uniform(0, box, nl), jnp.float32)
        yl = jnp.asarray(rng.uniform(0, box, nl), jnp.float32)
        smax = cfg.max_s_pix
        smin = smax / 2 + 0.6 if cfg.K > 8 else 1.0
        hl = jnp.asarray(
            rng.uniform(smin * px / 2, (smax - 0.05) * px / 2, nl), jnp.float32
        )
        vl = jnp.asarray(rng.uniform(0.5, 2.0, (2, nl)), jnp.float32)
        jax.block_until_ready(vl)
        t = timed(lambda: jnp.sum(deposit_2d_pallas(xl, yl, hl, vl, spec, level=cfg)))
        contrib = 2 * nl * cfg.K * (cfg.K + 1)
        out["levels"][f"K={cfg.K}"] = {
            "n": nl, "wall_s": round(t, 4),
            "contrib_per_sec": round(contrib / t / 1e9, 2),
        }
        print(f"K={cfg.K}: {t:.4f} s ({contrib/t/1e9:.2f} G contrib/s)", flush=True)

    with open(os.path.join(_ROOT, "DEPOSIT_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": "DEPOSIT_PROFILE.json"}))


if __name__ == "__main__":
    main()
