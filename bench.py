"""Benchmark: particle deposits/sec onto a 1024^2 multi-field map (north star).

Runs on whatever accelerator JAX finds (the driver runs it on one real TPU
chip). Workload: BASELINE config-2 shaped — synthetic snapshot-scale particle
set, adaptive-ish smoothing lengths sized to the K=8 Pallas level, 1024^2
map, 2-field stack (surface density + mass-weighted quantity), fused Pallas
deposit (split-bf16 precision, <=1e-5 fidelity class).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "deposits/sec", "vs_baseline": N, ...}

vs_baseline is measured against the north-star requirement of
1e9 particles -> 1024^2 maps in < 2 s on a v5e-8, i.e. 6.25e7
particle-deposits/sec *per chip* (BASELINE.md; the reference itself publishes
no numbers).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NORTH_STAR_DEPOSITS_PER_SEC_PER_CHIP = 1.0e9 / 2.0 / 8.0


class _BenchTimeout(Exception):
    pass


def main() -> None:
    # The axon TPU tunnel wedges/restarts spontaneously (recoveries observed
    # between ~2 and ~60 minutes); a wedged device HANGS rather than raising,
    # so each attempt runs under a SIGALRM watchdog, then retries after a
    # cool-down rather than failing the round's benchmark on a transient.
    import signal

    def _alarm(signum, frame):  # pragma: no cover - hardware-path insurance
        raise _BenchTimeout("bench attempt exceeded watchdog")

    has_alarm = hasattr(signal, "SIGALRM")
    if has_alarm:
        signal.signal(signal.SIGALRM, _alarm)
    for attempt, cooldown in ((1, 180), (2, 300), (3, 0)):
        try:
            if has_alarm:
                signal.alarm(540)
            _run()
            if has_alarm:
                signal.alarm(0)
            return
        except Exception as err:  # pragma: no cover - hardware-path insurance
            if has_alarm:
                signal.alarm(0)
            if cooldown == 0:
                raise
            sys.stderr.write(
                f"bench attempt {attempt} failed ({type(err).__name__}); "
                f"retrying in {cooldown}s\n"
            )
            time.sleep(cooldown)


def _run() -> None:
    import os

    import jax

    # amortise the (one-time per shape) XLA sort compile across bench runs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_bench_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_pallas import (
        PALLAS_LEVELS,
        deposit_2d_pallas,
    )

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n = 1 << (25 if on_tpu else 16)  # 33.5M on TPU, small on CPU smoke runs

    box = 25.0
    shape = (1024, 1024) if on_tpu else (256, 256)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box))
    px = box / shape[0]

    key = jax.random.PRNGKey(7)
    kx, ky, kh, km, kt = jax.random.split(key, 5)
    x = jax.random.uniform(kx, (n,), jnp.float32, 0.0, box)
    y = jax.random.uniform(ky, (n,), jnp.float32, 0.0, box)
    # smoothing lengths within the K=8 level (footprint <= 8 px)
    h = jax.random.uniform(kh, (n,), jnp.float32, 0.5 * px, 1.45 * px)
    m = jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0)
    t = jax.random.uniform(kt, (n,), jnp.float32, 1e4, 1e6)
    fields = jnp.stack([m, m * t], axis=0)
    jax.block_until_ready((x, y, h, fields))

    if on_tpu:

        def render():
            return deposit_2d_pallas(
                x, y, h, fields, spec, precision="bf16x2", level=PALLAS_LEVELS[0]
            )

    else:
        # CPU smoke path: interpreter-mode Pallas is orders slower than the
        # XLA stencil path, so smoke-test with the latter
        from astro_sph_tools_tpu.ops.deposit import deposit_2d_fixed_h

        def render():
            return deposit_2d_fixed_h(x, y, h, fields.T, spec, K=8, chunk=8192)

    # warm up / compile
    out = render()
    jax.block_until_ready(out)
    _ = float(out.sum())

    # a host round-trip (not just block_until_ready, which the axon tunnel
    # has been observed to satisfy early) closes the timed window; one
    # round-trip for all iterations keeps tunnel latency out of the rate.
    # Best of 3 windows: the tunnel intermittently stalls dispatch for
    # hundreds of ms, which a single window folds into the rate (observed
    # 66-83M deposits/s scatter for identical programs across a day).
    iters = 3 if on_tpu else 1
    dt = 1e30
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = render()
        checksum = float(out[0].sum())
        dt = min(dt, (time.perf_counter() - t0) / iters)
    deposits_per_sec = n / dt

    # secondary: the adaptive-h device pipeline (multi-level tile sort +
    # per-level fused passes) on a realistic lognormal footprint spectrum —
    # VERDICT r1 asked the bench not to measure only the friendliest regime.
    # Guarded so a failure here never costs the primary metric.
    adaptive = {}
    if on_tpu:
        try:
            from astro_sph_tools_tpu.ops.deposit_pallas import (
                deposit_tiled,
                tile_particles,
            )

            spec_a = MapSpec(
                shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True
            )
            kh2, km2 = jax.random.split(jax.random.PRNGKey(12), 2)
            log_h = jax.random.normal(kh2, (n,)) * 0.55 + jnp.log(0.9 * px)
            h_a = jnp.clip(jnp.exp(log_h), 0.25 * px, 24 * px).astype(jnp.float32)
            jax.block_until_ready(h_a)

            def render_adaptive():
                tp = tile_particles(x, y, h_a, fields, spec_a)
                return deposit_tiled(tp, precision="bf16x2")

            out_a = render_adaptive()
            jax.block_until_ready(out_a)  # compile/load
            dt_a = 1e30
            for _ in range(3):  # best of 3 (tunnel dispatch stalls)
                t0 = time.perf_counter()
                out_a = render_adaptive()
                _ = float(out_a[0].sum())
                dt_a = min(dt_a, time.perf_counter() - t0)
            adaptive = {
                "adaptive_deposits_per_sec": round(n / dt_a, 1),
                "adaptive_wall_clock_s": round(dt_a, 4),
            }
        except Exception as err:  # pragma: no cover - keep the primary metric
            adaptive = {"adaptive_error": type(err).__name__}

    path = "fused pallas deposit incl. tile sort" if on_tpu else "xla stencil deposit (cpu smoke)"
    print(
        json.dumps(
            {
                "metric": f"particle-deposits/sec, {shape[0]}^2 2-field map stack ({path})",
                "value": round(deposits_per_sec, 1),
                "unit": "deposits/sec",
                "vs_baseline": round(
                    deposits_per_sec / NORTH_STAR_DEPOSITS_PER_SEC_PER_CHIP, 4
                ),
                "n_particles": n,
                "wall_clock_s": round(dt, 4),
                "backend": backend,
                **adaptive,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
