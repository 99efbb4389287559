"""Benchmark: the north-star-deciding metric — adaptive-h particle
deposits/sec onto a 1024^2 multi-field map at >= 1e8 particle scale.

Workload (VERDICT r2 item 4: the headline must be the adaptive rate at
>= 1e8, not the friendliest regime): 2^27 = 1.342e8 particles — one
v5e-8 chip's share of the 1e9-particle north star — with a realistic
EAGLE-like setup: Morton-coherent clustered positions (snapshot storage
order), density-correlated lognormal smoothing lengths (mostly sub-pixel,
tail through the K=16/32/64 footprint levels), 2-field map stack, bf16x2
fused Pallas deposit. Identical to benchmarks/northstar_proxy.py.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "deposits/sec", "vs_baseline": N, ...}

vs_baseline is measured against the north-star requirement of
1e9 particles -> 1024^2 maps in < 2 s on a v5e-8, i.e. 6.25e7
particle-deposits/sec *per chip* (BASELINE.md; the reference itself
publishes no numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

NORTH_STAR_DEPOSITS_PER_SEC_PER_CHIP = 1.0e9 / 2.0 / 8.0


class _BenchTimeout(Exception):
    pass


_MAX_ATTEMPTS = 4
_PROBE_TRIES = 16  # ~75 min of tunnel-recovery patience before attempt 1
_PROBE_SLEEP = 240


def _device_probe_ok(timeout_s: int = 90) -> bool:
    """Run a trivial device op in a SUBPROCESS. A wedged axon tunnel hangs
    (or poisons) the process that touched it, so the probe must never share
    a process with the real run."""
    import subprocess

    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp; print(float(jnp.arange(4).sum()))",
            ],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def main() -> None:
    # The axon TPU tunnel wedges/restarts spontaneously (recoveries observed
    # between ~2 minutes and multiple hours); a wedged device HANGS rather
    # than raising, and a process that touched a wedged device can stay
    # poisoned after the tunnel recovers. Insurance, in order:
    #   1. subprocess probes (cheap, parent never touches the device) until
    #      the tunnel answers, before committing to the expensive attempt;
    #   2. the attempt itself under a SIGALRM watchdog — the first
    #      in-process warm-up of the 1.34e8-particle pipeline costs minutes
    #      (per-process program preparation) even with a hot compile cache,
    #      hence the generous alarm;
    #   3. on failure, RE-EXEC this script (fresh process, fresh runtime)
    #      rather than retrying in the poisoned one.
    import signal

    attempt = int(os.environ.get("AST_BENCH_ATTEMPT", "1"))

    for i in range(_PROBE_TRIES):
        if _device_probe_ok():
            break
        sys.stderr.write(f"bench: device probe {i + 1} wedged; waiting\n")
        time.sleep(_PROBE_SLEEP)
    # fall through even if every probe failed: the CPU smoke path (or a
    # late tunnel recovery) may still produce a result under the watchdog

    def _alarm(signum, frame):  # pragma: no cover - hardware-path insurance
        raise _BenchTimeout("bench attempt exceeded watchdog")

    has_alarm = hasattr(signal, "SIGALRM")
    if has_alarm:
        signal.signal(signal.SIGALRM, _alarm)
    try:
        if has_alarm:
            signal.alarm(2400)
        _run()
        if has_alarm:
            signal.alarm(0)
        return
    except Exception as err:  # pragma: no cover - hardware-path insurance
        if has_alarm:
            signal.alarm(0)
        if attempt >= _MAX_ATTEMPTS:
            raise
        sys.stderr.write(
            f"bench attempt {attempt} failed ({type(err).__name__}); "
            f"re-execing fresh process\n"
        )
        time.sleep(120)
        os.environ["AST_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(
            sys.executable, [sys.executable, os.path.abspath(__file__)]
        )


def _run() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_bench_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from northstar_proxy import run as proxy_run

    if on_tpu:
        n = 1 << 27  # one chip's share of the 1e9-particle north star
        res = proxy_run(n, "morton", repeats=3, engine="coherent")
        rate = res["deposits_per_sec"]
        print(
            json.dumps(
                {
                    "metric": (
                        "adaptive-h particle-deposits/sec, 1024^2 2-field map "
                        "stack at 1.34e8 particles (coherent-order fused pallas deposit "
                        "incl. device layout; realistic Morton-ordered workload)"
                    ),
                    "value": rate,
                    "unit": "deposits/sec",
                    "vs_baseline": round(
                        rate / NORTH_STAR_DEPOSITS_PER_SEC_PER_CHIP, 4
                    ),
                    "n_particles": res["n_particles"],
                    "wall_clock_s": res["wall_s"],
                    "north_star_budget_s": res["budget_s"],
                    "north_star_pass": res["pass"],
                    "phase_layout_s": res["phase_layout_s"],
                    "phase_deposit_s": res["phase_deposit_s"],
                    "level_counts": res["level_counts"],
                    "backend": backend,
                }
            )
        )
        return

    # CPU smoke path: tiny instance of the same workload through the XLA
    # stencil engine (interpreter-mode Pallas is orders slower)
    import numpy as np
    import jax.numpy as jnp

    from astro_sph_tools_tpu.ops.deposit import MapSpec, deposit_2d_fixed_h

    n = 1 << 16
    box = 25.0
    shape = (256, 256)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box))
    px = box / shape[0]
    key = jax.random.PRNGKey(7)
    kx, ky, kh, km = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (n,), jnp.float32, 0.0, box)
    y = jax.random.uniform(ky, (n,), jnp.float32, 0.0, box)
    h = jax.random.uniform(kh, (n,), jnp.float32, 0.5 * px, 1.45 * px)
    m = jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0)
    values = jnp.stack([m, m * 2.0], axis=1)
    out = deposit_2d_fixed_h(x, y, h, values, spec, K=8, chunk=8192)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = deposit_2d_fixed_h(x, y, h, values, spec, K=8, chunk=8192)
    checksum = float(out.sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    print(
        json.dumps(
            {
                "metric": "particle-deposits/sec, 256^2 2-field (cpu smoke)",
                "value": round(n / dt, 1),
                "unit": "deposits/sec",
                "vs_baseline": round(
                    (n / dt) / NORTH_STAR_DEPOSITS_PER_SEC_PER_CHIP, 4
                ),
                "n_particles": n,
                "wall_clock_s": round(dt, 4),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
