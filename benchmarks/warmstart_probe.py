"""Warm-start mitigation probe (VERDICT r4 item 9 / stretch).

Round-4 finding: the axon backend spends ~45 s of per-process program
preparation on ONE big cached executable (n_programs_warm = 4, one
"Finished XLA compilation ... 44.9 sec" event) even with a warm
persistent compile cache — the deployment-critical warm-start floor.

This probes whether ``jax.experimental.serialize_executable`` can skip
that per-process prep: process A AOT-compiles a representative big
program (the 6-operand 2^26 sort — the same executable class the layout
stage ships) and serialises it; process B deserialises and runs it,
timing load + first execution against a fresh jit in the same process.

Usage:  python benchmarks/warmstart_probe.py save   # writes /tmp/ast_exe.bin
        python benchmarks/warmstart_probe.py load   # fresh process
        python benchmarks/warmstart_probe.py jit    # fresh-process baseline
Driver: benchmarks/tpu_queue*.sh runs the three phases back to back and
collects WARMSTART.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXE = "/tmp/ast_exe.bin"
N = 1 << 26
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, "WARMSTART.json"
)


def build():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     ".jax_bench_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def fn(k, a, b, c, d, e):
        return jax.lax.sort([k, a, b, c, d, e], num_keys=1, is_stable=False)

    key = jax.random.key(0)
    ops = [jax.random.randint(key, (N,), 0, 4096, dtype=jnp.int32)] + [
        jax.random.uniform(jax.random.fold_in(key, i), (N,), jnp.float32)
        for i in range(5)
    ]
    return jax.jit(fn), ops


def record(phase, **kv):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[phase] = kv
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({phase: kv}), flush=True)


def main() -> int:
    import jax

    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    fn, ops = build()
    if mode == "save":
        from jax.experimental import serialize_executable

        t0 = time.perf_counter()
        compiled = fn.lower(*ops).compile()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        import pickle

        with open(EXE, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        ser_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(*ops)
        jax.block_until_ready(out)
        float(out[0][0])
        exec_s = time.perf_counter() - t0
        record(
            "save", compile_s=round(compile_s, 2),
            serialize_s=round(ser_s, 2), first_exec_s=round(exec_s, 2),
            payload_mb=round(len(payload) / 1e6, 1) if isinstance(payload, (bytes, bytearray)) else None,
            backend=jax.default_backend(),
        )
    elif mode == "load":
        from jax.experimental import serialize_executable

        # a fresh process: the question is whether deserialize_and_load
        # skips the ~45 s axon per-process program prep a cached jit pays
        fn2, ops = build()
        import pickle

        t0 = time.perf_counter()
        with open(EXE, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        compiled = serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree
        )
        load_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compiled(*ops)
        jax.block_until_ready(out)
        float(out[0][0])
        exec_s = time.perf_counter() - t0
        record(
            "load", load_s=round(load_s, 2), first_exec_s=round(exec_s, 2),
            backend=jax.default_backend(),
        )
    elif mode == "jit":
        t0 = time.perf_counter()
        out = fn(*ops)
        jax.block_until_ready(out)
        float(out[0][0])
        record(
            "jit_baseline", warm_first_s=round(time.perf_counter() - t0, 2),
            backend=jax.default_backend(),
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
