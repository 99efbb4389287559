"""Pallas run-append microbenchmark (shear-layout design probe).

The shear layout's last stage appends ~1e5 variable-length runs of packed
32 B records from a row-sorted source array into key-grouped destination
regions. This measures the two candidate kernels at that scale:

- ``nowait``: HBM->HBM DMAs round-robin over S semaphore slots, waiting
  only on slot reuse (throughput ceiling; write-overlap unsafe).
- ``chain``:  wait the previous run's DMA before issuing the next run's
  (the correctness ordering for overwrite-slack appends).

Two sweeps: issue-rate (many small runs) and bandwidth (few big runs).
Writes APPEND_MICRO.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REC = 8  # f32 lanes per record
S = 8  # in-flight DMA slots
RPB = 512  # runs per grid block (schedule slice resident in SMEM)


def build(NR, W, chain):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_gang = NR * W  # W is in gangs of 128 records

    def kern(sched_ref, src_ref, dst_ref, sem):
        def copy(i, slot):
            # gang layout (G, 8, 128): one gang = 128 consecutive records
            # x 8 fields = 4 KB contiguous; dim-0 (gang) offsets are
            # untiled-major, so ANY dynamic offset is legal and a W-gang
            # slab is a single contiguous W*4KB HBM transfer
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(sched_ref[0, i, 0], W)],
                dst_ref.at[pl.ds(sched_ref[0, i, 1], W)],
                sem.at[slot],
            )

        def body(i, _):
            slot = jax.lax.rem(i, S)
            if chain:
                @pl.when(i > 0)
                def _():
                    copy(i, jax.lax.rem(i + S - 1, S)).wait()
            else:
                @pl.when(i >= S)
                def _():
                    copy(i, slot).wait()
            copy(i, slot).start()
            return 0

        jax.lax.fori_loop(0, RPB, body, 0)

        if chain:
            copy(RPB - 1, (RPB - 1) % S).wait()
        else:
            def drain(s, _):
                # last S copies are in flight, one per slot
                i = RPB - S + s
                copy(i, jax.lax.rem(i, S)).wait()
                return 0

            jax.lax.fori_loop(0, S, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NR // RPB,),
        in_specs=[
            pl.BlockSpec((1, RPB, 2), lambda b: (b, 0, 0),
                         memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_gang + W, REC, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    return jax.jit(lambda s, x: call(s, x))


def measure(NR, W, repeats):
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_rec = NR * W * 128  # W is in gangs of 128 records
    rng = np.random.default_rng(0)
    src_off = (rng.permutation(NR).astype(np.int64) * W).astype(np.int32)
    dst_off = (np.arange(NR, dtype=np.int64) * W).astype(np.int32)
    sched = jnp.asarray(
        np.stack([src_off, dst_off], axis=1).reshape(NR // RPB, RPB, 2)
    )
    src = jnp.arange(n_rec * REC, dtype=jnp.float32).reshape(n_rec // 128, REC, 128)
    out = {}
    for name, chain in (("nowait", False), ("chain", True)):
        fn = build(NR, W, chain)
        o = fn(sched, src)
        jax.block_until_ready(o)
        float(o[0, 0, 0])
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            o = fn(sched, src)
            jax.block_until_ready(o)
            float(o[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        got = np.asarray(o[: 2 * W])
        want = np.asarray(src[src_off[0] : src_off[0] + W])
        want2 = np.asarray(src[src_off[1] : src_off[1] + W])
        ok = bool(
            np.array_equal(got[:W], want) and np.array_equal(got[W:], want2)
        )
        out[name] = {
            "s": round(best, 4),
            "runs_per_s": round(NR / best),
            "gbps_rw": round(n_rec * REC * 4 * 2 / best / 1e9, 1),
            "ok": ok,
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     ".jax_bench_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    res = {"backend": jax.default_backend(), "rec_f32": REC, "slots": S}
    # issue-rate probe: 128k runs x 2 gangs (8 KB DMAs, 1 GB payload)
    res["issue_128k_runs_2gang"] = measure(1 << 17, 2, args.repeats)
    # production shape: 128k runs x 10 gangs (40 KB DMAs, 5.4 GB payload)
    res["prod_128k_runs_10gang"] = measure(1 << 17, 10, args.repeats)
    # bandwidth probe: 16k runs x 16 gangs (64 KB DMAs, 1 GB payload)
    res["bw_16k_runs_16gang"] = measure(1 << 14, 16, args.repeats)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "APPEND_MICRO.json",
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
