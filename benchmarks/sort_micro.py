"""Sort-primitive microbenchmark for the random-order layout redesign.

NORTHSTAR_RANDOM (r4): the shuffled-input 2^27 render spends 1.22 s of its
1.76 s wall in ONE global 6-operand ``lax.sort``. Before building a
replacement (Pallas bucket/radix layout), measure what the candidate
building blocks actually cost on this chip at the headline scale:

- ``global_K``:   one lax.sort of N elements, K operands (key + K-1 f32)
- ``rows_L_K``:   batched row sort, rows of length L (sorts along the last
                  axis are independent bitonic networks: log^2 L passes,
                  not log^2 N)
- ``transpose``:  (N/L, L) -> (L, N/L) for 6 operands (the quantile-shuffle
                  step of a columnsort-style grouping)
- ``take``:       element gather of one f32 operand at N random indices
                  (the "sort keys only, gather payloads" alternative)
- ``searchsorted``: vmapped per-row run boundaries for B buckets

Writes SORT_MICRO.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, repeats=3):
    import jax

    out = fn(*args)  # warm/compile
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])  # force a real host round-trip
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 27)
    ap.add_argument("--keys", type=int, default=1344,
                    help="distinct composite keys (level,tile) at 1024^2")
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
    import jax.numpy as jnp

    N = args.n
    res = {"n": N, "backend": jax.default_backend()}

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    keys = jax.random.randint(k1, (N,), 0, args.keys, dtype=jnp.int32)
    pay = [jax.random.uniform(jax.random.fold_in(k2, i), (N,), jnp.float32)
           for i in range(5)]
    jax.block_until_ready((keys, pay))

    @jax.jit
    def global_sort6(k, p):
        return jax.lax.sort([k, *p], num_keys=1, is_stable=False)

    @jax.jit
    def global_sort2(k, p):
        return jax.lax.sort([k, p[0]], num_keys=1, is_stable=False)

    @jax.jit
    def global_sort4(k, p):
        return jax.lax.sort([k, *p[:3]], num_keys=1, is_stable=False)

    res["global_2op_s"] = round(_time(global_sort2, keys, pay, repeats=args.repeats), 4)
    res["global_4op_s"] = round(_time(global_sort4, keys, pay, repeats=args.repeats), 4)
    res["global_6op_s"] = round(_time(global_sort6, keys, pay, repeats=args.repeats), 4)

    for L in (2048, 8192, 16384, 65536):
        rows = N // L

        @jax.jit
        def row_sort(k, p, L=L, rows=rows):
            ops = [k.reshape(rows, L)] + [q.reshape(rows, L) for q in p]
            return jax.lax.sort(ops, num_keys=1, is_stable=False, dimension=-1)

        res[f"rows{L}_6op_s"] = round(_time(row_sort, keys, pay, repeats=args.repeats), 4)

        @jax.jit
        def row_sort2(k, p, L=L, rows=rows):
            idx = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
            return jax.lax.sort([k.reshape(rows, L), idx], num_keys=1,
                                is_stable=False, dimension=-1)

        res[f"rows{L}_2op_s"] = round(_time(row_sort2, keys, pay, repeats=args.repeats), 4)

    L = 2048

    @jax.jit
    def transpose6(k, p):
        return [a.reshape(N // L, L).T.reshape(-1) for a in (k, *p)]

    res["transpose6_s"] = round(_time(transpose6, keys, pay, repeats=args.repeats), 4)

    perm = jax.random.permutation(k1, N)

    @jax.jit
    def take1(p, idx):
        return jnp.take(p, idx)

    res["take_1op_s"] = round(_time(take1, pay[0], perm, repeats=args.repeats), 4)

    B = 64
    bounds = jnp.linspace(0, args.keys, B + 1).astype(jnp.int32)[1:-1]

    @jax.jit
    def runs(k):
        ks = jax.lax.sort([k.reshape(N // L, L)], num_keys=1, dimension=-1)[0]
        return jax.vmap(lambda row: jnp.searchsorted(row, bounds))(ks)

    res["rowsort1op_searchsorted_s"] = round(_time(runs, keys, repeats=args.repeats), 4)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "SORT_MICRO.json"
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
