"""VPU op-cost microbenchmark for the deposit footprint chain.

PRECISION_AB.json bounds the limb-split share of the coherent pass at ~14%
(bf16 vs bf16x2); the remaining VPU time is the per-(row, column) chain
q2 -> sqrt -> spline shape. This kernel measures the real per-element cost
of each piece in-register (a VMEM-resident (16, 2048) block looped many
times — XLA elementwise timings at HBM scale are bandwidth-bound and say
nothing about VPU op cost):

- fma:    x*a+b                      (baseline ALU op)
- sqrt:   jnp.sqrt(x)
- rsqrt:  x * lax.rsqrt(x)           (the sqrt-free identity q = q2*rsqrt(q2))
- spline: cubic_spline_shape(x)      (the piecewise polynomial alone)
- chain:  shape(sqrt(q2-chain))      (the full per-k footprint chain)
- chain_rsqrt: same with q2*rsqrt(q2)

Writes VPU_MICRO.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R, C = 16, 2048


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from astro_sph_tools_tpu.kernels.splines import cubic_spline_shape

    def make(body):
        def kern(x_ref, o_ref):
            def step(_, acc):
                # acc feeds the op so iterations can't be hoisted; the
                # 0.25 re-scale keeps values in the kernel-support range
                return body(0.25 * acc) + 1.0

            o_ref[...] = jax.lax.fori_loop(
                0, args.iters, step, x_ref[...]
            )

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )

    bodies = {
        "fma": lambda x: x * 1.000001 + 1e-7,
        "sqrt": lambda x: jnp.sqrt(x),
        "rsqrt": lambda x: x * jax.lax.rsqrt(x),
        "spline": cubic_spline_shape,
        "chain": lambda x: cubic_spline_shape(jnp.sqrt(x * x + 0.3)),
        "chain_rsqrt": lambda x: cubic_spline_shape(
            (lambda t: t * jax.lax.rsqrt(t))(x * x + 0.3)
        ),
    }

    x = jnp.full((R, C), 1.7, jnp.float32)
    res = {
        "backend": jax.default_backend(),
        "iters": args.iters,
        "block": [R, C],
        "ns_per_element_op": {},
    }
    for name, body in bodies.items():
        fn = make(body)
        out = fn(x)  # compile + warm
        out.block_until_ready()
        best = 1e30
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(x)
            _ = float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        res["ns_per_element_op"][name] = round(
            best / args.iters / (R * C) * 1e9, 4
        )

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "VPU_MICRO.json",
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
