"""North-star per-chip proxy: 1.25e8-particle adaptive-h 1024^2 multi-field
device-resident render, measured on one chip.

The north star is 1024^2 multi-field maps from a 1e9-particle snapshot in
< 2 s on a v5e-8 (BASELINE.md). One chip's share is 1e9/8 = 1.25e8 particles
with the SAME 2 s wall (the map reduction is a psum over tiles of a 1024^2
stack — negligible next to the deposit); this proxy measures exactly that
share device-resident: N = 2^27 = 1.342e8 particles >= 1.25e8.

Workload realism (VERDICT r2 item 1):
- positions: Morton-coherent clustered draw — a 256^2 Morton-ordered cell
  grid with a blob-mixture density field; consecutive particles are
  spatially adjacent, as in Peano-Hilbert-ordered EAGLE/SWIFT snapshots on
  disk (the reference's real inputs; cf. pyread_eagle's hash-cell chunk
  reads, `io/EAGLE/_SnapshotEAGLE.py:115-130`). ``--order random``
  shuffles cell assignment for the incoherent worst case.
- smoothing lengths: density-correlated (h ~ rho^(-1/3)) with lognormal
  scatter, median ~0.5 px (mostly sub-pixel), tail clipped into the K=64
  level so every particle stays on the device path.
- 2-field map stack (surface density + mass-weighted quantity), bf16x2
  fused Pallas deposit — the <=1e-5 fidelity class (FIDELITY.json).

Writes NORTHSTAR.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = 2.0  # the per-chip north-star wall for 1.25e8 particles


def _morton_order_2d(bits: int) -> np.ndarray:
    """Morton (z-order) rank of each cell of a (2^bits, 2^bits) grid,
    flattened row-major; rank[i * n + j] = interleave(bits of i, j)."""
    n = 1 << bits
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    rank = np.zeros((n, n), dtype=np.int64)
    for b in range(bits):
        rank |= ((ii >> b) & 1) << (2 * b + 1)
        rank |= ((jj >> b) & 1) << (2 * b)
    return rank.reshape(-1)


def build_particles(n: int, box: float, shape, *, order: str, seed: int = 7):
    """Device-resident clustered particle set (x, y, h, fields)."""
    import jax
    import jax.numpy as jnp

    bits = 8
    n_cells = 1 << (2 * bits)  # 256^2
    grid = 1 << bits
    rng = np.random.default_rng(seed)

    # blob-mixture density on the cell grid: point-mass splat + periodic FFT
    # Gaussian smoothing at three scales (a cheap lognormal-ish clustered
    # field; the weak single-core host makes per-blob loops seconds-scale)
    dens = np.zeros((grid, grid))
    fi = np.fft.fftfreq(grid)
    k2 = fi[:, None] ** 2 + fi[None, :] ** 2
    for n_blobs, sig_cells in ((400, 1.5), (1200, 3.0), (600, 6.0)):
        ci = rng.integers(0, grid, n_blobs)
        cj = rng.integers(0, grid, n_blobs)
        w = np.exp(rng.normal(0.0, 1.0, n_blobs))
        point = np.zeros((grid, grid))
        np.add.at(point, (ci, cj), w)
        kernel_ft = np.exp(-2.0 * (np.pi * sig_cells) ** 2 * k2)
        dens += np.real(np.fft.ifft2(np.fft.fft2(point) * kernel_ft))
    # raise the contrast toward the ~4-dex dynamic range of real gas
    # density fields (voids host the large-h tail)
    dens = np.maximum(dens, 0.0) ** 1.5
    dens = dens + 0.02 * dens.mean()
    dens = dens.reshape(-1)

    # order cells along the Morton curve -> coherent on-disk-like layout
    morton = _morton_order_2d(bits)
    cell_seq = np.argsort(morton)  # cell index visited at each curve step
    p = dens[cell_seq] / dens.sum()
    cum = np.cumsum(p)

    jx = jax.random  # device-side per-particle draws
    key = jx.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6 = jx.split(key, 6)
    u01 = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    step = jnp.searchsorted(jnp.asarray(cum, jnp.float32), u01)  # curve step
    step = jnp.clip(step, 0, n_cells - 1)
    if order == "random":
        # incoherent worst case with the same density field: iid inverse-CDF
        # draws instead of the sequential curve sweep
        step = jnp.searchsorted(
            jnp.asarray(cum, jnp.float32), jx.uniform(k6, (n,))
        )
        step = jnp.clip(step, 0, n_cells - 1)
    cell = jnp.asarray(cell_seq, jnp.int32)[step]
    ci = (cell // grid).astype(jnp.float32)
    cj = (cell % grid).astype(jnp.float32)
    cw = box / grid
    x = (cj + jx.uniform(k1, (n,))) * cw
    y = (ci + jx.uniform(k2, (n,))) * cw

    # density-correlated smoothing lengths, median ~0.5 px, K=64-capped
    px = box / shape[0]
    rho = jnp.asarray(dens / dens.mean(), jnp.float32)[cell]
    h_base = 0.5 * px * rho ** (-1.0 / 3.0)
    h = h_base * jnp.exp(0.6 * jx.normal(k3, (n,)))
    h = jnp.clip(h, 0.02 * px, 15.4 * px).astype(jnp.float32)

    m = jx.uniform(k4, (n,), jnp.float32, 0.5, 2.0)
    t = jx.uniform(k5, (n,), jnp.float32, 1e4, 1e6)
    fields = jnp.stack([m, m * t], axis=0)
    del m, t
    jax.block_until_ready((x, y, h, fields))
    return x, y, h, fields


def run(n: int, order: str, repeats: int = 3, engine: str = "sorted",
        prep=None, window: int = 0, caps_slack=None,
        measure_phases: bool = True, layout: str = "auto") -> dict:
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
    from astro_sph_tools_tpu.ops.deposit_pallas import deposit_tiled, tile_particles

    backend = jax.default_backend()
    box = 25.0
    shape = (1024, 1024)
    spec = MapSpec(shape=shape, extent=(0.0, box, 0.0, box), periodic_wrap=True)

    t0 = time.perf_counter()
    gen = lambda: build_particles(n, box, shape, order=order)
    x, y, h, fields = gen()
    gen_s = time.perf_counter() - t0

    if engine == "coherent-fused":
        # zero-sync single-program render: capacities calibrated from ONE
        # synced layout (not timed), then every render is a single dispatch
        # whose counts never return to the host
        from astro_sph_tools_tpu.ops.deposit_coherent import (
            caps_from_layout,
            deposit_2d_coherent_fused,
        )

        lay = tile_particles_coherent(x, y, h, fields, spec, donate=True, prep=prep)
        caps = caps_from_layout(lay, slack=caps_slack)
        level_counts = dict(lay.stats)
        n_oversize = int(lay.n_tail_oversize)
        del lay

        def fused():
            return deposit_2d_coherent_fused(
                x, y, h, fields, spec, caps, precision="bf16x2",
                donate=True, prep=prep,
            )

        from astro_sph_tools_tpu.utils.profiling import count_compilations

        x, y, h, fields = gen()
        t0 = time.perf_counter()
        with count_compilations() as progs:
            out, okf = fused()
            _ = float(out[0].sum())
        warm_s = time.perf_counter() - t0
        n_programs_warm = len(progs)
        assert bool(okf), "calibrated capacities overflowed on warm render"

        wall = 1e30
        for _ in range(repeats):
            del out
            x, y, h, fields = gen()
            t0 = time.perf_counter()
            out, okf = fused()
            _ = float(out[0].sum())
            wall = min(wall, time.perf_counter() - t0)
            assert bool(okf)

        return {
            "metric": "north-star per-chip proxy: adaptive 1024^2 2-field render wall",
            "n_particles": n,
            "order": order,
            "engine": engine,
        "layout": layout if engine != "coherent" else None,
            "prep": prep,
            "caps_slack": caps_slack,
            "wall_s": round(wall, 4),
            "budget_s": BUDGET_S,
            "pass": bool(wall < BUDGET_S and n >= 1.25e8),
            "deposits_per_sec": round(n / wall, 1),
            "phase_layout_s": None,  # single fused program: no phase split
            "phase_deposit_s": None,
            "level_counts": level_counts,
            "n_oversize": n_oversize,
            "warm_first_s": round(warm_s, 2),
            "n_programs_warm": n_programs_warm,
            "gen_s": round(gen_s, 2),
            "backend": backend,
        }

    # the layout build DONATES the input buffers (the sort double-buffers +
    # layout arrays brush 16 GB HBM at 2^27 otherwise), so inputs are
    # regenerated before every timed iteration — generation is excluded
    # from the timed window (a resident service reuses its layout; the
    # north-star wall is layout + deposit)
    if engine == "bucketed":
        # random-order production path: coarse shear bucketing feeding the
        # coherent engine (ops.layout_shear.deposit_2d_bucketed)
        from astro_sph_tools_tpu.ops.layout_shear import deposit_2d_bucketed

        def build(*a):
            return a

        def render(tp):
            xb, yb, hb, fb, specb = tp
            return deposit_2d_bucketed(
                xb, yb, hb, fb, specb, precision="bf16x2", donate=True
            )
    elif engine == "coherent":
        def build(*a):
            return tile_particles_coherent(
                *a, donate=True, prep=prep, window=window
            )

        def render(tp):
            return deposit_coherent(tp, precision="bf16x2")
    else:
        def build(*a):
            return tile_particles(
                *a, need_perm=False, donate=True, layout=layout
            )

        def render(tp):
            return deposit_tiled(tp, precision="bf16x2")

    def full():
        tp = build(x, y, h, fields, spec)
        return tp, render(tp)

    # warm (compile + program prepare)
    from astro_sph_tools_tpu.utils.profiling import count_compilations

    t0 = time.perf_counter()
    with count_compilations() as progs:
        tp, out = full()
        jax.block_until_ready(out)
        _ = float(out[0].sum())
    warm_s = time.perf_counter() - t0
    n_programs_warm = len(progs)
    if engine == "bucketed":
        level_counts = {}
        n_oversize = 0
    elif engine == "coherent":
        level_counts = dict(tp.stats)
        n_oversize = int(tp.n_tail_oversize)
    else:
        level_counts = {f"K={meta[0].cfg.K}": int(meta[3]) for meta in tp.geoms}
        n_oversize = int(tp.n_oversize)

    # steady timing: host round-trip closes each window (the axon tunnel can
    # satisfy block_until_ready early); best-of-N rides out dispatch stalls
    wall = phase_layout = phase_deposit = 1e30
    for _ in range(repeats):
        del tp
        x, y, h, fields = gen()
        t0 = time.perf_counter()
        tp, out = full()
        _ = float(out[0].sum())
        wall = min(wall, time.perf_counter() - t0)

        if not measure_phases or engine == "bucketed":
            continue  # bucketed: one fused pipeline, no phase split
        del tp
        x, y, h, fields = gen()
        t0 = time.perf_counter()
        tp = build(x, y, h, fields, spec)
        _ = float(
            tp.packed[0, 0, 0] if engine == "coherent" else tp.sorted_u[-1]
        )
        phase_layout = min(phase_layout, time.perf_counter() - t0)

        t0 = time.perf_counter()
        out = render(tp)
        _ = float(out[0].sum())
        phase_deposit = min(phase_deposit, time.perf_counter() - t0)

    return {
        "metric": "north-star per-chip proxy: adaptive 1024^2 2-field render wall",
        "n_particles": n,
        "order": order,
        "engine": engine,
        "layout": layout if engine != "coherent" else None,
        "prep": prep if engine == "coherent" else None,
        "window": window if engine == "coherent" else None,
        "wall_s": round(wall, 4),
        "budget_s": BUDGET_S,
        "pass": bool(wall < BUDGET_S and n >= 1.25e8),
        "deposits_per_sec": round(n / wall, 1),
        "phase_layout_s": round(phase_layout, 4) if measure_phases else None,
        "phase_deposit_s": round(phase_deposit, 4) if measure_phases else None,
        "level_counts": level_counts,
        "n_oversize": n_oversize,
        "warm_first_s": round(warm_s, 2),
        "n_programs_warm": n_programs_warm,
        "gen_s": round(gen_s, 2),
        "backend": backend,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 27)
    ap.add_argument("--order", choices=("morton", "random", "both"), default="morton")
    ap.add_argument(
        "--engine",
        choices=("sorted", "coherent", "coherent-fused", "bucketed"),
        default="sorted",
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--prep", choices=("pallas", "xla"), default=None)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--caps-slack", type=float, default=None)
    ap.add_argument("--layout", choices=("auto", "sort", "shear"), default="auto")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    orders = ("morton", "random") if args.order == "both" else (args.order,)
    results = [
        run(args.n, o, args.repeats, args.engine, args.prep, args.window,
            args.caps_slack, layout=args.layout)
        for o in orders
    ]
    payload = results[0] if len(results) == 1 else {**results[0], "random_order": results[1]}
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "NORTHSTAR.json"
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
