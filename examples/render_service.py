"""Resident render-service pattern: amortised compiles, donated buffers.

A production map service renders a stream of snapshot chunks against a
fixed map geometry. Two properties of the coherent engine make the steady
state fast, and this example demonstrates both:

1. **Bounded program variety** — every expensive compiled program is keyed
   on *size classes* (pow2 particle padding, 3-bit-class tail capacities,
   4096-step candidate schedules), so chunk-to-chunk count jitter does NOT
   recompile. After the first chunk of a given shape class, later chunks
   reuse every executable (`tests/test_deposit_coherent.py::
   test_gather_program_variety_bounded` pins this).
2. **Donated inputs** — `tile_particles_coherent(..., donate=True)` lets
   XLA reuse the input buffers for the layout, halving peak HBM in the
   build. The service must not touch the donated arrays afterwards (it
   streams fresh chunks anyway).

The stage-A prep engine is selectable: `prep="xla"` (measured default) or
`prep="pallas"` (fused single-pass row prep; see
`ops/coherent_prep_pallas.py`).

    python examples/render_service.py

Runs anywhere (CPU-safe, small sizes); on a TPU host the same code is the
per-chip north-star configuration (NORTHSTAR.json).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_chunk(rng, n, box, px):
    """Snapshot-ordered clustered chunk (stand-in for one macro-chunk of a
    real EAGLE read; see io.prefetch.stream_macro_chunks for the IO side)."""
    cx = rng.uniform(0, box, n)
    cy = rng.uniform(0, box, n)
    # 32x32 storage cells: at this N a 2048-particle row spans ~1-2 cells,
    # the row-coherence regime a real PH-ordered snapshot shows at 2^25+
    # (row-coherence needs high particle count per level-0 tile; a toy N
    # over a large map degrades gracefully to heavy whole-row routing)
    cell = (
        np.floor(cy / (box / 32)).astype(int) * 32
        + np.floor(cx / (box / 32)).astype(int)
    )
    order = np.argsort(cell, kind="stable")
    x, y = cx[order].astype(np.float32), cy[order].astype(np.float32)
    dens = rng.uniform(0.3, 3.0, 1024)[cell[order]]
    h = np.clip(
        0.6 * px * dens ** (-1 / 3) * np.exp(0.5 * rng.normal(size=n)),
        0.05 * px,
        12.0 * px,
    ).astype(np.float32)
    m = rng.uniform(0.5, 2.0, n).astype(np.float32)
    t = rng.uniform(1e4, 1e6, n).astype(np.float32)
    return x, y, h, np.stack([m, m * t])


def main() -> None:
    from astro_sph_tools_tpu.ops.deposit import MapSpec
    from astro_sph_tools_tpu.ops.deposit_coherent import (
        caps_from_layout,
        deposit_2d_coherent_fused,
        deposit_coherent,
        tile_particles_coherent,
    )

    box = 25.0
    res = 256
    spec = MapSpec(shape=(res, res), extent=(0, box, 0, box), periodic_wrap=True)
    rng = np.random.default_rng(0)
    n_chunks = 4
    n = 120_000  # per chunk; a real service streams ~2^25 per macro-chunk

    # Chunk 0 runs the SYNCED engine: one host round-trip reads the counts,
    # which calibrate static capacities for every later chunk
    # (occupancy-based: count + 6*sqrt(count) headroom — ~1-3% inflation,
    # which is why the fused render is now FASTER than the synced engine at
    # north-star scale, NORTHSTAR_FUSED.json). Chunks 1+ run the zero-sync
    # fused render — one program dispatch, no counts back to the host; the
    # on-device `ok` flag certifies the capacities held (check it lazily;
    # re-render the rare overflowing chunk synced).
    total = None
    caps = None
    pending_ok = []
    for ci in range(n_chunks):
        x, y, h, fields = synthetic_chunk(rng, n, box, box / res)
        t0 = time.perf_counter()
        if caps is None:
            # donate=True: the layout may reuse x/y/h/fields buffers — do
            # not read them after this call
            layout = tile_particles_coherent(
                x, y, h, fields, spec, donate=True, prep="xla"
            )
            caps = caps_from_layout(layout)
            maps = deposit_coherent(layout, precision="bf16x2")
            note = (
                f"synced calibration (coherent rows "
                f"{layout.stats['coherent_fraction']:.0%}, candidates "
                f"{layout.stats['n_candidates']}, routed tail "
                f"{layout.stats['routed_particles']})"
            )
        else:
            maps, ok = deposit_2d_coherent_fused(
                x, y, h, fields, spec, caps, precision="bf16x2", donate=True
            )
            pending_ok.append((ci, ok))
            note = "fused zero-sync"
        total = maps if total is None else total + maps
        dt = time.perf_counter() - t0
        print(f"chunk {ci + 1}/{n_chunks}: {dt * 1e3:7.1f} ms  {note}", flush=True)

    # settle the deferred capacity checks with ONE host fetch at the end
    # (a real service would re-render any failed chunk through the synced
    # engine and refresh caps via caps_from_layout)
    bad = [ci for ci, ok in pending_ok if not bool(ok)]
    assert not bad, f"capacity overflow on chunks {bad}: re-render synced"

    sigma = np.asarray(total[0])
    mean_t = np.where(sigma > 0, np.asarray(total[1]) / np.maximum(sigma, 1e-30), 0)
    print(
        f"final map: sigma sum={sigma.sum():.3e}, "
        f"T range=[{mean_t[mean_t > 0].min():.2e}, {mean_t.max():.2e}] K-ish"
    )
    # chunk 1 pays every compile; later chunks reuse the executables —
    # that is the resident-service guarantee this example demonstrates.


if __name__ == "__main__":
    main()
