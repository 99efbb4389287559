"""Fused Pallas sightline engine vs the dense oracle (interpret mode on CPU).

The dense engine (`ops.sightlines.column_integrate`) is the numerics oracle —
itself pinned against per-ray NumPy sums in test_sightlines.py.
"""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.sightlines import column_integrate, column_integrate_binned
from astro_sph_tools_tpu.ops.sightlines_pallas import column_integrate_pallas

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def _data(n=20000, rays=300, box=10.0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = np.exp(rng.normal(np.log(0.08), 0.7, n)).clip(0.01, 1.5)
    v = rng.uniform(0.5, 2.0, (n, 3)).astype(np.float32)
    rx = rng.uniform(0, box, rays)
    ry = rng.uniform(0, box, rays)
    return x, y, h, v, rx, ry, box


def _rel(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / np.abs(np.asarray(b)).max()


@pytest.mark.parametrize("projection", ["integrated", "kernel3d"])
@pytest.mark.parametrize("periodic", [True, False])
def test_matches_dense(projection, periodic):
    x, y, h, v, rx, ry, box = _data()
    pb = box if periodic else None
    ref = column_integrate(x, y, h, v, rx, ry, projection=projection, periodic_box=pb)
    got = column_integrate_pallas(
        x, y, h, v, rx, ry, projection=projection, periodic_box=pb
    )
    assert _rel(got, ref) < 3e-6


def test_single_field_and_clustered():
    x, y, h, v, rx, ry, box = _data()
    rng = np.random.default_rng(3)
    n = x.shape[0]
    xc = np.concatenate([rng.normal(5, 0.3, n // 2) % box, x[n // 2 :]])
    yc = np.concatenate([rng.normal(2, 0.3, n // 2) % box, y[n // 2 :]])
    ref = column_integrate(xc, yc, h, v[:, 0], rx[:7], ry[:7], periodic_box=box)
    got = column_integrate_pallas(xc, yc, h, v[:, 0], rx[:7], ry[:7], periodic_box=box)
    assert got.shape == ref.shape == (7,)
    assert _rel(got, ref) < 3e-6


def test_uniform_h_single_level():
    x, y, h, v, rx, ry, box = _data(n=8000, rays=100)
    h2 = np.full_like(h, 0.02)
    ref = column_integrate(x, y, h2, v, rx, ry, periodic_box=box)
    got = column_integrate_pallas(x, y, h2, v, rx, ry, periodic_box=box)
    assert _rel(got, ref) < 3e-6


@pytest.mark.parametrize("kernel", ["wendland_c2", "quintic_spline"])
def test_other_kernels(kernel):
    x, y, h, v, rx, ry, box = _data(n=8000, rays=100)
    ref = column_integrate(x, y, h, v, rx, ry, kernel=kernel, periodic_box=box)
    got = column_integrate_pallas(x, y, h, v, rx, ry, kernel=kernel, periodic_box=box)
    assert _rel(got, ref) < 3e-6


def test_coarse_grid_periodic_wrap_no_double_count():
    """Large supports force a tiny cell grid (ncy ~ 2-4): the periodic wrap
    spans must not re-add rows already inside the clamped main span.
    Regression for the double-count bug found in round 2 (also fixed in the
    binned engines)."""
    rng = np.random.default_rng(5)
    n, box = 3000, 10.0
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = rng.uniform(1.0, 1.6, n)  # supports ~ box/4
    v = rng.uniform(0.5, 2.0, n).astype(np.float32)
    rx = rng.uniform(0, box, 64)
    ry = rng.uniform(0, box, 64)
    ref = column_integrate(x, y, h, v, rx, ry, periodic_box=box)
    for got in (
        column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=box),
        column_integrate_binned(x, y, h, v, rx, ry, periodic_box=box),
    ):
        assert _rel(got, ref) < 3e-6


def test_edge_rays_xwrap_spans():
    """Rays hugging the box edges exercise the x-window wrap spans of the
    cell-level schedule (`_level_schedule` narrow-block x-wrap units)."""
    rng = np.random.default_rng(3)
    box = 10.0
    n = 30000
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = np.exp(rng.normal(np.log(0.1), 0.6, n)).clip(0.02, 1.0)
    v = rng.uniform(0.5, 2.0, n).astype(np.float32)
    # rays pinned to the four edges + corners (x- and y-wrap all active)
    t = rng.uniform(0, box, 60)
    eps = 1e-3
    rx = np.concatenate([t, t, np.full(60, eps), np.full(60, box - eps), [eps, box - eps]])
    ry = np.concatenate([np.full(60, eps), np.full(60, box - eps), t, t, [eps, box - eps]])
    ref = column_integrate(x, y, h, v, rx, ry, periodic_box=box)
    got = column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=box)
    assert _rel(got, ref) < 3e-6


def test_row_spanning_blocks_and_ragged_rays():
    """Ray count not a multiple of the block size, with rays spread so thin
    that blocks span multiple cell rows (wide-block fallback path)."""
    rng = np.random.default_rng(4)
    box = 25.0
    n = 40000
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    # large smoothing lengths -> coarse grids -> few rays per row
    h = rng.uniform(1.0, 3.0, n)
    v = rng.uniform(0.5, 2.0, n).astype(np.float32)
    rx = rng.uniform(0, box, 41)
    ry = rng.uniform(0, box, 41)
    for pb in (box, None):
        ref = column_integrate(x, y, h, v, rx, ry, periodic_box=pb)
        got = column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=pb)
        assert _rel(got, ref) < 3e-6


def test_rays_in_empty_regions_zero():
    """Ray blocks whose cells hold no particles must come back exactly zero:
    each block's anchor unit gets a forced zeroing step even when its spans
    are all empty (`_compact_units` keeps unit 0; on hardware the accumulator
    would otherwise hold garbage)."""
    rng = np.random.default_rng(7)
    box = 20.0
    n = 20000
    # all particles confined to the left quarter of the box, small h
    x = rng.uniform(0, box / 4, n)
    y = rng.uniform(0, box, n)
    h = rng.uniform(0.05, 0.2, n)
    v = rng.uniform(0.5, 2.0, n).astype(np.float32)
    # rays far to the right: empty cells at every level
    rx = rng.uniform(3 * box / 4, box - 1.0, 500)
    ry = rng.uniform(1.0, box - 1.0, 500)
    got = np.asarray(column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=box))
    assert np.all(got == 0.0)
    # non-periodic too (different span construction)
    got2 = np.asarray(column_integrate_pallas(x, y, h, v, rx, ry))
    assert np.all(got2 == 0.0)


def test_zero_rays():
    """Empty ray input returns an empty result (the dense engine's shape)
    instead of crashing on an empty argsort."""
    x, y, h, v, _, _, box = _data(n=2000, rays=5)
    empty = np.array([], np.float64)
    got = column_integrate_pallas(x, y, h, v, empty, empty, periodic_box=box)
    assert np.asarray(got).shape == (3, 0)
    got1 = column_integrate_pallas(x, y, h, v[:, 0], empty, empty)
    assert np.asarray(got1).shape == (0,)


def test_ray_batching_matches_single_pass(monkeypatch):
    """The >_RAY_BATCH path splits rays into batches; force a tiny batch and
    check batched == unbatched (per-ray independence).

    Runs in a SUBPROCESS: compiling this test's 301-ray program late in a
    long-lived suite process segfaulted XLA-CPU four times (in the compile
    itself once the cache paths were ruled out), while every standalone run
    passes. Process isolation sidesteps the accumulated-state crash and
    keeps one interpreter fault from killing the whole suite."""
    import os
    import subprocess
    import sys

    if os.environ.get("AST_RAY_BATCH_INNER") == "1":
        import jax

        import astro_sph_tools_tpu.ops.sightlines_pallas as sp

        # keep the giant one-off executables out of the shared persistent
        # cache (their zstd roundtrip has also segfaulted; note jax's
        # is_cache_used() latches per process — reset_cache re-reads the
        # flag)
        from jax._src import compilation_cache as cc

        jax.config.update("jax_enable_compilation_cache", False)
        cc.reset_cache()
        x, y, h, v, rx, ry, box = _data(n=15000, rays=301)
        whole = np.asarray(
            column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=box)
        )
        monkeypatch.setattr(sp, "_RAY_BATCH", 100)
        batched = np.asarray(
            sp.column_integrate_pallas(x, y, h, v, rx, ry, periodic_box=box)
        )
        assert batched.shape == whole.shape
        np.testing.assert_allclose(
            batched, whole, rtol=0, atol=1e-6 * np.abs(whole).max()
        )
        return

    r = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
            "--slow", f"{os.path.abspath(__file__)}::"
            "test_ray_batching_matches_single_pass",
        ],
        env={**os.environ, "AST_RAY_BATCH_INNER": "1"},
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, (
        f"isolated run failed rc={r.returncode}\n"
        f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    )
