"""Sharded sightlines/spectra: per-shard partials must sum to the global
result (columns and spectra are additive over particles)."""

import numpy as np
import pytest

from astro_sph_tools_tpu.ops.sightlines import column_integrate
from astro_sph_tools_tpu.parallel import (
    absorption_spectra_sharded,
    column_integrate_sharded,
)
from astro_sph_tools_tpu.ops.spectra import absorption_spectra

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def test_sharded_columns_match_global():
    rng = np.random.default_rng(0)
    n, rays, box, n_shards = 12000, 80, 10.0, 4
    x = rng.uniform(0, box, n)
    y = rng.uniform(0, box, n)
    h = np.exp(rng.normal(np.log(0.1), 0.5, n)).clip(0.02, 0.8)
    v = rng.uniform(0.5, 2.0, (n, 2)).astype(np.float32)
    rx = rng.uniform(0, box, rays)
    ry = rng.uniform(0, box, rays)

    edges = np.linspace(0, n, n_shards + 1).astype(int)
    shards = [
        (x[a:b], y[a:b], h[a:b], v[a:b]) for a, b in zip(edges[:-1], edges[1:])
    ]
    got = np.asarray(
        column_integrate_sharded(shards, rx, ry, periodic_box=box)
    )
    ref = np.asarray(column_integrate(x, y, h, v, rx, ry, periodic_box=box))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-6


def test_sharded_spectra_match_global():
    rng = np.random.default_rng(1)
    n, rays, box, n_shards = 6000, 30, 10.0, 3
    pos = rng.uniform(0, box, (n, 3))
    h = np.exp(rng.normal(np.log(0.1), 0.5, n)).clip(0.02, 0.8)
    vals = rng.uniform(0.5, 2.0, n).astype(np.float32)
    vpec = rng.normal(0, 60, n).astype(np.float32)
    T = 10 ** rng.uniform(4, 6, n)
    rx = rng.uniform(0, box, rays)
    ry = rng.uniform(0, box, rays)

    edges = np.linspace(0, n, n_shards + 1).astype(int)
    shards = [
        (pos[a:b], h[a:b], vals[a:b], vpec[a:b], T[a:b])
        for a, b in zip(edges[:-1], edges[1:])
    ]
    got, vc = absorption_spectra_sharded(
        shards, rx, ry, box_size=box, n_bins=256, periodic=True,
        cosmology=_cosmo(),
    )
    ref, _ = absorption_spectra(
        pos, h, vals, vpec, T, rx, ry, box_size=box, n_bins=256, periodic=True,
        cosmology=_cosmo(),
    )
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(ref).max()
    assert rel < 2e-5

    # data-dependent velocity bins cannot be summed across shards
    import pytest

    with pytest.raises(ValueError):
        absorption_spectra_sharded(shards, rx, ry, box_size=box, periodic=False)


def _cosmo():
    from astro_sph_tools_tpu.data_structures.cosmology import Cosmology

    return Cosmology(
        hubble_param=0.6777, omega_baryon=0.04825, expansion_factor=0.5,
        redshift=1.0, omega_matter=0.307, omega_lambda=0.693,
    )
