"""Fused Pallas spectra engine vs the dense engine (interpret mode on CPU)."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures.cosmology import Cosmology
from astro_sph_tools_tpu.ops.spectra import absorption_spectra
from astro_sph_tools_tpu.ops.spectra_pallas import absorption_spectra_pallas

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


def _data(n=8000, rays=100, box=10.0, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    h = np.exp(rng.normal(np.log(0.1), 0.6, n)).clip(0.02, 1.0)
    vals = rng.uniform(0.5, 2.0, n).astype(np.float32)
    vpec = rng.normal(0, 80, n).astype(np.float32)
    T = 10 ** rng.uniform(3.8, 6.5, n)
    rx = rng.uniform(0, box, rays)
    ry = rng.uniform(0, box, rays)
    return pos, h, vals, vpec, T, rx, ry, box


_COSMO = Cosmology(
    hubble_param=0.6777, omega_baryon=0.04825, expansion_factor=0.5,
    redshift=1.0, omega_matter=0.307, omega_lambda=0.693,
)


@pytest.mark.parametrize("periodic", [True, False])
def test_matches_dense(periodic):
    pos, h, vals, vpec, T, rx, ry, box = _data()
    ref, vc = absorption_spectra(
        pos, h, vals, vpec, T, rx, ry, cosmology=_COSMO, box_size=box,
        n_bins=512, periodic=periodic,
    )
    got, vc2 = absorption_spectra_pallas(
        pos, h, vals, vpec, T, rx, ry, cosmology=_COSMO, box_size=box,
        n_bins=512, periodic=periodic,
    )
    assert np.allclose(vc, vc2)
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(ref).max()
    assert rel < 1e-5  # bf16x2 matmul residual ~2^-17


def test_no_cosmology_and_bins():
    pos, h, vals, vpec, T, rx, ry, box = _data(n=4000, rays=30)
    ref, _ = absorption_spectra(
        pos, h, vals, vpec, T, rx, ry, box_size=box, n_bins=256, periodic=False
    )
    got, _ = absorption_spectra_pallas(
        pos, h, vals, vpec, T, rx, ry, box_size=box, n_bins=256, periodic=False
    )
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / np.abs(ref).max()
    assert rel < 1e-5


def test_rejects_unaligned_bins():
    pos, h, vals, vpec, T, rx, ry, box = _data(n=1000, rays=5)
    with pytest.raises(ValueError):
        absorption_spectra_pallas(
            pos, h, vals, vpec, T, rx, ry, box_size=box, n_bins=300
        )


def test_zero_rays_spectra():
    rng = np.random.default_rng(0)
    box, n = 8.0, 2000
    pos = rng.uniform(0, box, (n, 3))
    h = rng.uniform(0.1, 0.5, n)
    val = rng.uniform(0.5, 2.0, n).astype(np.float32)
    vel = rng.normal(0, 50, n).astype(np.float32)
    T = rng.uniform(1e4, 1e5, n).astype(np.float32)
    empty = np.array([], np.float64)
    tau, vc = absorption_spectra_pallas(pos, h, val, vel, T, empty, empty,
                                        box_size=box, n_bins=128)
    assert np.asarray(tau).shape == (0, 128) and vc.shape == (128,)


def test_voigt_matches_dense():
    """profile="voigt" through the fused Pallas pass agrees with the dense
    XLA oracle engine (same Hjerting expansion, bf16x2 MXU accumulate)."""
    pos, h, vals, vpec, T, rx, ry, box = _data()
    kwargs = dict(
        cosmology=_COSMO, box_size=box, n_bins=512,
        profile="voigt", gamma=6.265e8,
    )
    ref, _ = absorption_spectra(pos, h, vals, vpec, T, rx, ry, **kwargs)
    got, _ = absorption_spectra_pallas(pos, h, vals, vpec, T, rx, ry, **kwargs)
    ref, got = np.asarray(ref), np.asarray(got)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5
