"""3D voxel gridding vs dense NumPy oracle (BASELINE config 3, scaled down)."""

import numpy as np

from astro_sph_tools_tpu.ops.grid3d import GridSpec, deposit_3d
from oracles import grid3d_oracle


def rel_err(got, expected):
    return np.abs(got - expected).max() / np.abs(expected).max()


class TestDeposit3D:
    def test_matches_oracle(self, rng):
        n = 400
        pos = rng.uniform(0, 10.0, (n, 3))
        h = rng.uniform(0.4, 1.2, n)
        m = rng.uniform(0.5, 2.0, n)
        spec = GridSpec(shape=(16, 16, 16), extent=(0.0, 10.0, 0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_3d(pos, h, m, spec, chunk=512))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_periodic(self, rng):
        n = 200
        pos = rng.uniform(0, 10.0, (n, 3))
        pos[:30, 0] = rng.uniform(0, 0.3, 30)  # edge-hugging
        h = np.full(n, 0.8)
        m = np.ones(n)
        spec = GridSpec(
            shape=(12, 12, 12), extent=(0.0, 10.0, 0.0, 10.0, 0.0, 10.0), periodic_wrap=True
        )
        got = np.asarray(deposit_3d(pos, h, m, spec, chunk=512))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent, periodic=True)
        assert rel_err(got, expected) < 1e-5

    def test_mass_conservation(self, rng):
        """Volume integral of the density grid approximates total mass for
        well-resolved kernels away from edges."""
        n = 300
        pos = rng.uniform(3.0, 7.0, (n, 3))
        h = rng.uniform(0.5, 0.8, n)
        m = rng.uniform(0.5, 2.0, n)
        spec = GridSpec(shape=(48, 48, 48), extent=(0.0, 10.0, 0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_3d(pos, h, m, spec, chunk=512))
        voxel_volume = np.prod(spec.voxel_size)
        assert abs(got.sum() * voxel_volume / m.sum() - 1.0) < 2e-2

    def test_oversize_and_rect(self, rng):
        n = 40
        pos = rng.uniform(0, 10.0, (n, 3))
        h = np.full(n, 0.5)
        h[:3] = 6.0  # oversize footprint
        m = np.ones(n)
        spec = GridSpec(shape=(8, 12, 16), extent=(0.0, 10.0, 0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_3d(pos, h, m, spec, chunk=512))
        expected = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        assert rel_err(got, expected) < 1e-5

    def test_multifield_velocity_cube(self, rng):
        """Density + momentum cubes in one pass (config 3 'density/velocity')."""
        n = 200
        pos = rng.uniform(0, 10.0, (n, 3))
        h = rng.uniform(0.5, 1.0, n)
        m = rng.uniform(0.5, 2.0, n)
        vx = rng.normal(0, 100.0, n)
        fields = np.stack([m, m * vx], axis=1)
        spec = GridSpec(shape=(12, 12, 12), extent=(0.0, 10.0, 0.0, 10.0, 0.0, 10.0))
        got = np.asarray(deposit_3d(pos, h, fields, spec, chunk=512))
        exp_m = grid3d_oracle(pos, h, m, spec.shape, spec.extent)
        exp_mv = grid3d_oracle(pos, h, m * vx, spec.shape, spec.extent)
        assert rel_err(got[..., 0], exp_m) < 1e-5
        assert np.abs(got[..., 1] - exp_mv).max() / np.abs(exp_mv).max() < 1e-5
