"""Coverage for small API branches not exercised elsewhere."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import CoordinateAxes, ParticleType
from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.ops.grid3d import GridSpec


class TestEnumBranches:
    def test_baryonic_set(self):
        assert ParticleType.dark_matter not in ParticleType.baryonic()
        assert ParticleType.gas in ParticleType.baryonic()

    def test_axis_from_string_error(self):
        with pytest.raises(ValueError):
            CoordinateAxes.from_string("w")

    def test_axis_str(self):
        assert str(CoordinateAxes.Y) == "y"

    def test_swift_dataset_names(self):
        assert ParticleType.star.swift_dataset_name == "stars"
        assert ParticleType.black_hole.swift_dataset_name == "black_holes"


class TestSpecValidation:
    def test_bad_pixel_origin(self):
        spec = MapSpec(shape=(8, 8), extent=(0, 1, 0, 1), pixel_origin="middle")
        with pytest.raises(ValueError):
            _ = spec.sample_offset

    def test_bad_voxel_origin(self):
        spec = GridSpec(shape=(4, 4, 4), extent=(0, 1, 0, 1, 0, 1), voxel_origin="edge")
        with pytest.raises(ValueError):
            _ = spec.sample_offset

    def test_pixel_sizes_rectangular(self):
        spec = MapSpec(shape=(10, 20), extent=(0.0, 4.0, 0.0, 1.0))
        assert spec.pixel_size == (0.1, 0.2)


class TestRenderVelocityField:
    def test_velocity_los_field(self, tmp_path):
        from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
        from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
        from astro_sph_tools_tpu.render import render_map_stack

        spec = SyntheticSnapshotSpec(n_gas=1024, n_dm=32, n_star=8, n_bh=2)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        stack = render_map_stack(
            snap, fields=("velocity_los",), resolution=24, engine="xla"
        )
        assert "mean_velocity_los" in stack.keys()
        v = stack["mean_velocity_los"]
        vmax = np.abs(truth.velocities[ParticleType.gas][:, 2]).max()
        assert np.abs(v).max() <= vmax * 1.001


class TestPallasFieldLimit:
    def test_too_many_fields_rejected(self, rng):
        from astro_sph_tools_tpu.ops.deposit_pallas import deposit_2d_pallas

        n = 64
        x = rng.uniform(0, 10, n)
        fields = rng.uniform(0, 1, (6, n))  # > 5 fields
        spec = MapSpec(shape=(16, 16), extent=(0, 10, 0, 10))
        with pytest.raises(ValueError):
            deposit_2d_pallas(x, x, np.full(n, 0.2), fields, spec)


class TestUnitsMisc:
    def test_sqrt_and_iteration(self):
        from astro_sph_tools_tpu.units import unit_array

        a = unit_array(np.array([4.0, 9.0]), "Mpc**2")
        r = a.sqrt()
        np.testing.assert_allclose(r.value, [2.0, 3.0])
        assert r.units.dims == unit_array(1.0, "Mpc").units.dims
        vals = [float(x.value) for x in a]
        assert vals == [4.0, 9.0]

    def test_comparisons_and_rsub(self):
        from astro_sph_tools_tpu.units import unit_quantity

        assert unit_quantity(2.0, "Mpc") > unit_quantity(1000.0, "kpc")
        diff = 3.0 - unit_quantity(1.0, "")
        assert float(diff.value) == 2.0
