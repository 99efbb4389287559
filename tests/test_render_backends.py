"""render_map_stack over SWIFT and TNG snapshots (cross-backend surface)."""

import numpy as np
import pytest

from astro_sph_tools_tpu.io.swift import SnapshotSWIFT
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_swift_snapshot,
    write_tng_snapshot,
)
from astro_sph_tools_tpu.io.tng import SnapshotTNG
from astro_sph_tools_tpu.render import render_map_stack

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


class TestRenderBackends:
    def test_swift_snapshot_render(self, tmp_path, rng):
        spec = SyntheticSnapshotSpec(n_gas=1500, n_dm=100, n_star=50, n_bh=2, clustered=True)
        path, truth = write_swift_snapshot(str(tmp_path), spec)
        snap = SnapshotSWIFT(path)
        stack = render_map_stack(snap, fields=("density", "temperature"), resolution=32, engine="xla")
        sd = stack["surface_density"]
        assert sd.sum() > 0 and np.isfinite(sd).all()
        assert "mean_temperature" in stack.keys()

    def test_tng_snapshot_render(self, tmp_path, rng):
        spec = SyntheticSnapshotSpec(n_gas=1500, n_dm=100, n_star=50, n_bh=2, n_files=2)
        snap_path, _, truth, extra = write_tng_snapshot(str(tmp_path), spec)
        snap = SnapshotTNG(snap_path)
        stack = render_map_stack(snap, fields=("density", "temperature"), resolution=32, engine="xla")
        sd = stack["surface_density"]
        assert sd.sum() > 0 and np.isfinite(sd).all()
        mt = stack["mean_temperature"]
        covered = sd > sd.max() * 1e-3
        # derived temperatures must land in the truth range
        assert mt[covered].max() <= truth.temperature.max() * 1.001

    def test_same_truth_same_maps_across_backends(self, tmp_path, rng):
        """EAGLE and SWIFT files from one truth -> identical maps."""
        from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
        from astro_sph_tools_tpu.io.synthetic import generate_particles, write_snapshot

        spec = SyntheticSnapshotSpec(n_gas=800, n_dm=50, n_star=20, n_bh=2)
        truth = generate_particles(spec)
        eagle_path, _ = write_snapshot(str(tmp_path), spec, truth)
        swift_path, _ = write_swift_snapshot(str(tmp_path), spec, truth)
        m_eagle = render_map_stack(SnapshotEAGLE(eagle_path), resolution=32, engine="xla")
        m_swift = render_map_stack(SnapshotSWIFT(swift_path), resolution=32, engine="xla")
        np.testing.assert_allclose(
            m_eagle["surface_density"], m_swift["surface_density"], rtol=1e-4
        )
