"""Particle-filter sidecar format round-trip and protection semantics."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.particle_filter import (
    LineOfSightParticleFilter,
    ParticleFilterFile,
    SnapshotParticleFilter,
)


def make_file(path, rng):
    pf = ParticleFilterFile(
        filepath=str(path),
        description="haloes above 1e12",
        source_file="contra_output.hdf5",
        simulation_type="EAGLE",
        snapshots_directory="/data/sim",
    )
    mask = rng.random(100) > 0.5
    ids = np.nonzero(mask)[0].astype(np.int64) + 1000
    pf.add_snapshot_filter(
        SnapshotParticleFilter(
            particle_type=ParticleType.gas,
            redshift=0.5,
            snapshot_number="012",
            filepath="/data/sim/snapshot_012_z000p503/snap_012_z000p503.0.hdf5",
            allowed_ids=ids,
            mask=mask,
        )
    )
    los_mask = rng.random(50) > 0.3
    pf.add_line_of_sight_filter(
        LineOfSightParticleFilter(
            particle_type=ParticleType.gas,
            redshift=0.5,
            file_name="part_los_z0.500.hdf5",
            line_of_sight_index=3,
            filepath="/data/sim/los/part_los_z0.500.hdf5",
            allowed_ids=np.nonzero(los_mask)[0].astype(np.int64),
            mask=los_mask,
        )
    )
    pf.save()
    return pf, mask, los_mask


class TestParticleFilterFile:
    def test_round_trip(self, tmp_path, rng):
        path = tmp_path / "filters.hdf5"
        written, mask, los_mask = make_file(path, rng)
        loaded = ParticleFilterFile(filepath=str(path))
        assert loaded.description == "haloes above 1e12"
        assert loaded.simulation_type == "EAGLE"
        assert loaded.snapshots_directory == "/data/sim"
        snap_f = loaded.get_snapshot_filter(
            "snap_012_z000p503.0.hdf5", ParticleType.gas
        )
        np.testing.assert_array_equal(snap_f.mask, mask)
        assert snap_f.redshift == 0.5
        los_f = loaded.get_line_of_sight_filter("part_los_z0.500.hdf5", 3, ParticleType.gas)
        np.testing.assert_array_equal(los_f.mask, los_mask)
        assert los_f.line_of_sight_index == 3

    def test_write_once_protection(self, tmp_path, rng):
        path = tmp_path / "filters.hdf5"
        make_file(path, rng)
        loaded = ParticleFilterFile(filepath=str(path))
        assert not loaded.writable
        with pytest.raises(PermissionError):
            loaded.add_snapshot_filter(
                SnapshotParticleFilter(
                    ParticleType.star, 0.1, "015", "/x/snap.hdf5",
                    np.arange(3, dtype=np.int64), np.ones(3, bool),
                )
            )

    def test_parallel_append_keeps_existing(self, tmp_path, rng):
        path = tmp_path / "filters.hdf5"
        make_file(path, rng)
        # second writer appends a different particle type
        pf2 = ParticleFilterFile(filepath=str(path), allow_parallel_write=True)
        assert pf2.writable
        pf2.add_snapshot_filter(
            SnapshotParticleFilter(
                ParticleType.star, 0.5, "012",
                "/data/sim/snapshot_012_z000p503/snap_012_z000p503.0.hdf5",
                np.arange(5, dtype=np.int64), np.ones(5, bool),
            )
        )
        pf2.save()
        loaded = ParticleFilterFile(filepath=str(path))
        assert ParticleType.gas in loaded.snapshot_filters["snap_012_z000p503.0.hdf5"]
        assert ParticleType.star in loaded.snapshot_filters["snap_012_z000p503.0.hdf5"]

    def test_version_recorded(self, tmp_path, rng):
        from astro_sph_tools_tpu.__about__ import __version__

        path = tmp_path / "filters.hdf5"
        make_file(path, rng)
        loaded = ParticleFilterFile(filepath=str(path))
        assert loaded.version == __version__
