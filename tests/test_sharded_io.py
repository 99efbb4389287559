"""Sharded IO glue: snapshot fields -> globally-sharded device arrays -> deposit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
from astro_sph_tools_tpu.ops.deposit import MapSpec
from astro_sph_tools_tpu.parallel.sharded import deposit_2d_sharded, make_mesh
from astro_sph_tools_tpu.parallel.sharded_io import (
    load_particle_fields_sharded,
    sharded_from_local,
)
from oracles import project_oracle

# compile-heavy (interpret-mode Pallas / shard_map meshes): slow lane
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestShardedFromLocal:
    def test_sharding_layout(self, mesh, rng):
        data = rng.normal(size=(8 * 16, 3)).astype(np.float32)
        arr = sharded_from_local(data, mesh)
        assert arr.shape == data.shape
        assert isinstance(arr.sharding, NamedSharding)
        np.testing.assert_allclose(np.asarray(arr), data)

    def test_padding_to_multiple(self, mesh, rng):
        data = rng.normal(size=(100,)).astype(np.float32)
        arr = sharded_from_local(data, mesh, pad_to_multiple=64)
        assert arr.shape[0] == 128
        np.testing.assert_allclose(np.asarray(arr)[:100], data)
        assert (np.asarray(arr)[100:] == 0).all()


class TestSnapshotToShardedDeposit:
    def test_end_to_end(self, mesh, tmp_path):
        """Snapshot file -> sharded fields -> sharded deposit == oracle."""
        spec = SyntheticSnapshotSpec(n_gas=3000, n_dm=64, n_star=16, n_bh=2, n_files=2)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        chunk = 128
        fields = load_particle_fields_sharded(
            snap, ParticleType.gas,
            ["positions", "smoothing_lengths", "masses"],
            mesh, pad_to_multiple=8 * chunk,
        )
        pos = fields["positions"]
        # small fixed-h subset check: force h into the K=8 stencil budget
        h_small = jnp.minimum(fields["smoothing_lengths"], 0.22)
        map_spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        img = deposit_2d_sharded(
            pos[:, 0], pos[:, 1], h_small, fields["masses"], map_spec, mesh,
            K=8, chunk=chunk,
        )
        expected = project_oracle(
            truth.positions[ParticleType.gas][:, 0],
            truth.positions[ParticleType.gas][:, 1],
            np.minimum(truth.smoothing[ParticleType.gas], 0.22),
            truth.masses[ParticleType.gas],
            map_spec.shape, map_spec.extent,
        )
        err = np.abs(np.asarray(img) - expected).max() / np.abs(expected).max()
        assert err < 1e-4  # f32 masses ~1e6 Msun: coarser than unit-scale tests
