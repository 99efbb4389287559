"""Streaming prefetch pipeline: block iteration + streamed deposit."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.prefetch import stream_particle_blocks, streamed_deposit_2d
from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
from astro_sph_tools_tpu.ops.deposit import MapSpec
from oracles import project_oracle


@pytest.fixture(scope="module")
def snap(tmp_path_factory):
    spec = SyntheticSnapshotSpec(n_gas=3000, n_dm=64, n_star=16, n_bh=2, n_files=2)
    root = tmp_path_factory.mktemp("stream_sim")
    path, truth = write_snapshot(str(root), spec)
    return SnapshotEAGLE(path), truth, spec


class TestStreamBlocks:
    def test_blocks_cover_everything_in_order(self, snap):
        snapshot, truth, spec = snap
        seen = []
        for block in stream_particle_blocks(
            snapshot, ParticleType.gas, ["masses"], chunk_size=700, device_put=False
        ):
            assert block["stop"] - block["start"] == block["masses"].shape[0]
            seen.append(block["masses"])
        total = np.concatenate(seen)
        assert total.shape[0] == spec.n_gas
        np.testing.assert_allclose(
            np.sort(total), np.sort(truth.masses[ParticleType.gas]), rtol=1e-6
        )

    def test_device_blocks(self, snap):
        import jax

        snapshot, *_ = snap
        block = next(
            iter(
                stream_particle_blocks(
                    snapshot, ParticleType.gas, ["positions"], chunk_size=1000
                )
            )
        )
        assert isinstance(block["positions"], jax.Array)
        assert block["positions"].shape == (1000, 3)

    def test_producer_exception_propagates(self, snap):
        snapshot, *_ = snap
        with pytest.raises(AttributeError):
            list(
                stream_particle_blocks(
                    snapshot, ParticleType.gas, ["nonexistent_field"], chunk_size=100
                )
            )


class TestStreamedDeposit:
    def test_matches_oracle(self, snap):
        snapshot, truth, spec = snap
        map_spec = MapSpec(shape=(64, 64), extent=(0.0, 10.0, 0.0, 10.0))
        # clamp h into the K=8 budget for the fixed-level streaming engine
        h = np.minimum(truth.smoothing[ParticleType.gas], 0.22)

        class ClampedSnap:
            def __getattr__(self, name):
                return getattr(snapshot, name)

            def get_smoothing_lengths(self, pt, **kw):
                from astro_sph_tools_tpu.units import unit_array

                return unit_array(
                    np.minimum(
                        snapshot.get_smoothing_lengths(pt, **kw).to_value("Mpc"), 0.22
                    ),
                    "Mpc",
                )

        img = np.asarray(
            streamed_deposit_2d(
                ClampedSnap(), ParticleType.gas, map_spec,
                K=8, chunk_size=900, device_chunk=512,
            )
        )
        pos = truth.positions[ParticleType.gas]
        expected = project_oracle(
            pos[:, 0], pos[:, 1], h, truth.masses[ParticleType.gas],
            map_spec.shape, map_spec.extent,
        )
        err = np.abs(img - expected).max() / np.abs(expected).max()
        assert err < 1e-4


class TestAbandonedStream:
    """A consumer that stops early must not leak a producer thread blocked
    on queue.put — a leaked producer mid-device_put races later compile
    work (observed segfault in a JAX cache write under the full suite)."""

    def test_abandoned_block_stream_joins_producer(self, snap):
        import threading

        snapshot, *_ = snap
        before = {t.name for t in threading.enumerate()}
        stream = stream_particle_blocks(
            snapshot, ParticleType.gas, ["masses"], chunk_size=64,
            prefetch_depth=1, device_put=False,
        )
        next(stream)  # consume one block, then abandon
        stream.close()  # triggers the generator's finally
        leaked = [
            t for t in threading.enumerate()
            if t.name.startswith("ast-prefetch") and t.is_alive()
        ]
        for t in leaked:
            t.join(timeout=5.0)
        assert not any(t.is_alive() for t in leaked)
        assert before  # silence unused warnings

    def test_abandoned_macro_stream_joins_producer(self):
        import threading

        from astro_sph_tools_tpu.io.prefetch import stream_macro_chunks

        def read_chunk(ci):
            return {"x": np.arange(ci, ci + 4, dtype=np.float32)}

        stream = stream_macro_chunks(
            read_chunk, 50, prefetch_depth=1, to_device=lambda h: h
        )
        next(stream)
        stream.close()
        leaked = [
            t for t in threading.enumerate()
            if t.name.startswith("ast-macro-prefetch") and t.is_alive()
        ]
        for t in leaked:
            t.join(timeout=5.0)
        assert not any(t.is_alive() for t in leaked)


class TestReaderPool:
    def test_pool_delivers_in_order(self):
        """n_readers > 1 fans reads over a thread pool but delivery stays
        strictly ordered (VERDICT r4 item 2 host fan-out)."""
        import time

        from astro_sph_tools_tpu.io.prefetch import stream_macro_chunks

        def read_chunk(ci):
            time.sleep(0.01 * ((ci * 7) % 3))  # jittered completion order
            return {"ci": np.asarray([ci])}

        got = [
            int(item["ci"][0])
            for item in stream_macro_chunks(
                read_chunk, 12, prefetch_depth=2, to_device=lambda h: h,
                n_readers=4,
            )
        ]
        assert got == list(range(12))

    def test_pool_propagates_errors(self):
        from astro_sph_tools_tpu.io.prefetch import stream_macro_chunks

        def read_chunk(ci):
            if ci == 3:
                raise RuntimeError("boom")
            return {"ci": np.asarray([ci])}

        stream = stream_macro_chunks(
            read_chunk, 6, to_device=lambda h: h, n_readers=3
        )
        with pytest.raises(RuntimeError, match="boom"):
            list(stream)
