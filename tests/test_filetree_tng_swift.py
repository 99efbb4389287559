"""TNG file-tree scraper and SWIFT snapshot discovery."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.filetree import FileTreeScraper_TNG, discover_swift_snapshots
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_swift_snapshot,
    write_tng_snapshot,
)


@pytest.fixture(scope="module")
def tng_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tng_tree")
    specs = {}
    for num, z in [(50, 1.0), (99, 0.0)]:
        spec = SyntheticSnapshotSpec(
            n_gas=256, n_dm=128, n_star=32, n_bh=2, n_files=2,
            snapshot_number=num, redshift=z, n_groups=4,
        )
        write_tng_snapshot(str(root), spec)
        specs[num] = spec
    return str(root), specs


class TestFileTreeScraperTNG:
    def test_discovery(self, tng_dir):
        root, specs = tng_dir
        tree = FileTreeScraper_TNG(root)
        assert tree.snapshots.get_numbers() == ("050", "099")
        assert len(tree.catalogues) == 2
        leaf = tree.snapshots.get_by_number("050")
        assert len(leaf.filepaths) == 2

    def test_load_snapshot_and_catalogue(self, tng_dir):
        root, specs = tng_dir
        tree = FileTreeScraper_TNG(root)
        snap = tree.snapshots.get_by_number("099").load()
        assert snap.redshift == pytest.approx(0.0)
        assert snap.number_of_particles(ParticleType.gas) == specs[99].n_gas
        cat = tree.catalogues.get_by_number("099").load()
        assert len(cat) == specs[99].n_groups
        assert cat.snapshot.redshift == pytest.approx(0.0)

    def test_redshift_lookup_reads_headers(self, tng_dir):
        root, _ = tng_dir
        tree = FileTreeScraper_TNG(root)
        assert tree.snapshots.find_file_number_from_redshift(0.4) == "050"
        assert tree.snapshots.find_file_number_from_redshift(0.0) == "099"

    def test_skip_numbers(self, tng_dir):
        root, _ = tng_dir
        tree = FileTreeScraper_TNG(root, skip_snapshot_numbers=["050"])
        assert tree.snapshots.get_numbers() == ("099",)


class TestSwiftDiscovery:
    def test_finds_valid_snapshots(self, tmp_path):
        spec = SyntheticSnapshotSpec(n_gas=64, n_dm=32, n_star=8, n_bh=2, snapshot_number=7)
        write_swift_snapshot(str(tmp_path), spec)
        # decoy: an hdf5-suffixed file with no SWIFT header
        (tmp_path / "random_0001.hdf5").write_bytes(b"not hdf5")
        found = discover_swift_snapshots(str(tmp_path))
        assert "0007" in found
        assert len(found["0007"]) == 1
        assert "0001" not in found
