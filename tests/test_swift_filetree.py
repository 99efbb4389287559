"""SWIFT filepath utilities + file-tree scraper + CLI dispatch.

Covers the reference's SWIFT scrape/generate surface
(`io/SWIFT/_SnapshotSWIFT.py:115-283`) and the SOAP-discovery/scraper layer
the reference lacks (its SWIFT tree module imports nonexistent files,
`io/SWIFT/_SWIFT.py:4-7`).
"""

import os

import h5py
import numpy as np
import pytest

from astro_sph_tools_tpu.io.filetree import (
    FileTreeScraper_SWIFT,
    discover_soap_catalogues,
    discover_swift_snapshots,
)
from astro_sph_tools_tpu.io.swift import CatalogueSOAP, SnapshotSWIFT
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_soap_catalogue,
    write_swift_snapshot,
)


@pytest.fixture(scope="module")
def swift_tree(tmp_path_factory):
    """Two SWIFT outputs (z=1.0 and z=0.25) with SOAP catalogues."""
    root = tmp_path_factory.mktemp("swift_tree")
    specs = [
        SyntheticSnapshotSpec(
            n_gas=512, n_dm=256, n_star=32, n_bh=2, n_groups=5,
            snapshot_number=10, redshift=1.0, seed=3,
        ),
        SyntheticSnapshotSpec(
            n_gas=512, n_dm=256, n_star=32, n_bh=2, n_groups=5,
            snapshot_number=12, redshift=0.25, seed=4,
        ),
    ]
    for spec in specs:
        _, particles = write_swift_snapshot(str(root), spec)
        write_soap_catalogue(str(root), spec, particles)
    return str(root), specs


class TestFilepathUtilities:
    def test_generate_filepaths_single(self, tmp_path):
        paths = SnapshotSWIFT.generate_filepaths(
            "0010", "0012", directory=str(tmp_path), basename="swift_"
        )
        assert paths["0010"].endswith("swift_0010.hdf5")
        assert os.path.isabs(paths["0012"])

    def test_generate_filepaths_parallel(self, tmp_path):
        paths = SnapshotSWIFT.generate_filepaths(
            "0010", directory=str(tmp_path), basename="snap_",
            parallel_ranks=[0, 1],
        )
        assert paths["0010"][1].endswith("snap_0010.1.hdf5")

    def test_scrape_filepaths(self, swift_tree):
        root, specs = swift_tree
        info = SnapshotSWIFT.scrape_filepaths(root)
        # only the validated snapshot basename survives (soap_* files fail
        # the Header+Cosmology shape check)
        assert len(info) == 1
        basename, numbers, parallel, ext = info[0]
        assert basename == "swift_"
        assert set(numbers) == {"0010", "0012"}
        assert parallel is None
        assert ext == "hdf5"

    def test_scrape_rejects_mixed_extensions(self, tmp_path):
        (tmp_path / "snap_0001.hdf5").write_bytes(b"x")
        (tmp_path / "snap_0002.h5").write_bytes(b"x")
        with pytest.raises(IOError):
            SnapshotSWIFT.scrape_filepaths(str(tmp_path))

    def test_generate_from_partial_info(self, swift_tree):
        root, _ = swift_tree
        paths = SnapshotSWIFT.generate_filepaths_from_partial_info(root)
        assert set(paths) == {"0010", "0012"}
        assert all(os.path.exists(p) for p in paths.values())
        with pytest.raises(FileNotFoundError):
            SnapshotSWIFT.generate_filepaths_from_partial_info(
                root, basename="nonexistent_"
            )
        with pytest.raises(FileNotFoundError):
            SnapshotSWIFT.generate_filepaths_from_partial_info(
                root, snapshot_number_strings=["9999"]
            )

    def test_get_snapshot_order(self):
        assert SnapshotSWIFT.get_snapshot_order(["0012", "0002", "0010"]) == [
            "0002", "0010", "0012",
        ]
        assert SnapshotSWIFT.get_snapshot_order(["2", "10"], reverse=True) == [
            "10", "2",
        ]


class TestDiscovery:
    def test_discover_snapshots(self, swift_tree):
        root, _ = swift_tree
        found = discover_swift_snapshots(root)
        assert set(found) == {"0010", "0012"}

    def test_discover_soap(self, swift_tree):
        root, _ = swift_tree
        found = discover_soap_catalogues(root)
        assert set(found) == {"0010", "0012"}
        entry = found["0012"]
        assert entry["properties"][0].endswith("soap_0012.hdf5")
        assert entry["membership"][0].endswith("soap_membership_0012.hdf5")


class TestFileTreeScraperSWIFT:
    def test_snapshots_and_catalogues(self, swift_tree):
        root, specs = swift_tree
        tree = FileTreeScraper_SWIFT(root)
        assert len(tree.snapshots.get_numbers()) == 2
        assert len(tree.catalogues.get_numbers()) == 2
        # snapshot leaves exclude the SOAP files that match the same regex
        for leaf in tree.snapshots:
            assert "soap" not in os.path.basename(leaf.filepath)

    def test_redshift_lookup(self, swift_tree):
        root, specs = swift_tree
        tree = FileTreeScraper_SWIFT(root)
        # reference semantics: the closest file with z_file >= z_query
        # (`io/EAGLE/_EAGLE.py:141-151`)
        assert tree.snapshots.find_file_number_from_redshift(0.25) == "0012"
        assert tree.snapshots.find_file_number_from_redshift(0.9) == "0010"
        assert tree.catalogues.find_file_number_from_redshift(0.2) == "0012"

    def test_load_catalogue_end_to_end(self, swift_tree):
        root, specs = swift_tree
        tree = FileTreeScraper_SWIFT(root)
        cat = tree.catalogues.get_by_number("0012").load()
        assert isinstance(cat, CatalogueSOAP)
        assert isinstance(cat.snapshot, SnapshotSWIFT)
        assert cat.snapshot.redshift == pytest.approx(0.25)
        assert cat.get_number_of_haloes() == specs[1].n_groups

    def test_skip_numbers(self, swift_tree):
        root, _ = swift_tree
        tree = FileTreeScraper_SWIFT(root, skip_snapshot_numbers=["0010"])
        assert tree.snapshots.get_numbers() == ("0012",)


class TestCLISwiftDispatch:
    def test_find_nearest_haloes_swift(self, swift_tree, tmp_path):
        from astro_sph_tools_tpu.scripts.find_nearest_haloes import main

        root, specs = swift_tree
        out_stem = str(tmp_path / "nearest_swift")
        rc = main([
            "--target-redshift", "0.25", "--swift",
            "--input-directory", root,
            "--output-filepath", out_stem,
            "--minimum-log10-halo-masses", "11.5",
        ])
        assert rc == 0
        with h5py.File(out_stem + ".hdf5", "r") as f:
            grp = f[list(f.keys())[0]]
            ids = np.asarray(grp["halo_indexes"])
            dist = np.asarray(grp["halo_comoving_distance"])
            assert ids.shape == (specs[1].n_gas,)
            assert np.isfinite(dist).all() and (dist >= 0).all()
            assert "minimum_halo_mass_limited/11.50" in grp

    def test_swift_snipshots_rejected(self, swift_tree, tmp_path):
        from astro_sph_tools_tpu.scripts.find_nearest_haloes import main

        root, _ = swift_tree
        rc = main([
            "--target-redshift", "0.25", "--swift", "--snipshots",
            "--input-directory", root,
            "--output-filepath", str(tmp_path / "x"),
        ])
        assert rc == 1
