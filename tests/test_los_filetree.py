"""LOS reader + file-tree scraper tests over synthetic EAGLE datasets."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.filetree import FileTreeScraper_EAGLE, tag_redshift
from astro_sph_tools_tpu.io.los import LineOfSightFileEAGLE
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_catalogue,
    write_los_file,
    write_snapshot,
)


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("eagle_tree")
    specs = [
        SyntheticSnapshotSpec(
            n_gas=256, n_dm=128, n_star=32, n_bh=2, n_files=2,
            snapshot_number=num, redshift=z,
        )
        for num, z in [(10, 1.0), (11, 0.5), (12, 0.1)]
    ]
    truths = {}
    for spec in specs:
        _, truth = write_snapshot(str(root), spec)
        write_catalogue(str(root), spec, truth)
        truths[spec.snapshot_number] = (spec, truth)
    los_path, los_truth = write_los_file(str(root), specs[1])
    return str(root), truths, los_path, los_truth


class TestLineOfSight:
    def test_file_metadata(self, sim_dir):
        _, _, los_path, truth = sim_dir
        f = LineOfSightFileEAGLE(los_path)
        assert f.number_of_sightlines == 4
        assert len(f) == 4
        assert f.redshift == pytest.approx(0.5)

    def test_start_positions_h_corrected(self, sim_dir):
        _, _, los_path, truth = sim_dir
        f = LineOfSightFileEAGLE(los_path)
        for i, sl in enumerate(truth["sightlines"]):
            start = f.get_sightline_start_position(i)
            np.testing.assert_allclose(start.value[0], sl["x"], rtol=1e-10)
            np.testing.assert_allclose(start.value[1], sl["y"], rtol=1e-10)
            direction = f.get_sightline_direction_vector(i)
            np.testing.assert_array_equal(direction, [0.0, 0.0, 1.0])

    def test_field_recovery(self, sim_dir):
        _, _, los_path, truth = sim_dir
        f = LineOfSightFileEAGLE(los_path)
        sl = f.get_sightline(0)
        t = truth["sightlines"][0]
        np.testing.assert_allclose(sl.positions_comoving.value, t["positions"], rtol=1e-10)
        np.testing.assert_allclose(sl.masses.value, t["masses"], rtol=1e-6)
        np.testing.assert_allclose(sl.temperatures.value, t["temperature"], rtol=1e-10)
        np.testing.assert_allclose(sl.densities_comoving.value, t["density"], rtol=1e-6)
        np.testing.assert_allclose(sl.smoothing_lengths_comoving.value, t["smoothing"], rtol=1e-10)

    def test_proper_positions_scaled_by_a(self, sim_dir):
        _, _, los_path, truth = sim_dir
        f = LineOfSightFileEAGLE(los_path)
        sl = f.get_sightline(1)
        a = f.a
        np.testing.assert_allclose(
            sl.positions_proper.value, truth["sightlines"][1]["positions"] * a, rtol=1e-10
        )

    def test_cache_behavior(self, sim_dir):
        _, _, los_path, _ = sim_dir
        sl = LineOfSightFileEAGLE(los_path).get_sightline(0, cache_data=True)
        first = sl.masses
        assert sl.masses is first  # cached
        sl.cache_data = False
        assert sl.masses is not first

    def test_get_files_sorted_by_redshift(self, sim_dir, tmp_path):
        root, *_ = sim_dir
        import shutil, os

        d = tmp_path / "los"
        d.mkdir()
        for z in ["3p000", "0p500", "1p250"]:
            (d / f"part_los_z{z.replace('p', '.')}.hdf5".replace(".hdf5", "")).touch()
        # use canonical naming: part_los_z<float>.hdf5
        for f_ in d.iterdir():
            f_.unlink()
        for z in ["3.000", "0.500", "1.250"]:
            (d / f"part_los_z{z}.hdf5").touch()
        files = LineOfSightFileEAGLE.get_files(str(d))
        zs = [float(p.rsplit("z", 1)[1].rsplit(".", 1)[0]) for p in files]
        assert zs == sorted(zs)


class TestFileTreeScraper:
    def test_snapshot_discovery(self, sim_dir):
        root, truths, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        assert len(tree.snapshots) == 3
        assert tree.snapshots.get_numbers() == ("010", "011", "012")
        leaf = tree.snapshots.get_by_number("011")
        assert len(leaf.filepaths) == 2  # parallel files
        assert leaf.tag_redshift == pytest.approx(0.5)

    def test_catalogue_discovery_and_pairing(self, sim_dir):
        root, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        assert len(tree.catalogues) == 3
        leaf = tree.catalogues.get_by_number("012")
        assert "eagle_subfind_particles" in leaf.membership_filepath
        assert "eagle_subfind_tab" in leaf.properties_filepath
        assert leaf.snapshot_leaf is not None
        assert leaf.snapshot_leaf.number == "012"

    def test_leaf_load_snapshot(self, sim_dir):
        root, truths, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        snap = tree.snapshots.get_by_number("010").load()
        spec, truth = truths[10]
        assert snap.redshift == pytest.approx(1.0)
        assert snap.number_of_particles(ParticleType.gas) == spec.n_gas

    def test_leaf_load_catalogue(self, sim_dir):
        root, truths, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        cat = tree.catalogues.get_by_number("011").load()
        spec, _ = truths[11]
        assert len(cat) == spec.n_groups
        assert cat.snapshot.redshift == pytest.approx(0.5)

    def test_redshift_lookup(self, sim_dir):
        root, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        # query z=0.3: snapshots have z = 1.0, 0.5, 0.1 -> picks last z >= 0.3
        assert tree.snapshots.find_file_number_from_redshift(0.3) == "011"
        assert tree.snapshots.find_file_number_from_redshift(0.05) == "012"
        with pytest.raises(FileNotFoundError):
            tree.snapshots.find_file_number_from_redshift(5.0)

    def test_skip_numbers(self, sim_dir):
        root, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root, skip_snapshot_numbers=["011"])
        assert tree.snapshots.get_numbers() == ("010", "012")
        assert tree.catalogues.get_numbers() == ("010", "012")

    def test_get_by_tag_and_errors(self, sim_dir):
        root, *_ = sim_dir
        tree = FileTreeScraper_EAGLE(root)
        leaf = tree.snapshots.get_by_tag(tree.snapshots.get_tags()[0])
        assert leaf.number == "010"
        with pytest.raises(KeyError):
            tree.snapshots.get_by_number("099")

    def test_path_relocation(self):
        root, rel = FileTreeScraper_EAGLE.split_filepath(
            "/data/sim/snapshot_012_z000p100/snap_012_z000p100.0.hdf5"
        )
        assert root == "/data/sim"
        assert rel == "snapshot_012_z000p100/snap_012_z000p100.0.hdf5"
        assert (
            FileTreeScraper_EAGLE.make_filepath_with_root("/new/loc", rel)
            == "/new/loc/snapshot_012_z000p100/snap_012_z000p100.0.hdf5"
        )

    def test_tag_redshift_parsing(self):
        assert tag_redshift("012_z000p503") == pytest.approx(0.503)
        assert tag_redshift("005_z003p125") == pytest.approx(3.125)
