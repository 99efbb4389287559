"""SWIFT backend tests: snapshot field recovery, DM k-NN hsml, SOAP catalogue."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.catalogue import BasicHaloDefinitions
from astro_sph_tools_tpu.io.errors import HaloDefinitionNotSupportedError
from astro_sph_tools_tpu.io.swift import CatalogueSOAP, SnapshotSWIFT
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_soap_catalogue,
    write_swift_snapshot,
)


@pytest.fixture(scope="module")
def swift(tmp_path_factory):
    spec = SyntheticSnapshotSpec(n_gas=1024, n_dm=1500, n_star=128, n_bh=4)
    root = tmp_path_factory.mktemp("swift_sim")
    path, truth = write_swift_snapshot(str(root), spec)
    cat_path, memb_path, cat_truth = write_soap_catalogue(str(root), spec, truth)
    snap = SnapshotSWIFT(path)
    return snap, truth, spec, cat_path, memb_path, cat_truth


class TestSnapshotSWIFT:
    def test_metadata(self, swift):
        snap, truth, spec, *_ = swift
        assert snap.redshift == pytest.approx(spec.redshift)
        assert snap.h == pytest.approx(spec.hubble_param)
        assert snap.omega_baryon == pytest.approx(spec.omega_baryon)
        np.testing.assert_allclose(snap.box_size.value, spec.box_size_mpc)
        assert snap.number_of_particles(ParticleType.gas) == spec.n_gas

    def test_field_recovery_matches_truth(self, swift):
        snap, truth, *_ = swift
        np.testing.assert_allclose(
            snap.get_positions(ParticleType.gas).value,
            truth.positions[ParticleType.gas], rtol=1e-10,
        )
        np.testing.assert_allclose(
            snap.get_masses(ParticleType.gas).value, truth.masses[ParticleType.gas], rtol=1e-10
        )
        np.testing.assert_allclose(
            snap.get_densities(ParticleType.gas).value, truth.density, rtol=1e-8
        )
        np.testing.assert_allclose(
            snap.get_temperatures(ParticleType.gas).value, truth.temperature, rtol=1e-10
        )

    def test_cross_backend_parity_with_eagle(self, swift, tmp_path):
        """Same physical truth through EAGLE and SWIFT files must give the
        same user-facing values."""
        from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
        from astro_sph_tools_tpu.io.synthetic import write_snapshot

        snap_swift, truth, spec, *_ = swift
        eagle_path, _ = write_snapshot(str(tmp_path), spec, truth)
        snap_eagle = SnapshotEAGLE(eagle_path)
        for pt in (ParticleType.gas, ParticleType.star):
            np.testing.assert_allclose(
                snap_swift.get_positions(pt).value,
                snap_eagle.get_positions(pt).value, rtol=1e-9,
            )
            np.testing.assert_allclose(
                snap_swift.get_masses(pt).value,
                snap_eagle.get_masses(pt).value, rtol=1e-6,
            )
        np.testing.assert_allclose(
            snap_swift.get_elemental_abundance(ParticleType.gas, "Fe").value,
            snap_eagle.get_elemental_abundance(ParticleType.gas, "Fe").value, rtol=1e-10,
        )

    def test_dm_smoothing_lengths_knn(self, swift):
        """DM hsml = 32nd-neighbour distance (periodic)."""
        from scipy.spatial import KDTree

        snap, truth, spec, *_ = swift
        hs = snap.get_smoothing_lengths(ParticleType.dark_matter)
        pos = truth.positions[ParticleType.dark_matter]
        box = spec.box_size_mpc
        tree = KDTree(np.mod(pos, box), boxsize=box)
        d, _ = tree.query(np.mod(pos, box), k=32)
        np.testing.assert_allclose(hs.value, d[:, -1], rtol=1e-8)
        assert len(hs) == spec.n_dm  # the reference's max/min bug truncated this

    def test_bh_mass_split(self, swift):
        snap, truth, *_ = swift
        np.testing.assert_allclose(
            snap.get_black_hole_subgrid_masses().value, truth.bh_subgrid_mass, rtol=1e-10
        )
        with pytest.raises(ValueError):
            snap.get_masses(ParticleType.black_hole)

    def test_proper_units_scale(self, swift):
        snap, truth, spec, *_ = swift
        pos_p = snap.get_positions(ParticleType.gas, use_proper_units=True)
        np.testing.assert_allclose(
            pos_p.value, truth.positions[ParticleType.gas] * spec.expansion_factor, rtol=1e-10
        )


class TestCatalogueSOAP:
    def test_halo_ids_and_parents(self, swift):
        snap, truth, spec, cat_path, memb_path, cat_truth = swift
        cat = CatalogueSOAP(cat_path, memb_path, snap)
        assert len(cat) == spec.n_groups
        np.testing.assert_array_equal(cat.get_halo_IDs(), cat_truth["halo_ids"])
        np.testing.assert_array_equal(cat.get_halo_parent_IDs(), cat_truth["parent"])
        np.testing.assert_array_equal(cat.get_halo_top_level_parent_IDs(), cat_truth["host"])

    def test_centres_and_masses(self, swift):
        snap, truth, spec, cat_path, memb_path, cat_truth = swift
        cat = CatalogueSOAP(cat_path, memb_path, snap)
        np.testing.assert_allclose(
            cat.get_halo_centres_of_potential().value, truth.group_centres, rtol=1e-10
        )
        m200 = cat.get_halo_masses(BasicHaloDefinitions.SO_200_CRIT.value)
        np.testing.assert_allclose(m200.value, cat_truth["masses"], rtol=1e-10)
        r500 = cat.get_halo_radii(BasicHaloDefinitions.SO_500_CRIT.value)
        np.testing.assert_allclose(r500.value, cat_truth["radii"] * 0.7, rtol=1e-10)

    def test_unsupported_definition(self, swift):
        snap, truth, spec, cat_path, memb_path, _ = swift
        cat = CatalogueSOAP(cat_path, memb_path, snap)
        with pytest.raises(HaloDefinitionNotSupportedError):
            cat.get_halo_radii(BasicHaloDefinitions.SO_200_MEAN.value)

    def test_membership_maps(self, swift):
        snap, truth, spec, cat_path, memb_path, _ = swift
        cat = CatalogueSOAP(cat_path, memb_path, snap)
        idx = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas)
        gn = truth.group_numbers[ParticleType.gas]
        bound = (gn >= 1) & (gn <= spec.n_groups)
        np.testing.assert_array_equal(idx[bound], gn[bound] - 1)
        # bound_only variant drops the unbound (negative group number) ones
        idx_b = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas, bound_only=True)
        unbound = gn < 0
        assert (idx_b[unbound] == -1).all()

    def test_hierarchy_counts(self, swift):
        snap, truth, spec, cat_path, memb_path, cat_truth = swift
        cat = CatalogueSOAP(cat_path, memb_path, snap)
        kids = cat.number_of_children
        # halo 0 has one direct child (halo 2); halo 2 has one (halo 3)
        assert kids[0] == 1 and kids[2] == 1
        assert cat.number_of_descendants[0] == 2


class TestSWIFTRegionRestriction:
    """Region restriction through SWIFT's native Cells metadata — the
    spatial masking capability the reference's broken SWIFT backend never
    had (swiftsimio cell masking parity)."""

    @pytest.fixture()
    def cells_snapshot(self, tmp_path):
        spec = SyntheticSnapshotSpec(
            n_gas=4096, n_dm=512, n_star=64, n_bh=2, swift_cells_dim=4
        )
        path, truth = write_swift_snapshot(str(tmp_path), spec)
        return SnapshotSWIFT(path), truth, spec

    def test_cells_metadata_written_and_loaded(self, cells_snapshot):
        snap, truth, spec = cells_snapshot
        cells = snap._load_cells()
        assert cells is not False
        centres, size, per_type = cells
        assert centres.shape == (64, 3)
        counts, offsets, files = per_type[ParticleType.gas]
        assert counts.sum() == spec.n_gas
        # offsets consistent with counts (cell-ordered single file)
        np.testing.assert_array_equal(
            offsets, np.concatenate([[0], np.cumsum(counts)[:-1]])
        )

    def test_region_read_is_exact(self, cells_snapshot):
        snap, truth, spec = cells_snapshot
        box = spec.box_size_mpc
        snap.restrict_data_comoving_loading_region(
            1.0, 4.0, 2.0, 6.0, 0.0, box
        )
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        p = truth.positions[ParticleType.gas]
        sel = (
            (p[:, 0] >= 1.0) & (p[:, 0] < 4.0)
            & (p[:, 1] >= 2.0) & (p[:, 1] < 6.0)
        )
        assert len(pos) == sel.sum() > 0
        assert snap.number_of_particles_this_rank(ParticleType.gas) == sel.sum()
        ids = snap.get_IDs(ParticleType.gas)
        assert sorted(ids) == sorted(truth.ids[ParticleType.gas][sel])
        # masses align with the same selection
        m = snap.get_masses(ParticleType.gas).to_value("Msun")
        assert np.allclose(np.sort(m), np.sort(truth.masses[ParticleType.gas][sel]))

    def test_region_read_prunes_rows(self, cells_snapshot):
        """A 1-cell-sized region must read only a few of the 64 cells."""
        snap, truth, spec = cells_snapshot
        snap.restrict_data_comoving_loading_region(
            0.1, 2.4, 0.1, 2.4, 0.1, 2.4
        )
        ranges = snap._region_rows[ParticleType.gas]
        assert ranges is not None
        rows_read = sum(e - s for r in ranges for (s, e) in r)
        assert 0 < rows_read < spec.n_gas // 2

    def test_wrapped_region(self, cells_snapshot):
        snap, truth, spec = cells_snapshot
        box = spec.box_size_mpc
        snap.restrict_data_comoving_loading_region(
            box - 1.0, box + 1.0, 0.0, box, 0.0, box
        )
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        p = truth.positions[ParticleType.gas]
        sel = (p[:, 0] >= box - 1.0) | (p[:, 0] < 1.0)
        assert len(pos) == sel.sum() > 0
        assert ((pos[:, 0] >= box - 1.0) | (pos[:, 0] < 1.0)).all()

    def test_clear_restriction(self, cells_snapshot):
        snap, truth, spec = cells_snapshot
        snap.restrict_data_comoving_loading_region(0.0, 1.0, 0.0, 1.0, 0.0, 1.0)
        n_r = snap.number_of_particles_this_rank(ParticleType.gas)
        snap.clear_region_restriction()
        assert snap.number_of_particles_this_rank(ParticleType.gas) == spec.n_gas
        assert n_r < spec.n_gas

    def test_no_cells_metadata_still_exact(self, tmp_path):
        """Without Cells the restriction is mask-only but exact."""
        spec = SyntheticSnapshotSpec(n_gas=1024, n_dm=64, n_star=16, n_bh=2)
        path, truth = write_swift_snapshot(str(tmp_path), spec)
        snap = SnapshotSWIFT(path)
        assert snap._load_cells() is False
        snap.restrict_data_comoving_loading_region(
            2.0, 5.0, 0.0, spec.box_size_mpc, 0.0, spec.box_size_mpc
        )
        pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
        p = truth.positions[ParticleType.gas]
        assert len(pos) == ((p[:, 0] >= 2.0) & (p[:, 0] < 5.0)).sum()

    def test_multifile_without_files_map_skips_cells_pruning(self, tmp_path):
        """Regression (ADVICE r4, medium): a multi-file snapshot whose Cells
        group lacks ``Files/<type>`` must NOT assume every cell lives in
        file 0 — that empties the row ranges for files 1..N-1 and silently
        drops their in-region particles. Pruning must be skipped (exact
        membership mask over whole-file reads)."""
        import h5py

        from astro_sph_tools_tpu import constants as C

        box = 10.0
        rng = np.random.default_rng(7)
        # file 0: gas at x in [0, 5); file 1: gas at x in [5, 10)
        pos0 = rng.uniform([0, 0, 0], [5, box, box], (100, 3))
        pos1 = rng.uniform([5, 0, 0], [box, box, box], (100, 3))
        num_total = np.array([200, 0, 0, 0, 0, 0], np.int64)
        for fi, pos in enumerate((pos0, pos1)):
            path = tmp_path / f"swift_0000.{fi}.hdf5"
            with h5py.File(path, "w") as f:
                hdr = f.create_group("Header")
                hdr.attrs["Redshift"] = np.array([0.0])
                hdr.attrs["Scale-factor"] = np.array([1.0])
                hdr.attrs["NumPart_Total"] = num_total
                this = np.zeros(6, np.int64)
                this[0] = len(pos)
                hdr.attrs["NumPart_ThisFile"] = this
                hdr.attrs["BoxSize"] = np.full(3, box)
                cos = f.create_group("Cosmology")
                cos.attrs["h"] = np.array([0.7])
                cos.attrs["Omega_b"] = np.array([0.05])
                g = f.create_group("PartType0")
                ds = g.create_dataset("Coordinates", data=pos)
                ds.attrs[
                    "Conversion factor to CGS (not including cosmological "
                    "corrections)"
                ] = C.MEGAPARSEC_CGS
                ds.attrs["a-scale exponent"] = np.array([1.0])
                if fi == 0:
                    # Cells metadata present but WITHOUT a Files group
                    cells = f.create_group("Cells")
                    meta = cells.create_group("Meta-data")
                    meta.attrs["size"] = np.array([5.0, box, box])
                    cells.create_dataset(
                        "Centres", data=np.array([[2.5, 5, 5], [7.5, 5, 5]])
                    )
                    cells.create_group("Counts").create_dataset(
                        "PartType0", data=np.array([100, 100], np.int64)
                    )
                    cells.create_group("OffsetsInFile").create_dataset(
                        "PartType0", data=np.array([0, 100], np.int64)
                    )
        snap = SnapshotSWIFT(str(tmp_path / "swift_0000.0.hdf5"))
        assert len(snap._file_paths) == 2
        # region entirely inside file 1's x-range
        snap.restrict_data_comoving_loading_region(6.0, 9.0, 0.0, box, 0.0, box)
        got = snap.get_positions(ParticleType.gas).to_value("Mpc")
        expected = pos1[(pos1[:, 0] >= 6.0) & (pos1[:, 0] < 9.0)]
        assert len(got) == len(expected) > 0
        np.testing.assert_allclose(
            np.sort(got[:, 0]), np.sort(expected[:, 0]), rtol=1e-12
        )
