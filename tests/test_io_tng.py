"""TNG backend tests: field recovery, derived temperature, group catalogue."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.catalogue import BasicHaloDefinitions
from astro_sph_tools_tpu.io.errors import HaloDefinitionNotSupportedError, SnapshotFormatError
from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_tng_snapshot
from astro_sph_tools_tpu.io.tng import CatalogueTNG, SnapshotTNG


@pytest.fixture(scope="module")
def tng(tmp_path_factory):
    spec = SyntheticSnapshotSpec(n_gas=1024, n_dm=512, n_star=128, n_bh=4, n_files=2, n_groups=6)
    root = tmp_path_factory.mktemp("tng_sim")
    snap_path, cat_path, truth, extra = write_tng_snapshot(str(root), spec)
    snap = SnapshotTNG(snap_path)
    return snap, cat_path, truth, extra, spec


class TestSnapshotTNG:
    def test_metadata(self, tng):
        snap, _, truth, extra, spec = tng
        assert snap.redshift == pytest.approx(spec.redshift)
        assert snap.a == pytest.approx(spec.expansion_factor)
        np.testing.assert_allclose(snap.box_size.value, spec.box_size_mpc, rtol=1e-10)
        assert snap.number_of_particles(ParticleType.gas) == spec.n_gas
        assert snap.solar_metallicity == 0.0127

    def test_positions_unit_conversion(self, tng):
        """ckpc/h on disk -> comoving Mpc user-facing."""
        snap, _, truth, extra, spec = tng
        order = extra["order"][ParticleType.gas]
        pos = snap.get_positions(ParticleType.gas)
        np.testing.assert_allclose(
            pos.value, truth.positions[ParticleType.gas][order], rtol=1e-10
        )

    def test_velocities_sqrt_a(self, tng):
        snap, _, truth, extra, spec = tng
        order = extra["order"][ParticleType.dark_matter]
        v = snap.get_velocities(ParticleType.dark_matter)
        np.testing.assert_allclose(
            v.value, truth.velocities[ParticleType.dark_matter][order], rtol=1e-10
        )

    def test_masses_and_mass_table(self, tng):
        snap, _, truth, extra, _ = tng
        order = extra["order"][ParticleType.gas]
        np.testing.assert_allclose(
            snap.get_masses(ParticleType.gas).value, truth.masses[ParticleType.gas][order],
            rtol=1e-10,
        )
        dm = snap.get_masses(ParticleType.dark_matter)
        np.testing.assert_allclose(dm.value, truth.dm_particle_mass, rtol=1e-10)

    def test_density_conversion(self, tng):
        snap, _, truth, extra, _ = tng
        order = extra["order"][ParticleType.gas]
        rho = snap.get_densities(ParticleType.gas)
        np.testing.assert_allclose(rho.value, truth.density[order], rtol=1e-9)

    def test_derived_temperature(self, tng):
        """T from InternalEnergy/ElectronAbundance/X_H must reproduce the
        truth temperature the fixture inverted."""
        snap, _, truth, extra, _ = tng
        order = extra["order"][ParticleType.gas]
        t = snap.get_temperatures(ParticleType.gas)
        np.testing.assert_allclose(t.value, truth.temperature[order], rtol=1e-10)

    def test_metallicity_solar_units(self, tng):
        snap, _, truth, extra, _ = tng
        order = extra["order"][ParticleType.gas]
        z = snap.get_metallicities(ParticleType.gas, solar_units=True)
        np.testing.assert_allclose(
            z.value, truth.metallicity[ParticleType.gas][order] / 0.0127, rtol=1e-10
        )

    def test_abundance_columns(self, tng):
        snap, _, truth, extra, _ = tng
        order = extra["order"][ParticleType.star]
        fe = snap.get_elemental_abundance(ParticleType.star, "Fe")
        np.testing.assert_allclose(
            fe.value, truth.abundances[ParticleType.star]["Fe"][order], rtol=1e-10
        )

    def test_bad_path(self, tmp_path):
        with pytest.raises(SnapshotFormatError):
            SnapshotTNG(str(tmp_path / "snap_99.hdf5"))


class TestCatalogueTNG:
    def test_counts_and_fields(self, tng):
        snap, cat_path, truth, extra, spec = tng
        cat = CatalogueTNG(cat_path, snap)
        assert len(cat) == spec.n_groups
        np.testing.assert_allclose(
            cat.get_halo_centres_of_potential().value, truth.group_centres, rtol=1e-10
        )
        m = cat.get_halo_masses(BasicHaloDefinitions.FOF_GROUP.value)
        np.testing.assert_allclose(m.value, extra["masses"], rtol=1e-10)

    def test_so_definitions(self, tng):
        snap, cat_path, truth, extra, _ = tng
        cat = CatalogueTNG(cat_path, snap)
        m200 = cat.get_halo_masses(BasicHaloDefinitions.SO_200_CRIT.value)
        m_mean = cat.get_halo_masses(BasicHaloDefinitions.SO_200_MEAN.value)
        np.testing.assert_allclose(m_mean.value / m200.value, 1.2, rtol=1e-9)
        r_th = cat.get_halo_radii(BasicHaloDefinitions.SO_200_TOP_HAT.value)
        np.testing.assert_allclose(r_th.value, extra["radii"] * 1.1, rtol=1e-9)
        with pytest.raises(HaloDefinitionNotSupportedError):
            cat.get_halo_masses(BasicHaloDefinitions.SO_2500_CRIT.value)

    def test_membership_from_offsets(self, tng):
        snap, cat_path, truth, extra, spec = tng
        cat = CatalogueTNG(cat_path, snap)
        halo_idx = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas)
        order = extra["order"][ParticleType.gas]
        gn = truth.group_numbers[ParticleType.gas][order]
        member = (gn > 0) & (gn < 2**30)
        np.testing.assert_array_equal(halo_idx[member], gn[member] - 1)
        assert (halo_idx[~member] == -1).all()

    def test_member_particle_ids(self, tng):
        snap, cat_path, truth, extra, spec = tng
        cat = CatalogueTNG(cat_path, snap)
        ids = cat.get_particle_IDs(ParticleType.star)
        gn = truth.group_numbers[ParticleType.star]
        member = (gn > 0) & (gn < 2**30)
        np.testing.assert_array_equal(np.sort(ids), np.sort(truth.ids[ParticleType.star][member]))

    def test_contains_type_filter(self, tng):
        snap, cat_path, truth, extra, spec = tng
        cat = CatalogueTNG(cat_path, snap)
        n_bh = cat.get_number_of_haloes(ParticleType.black_hole)
        assert n_bh == int((extra["group_len_type"][:, 5] > 0).sum())


class TestHaloCutout:
    """O(halo) cutout reads via GroupLenType offsets (illustris_python
    snapshot.loadHalo semantics): TNG snapshots store particles in
    FoF-group order, so a halo is one contiguous row slice per type."""

    def test_cutout_matches_membership(self, tng):
        snap, cat_path, truth, extra, spec = tng
        cat = CatalogueTNG(cat_path, snap)
        gn = truth.group_numbers[ParticleType.gas]
        member = (gn > 0) & (gn < 2**30)
        target = int(np.bincount(gn[member] - 1).argmax())
        try:
            cat.restrict_snapshot_to_halo(target)
            ids = snap.get_IDs(ParticleType.gas)
            expected = truth.ids[ParticleType.gas][member & (gn == target + 1)]
            assert sorted(ids) == sorted(expected)
            assert snap.number_of_particles_this_rank(ParticleType.gas) == len(expected)
            # positions come back unit-converted for just the cutout
            pos = snap.get_positions(ParticleType.gas).to_value("Mpc")
            assert pos.shape == (len(expected), 3)
        finally:
            snap.clear_row_restriction()
        assert snap.number_of_particles_this_rank(ParticleType.gas) == len(
            truth.ids[ParticleType.gas]
        )

    def test_cutout_prunes_file_opens(self, tng, monkeypatch):
        snap, cat_path, truth, extra, spec = tng
        import astro_sph_tools_tpu.io.tng as tng_mod

        cat = CatalogueTNG(cat_path, snap)
        try:
            cat.restrict_snapshot_to_halo(0)  # group 0: first rows of file 0
            opens: list = []
            real_file = tng_mod.h5py.File

            def wrapper(path, *a, **kw):
                opens.append(str(path))
                return real_file(path, *a, **kw)

            monkeypatch.setattr(tng_mod.h5py, "File", wrapper)
            snap.get_IDs(ParticleType.gas)
            snap_files = [o for o in opens if "snapdir" in o]
            assert 0 < len(snap_files) < len(snap._file_paths)
        finally:
            monkeypatch.undo()
            snap.clear_row_restriction()

    def test_invalid_halo_index_raises(self, tng):
        snap, cat_path, _, _, _ = tng
        cat = CatalogueTNG(cat_path, snap)
        with pytest.raises(IndexError):
            cat.restrict_snapshot_to_halo(10**9)


def test_membership_correct_under_restriction(tng):
    """Membership queries must use GLOBAL row indexes while a halo cutout
    is active: every particle of halo k must be labelled k, not 0, and
    get_particle_IDs must return the bound subset of the cutout."""
    snap, cat_path, truth, extra, spec = tng
    cat = CatalogueTNG(cat_path, snap)
    gn = truth.group_numbers[ParticleType.gas]
    member = (gn > 0) & (gn < 2**30)
    target = int(np.bincount(gn[member] - 1, minlength=spec.n_groups).argmax())
    try:
        cat.restrict_snapshot_to_halo(target)
        labels = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas)
        assert len(labels) > 0
        np.testing.assert_array_equal(labels, target)
        bound_ids = cat.get_particle_IDs(ParticleType.gas)
        expected = truth.ids[ParticleType.gas][member & (gn == target + 1)]
        assert sorted(bound_ids) == sorted(expected)
    finally:
        snap.clear_row_restriction()
