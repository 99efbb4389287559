"""Golden-file IO tests: synthetic EAGLE-schema snapshots -> SnapshotEAGLE.

The generator writes *physical* truth converted to EAGLE internal units; the
reader must recover the truth through the h/a/CGS algebra
(_SnapshotEAGLE.py:422-453), proving the unit pipeline end to end.
"""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.errors import SnapshotFormatError
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    generate_particles,
    write_snapshot,
)


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    spec = SyntheticSnapshotSpec(n_gas=2048, n_dm=2048, n_star=256, n_bh=8, n_files=3)
    root = tmp_path_factory.mktemp("eagle_sim")
    path, truth = write_snapshot(str(root), spec)
    return SnapshotEAGLE(path), truth, spec


class TestHeader:
    def test_metadata(self, snapshot):
        snap, truth, spec = snapshot
        assert snap.redshift == pytest.approx(spec.redshift)
        assert snap.h == pytest.approx(spec.hubble_param)
        assert snap.a == pytest.approx(spec.expansion_factor)
        assert snap.omega_baryon == pytest.approx(spec.omega_baryon)
        assert not snap.is_snipshot
        assert snap.number == f"{spec.snapshot_number:03d}"

    def test_box_size_mpc(self, snapshot):
        snap, truth, spec = snapshot
        np.testing.assert_allclose(snap.box_size.value, spec.box_size_mpc, rtol=1e-10)

    def test_counts(self, snapshot):
        snap, truth, spec = snapshot
        assert snap.number_of_particles(ParticleType.gas) == spec.n_gas
        assert snap.number_of_particles(ParticleType.dark_matter) == spec.n_dm
        assert snap.number_of_particles_this_rank(ParticleType.gas) == spec.n_gas

    def test_bad_path_rejected(self, tmp_path):
        with pytest.raises(SnapshotFormatError):
            SnapshotEAGLE(str(tmp_path / "not_a_snapshot.hdf5"))


class TestFieldRecovery:
    """Reader output must equal the physical truth (comoving h-full Mpc etc.)."""

    def test_ids_int64(self, snapshot):
        snap, truth, _ = snapshot
        ids = snap.get_IDs(ParticleType.gas)
        assert ids.dtype == np.int64
        np.testing.assert_array_equal(np.sort(ids), np.sort(truth.ids[ParticleType.gas]))

    def test_positions_mpc(self, snapshot):
        snap, truth, _ = snapshot
        pos = snap.get_positions(ParticleType.gas)
        np.testing.assert_allclose(pos.value, truth.positions[ParticleType.gas], rtol=1e-10)

    def test_proper_positions(self, snapshot):
        snap, truth, spec = snapshot
        pos = snap.get_positions(ParticleType.gas, use_proper_units=True)
        np.testing.assert_allclose(
            pos.value, truth.positions[ParticleType.gas] * spec.expansion_factor, rtol=1e-10
        )

    def test_masses_msun(self, snapshot):
        snap, truth, _ = snapshot
        m = snap.get_masses(ParticleType.gas)
        np.testing.assert_allclose(m.value, truth.masses[ParticleType.gas], rtol=1e-6)

    def test_dm_constant_masses(self, snapshot):
        snap, truth, spec = snapshot
        m = snap.get_masses(ParticleType.dark_matter)
        assert m.shape == (spec.n_dm,)
        np.testing.assert_allclose(m.value, truth.dm_particle_mass, rtol=1e-6)

    def test_bh_masses_split(self, snapshot):
        snap, truth, _ = snapshot
        with pytest.raises(ValueError):
            snap.get_masses(ParticleType.black_hole)
        sub = snap.get_black_hole_subgrid_masses()
        dyn = snap.get_black_hole_dynamical_masses()
        np.testing.assert_allclose(sub.value, truth.bh_subgrid_mass, rtol=1e-6)
        np.testing.assert_allclose(dyn.value, truth.masses[ParticleType.black_hole], rtol=1e-6)

    def test_velocities(self, snapshot):
        snap, truth, _ = snapshot
        v = snap.get_velocities(ParticleType.dark_matter)
        np.testing.assert_allclose(v.value, truth.velocities[ParticleType.dark_matter], rtol=1e-10)

    def test_smoothing_lengths(self, snapshot):
        snap, truth, _ = snapshot
        hs = snap.get_smoothing_lengths(ParticleType.gas)
        np.testing.assert_allclose(hs.value, truth.smoothing[ParticleType.gas], rtol=1e-10)

    def test_density(self, snapshot):
        snap, truth, _ = snapshot
        rho = snap.get_densities(ParticleType.gas)
        np.testing.assert_allclose(rho.value, truth.density, rtol=1e-6)

    def test_temperature_gas_only(self, snapshot):
        snap, truth, _ = snapshot
        t = snap.get_temperatures(ParticleType.gas)
        np.testing.assert_allclose(t.value, truth.temperature, rtol=1e-10)
        with pytest.raises(ValueError):
            snap.get_temperatures(ParticleType.star)

    def test_sfr(self, snapshot):
        snap, truth, _ = snapshot
        sfr = snap.get_sfr()
        np.testing.assert_allclose(sfr.value, truth.sfr, rtol=1e-6, atol=1e-12)

    def test_metallicity_and_solar(self, snapshot):
        snap, truth, spec = snapshot
        z = snap.get_metallicities(ParticleType.gas)
        np.testing.assert_allclose(z.value, truth.metallicity[ParticleType.gas], rtol=1e-10)
        zsol = snap.get_metallicities(ParticleType.gas, solar_units=True)
        np.testing.assert_allclose(
            zsol.value, truth.metallicity[ParticleType.gas] / spec.solar_metallicity, rtol=1e-10
        )

    def test_abundance(self, snapshot):
        snap, truth, _ = snapshot
        fe = snap.get_elemental_abundance(ParticleType.gas, "Fe")
        np.testing.assert_allclose(
            fe.value, truth.abundances[ParticleType.gas]["Fe"], rtol=1e-10
        )
        with pytest.raises(ValueError):
            snap.get_elemental_abundance(ParticleType.gas, "U")

    def test_number_density(self, snapshot):
        """n_H = rho_cgs * X_H / (1.008 * 1.661e-24) in cm^-3."""
        from astro_sph_tools_tpu import constants as C

        snap, truth, _ = snapshot
        n_h = snap.get_number_densities(ParticleType.gas, "H")
        rho_cgs = truth.density * C.SOLAR_MASS_CGS / C.MEGAPARSEC_CGS**3
        expected = rho_cgs * truth.abundances[ParticleType.gas]["H"] / (
            C.ATOMIC_WEIGHTS["H"] * C.ATOMIC_MASS_UNIT_CGS_REFERENCE
        )
        np.testing.assert_allclose(n_h.value, expected, rtol=1e-6)

    def test_mean_enrichment_redshift(self, snapshot):
        snap, truth, _ = snapshot
        ez = snap.get_mean_enrichment_redshift(ParticleType.star)
        np.testing.assert_allclose(ez.value, truth.enrichment_z[ParticleType.star], rtol=1e-10)

    def test_volumes_formula(self, snapshot):
        """Default volume = h^3 * pi * 4/3 (the reference's literal formula)."""
        snap, truth, _ = snapshot
        vol = snap.get_volumes(ParticleType.gas)
        h = truth.smoothing[ParticleType.gas]
        np.testing.assert_allclose(vol.value, h**3 * np.pi * (4 / 3), rtol=1e-9)


class TestGroupNumbers:
    def test_group_id_semantics(self, snapshot):
        snap, truth, _ = snapshot
        raw = truth.group_numbers[ParticleType.gas]
        gid = snap.get_group_ID(ParticleType.gas)
        unbound = raw < 0
        np.testing.assert_array_equal(gid[unbound], SnapshotEAGLE.EAGLE_MAX_GROUP_NUMBER)
        np.testing.assert_array_equal(gid[~unbound], raw[~unbound])
        gid_inc = snap.get_group_ID(ParticleType.gas, include_nearby_unattached_particles=True)
        np.testing.assert_array_equal(gid_inc[unbound], -raw[unbound])

    def test_group_index(self, snapshot):
        snap, truth, _ = snapshot
        raw = truth.group_numbers[ParticleType.gas]
        gidx = snap.get_group_index(ParticleType.gas)
        member = (raw > 0) & (raw < 2**30)
        np.testing.assert_array_equal(gidx[member], raw[member] - 1)
        np.testing.assert_array_equal(gidx[raw == 2**30], -1)


class TestRegionRestriction:
    def test_plain_region(self, tmp_path):
        spec = SyntheticSnapshotSpec(n_gas=2000, n_dm=10, n_star=10, n_bh=2, n_files=2)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        snap.restrict_data_comoving_loading_region(2.0, 5.0, 1.0, 9.0, 0.0, 10.0)
        pos = snap.get_positions(ParticleType.gas).value
        assert len(pos) > 0
        assert (pos[:, 0] >= 2.0).all() and (pos[:, 0] < 5.0).all()
        assert (pos[:, 1] >= 1.0).all() and (pos[:, 1] < 9.0).all()
        p = truth.positions[ParticleType.gas]
        expected = (
            (p[:, 0] >= 2.0) & (p[:, 0] < 5.0) & (p[:, 1] >= 1.0) & (p[:, 1] < 9.0)
        ).sum()
        assert len(pos) == expected
        assert snap.number_of_particles_this_rank(ParticleType.gas) == expected

    def test_wrapped_region(self, tmp_path):
        """Inverted range crosses the periodic boundary (x in [9, 1))."""
        spec = SyntheticSnapshotSpec(n_gas=2000, n_dm=10, n_star=10, n_bh=2, n_files=1)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        snap.restrict_data_comoving_loading_region(9.0, 11.0, 0.0, 10.0, 0.0, 10.0)
        pos = snap.get_positions(ParticleType.gas).value
        assert ((pos[:, 0] >= 9.0) | (pos[:, 0] < 1.0)).all()
        p = truth.positions[ParticleType.gas]
        expected = ((p[:, 0] >= 9.0) | (p[:, 0] < 1.0)).sum()
        assert len(pos) == expected

    def test_clear_restriction(self, tmp_path):
        spec = SyntheticSnapshotSpec(n_gas=500, n_dm=10, n_star=10, n_bh=2, n_files=1)
        path, _ = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        snap.restrict_data_comoving_loading_region(0.0, 1.0, 0.0, 10.0, 0.0, 10.0)
        n_restricted = snap.number_of_particles_this_rank(ParticleType.gas)
        snap.clear_region_restriction()
        assert snap.number_of_particles_this_rank(ParticleType.gas) == 500
        assert n_restricted < 500

    def test_region_selection_is_lazy_per_type(self, tmp_path):
        """ADVICE r4: a gas-only regional read must not stream the
        coordinates of other particle types — the spatial index and
        membership mask are built per type on first access."""
        spec = SyntheticSnapshotSpec(n_gas=500, n_dm=400, n_star=32, n_bh=2, n_files=1)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        snap.restrict_data_comoving_loading_region(2.0, 5.0, 0.0, 10.0, 0.0, 10.0)
        # the restriction itself builds nothing
        assert snap._spatial_index == {}
        assert snap._region_masks == {}
        pos = snap.get_positions(ParticleType.gas).value
        assert ParticleType.gas in snap._spatial_index
        assert ParticleType.dark_matter not in snap._spatial_index
        assert ParticleType.dark_matter not in snap._region_masks
        p = truth.positions[ParticleType.gas]
        assert len(pos) == ((p[:, 0] >= 2.0) & (p[:, 0] < 5.0)).sum()
        # per-rank counts fill lazily and correctly too
        pd = truth.positions[ParticleType.dark_matter]
        n_dm = snap.number_of_particles_this_rank(ParticleType.dark_matter)
        assert n_dm == ((pd[:, 0] >= 2.0) & (pd[:, 0] < 5.0)).sum()
        assert ParticleType.dark_matter in snap._spatial_index


class TestMultiProcessSplit:
    def test_file_split_partitions(self, tmp_path):
        spec = SyntheticSnapshotSpec(n_gas=1000, n_dm=10, n_star=10, n_bh=2, n_files=4)
        path, truth = write_snapshot(str(tmp_path), spec)
        all_ids = []
        for r in range(2):
            snap = SnapshotEAGLE(path, process_index=r, n_processes=2)
            all_ids.append(snap.get_IDs(ParticleType.gas))
        combined = np.sort(np.concatenate(all_ids))
        np.testing.assert_array_equal(combined, np.sort(truth.ids[ParticleType.gas]))

    def test_proper_region_converts_to_comoving(self, tmp_path):
        """Proper bounds scale by 1/a before masking (z=0.5 -> a=2/3)."""
        spec = SyntheticSnapshotSpec(n_gas=800, n_dm=10, n_star=10, n_bh=2, n_files=1)
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        a = spec.expansion_factor
        # proper [0, 2] Mpc == comoving [0, 3] Mpc at a = 2/3
        snap.restrict_data_proper_loading_region(0.0, 2.0, 0.0, 10.0 * a, 0.0, 10.0 * a)
        pos = snap.get_positions(ParticleType.gas).value
        assert (pos[:, 0] < 2.0 / a + 1e-9).all()
        p = truth.positions[ParticleType.gas]
        expected = (p[:, 0] < 2.0 / a).sum()
        assert len(pos) == expected


class TestDeviceBridge:
    def test_fields_to_device(self, snapshot):
        import jax
        import jax.numpy as jnp

        snap, truth, _ = snapshot
        fields = snap.fields_to_device(
            ParticleType.gas, ["positions", "masses", "smoothing_lengths"]
        )
        assert set(fields) == {"positions", "masses", "smoothing_lengths"}
        assert isinstance(fields["masses"], jax.Array)
        assert fields["masses"].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(fields["positions"]),
            truth.positions[ParticleType.gas].astype(np.float32),
            rtol=1e-6,
        )

    def test_read_async(self, snapshot):
        snap, truth, _ = snapshot
        future = snap.read_async("get_masses", ParticleType.gas)
        result = future.result(timeout=30)
        np.testing.assert_allclose(result.value, truth.masses[ParticleType.gas], rtol=1e-6)


def test_wrapped_interval_mask_degenerate():
    # ADVICE r1 #4: zero-width regions must select nothing (previously all)
    from astro_sph_tools_tpu.io.eagle import _wrapped_interval_mask

    v = np.linspace(0, 10, 50, endpoint=False)
    assert not _wrapped_interval_mask(v, 3.0, 3.0, 10.0).any()
    assert not _wrapped_interval_mask(v, 13.0, 13.0, 10.0).any()  # wrapped lo==hi
    assert not _wrapped_interval_mask(v, 5.0, 4.0, 10.0).any()  # inverted
    # sanity: normal + wrapped intervals still work
    assert _wrapped_interval_mask(v, 2.0, 4.0, 10.0).sum() == 10
    assert _wrapped_interval_mask(v, 9.0, 11.0, 10.0).sum() == 10


def test_cgs_conversion_upcasts_f32(synthetic_snapshot_dir=None):
    # f32 on-disk data must not overflow when expressed in CGS grams
    # (1e6 Msun ~ 2e39 g > f32 max); conversion runs in f64
    from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
    from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spec = SyntheticSnapshotSpec(n_gas=64, n_dm=32, n_star=8, n_bh=2, n_files=1)
        path, _ = write_snapshot(d, spec)
        snap = SnapshotEAGLE(path)
        raw = np.asarray([2.0e-5], np.float32)  # ~ raw internal mass units
        out = snap.make_cgs_data("g", raw, h_exp=-1.0, cgs_conversion_factor=1.989e43)
        assert np.isfinite(out.value).all()
        assert out.value.dtype == np.float64


def test_output_dtype_f32_fast_path():
    # opt-in f32 field output: same values as the f64 contract (to f32
    # precision), no grams materialised en route
    from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
    from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
    from astro_sph_tools_tpu.data_structures import ParticleType
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spec = SyntheticSnapshotSpec(n_gas=256, n_dm=32, n_star=8, n_bh=2, n_files=2)
        path, _ = write_snapshot(d, spec)
        snap64 = SnapshotEAGLE(path)
        snap32 = SnapshotEAGLE(path)
        snap32.output_dtype = np.float32
        for getter in ("get_positions", "get_masses", "get_smoothing_lengths"):
            a = getattr(snap64, getter)(ParticleType.gas)
            b = getattr(snap32, getter)(ParticleType.gas)
            assert b.value.dtype == np.float32
            np.testing.assert_allclose(
                b.value, a.value.astype(np.float32), rtol=3e-7
            )


class TestSpatialIndex:
    """Region reads must be O(region), not O(box): with the block index
    built, a small-region read opens only the files whose blocks intersect
    the region (pyread_eagle select_region parity,
    `_SnapshotEAGLE.py:115-117,176-310`; VERDICT r3 item 3)."""

    @staticmethod
    def _counting_file(counter):
        import h5py

        real_file = h5py.File

        def wrapper(path, *a, **kw):
            counter.append(str(path))
            return real_file(path, *a, **kw)

        return wrapper

    @pytest.fixture()
    def indexed_snapshot(self, tmp_path):
        spec = SyntheticSnapshotSpec(
            n_gas=8192, n_dm=64, n_star=16, n_bh=2, n_files=64,
            spatial_order=True,
        )
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        return snap, truth, spec

    def test_small_region_opens_few_files(self, indexed_snapshot, monkeypatch):
        import h5py
        import astro_sph_tools_tpu.io.eagle as eagle_mod

        snap, truth, spec = indexed_snapshot
        snap.restrict_data_comoving_loading_region(
            1.0, 2.5, 1.0, 2.5, 1.0, 2.5
        )
        # correctness first: exact region mask applied over pruned reads
        pos = snap.get_positions(ParticleType.gas).value
        p = truth.positions[ParticleType.gas]
        expected = (
            (p[:, 0] >= 1.0) & (p[:, 0] < 2.5)
            & (p[:, 1] >= 1.0) & (p[:, 1] < 2.5)
            & (p[:, 2] >= 1.0) & (p[:, 2] < 2.5)
        ).sum()
        assert len(pos) == expected > 0
        # now count file opens for a non-coordinate field read
        opens: list = []
        monkeypatch.setattr(
            eagle_mod.h5py, "File", self._counting_file(opens)
        )
        masses = snap.get_masses(ParticleType.gas)
        assert len(masses) == expected
        # (1.5/10)^3 ~ 0.3% of the volume: with Morton-ordered files the
        # read must touch a small fraction of the 64 files
        assert 0 < len(set(opens)) < 16

    def test_wrapped_region_prunes_and_is_exact(self, indexed_snapshot, monkeypatch):
        import astro_sph_tools_tpu.io.eagle as eagle_mod

        snap, truth, spec = indexed_snapshot
        # crosses the periodic boundary on x: x in [9.5, 10) U [0, 0.5)
        snap.restrict_data_comoving_loading_region(
            9.5, 10.5, 4.0, 6.0, 4.0, 6.0
        )
        pos = snap.get_positions(ParticleType.gas).value
        p = truth.positions[ParticleType.gas]
        sel = (
            ((p[:, 0] >= 9.5) | (p[:, 0] < 0.5))
            & (p[:, 1] >= 4.0) & (p[:, 1] < 6.0)
            & (p[:, 2] >= 4.0) & (p[:, 2] < 6.0)
        )
        assert len(pos) == sel.sum() > 0
        assert ((pos[:, 0] >= 9.5) | (pos[:, 0] < 0.5)).all()
        opens: list = []
        monkeypatch.setattr(
            eagle_mod.h5py, "File", self._counting_file(opens)
        )
        ids = snap.get_IDs(ParticleType.gas)
        assert sorted(ids) == sorted(truth.ids[ParticleType.gas][sel])
        assert 0 < len(set(opens)) < 32

    def test_unsorted_snapshot_still_exact(self, tmp_path):
        """Without spatial ordering the index cannot prune (every block
        spans the box) but results stay exact."""
        spec = SyntheticSnapshotSpec(
            n_gas=1000, n_dm=10, n_star=10, n_bh=2, n_files=4
        )
        path, truth = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        snap.restrict_data_comoving_loading_region(
            2.0, 4.0, 0.0, 10.0, 0.0, 10.0
        )
        pos = snap.get_positions(ParticleType.gas).value
        p = truth.positions[ParticleType.gas]
        assert len(pos) == ((p[:, 0] >= 2.0) & (p[:, 0] < 4.0)).sum()


class TestNumPartHighWord:
    def test_highword_counts(self, tmp_path):
        """Real EAGLE headers split counts into uint32 NumPart_Total +
        NumPart_Total_HighWord; production boxes exceed 2^32 particles
        (reference scale evidence: `tools/_ArrayReorder.py:536-548`)."""
        fake_gas_total = 5_000_000_000  # > 2^32
        spec = SyntheticSnapshotSpec(
            n_gas=64, n_dm=32, n_star=8, n_bh=2, n_files=1,
            numpart_highword=True,
            numpart_total_override=(fake_gas_total, 32, 0, 0, 8, 2),
        )
        path, _ = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        assert snap.number_of_particles(ParticleType.gas) == fake_gas_total
        assert snap.number_of_particles(ParticleType.dark_matter) == 32

    def test_highword_zero_roundtrip(self, tmp_path):
        """HighWord present but zero must not change small counts."""
        spec = SyntheticSnapshotSpec(
            n_gas=100, n_dm=50, n_star=10, n_bh=2, n_files=2,
            numpart_highword=True,
        )
        path, _ = write_snapshot(str(tmp_path), spec)
        snap = SnapshotEAGLE(path)
        assert snap.number_of_particles(ParticleType.gas) == 100
        assert snap.number_of_particles(ParticleType.dark_matter) == 50


def test_padded_full_axis_region_selects_everything(tmp_path):
    """A region wider than the box with out-of-box bounds (e.g. the render
    CLI's padded full-box region, [-pad, box+pad)) must select the whole
    axis — regression for the wrapped-interval full-axis check running
    after the modulo (it collapsed the axis to a thin wrapped slab)."""
    from astro_sph_tools_tpu.io.synthetic import SyntheticSnapshotSpec, write_snapshot
    from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE

    spec = SyntheticSnapshotSpec(n_gas=512, n_dm=16, n_star=8, n_bh=2, n_files=2)
    path, truth = write_snapshot(str(tmp_path), spec)
    snap = SnapshotEAGLE(path)
    snap.restrict_data_comoving_loading_region(
        -0.5, 10.5, -0.5, 10.5, -0.5, 10.5
    )
    assert snap.number_of_particles_this_rank(ParticleType.gas) == 512
