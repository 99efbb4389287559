"""Halo definitions, hierarchy analytics, and SUBFIND catalogue tests."""

import numpy as np
import pytest

from astro_sph_tools_tpu.data_structures import ParticleType
from astro_sph_tools_tpu.io.catalogue import (
    BasicHaloDefinitions,
    CriticalSphericalOverdensityAperture,
    FixedRadiusAperture,
    FOFGroup,
    MeanSphericalOverdensityAperture,
    TopHatSphericalOverdensityAperture,
    calculate_n_children,
)
from astro_sph_tools_tpu.io.eagle import SnapshotEAGLE
from astro_sph_tools_tpu.io.errors import HaloDefinitionNotSupportedError
from astro_sph_tools_tpu.io.subfind import CatalogueSUBFIND
from astro_sph_tools_tpu.io.synthetic import (
    SyntheticSnapshotSpec,
    write_catalogue,
    write_snapshot,
)
from astro_sph_tools_tpu.units import unit_quantity


class TestHaloDefinitions:
    def test_value_equality(self):
        assert FOFGroup() == FOFGroup()
        assert CriticalSphericalOverdensityAperture(200) == CriticalSphericalOverdensityAperture(200)
        assert CriticalSphericalOverdensityAperture(200) != CriticalSphericalOverdensityAperture(500)
        # flavours are distinct even at the same multiple
        assert CriticalSphericalOverdensityAperture(200) != MeanSphericalOverdensityAperture(200)
        assert MeanSphericalOverdensityAperture(200) != TopHatSphericalOverdensityAperture(200)

    def test_fixed_radius_compares_in_kpc(self):
        # comparison is exact in kpc (reference `_CatalogueBase.py:117`)
        a = FixedRadiusAperture(unit_quantity(30.0, "kpc"))
        b = FixedRadiusAperture(unit_quantity(30.0, "kpc"))
        c = FixedRadiusAperture(unit_quantity(50.0, "kpc"))
        assert a == b
        assert a != c

    def test_enum_members(self):
        names = {d.name for d in BasicHaloDefinitions}
        assert {"FOF_GROUP", "SO_200_CRIT", "SO_500_CRIT", "SO_2500_CRIT",
                "SO_200_MEAN", "SO_500_MEAN", "SO_2500_MEAN", "SO_200_TOP_HAT",
                "FIXED_5_KPC", "FIXED_10_KPC", "FIXED_30_KPC", "FIXED_50_KPC",
                "FIXED_100_KPC"} == names

    def test_make_error(self):
        err = FOFGroup().make_error(CatalogueSUBFIND)
        assert isinstance(err, HaloDefinitionNotSupportedError)
        assert "FOFGroup" in str(err)


class TestHierarchyAnalytics:
    def test_flat_catalogue(self):
        ids = np.array([1, 2, 3])
        parents = np.array([-1, -1, -1])
        direct, total = calculate_n_children(ids, parents)
        assert (direct == 0).all() and (total == 0).all()

    def test_two_level_tree(self):
        # 1 is root; 2, 3 children of 1; 4 child of 2
        ids = np.array([1, 2, 3, 4])
        parents = np.array([-1, 1, 1, 2])
        direct, total = calculate_n_children(ids, parents)
        np.testing.assert_array_equal(direct, [2, 1, 0, 0])
        np.testing.assert_array_equal(total, [3, 1, 0, 0])

    def test_against_reference_algorithm(self, rng):
        """Vectorized result must equal a straightforward port of the
        reference's O(N^2) loop (`_CatalogueBase.py:694-715`)."""
        n = 200
        ids = rng.permutation(n) + 1
        parents = np.full(n, -1)
        for i in range(1, n):
            # parent must come earlier in a random topological order
            if rng.random() < 0.8:
                parents[i] = ids[rng.integers(0, i)]
        # reference port
        def oracle(halo_ids, parent_ids):
            nd = np.zeros(len(halo_ids), dtype=int)
            nt = np.zeros(len(halo_ids), dtype=int)
            null = -len(halo_ids)
            pidx = np.empty(len(halo_ids), dtype=int)
            pidx[parent_ids == -1] = null
            for index, hid in enumerate(halo_ids):
                pidx[parent_ids == hid] = index
            for i in range(len(pidx)):
                if pidx[i] == null:
                    continue
                p = pidx[i]
                nd[p] += 1
                while True:
                    nt[p] += 1
                    p = pidx[p]
                    if p == null:
                        break
            return nd, nt

        ids_shuffled = ids[np.argsort(rng.random(n))]
        # keep alignment: use original arrays
        exp_d, exp_t = oracle(ids, parents)
        got_d, got_t = calculate_n_children(ids, parents)
        np.testing.assert_array_equal(got_d, exp_d)
        np.testing.assert_array_equal(got_t, exp_t)


@pytest.fixture(scope="module")
def catalogue(tmp_path_factory):
    spec = SyntheticSnapshotSpec(n_gas=2048, n_dm=1024, n_star=256, n_bh=8, n_files=2, n_groups=6)
    root = tmp_path_factory.mktemp("eagle_cat")
    snap_path, truth = write_snapshot(str(root), spec)
    memb, prop = write_catalogue(str(root), spec, truth)
    snap = SnapshotEAGLE(snap_path)
    return CatalogueSUBFIND(memb, prop, snap), truth, spec


class TestCatalogueSUBFIND:
    def test_halo_counts(self, catalogue):
        cat, truth, spec = catalogue
        assert cat.get_number_of_haloes() == spec.n_groups
        assert len(cat) == spec.n_groups

    def test_halo_ids_are_numbers(self, catalogue):
        cat, truth, spec = catalogue
        np.testing.assert_array_equal(cat.get_halo_IDs(), np.arange(1, spec.n_groups + 1))
        np.testing.assert_array_equal(cat.get_halo_indexes(), np.arange(spec.n_groups))

    def test_parents_unsupported(self, catalogue):
        cat, *_ = catalogue
        with pytest.raises(NotImplementedError):
            cat.get_halo_parent_IDs()
        np.testing.assert_array_equal(cat.get_halo_top_level_parent_IDs(), cat.get_halo_IDs())

    def test_centre_of_potential_mpc(self, catalogue):
        cat, truth, _ = catalogue
        cop = cat.get_halo_centres_of_potential()
        np.testing.assert_allclose(cop.value, truth.group_centres, rtol=1e-10)

    def test_com_unsupported(self, catalogue):
        cat, *_ = catalogue
        with pytest.raises(NotImplementedError):
            cat.get_halo_centres_of_mass()

    def test_fof_masses(self, catalogue):
        cat, truth, _ = catalogue
        m = cat.get_halo_masses(BasicHaloDefinitions.FOF_GROUP.value)
        assert m.shape == (len(cat),)
        assert (m.value > 1e10).all()

    def test_mean_and_tophat_definitions_work(self, catalogue):
        """The reference crashes on Mean/TopHat (isinstance ladder bug);
        the rebuild must serve them."""
        cat, *_ = catalogue
        m_crit = cat.get_halo_masses(BasicHaloDefinitions.SO_200_CRIT.value)
        m_mean = cat.get_halo_masses(BasicHaloDefinitions.SO_200_MEAN.value)
        m_th = cat.get_halo_masses(BasicHaloDefinitions.SO_200_TOP_HAT.value)
        # synthetic catalogue: mean = 1.2x crit, tophat = 1.1x crit
        np.testing.assert_allclose(m_mean.value / m_crit.value, 1.2, rtol=1e-6)
        np.testing.assert_allclose(m_th.value / m_crit.value, 1.1, rtol=1e-6)
        r_mean = cat.get_halo_radii(BasicHaloDefinitions.SO_500_MEAN.value)
        assert (r_mean.value > 0).all()

    def test_unsupported_definition_raises(self, catalogue):
        cat, *_ = catalogue
        with pytest.raises(HaloDefinitionNotSupportedError):
            cat.get_halo_masses(BasicHaloDefinitions.FIXED_30_KPC.value)
        with pytest.raises(HaloDefinitionNotSupportedError):
            cat.get_halo_radii(BasicHaloDefinitions.FOF_GROUP.value)

    def test_contains_particle_type_filter(self, catalogue):
        cat, truth, spec = catalogue
        n_with_bh = cat.get_number_of_haloes(ParticleType.black_hole)
        assert n_with_bh <= spec.n_groups
        idx = cat.get_halo_indexes(ParticleType.black_hole)
        gn_bh = truth.group_numbers[ParticleType.black_hole]
        expected = np.unique(gn_bh[(gn_bh > 0) & (gn_bh < 2**30)]) - 1
        np.testing.assert_array_equal(idx, expected)

    def test_member_particle_ids(self, catalogue):
        cat, truth, _ = catalogue
        ids = cat.get_particle_IDs(ParticleType.gas)
        gn = truth.group_numbers[ParticleType.gas]
        bound = (gn > 0) & (gn < 2**30)
        np.testing.assert_array_equal(np.sort(ids), np.sort(truth.ids[ParticleType.gas][bound]))

    def test_halo_map_by_snapshot_particle(self, catalogue):
        cat, truth, _ = catalogue
        idx_map = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas)
        gn = truth.group_numbers[ParticleType.gas]
        member = (gn > 0) & (gn < 2**30)
        np.testing.assert_array_equal(idx_map[member], gn[member] - 1)
        assert (idx_map[~member] == -1).all()

    def test_halo_map_with_custom_ids(self, catalogue):
        cat, truth, _ = catalogue
        sub = truth.ids[ParticleType.gas][::3]
        idx_map = cat.get_halo_indexes_by_snapshot_particle(ParticleType.gas, sub)
        assert idx_map.shape == sub.shape
        gn = truth.group_numbers[ParticleType.gas][::3]
        member = (gn > 0) & (gn < 2**30)
        np.testing.assert_array_equal(idx_map[member], gn[member] - 1)

    def test_number_of_children_flat(self, catalogue):
        cat, *_ = catalogue
        assert (cat.number_of_children == 0).all()
        assert (cat.number_of_descendants == 0).all()
