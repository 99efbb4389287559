"""Units layer and cosmology math vs reference formulas (_SnapshotBase.py:216-536)."""

import numpy as np
import pytest

from astro_sph_tools_tpu import constants as C
from astro_sph_tools_tpu.data_structures import Cosmology
from astro_sph_tools_tpu.units import (
    UnitArray,
    UnitConversionError,
    UnknownUnitError,
    parse_unit,
    unit_quantity,
)


class TestUnitParsing:
    def test_simple(self):
        assert parse_unit("Mpc").scale == C.MEGAPARSEC_CGS

    def test_compound_density(self):
        u = parse_unit("Msun/Mpc**3")
        assert np.isclose(u.scale, C.SOLAR_MASS_CGS / C.MEGAPARSEC_CGS**3)

    def test_hubble_units(self):
        # km/s/Mpc: successive division binds left (a/b/c = a/(b*c))
        u = parse_unit("km/s/Mpc")
        assert np.isclose(u.scale, 1.0e5 / C.MEGAPARSEC_CGS)

    def test_product(self):
        u = parse_unit("g*cm**2/s**2")
        assert np.isclose(u.scale, 1.0)

    def test_unknown_symbol(self):
        with pytest.raises(UnknownUnitError):
            parse_unit("furlongs")


class TestUnitArray:
    def test_convert_length(self):
        x = UnitArray(np.array([1.0]), "Mpc")
        np.testing.assert_allclose(x.to("kpc").value, [1000.0])

    def test_incompatible(self):
        with pytest.raises(UnitConversionError):
            UnitArray(1.0, "Mpc").to("Msun")

    def test_arithmetic_units(self):
        m = UnitArray(np.array([2.0]), "Msun")
        v = UnitArray(np.array([8.0]), "Mpc**3")
        rho = m / v
        np.testing.assert_allclose(rho.to("Msun/Mpc**3").value, [0.25])

    def test_addition_converts(self):
        total = UnitArray(1.0, "Mpc") + UnitArray(500.0, "kpc")
        np.testing.assert_allclose(total.value, 1.5)

    def test_in_cgs(self):
        x = UnitArray(1.0, "Msun").in_cgs()
        np.testing.assert_allclose(x.value, C.SOLAR_MASS_CGS)


class TestCosmology:
    def setup_method(self):
        # EAGLE Ref-L0100 cosmology
        self.cosmo = Cosmology.from_redshift(
            redshift=1.0, hubble_param=0.6777, omega_baryon=0.04825
        )

    def test_expansion_factor(self):
        assert abs(self.cosmo.a - 0.5) < 1e-12

    def test_to_proper_roundtrip(self):
        data = np.array([1.0, 2.0, 3.0])
        out = self.cosmo.to_comoving(self.cosmo.to_proper(data, 3), 3)
        np.testing.assert_allclose(out, data, rtol=1e-12)

    def test_proper_length_is_a_times(self):
        assert abs(self.cosmo.to_proper_length(10.0) - 5.0) < 1e-12

    def test_density_exponent(self):
        # density scales as a^-3 under to_proper
        assert abs(self.cosmo.to_proper_density(1.0) - 8.0) < 1e-9

    def test_critical_density_value(self):
        """rho_c = 3 H^2/(8 pi G) with H = 100h km/s/Mpc; the standard value
        is 2.775e11 h^2 Msun/Mpc^3 (checked against the reference's unyt
        computation at _SnapshotBase.py:493)."""
        rho = self.cosmo.critical_density_comoving()
        expected = 2.77536627e11 * 0.6777**2  # Msun/Mpc^3
        assert abs(rho / expected - 1.0) < 1e-3

    def test_proper_critical_density(self):
        assert np.isclose(
            self.cosmo.critical_density_proper(),
            self.cosmo.critical_density_comoving() / self.cosmo.a**3,
        )

    def test_gas_density_scaling(self):
        assert np.isclose(
            self.cosmo.critical_gas_density_comoving(),
            0.04825 * self.cosmo.critical_density_comoving(),
        )

    def test_unit_array_variant(self):
        q = self.cosmo.calculate_comoving_critical_density()
        assert np.isclose(q.to_value("Msun/Mpc**3"), self.cosmo.critical_density_comoving())

    def test_is_pytree(self):
        import jax

        leaves = jax.tree_util.tree_leaves(self.cosmo)
        assert len(leaves) == 6  # z, h, Ob, a, Om, OL

    def test_hubble_rate(self):
        # H(0) = H0; H(1) = H0 sqrt(Om*8 + OL)
        c = Cosmology.from_redshift(0.0, 0.7, 0.048, omega_matter=0.3, omega_lambda=0.7)
        assert c.hubble_rate(0.0) == pytest.approx(70.0)
        assert c.hubble_rate(1.0) == pytest.approx(70.0 * (0.3 * 8 + 0.7) ** 0.5)
