"""Cosmology / unit-convention math as a JAX pytree.

Parity targets (pure math preserved exactly, re-derived in CGS):
- ``to_proper(data, n) = data * a**n`` and ``to_comoving(data, n) = data / a**n``
  with named length/area/volume/column-density/density wrappers
  (`/root/reference/src/astro_sph_tools/io/data_structures/_SnapshotBase.py:216-480`).
- Critical density ``rho_c = 3 H^2 / (8 pi G)`` with ``H = 100 h km/s/Mpc``,
  reported in Msun/Mpc^3; the proper variant divides by ``a^3``; baryon
  variants multiply by ``Omega_b`` (`_SnapshotBase.py:484-536`).

Unlike the reference's class tower, this is a frozen dataclass registered as a
pytree whose numeric fields are leaves — it can be closed over, passed through
``jit``, and vmapped without retracing per snapshot.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import TypeVar

import jax

from .. import constants as C
from ..units import UnitArray, unit_quantity

T = TypeVar("T")

# 100 km/s/Mpc in CGS (s^-1): the Hubble-parameter normalisation.
_H100_CGS = 100.0 * 1.0e5 / C.MEGAPARSEC_CGS
# rho_c(h=1) = 3 H100^2 / (8 pi G), converted from g/cm^3 to Msun/Mpc^3.
RHO_CRIT_H1_MSUN_PER_MPC3 = (
    3.0 * _H100_CGS**2 / (8.0 * math.pi * C.GRAVITATIONAL_CONSTANT_CGS)
    * C.MEGAPARSEC_CGS**3 / C.SOLAR_MASS_CGS
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Cosmology:
    """Snapshot-level cosmological parameters (all fields are pytree leaves).

    omega_matter/omega_lambda default to the EAGLE Ref cosmology; they only
    enter through :meth:`hubble_rate` (sightline velocity-space mapping).
    """

    redshift: float
    hubble_param: float
    omega_baryon: float
    expansion_factor: float
    omega_matter: float = 0.307
    omega_lambda: float = 0.693

    @staticmethod
    def from_redshift(
        redshift: float,
        hubble_param: float,
        omega_baryon: float,
        omega_matter: float = 0.307,
        omega_lambda: float = 0.693,
    ) -> "Cosmology":
        return Cosmology(
            redshift=redshift,
            hubble_param=hubble_param,
            omega_baryon=omega_baryon,
            expansion_factor=1.0 / (1.0 + redshift),
            omega_matter=omega_matter,
            omega_lambda=omega_lambda,
        )

    def hubble_rate(self, redshift=None) -> float:
        """H(z) in km/s/Mpc: ``H0 sqrt(Om (1+z)^3 + OL)`` (flat LCDM).

        Defaults to the snapshot's own redshift — the Hubble-flow gradient
        used to map sightline path length into velocity space.
        """
        z = self.redshift if redshift is None else redshift
        h0 = 100.0 * self.hubble_param
        return h0 * (self.omega_matter * (1.0 + z) ** 3 + self.omega_lambda) ** 0.5

    # -- aliases matching the reference's property names ------------------------
    @property
    def z(self) -> float:
        return self.redshift

    @property
    def a(self) -> float:
        return self.expansion_factor

    @property
    def h(self) -> float:
        return self.hubble_param

    # -- comoving <-> proper ----------------------------------------------------
    def to_proper(self, data: T, length_dimensions_exponent: int) -> T:
        """Convert co-moving data to proper: ``data * a**n``."""
        return data * (self.expansion_factor**length_dimensions_exponent)

    def to_comoving(self, data: T, length_dimensions_exponent: int) -> T:
        """Convert proper data to co-moving: ``data / a**n``."""
        return data / (self.expansion_factor**length_dimensions_exponent)

    def to_proper_length(self, data: T) -> T:
        return self.to_proper(data, 1)

    def to_proper_area(self, data: T) -> T:
        return self.to_proper(data, 2)

    def to_proper_volume(self, data: T) -> T:
        return self.to_proper(data, 3)

    def to_proper_column_density(self, data: T) -> T:
        return self.to_proper(data, -2)

    def to_proper_density(self, data: T) -> T:
        return self.to_proper(data, -3)

    def to_comoving_length(self, data: T) -> T:
        return self.to_comoving(data, 1)

    def to_comoving_area(self, data: T) -> T:
        return self.to_comoving(data, 2)

    def to_comoving_volume(self, data: T) -> T:
        return self.to_comoving(data, 3)

    def to_comoving_column_density(self, data: T) -> T:
        return self.to_comoving(data, -2)

    def to_comoving_density(self, data: T) -> T:
        return self.to_comoving(data, -3)

    # -- critical densities -------------------------------------------------------
    def critical_density_comoving(self) -> float:
        """``3 H^2 / (8 pi G)`` with ``H = 100 h km/s/Mpc``, in Msun/Mpc^3."""
        return self.hubble_param**2 * RHO_CRIT_H1_MSUN_PER_MPC3

    def critical_density_proper(self) -> float:
        """Comoving critical density converted with ``a**-3``, in Msun/Mpc^3."""
        return self.to_proper_density(self.critical_density_comoving())

    def critical_gas_density_comoving(self) -> float:
        return self.omega_baryon * self.critical_density_comoving()

    def critical_gas_density_proper(self) -> float:
        return self.omega_baryon * self.critical_density_proper()

    # unyt-flavoured variants for the host-side API (UnitArray wrappers)
    def calculate_comoving_critical_density(self) -> UnitArray:
        return unit_quantity(self.critical_density_comoving(), "Msun/Mpc**3")

    def calculate_proper_critical_density(self) -> UnitArray:
        return unit_quantity(self.critical_density_proper(), "Msun/Mpc**3")

    def calculate_comoving_critical_gas_density(self) -> UnitArray:
        return unit_quantity(self.critical_gas_density_comoving(), "Msun/Mpc**3")

    def calculate_proper_critical_gas_density(self) -> UnitArray:
        return unit_quantity(self.critical_gas_density_proper(), "Msun/Mpc**3")

    def replace(self, **changes) -> "Cosmology":
        return dataclasses.replace(self, **changes)
