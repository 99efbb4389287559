"""Snapshot data model: the keystone abstraction of the IO layer.

Parity target: ``SnapshotBase``
(`/root/reference/src/astro_sph_tools/io/data_structures/_SnapshotBase.py:25-1007`).
Contract conventions preserved exactly (`_SnapshotBase.py:28-41`):

- user-facing data is **co-moving** and **h-full** (no factors of h removed);
- lengths in Mpc, masses in Msun, velocities in km/s, temperatures in K;
- particle IDs are int64;
- elements are addressed by chemical symbol (the reference passes
  ``mendeleev`` Element objects; symbols are accepted here and Element-likes
  with a ``.symbol`` attribute are unwrapped).

Architecture differences from the reference (deliberate, TPU-first):
- cosmology math delegates to the jit-safe :class:`Cosmology` pytree rather
  than being baked into the reader class;
- backends implement a compact ``_get_*`` hook set returning raw NumPy;
  unit wrapping/validation lives here once;
- ``fields_to_device`` streams any set of fields into JAX device arrays
  (optionally sharded) — the bridge from host HDF5 to the deposit engine.
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional, Sequence, Union

import numpy as np

from .. import constants as C
from ..data_structures.cosmology import Cosmology
from ..data_structures.particle_types import ParticleType
from ..units import UnitArray

ElementLike = Union[str, object]


def element_symbol(element: ElementLike) -> str:
    """Accept 'Fe', a mendeleev-style object with .symbol, or similar."""
    if isinstance(element, str):
        return element
    symbol = getattr(element, "symbol", None)
    if symbol is None:
        raise TypeError(f"Cannot interpret {element!r} as a chemical element")
    return symbol


class SnapshotBase(ABC):
    """Base snapshot reader: metadata + field getters with unit conventions."""

    def __init__(
        self,
        filepath: str,
        number: str,
        redshift: float,
        hubble_param: float,
        omega_baryon: float,
        expansion_factor: float,
        box_size: UnitArray,
        tracked_elements: Sequence[str] = (),
        snipshot: bool = False,
    ) -> None:
        self._filepath = filepath
        self._number = number
        self._cosmology = Cosmology(
            redshift=float(redshift),
            hubble_param=float(hubble_param),
            omega_baryon=float(omega_baryon),
            expansion_factor=float(expansion_factor),
        )
        self._box_size = box_size.to("Mpc")
        self._tracked_elements = tuple(element_symbol(e) for e in tracked_elements)
        self._snipshot = bool(snipshot)
        self._n_particles: dict[ParticleType, int] = {}
        self._n_particles_this_rank: dict[ParticleType, int] = {}
        self._update_number_of_particles()
        self._executor: Optional[ThreadPoolExecutor] = None

    # -- backend hooks (counts) ------------------------------------------------
    @abstractmethod
    def _get_number_of_particles(self) -> dict[ParticleType, int]: ...

    @abstractmethod
    def _get_number_of_particles_this_rank(self) -> dict[ParticleType, int]: ...

    def _update_number_of_particles(self) -> None:
        """Refresh particle counts (e.g. after a region restriction);
        parity: `_SnapshotBase.py:110-117`.

        Per-rank counts are refilled lazily on first access: under a
        region restriction they can require reading coordinates to build
        membership masks, and an eager refresh here would force that read
        for every particle type up front (a gas-only regional render
        would pay whole-box DM/star/BH scans it never uses)."""
        self._n_particles = dict(self._get_number_of_particles())
        self._n_particles_this_rank = {}

    def _get_number_of_particles_this_rank_single(
        self, particle_type: ParticleType
    ) -> int:
        """Per-type hook behind the lazy per-rank count cache. Backends
        whose per-rank count needs per-type work (e.g. EAGLE's spatial
        index + membership mask) override this to compute only the
        requested type; the default computes the full dict."""
        return int(self._get_number_of_particles_this_rank()[particle_type])

    # -- metadata ---------------------------------------------------------------
    @property
    def filepath(self) -> str:
        return self._filepath

    @property
    def number(self) -> str:
        return self._number

    @property
    def is_snipshot(self) -> bool:
        return self._snipshot

    @property
    def cosmology(self) -> Cosmology:
        return self._cosmology

    @property
    def redshift(self) -> float:
        return self._cosmology.redshift

    z = redshift

    @property
    def expansion_factor(self) -> float:
        return self._cosmology.expansion_factor

    a = expansion_factor

    @property
    def hubble_param(self) -> float:
        return self._cosmology.hubble_param

    h = hubble_param

    @property
    def omega_baryon(self) -> float:
        return self._cosmology.omega_baryon

    @property
    def box_size(self) -> UnitArray:
        """Co-moving box size (h-full), Mpc 3-vector."""
        return self._box_size

    @property
    def tracked_elements(self) -> tuple[str, ...]:
        return self._tracked_elements

    # -- comoving <-> proper delegation (parity `_SnapshotBase.py:216-480`) ----
    def to_proper(self, data, length_dimensions_exponent: int):
        return self._cosmology.to_proper(data, length_dimensions_exponent)

    def to_comoving(self, data, length_dimensions_exponent: int):
        return self._cosmology.to_comoving(data, length_dimensions_exponent)

    def __getattr__(self, name: str):
        # forward to_proper_length / to_comoving_density / critical densities
        # etc. to the Cosmology pytree
        if name.startswith(("to_proper_", "to_comoving_", "calculate_")) or name.endswith(
            "critical_density"
        ):
            return getattr(self._cosmology, name)
        raise AttributeError(name)

    @property
    def proper_critical_density(self) -> UnitArray:
        return self._cosmology.calculate_proper_critical_density()

    @property
    def proper_critical_gas_density(self) -> UnitArray:
        return self._cosmology.calculate_proper_critical_gas_density()

    # -- particle counts --------------------------------------------------------
    def number_of_particles(self, particle_type: ParticleType) -> int:
        """Global particle count (parity `_SnapshotBase.py:549-563`)."""
        return self._n_particles[particle_type]

    def number_of_particles_this_rank(self, particle_type: ParticleType) -> int:
        """Count held by this process (parity `_SnapshotBase.py:565-578`).
        Computed lazily per type (see :meth:`_update_number_of_particles`)."""
        if particle_type not in self._n_particles_this_rank:
            self._n_particles_this_rank[particle_type] = (
                self._get_number_of_particles_this_rank_single(particle_type)
            )
        return self._n_particles_this_rank[particle_type]

    # -- field getters -----------------------------------------------------------
    def get_IDs(self, particle_type: ParticleType) -> np.ndarray:
        """int64 particle IDs (parity `_SnapshotBase.py:583-597`)."""
        return self._get_IDs(particle_type)

    @abstractmethod
    def _get_IDs(self, particle_type: ParticleType) -> np.ndarray: ...

    def get_smoothing_lengths(
        self, particle_type: ParticleType, use_proper_units: bool = False
    ) -> UnitArray:
        """Smoothing lengths in Mpc (parity `_SnapshotBase.py:599-616`)."""
        return self._get_smoothing_lengths(particle_type, use_proper_units)

    @abstractmethod
    def _get_smoothing_lengths(
        self, particle_type: ParticleType, use_proper_units: bool
    ) -> UnitArray: ...

    def get_masses(self, particle_type: ParticleType) -> UnitArray:
        """Masses in Msun. Black holes are rejected — they have subgrid vs
        dynamical masses instead (parity `_SnapshotBase.py:618-636`)."""
        if particle_type == ParticleType.black_hole:
            raise ValueError(
                "Black holes have both subgrid and dynamical masses: use "
                "get_black_hole_subgrid_masses or get_black_hole_dynamical_masses."
            )
        return self._get_masses(particle_type)

    @abstractmethod
    def _get_masses(self, particle_type: ParticleType) -> UnitArray: ...

    def get_total_mass(self, particle_type: Optional[ParticleType] = None) -> UnitArray:
        """Summed mass; None sums every species with BH dynamical mass
        (parity `_SnapshotBase.py:639-657`)."""
        return self._get_total_mass(particle_type)

    def _get_total_mass(self, particle_type: Optional[ParticleType]) -> UnitArray:
        if particle_type is None:
            total = self._get_total_mass(ParticleType.gas)
            total = total + self._get_total_mass(ParticleType.dark_matter)
            total = total + self._get_total_mass(ParticleType.star)
            return total + self.get_black_hole_dynamical_masses().sum()
        if particle_type == ParticleType.black_hole:
            return self.get_black_hole_dynamical_masses().sum()
        return self.get_masses(particle_type).sum()

    def get_black_hole_subgrid_masses(self) -> UnitArray:
        return self._get_black_hole_subgrid_masses()

    @abstractmethod
    def _get_black_hole_subgrid_masses(self) -> UnitArray: ...

    def get_black_hole_dynamical_masses(self) -> UnitArray:
        return self._get_black_hole_dynamical_masses()

    @abstractmethod
    def _get_black_hole_dynamical_masses(self) -> UnitArray: ...

    def get_total_black_hole_subgrid_mass(self) -> UnitArray:
        return self.get_black_hole_subgrid_masses().sum()

    def get_total_black_hole_dynamical_mass(self) -> UnitArray:
        return self.get_black_hole_dynamical_masses().sum()

    def get_positions(
        self, particle_type: ParticleType, use_proper_units: bool = False
    ) -> UnitArray:
        """(N, 3) positions in Mpc (parity `_SnapshotBase.py:708-725`)."""
        return self._get_positions(particle_type, use_proper_units)

    @abstractmethod
    def _get_positions(
        self, particle_type: ParticleType, use_proper_units: bool
    ) -> UnitArray: ...

    def get_velocities(
        self, particle_type: ParticleType, use_proper_units: bool = False
    ) -> UnitArray:
        """(N, 3) velocities in km/s (parity `_SnapshotBase.py:727-744`)."""
        return self._get_velocities(particle_type, use_proper_units)

    @abstractmethod
    def _get_velocities(
        self, particle_type: ParticleType, use_proper_units: bool
    ) -> UnitArray: ...

    def get_sfr(self, particle_type: ParticleType = ParticleType.gas) -> UnitArray:
        """Star formation rates in Msun/yr (parity `_SnapshotBase.py:746-756`)."""
        if particle_type != ParticleType.gas:
            raise ValueError("Star formation rate is a gas-particle field.")
        return self._get_sfr()

    @abstractmethod
    def _get_sfr(self) -> UnitArray: ...

    def get_volumes(
        self, particle_type: ParticleType, use_proper_units: bool = False
    ) -> UnitArray:
        """Particle volumes. Default: volume within the smoothing length,
        ``h^3 * pi * 4/3`` — the reference's literal formula
        (`_SnapshotBase.py:776-777`)."""
        return self._get_volumes(particle_type, use_proper_units)

    def _get_volumes(self, particle_type: ParticleType, use_proper_units: bool) -> UnitArray:
        h = self.get_smoothing_lengths(particle_type, use_proper_units=use_proper_units)
        return h**3 * (math.pi * (4.0 / 3.0))

    def get_metallicities(
        self,
        particle_type: ParticleType,
        solar_units: bool = False,
        solar_metallicity: Optional[float] = None,
    ) -> UnitArray:
        """Mass-fraction metallicity; optionally in solar units
        (parity `_SnapshotBase.py:779-809`). Gas/star only."""
        if particle_type not in (ParticleType.gas, ParticleType.star):
            raise ValueError(f"Metallicity not supported for {particle_type.display_name}.")
        return self._get_metallicities(particle_type, solar_units, solar_metallicity)

    @abstractmethod
    def _get_metallicities(
        self, particle_type: ParticleType, solar_units: bool, solar_metallicity: Optional[float]
    ) -> UnitArray: ...

    def get_mean_enrichment_redshift(self, particle_type: ParticleType) -> UnitArray:
        """Metal-mass-weighted mean enrichment redshift
        (parity `_SnapshotBase.py:811-831`). Gas/star only."""
        if particle_type not in (ParticleType.gas, ParticleType.star):
            raise ValueError(
                f"Mean enrichment redshift not supported for {particle_type.display_name}."
            )
        return self._get_mean_enrichment_redshift(particle_type)

    @abstractmethod
    def _get_mean_enrichment_redshift(self, particle_type: ParticleType) -> UnitArray: ...

    def get_densities(
        self, particle_type: ParticleType, use_proper_units: bool = False
    ) -> UnitArray:
        """SPH densities, Msun/Mpc^3 (parity `_SnapshotBase.py:833-856`). Gas only."""
        if particle_type != ParticleType.gas:
            raise ValueError(f"Density not supported for {particle_type.display_name}.")
        return self._get_densities(particle_type, use_proper_units)

    @abstractmethod
    def _get_densities(self, particle_type: ParticleType, use_proper_units: bool) -> UnitArray: ...

    def get_number_densities(
        self,
        particle_type: ParticleType,
        element: ElementLike,
        use_proper_units: bool = False,
        default_abundance: Optional[float] = None,
    ) -> UnitArray:
        """Elemental number densities: rho * X_elem / m_elem, in cm^-3
        (parity `_SnapshotBase.py:858-887`). Gas only."""
        if particle_type != ParticleType.gas:
            raise ValueError(f"Number density not supported for {particle_type.display_name}.")
        return self._get_number_densities(
            particle_type, element_symbol(element), use_proper_units, default_abundance
        )

    @abstractmethod
    def _get_number_densities(
        self,
        particle_type: ParticleType,
        element: str,
        use_proper_units: bool,
        default_abundance: Optional[float],
    ) -> UnitArray: ...

    def get_temperatures(self, particle_type: ParticleType) -> UnitArray:
        """Temperatures in K (parity `_SnapshotBase.py:889-909`). Gas only."""
        if particle_type != ParticleType.gas:
            raise ValueError(f"Temperature not supported for {particle_type.display_name}.")
        return self._get_temperatures(particle_type)

    @abstractmethod
    def _get_temperatures(self, particle_type: ParticleType) -> UnitArray: ...

    def get_elemental_abundance(
        self, particle_type: ParticleType, element: ElementLike
    ) -> UnitArray:
        """Mass-fraction abundance of one element
        (parity `_SnapshotBase.py:911-933`). Gas/star only."""
        if particle_type not in (ParticleType.gas, ParticleType.star):
            raise ValueError(
                f"Elemental abundance not supported for {particle_type.display_name}."
            )
        return self._get_elemental_abundance(particle_type, element_symbol(element))

    @abstractmethod
    def _get_elemental_abundance(self, particle_type: ParticleType, element: str) -> UnitArray: ...

    # -- async variants (parity `_SnapshotBase.py:937-1007`) ---------------------
    def read_async(self, getter_name: str, /, *args, **kwargs) -> Future:
        """Submit any ``get_*`` call to a background IO thread.

        Generalisation of the reference's per-getter async wrappers
        (`_SnapshotBase.py:937-1007`, ThreadPoolExecutor-based): overlap HDF5
        reads with device compute.
        """
        if self._executor is None:
            self._executor = ThreadPoolExecutor(max_workers=4, thread_name_prefix="snap-io")
        fn = getattr(self, getter_name)
        return self._executor.submit(fn, *args, **kwargs)

    # -- device bridge ------------------------------------------------------------
    def fields_to_device(
        self,
        particle_type: ParticleType,
        fields: Sequence[str],
        dtype=None,
        sharding=None,
    ) -> dict:
        """Read fields and place them on JAX devices.

        ``fields`` entries name ``get_*`` methods without the prefix (e.g.
        "positions", "masses", "smoothing_lengths"). Values become jnp arrays
        (f32 by default for TPU), optionally placed with a ``NamedSharding``.
        """
        import jax
        import jax.numpy as jnp

        dtype = dtype or jnp.float32
        out = {}
        for name in fields:
            value = getattr(self, f"get_{name}")(particle_type)
            if isinstance(value, UnitArray):
                value = value.value
            arr = jnp.asarray(np.asarray(value), dtype=dtype)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            out[name] = arr
        return out

    # -- helpers for backends -------------------------------------------------------
    @staticmethod
    def number_density_from_density(
        density_cgs: np.ndarray, abundance: np.ndarray, atomic_weight: float
    ) -> np.ndarray:
        """n = rho * X / (A * m_u) with the reference's atomic mass unit
        (1.661e-24 g, `_SnapshotEAGLE.py:28`)."""
        return density_cgs * abundance / (atomic_weight * C.ATOMIC_MASS_UNIT_CGS_REFERENCE)
