"""Particle-type and coordinate-axis vocabulary.

Behavioral parity targets:
- ``ParticleType`` values/HDF5 names follow the reference
  (`/root/reference/src/astro_sph_tools/data_structures/_ParticleType.py:7-35`):
  gas=0, dark_matter=1, star=4, black_hole=5, HDF5 group ``PartType{n}``.
- ``CoordinateAxes`` follows `/root/reference/src/astro_sph_tools/_CoordinateAxes.py:3-32`.
"""

from __future__ import annotations

from enum import Enum


class ParticleType(Enum):
    """SPH simulation particle species, indexed by the Gadget/EAGLE type id."""

    gas = 0
    dark_matter = 1
    star = 4
    black_hole = 5

    @property
    def common_hdf5_name(self) -> str:
        """The on-disk HDF5 group name, e.g. ``PartType0`` for gas."""
        return f"PartType{self.value}"

    @property
    def display_name(self) -> str:
        return {
            ParticleType.gas: "gas",
            ParticleType.dark_matter: "dark matter",
            ParticleType.star: "star",
            ParticleType.black_hole: "black hole",
        }[self]

    @property
    def swift_dataset_name(self) -> str:
        """The swiftsimio attribute name for this species."""
        return {
            ParticleType.gas: "gas",
            ParticleType.dark_matter: "dark_matter",
            ParticleType.star: "stars",
            ParticleType.black_hole: "black_holes",
        }[self]

    @staticmethod
    def get_all() -> tuple["ParticleType", ...]:
        """All species, in the reference's enumeration order."""
        return (
            ParticleType.gas,
            ParticleType.star,
            ParticleType.black_hole,
            ParticleType.dark_matter,
        )

    @staticmethod
    def baryonic() -> tuple["ParticleType", ...]:
        return (ParticleType.gas, ParticleType.star, ParticleType.black_hole)

    def __str__(self) -> str:
        return self.common_hdf5_name


class CoordinateAxes(Enum):
    """The three axes of a 3D cartesian grid."""

    X = 0
    Y = 1
    Z = 2

    def __str__(self) -> str:
        return ("x", "y", "z")[self.value]

    @staticmethod
    def from_string(value: str) -> "CoordinateAxes":
        try:
            return {"x": CoordinateAxes.X, "y": CoordinateAxes.Y, "z": CoordinateAxes.Z}[
                value.strip().lower()
            ]
        except KeyError:
            raise ValueError(f"Not a coordinate axis: {value!r}") from None

    @property
    def projection_plane(self) -> tuple[int, int]:
        """The two in-plane axis indices when projecting along this axis.

        Matches the reference projector's axis convention
        (`tools/projections/_pixel_calculations.pyx:20-28`): projecting along
        x uses (y, z) as the image plane; along y uses (x, z); along z, (x, y).
        """
        return {
            CoordinateAxes.X: (1, 2),
            CoordinateAxes.Y: (0, 2),
            CoordinateAxes.Z: (0, 1),
        }[self]
