"""Core data vocabulary: particle types, axes, cosmology."""

from .particle_types import ParticleType, CoordinateAxes
from .cosmology import Cosmology, RHO_CRIT_H1_MSUN_PER_MPC3

__all__ = [
    "ParticleType",
    "CoordinateAxes",
    "Cosmology",
    "RHO_CRIT_H1_MSUN_PER_MPC3",
]
