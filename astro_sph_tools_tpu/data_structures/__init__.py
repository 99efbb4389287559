"""Core data vocabulary: particle types, axes, cosmology."""

from .particle_types import ParticleType, CoordinateAxes
from .cosmology import Cosmology, RHO_CRIT_H1_MSUN_PER_MPC3
from .interface import (
    Interface,
    ISimulation,
    ISimulationData,
    SimulationDataBase,
    SimType_EAGLE,
    SimType_SWIFT,
    SimType_TNG,
    ensure_not_interface,
)
from .ionisation import IIonisationTable, IonisationTableBase

__all__ = [
    "IIonisationTable",
    "ISimulation",
    "ISimulationData",
    "Interface",
    "IonisationTableBase",
    "SimulationDataBase",
    "SimType_EAGLE",
    "SimType_SWIFT",
    "SimType_TNG",
    "ensure_not_interface",
    "ParticleType",
    "CoordinateAxes",
    "Cosmology",
    "RHO_CRIT_H1_MSUN_PER_MPC3",
]
