"""astro_sph_tools_tpu — a TPU-native SPH snapshot analysis & rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``QuasarX1/astro-sph-tools``: reading SPH cosmological simulation outputs
(EAGLE, SWIFT, IllustrisTNG — snapshots, halo catalogues, line-of-sight files,
ionisation tables) and rendering/analysing them — SPH kernel projection to 2D
maps, 3D voxel gridding, sightline integration, ID-matched reordering, halo
queries — designed for TPU meshes (``jax.sharding`` + ``shard_map`` + Pallas
deposit kernels) rather than MPI.

Data conventions follow the reference
(`/root/reference/src/astro_sph_tools/io/data_structures/_SnapshotBase.py:28-41`):
user-facing data is co-moving and h-full, in Mpc / Msun / km/s / K.
"""

from .__about__ import __version__
from .data_structures import Cosmology, ParticleType, CoordinateAxes
from .units import UnitArray, unit_array, unit_quantity
from .render import (
    MapStack,
    render_halo_maps,
    render_halo_maps_sharded,
    render_map_stack,
)

__all__ = [
    "__version__",
    "Cosmology",
    "ParticleType",
    "CoordinateAxes",
    "UnitArray",
    "unit_array",
    "unit_quantity",
    "MapStack",
    "render_halo_maps",
    "render_halo_maps_sharded",
    "render_map_stack",
]
