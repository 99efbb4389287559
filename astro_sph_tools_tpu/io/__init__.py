"""IO layer: snapshot/catalogue/LOS data models and format backends.

Mirrors the reference's ``io`` package surface (`io/__init__.py:5-10`):
errors, abstract data structures, EAGLE backend, ionisation tables — plus
the SWIFT/TNG backends (working here, unlike the reference's broken ones)
and the synthetic fixture generator.
"""

from . import errors
from .catalogue import (
    BasicHaloDefinitions,
    CatalogueBase,
    CriticalSphericalOverdensityAperture,
    FixedRadiusAperture,
    FOFGroup,
    IApertureHalo,
    IHaloDefinition,
    MeanSphericalOverdensityAperture,
    SphericalOverdensityAperture,
    TopHatSphericalOverdensityAperture,
)
from .eagle import EAGLE_MAX_GROUP_NUMBER, SnapshotEAGLE
from .filetree import (
    FileSetLeaf,
    FileTreeScraper_EAGLE,
    FileTreeScraper_SWIFT,
    FileTreeScraperBase,
    TaggedFileSet,
    discover_soap_catalogues,
    discover_swift_snapshots,
)
from .los import (
    LineOfSightBase,
    LineOfSightEAGLE,
    LineOfSightFileBase,
    LineOfSightFileEAGLE,
    LineOfSightFileSWIFT,
)
from .snapshot import SnapshotBase
from .subfind import CatalogueSUBFIND
from .swift import CatalogueSOAP, SnapshotSWIFT
from .tng import CatalogueTNG, SnapshotTNG
from .ionisation import IonisationTable_HM01, SupportedIons
from .packing import (
    PackedParticles,
    pack_particles_host,
    unpack_particles_device,
)
from .prefetch import stream_macro_chunks, stream_particle_blocks, streamed_deposit_2d
from .particle_filter import (
    LineOfSightParticleFilter,
    ParticleFilterFile,
    SnapshotParticleFilter,
)

__all__ = [
    "errors",
    "BasicHaloDefinitions",
    "CatalogueBase",
    "CatalogueSOAP",
    "CatalogueSUBFIND",
    "CatalogueTNG",
    "CriticalSphericalOverdensityAperture",
    "EAGLE_MAX_GROUP_NUMBER",
    "FileSetLeaf",
    "FileTreeScraperBase",
    "FileTreeScraper_EAGLE",
    "FileTreeScraper_SWIFT",
    "discover_soap_catalogues",
    "discover_swift_snapshots",
    "FixedRadiusAperture",
    "FOFGroup",
    "IApertureHalo",
    "IHaloDefinition",
    "LineOfSightBase",
    "LineOfSightEAGLE",
    "LineOfSightFileBase",
    "LineOfSightFileEAGLE",
    "LineOfSightFileSWIFT",
    "LineOfSightParticleFilter",
    "ParticleFilterFile",
    "SnapshotParticleFilter",
    "PackedParticles",
    "pack_particles_host",
    "unpack_particles_device",
    "stream_macro_chunks",
    "stream_particle_blocks",
    "streamed_deposit_2d",
    "MeanSphericalOverdensityAperture",
    "SnapshotBase",
    "SnapshotEAGLE",
    "SnapshotSWIFT",
    "SnapshotTNG",
    "IonisationTable_HM01",
    "SupportedIons",
    "SphericalOverdensityAperture",
    "TopHatSphericalOverdensityAperture",
]
