"""Physical constants and atomic data (CGS base).

The reference obtains these from ``unyt``/``mendeleev`` (e.g.
``/root/reference/src/astro_sph_tools/io/EAGLE/_SnapshotEAGLE.py:28`` defines
``ATOMIC_MASS_UNIT = 1.661e-24 g``); neither package is a dependency here, so
the needed values are tabulated directly. All values are CODATA-2018 unless a
reference-compat value is required (noted inline).
"""

from __future__ import annotations

# --- fundamental constants (CGS) ------------------------------------------
GRAVITATIONAL_CONSTANT_CGS = 6.674_30e-8      # cm^3 g^-1 s^-2
BOLTZMANN_CONSTANT_CGS = 1.380_649e-16        # erg K^-1
PROTON_MASS_CGS = 1.672_621_923_69e-24        # g
ELECTRON_MASS_CGS = 9.109_383_7015e-28        # g
SPEED_OF_LIGHT_CGS = 2.997_924_58e10          # cm s^-1
PLANCK_CONSTANT_CGS = 6.626_070_15e-27        # erg s

# Reference-compatible atomic mass unit: the reference hard-codes 1.661e-24 g
# for elemental number densities (_SnapshotEAGLE.py:28). The CODATA value is
# 1.66053906660e-24; we keep both and default to the reference value in the
# number-density path so results agree bit-for-bit in double precision.
ATOMIC_MASS_UNIT_CGS_REFERENCE = 1.661e-24    # g  (reference compat)
ATOMIC_MASS_UNIT_CGS = 1.660_539_066_60e-24   # g  (CODATA 2018)

# --- astronomical units (CGS) ----------------------------------------------
SOLAR_MASS_CGS = 1.988_47e33                  # g  (IAU 2015 nominal + G)
PARSEC_CGS = 3.085_677_581_491_367e18         # cm (exact IAU definition)
KILOPARSEC_CGS = PARSEC_CGS * 1.0e3
MEGAPARSEC_CGS = PARSEC_CGS * 1.0e6
YEAR_CGS = 3.155_76e7                         # s (Julian year)
GIGAYEAR_CGS = YEAR_CGS * 1.0e9

# SI-flavoured gravitational constant used by the reference's critical-density
# formula (scipy.constants.gravitational_constant, N m^2 kg^-2).
GRAVITATIONAL_CONSTANT_SI = 6.674_30e-11      # m^3 kg^-1 s^-2

# --- atomic weights ---------------------------------------------------------
# Standard atomic weights (amu), CIAAW-2021 abridged. The reference pulls
# these from ``mendeleev``/``atomic_weights``; the EAGLE backend tracks the
# nine elements H..Fe (_SnapshotEAGLE.py:553-585).
ATOMIC_WEIGHTS: dict[str, float] = {
    "H": 1.008,
    "He": 4.002602,
    "Li": 6.94,
    "Be": 9.0121831,
    "B": 10.81,
    "C": 12.011,
    "N": 14.007,
    "O": 15.999,
    "F": 18.998403163,
    "Ne": 20.1797,
    "Na": 22.98976928,
    "Mg": 24.305,
    "Al": 26.9815385,
    "Si": 28.085,
    "P": 30.973761998,
    "S": 32.06,
    "Cl": 35.45,
    "Ar": 39.948,
    "K": 39.0983,
    "Ca": 40.078,
    "Sc": 44.955908,
    "Ti": 47.867,
    "V": 50.9415,
    "Cr": 51.9961,
    "Mn": 54.938044,
    "Fe": 55.845,
    "Ni": 58.6934,
    "Cu": 63.546,
    "Zn": 65.38,
}

# Atomic numbers for the same elements (for ionisation-table metadata).
ATOMIC_NUMBERS: dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Ni": 28, "Cu": 29, "Zn": 30,
}

# The nine elements tracked by EAGLE snapshots, in EAGLE's on-disk order
# (_SnapshotEAGLE.py:553-585: ElementAbundance/<Name> groups).
EAGLE_TRACKED_ELEMENTS: tuple[str, ...] = (
    "H", "He", "C", "N", "O", "Ne", "Mg", "Si", "Fe",
)

# Default solar metallicity used by TNG-style backends
# (reference io/TNG/_SnapshotTNG.py:103).
TNG_SOLAR_METALLICITY = 0.0127

# Primordial hydrogen mass fraction (used for derived temperature etc.).
PRIMORDIAL_HYDROGEN_ABUNDANCE = 0.752
