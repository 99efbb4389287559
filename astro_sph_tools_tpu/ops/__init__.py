"""Device-side operations: periodic geometry, cell lists, deposit passes."""

from .periodic import (
    calculate_periodic,
    make_periodic,
    shift_centre,
    shift_origin,
    wrapped_displacement,
    wrapped_distance,
)

__all__ = [
    "calculate_periodic",
    "make_periodic",
    "shift_centre",
    "shift_origin",
    "wrapped_displacement",
    "wrapped_distance",
]
