"""Shared periodic spatial-selection helpers for region-restricted IO.

Used by the EAGLE block-bounding-box index (`io/eagle.py`) and the SWIFT
native cell-metadata index (`io/swift.py`). The periodic decomposition
mirrors the reference's 8-way region split
(`_SnapshotEAGLE.py:270-296`), done per axis.
"""

from __future__ import annotations

import numpy as np


def axis_intervals(lo: float, hi: float, box: float) -> list[tuple[float, float]]:
    """Decompose the possibly-wrapped region [lo, hi) into 0-2 linear
    sub-intervals of [0, box)."""
    if hi - lo <= 0:
        return []
    if hi - lo >= box:
        return [(0.0, box)]
    lo = lo % box
    hi_m = hi % box
    if lo < hi_m:
        return [(lo, hi_m)]
    return [(lo, box), (0.0, hi_m)]


def wrapped_interval_mask(
    values: np.ndarray, lo: float, hi: float, box: float
) -> np.ndarray:
    """Membership of values (in [0, box)) in the possibly-wrapped [lo, hi)."""
    if hi - lo <= 0:  # zero-width (or inverted) region selects nothing
        return np.zeros(values.shape[0], dtype=bool)
    if hi - lo >= box:  # full axis — MUST test before wrapping the bounds
        return np.ones(values.shape[0], dtype=bool)
    lo = lo % box
    hi_m = hi % box
    if lo <= hi_m and hi_m != lo:
        return (values >= lo) & (values < hi_m)
    # wrapped: [lo, box) U [0, hi)
    return (values >= lo) | (values < hi_m)


def interval_overlap_mask(
    mins: np.ndarray,
    maxs: np.ndarray,
    regions: list[tuple],
    box: float,
) -> np.ndarray:
    """Which axis-aligned boxes [mins, maxs] (N, 3) intersect any region.

    ``regions``: (x0, x1, y0, y1, z0, z1) tuples; each axis range may wrap
    across the periodic boundary (inverted/out-of-box bounds).
    """
    n = mins.shape[0]
    sel = np.zeros(n, dtype=bool)
    for region in regions:
        m = np.ones(n, dtype=bool)
        for ax in range(3):
            lo_r, hi_r = region[2 * ax], region[2 * ax + 1]
            ax_ok = np.zeros(n, dtype=bool)
            for lo, hi in axis_intervals(lo_r, hi_r, box):
                ax_ok |= (maxs[:, ax] >= lo) & (mins[:, ax] < hi)
            m &= ax_ok
        sel |= m
    return sel


def region_membership_mask(
    pos: np.ndarray, regions: list[tuple], box: float
) -> np.ndarray:
    """Exact per-row membership of (N, 3) positions in any region."""
    mask = np.zeros(pos.shape[0], dtype=bool)
    for (x0, x1, y0, y1, z0, z1) in regions:
        m = wrapped_interval_mask(pos[:, 0], x0, x1, box)
        m &= wrapped_interval_mask(pos[:, 1], y0, y1, box)
        m &= wrapped_interval_mask(pos[:, 2], z0, z1, box)
        mask |= m
    return mask
