"""Periodic-box geometry, pure ``jax.numpy``.

Parity target: `/root/reference/src/astro_sph_tools/tools/_periodic_box_manipulations.py:10-72`.
Semantics preserved exactly (minimum-image displacement with the |d| > L/2
wrap rule; wrap-into-box with the half-open [0, L) / [-L/2, L/2) intervals;
origin/centre shifts); the reference's in-place NumPy mutation becomes
functional returns, which is what ``jit`` requires anyway.

All functions are shape-polymorphic over leading axes and work elementwise,
so they trace once and fuse into surrounding computations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def wrapped_displacement(from_positions: Array, to_positions: Array, box_width) -> Array:
    """Minimum-image displacement ``to - from`` in a periodic box.

    Components with |delta| > box_width/2 are wrapped by one box length toward
    zero (reference `_periodic_box_manipulations.py:10-20`). Assumes points
    are inside the box (or that the true displacement is under half a box).
    """
    delta = to_positions - from_positions
    needs_wrap = jnp.abs(delta) > box_width / 2
    return jnp.where(needs_wrap, delta - jnp.sign(delta) * box_width, delta)


def wrapped_distance(
    from_position: Array, to_positions: Array, box_width, squared: bool = False
) -> Array:
    """Length of the minimum-image displacement (reference `:22-34`).

    The reduction axis follows the reference: the last axis when either input
    is 2D (vectors), else the whole (1D single-vector) input.
    """
    displacement = wrapped_displacement(from_position, to_positions, box_width)
    axis = 1 if (jnp.ndim(from_position) > 1 or jnp.ndim(to_positions) > 1) else 0
    squared_distance = (displacement**2).sum(axis=axis)
    return squared_distance if squared else jnp.sqrt(squared_distance)


def make_periodic(positions: Array, box_width, origin_is_centre: bool = False) -> Array:
    """Wrap positions into [0, L) (or [-L/2, L/2) if *origin_is_centre*).

    Functional version of the reference's in-place ``make_periodic``
    (`:36-43`); single-wrap semantics preserved (positions more than one box
    length outside are wrapped once, as in the reference).
    """
    if origin_is_centre:
        half = box_width / 2
        out_of_box = (positions < -half) | (positions >= half)
        wrapped = positions - jnp.sign(positions + half) * box_width
    else:
        out_of_box = (positions < 0.0) | (positions >= box_width)
        wrapped = positions - jnp.sign(positions) * box_width
    return jnp.where(out_of_box, wrapped, positions)


# Functional alias used by the reference's public API (`:44-51`).
calculate_periodic = make_periodic


def shift_origin(
    positions: Array, new_origin: Array, box_width, origin_is_centre: bool = False
) -> Array:
    """Translate so *new_origin* maps to zero, then wrap (reference `:53-60`)."""
    return make_periodic(positions - new_origin, box_width, origin_is_centre)


def shift_centre(
    positions: Array, new_centre: Array, box_width, origin_is_centre: bool = False
) -> Array:
    """Translate so *new_centre* maps to the box centre, then wrap (reference `:62-72`)."""
    if origin_is_centre:
        return shift_origin(positions, new_centre, box_width, origin_is_centre)
    return make_periodic(positions + (box_width / 2 - new_centre), box_width, origin_is_centre)
