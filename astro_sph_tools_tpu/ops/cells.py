"""Morton encoding and on-device cell lists (neighbor structure).

SURVEY.md §7.2 step 5: "Morton encoding, on-device radix/``jnp.sort`` by
cell, cell ranges (``searchsorted``) — the cell list that feeds per-tile
particle bins". The deposit engine uses a specialised 2D tile binning
(``deposit_pallas.tile_particles``); this module is the general 3D
structure backing neighbor queries and spatial analysis.

Real EAGLE snapshots are stored in Peano-Hilbert chunk order, so device
sorts here run on nearly-sorted keys; the structure is built once per
snapshot and amortised over every query/render.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _part1by2(x: Array) -> Array:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_encode_3d(ix: Array, iy: Array, iz: Array) -> Array:
    """Interleave three 10-bit cell indices into a 30-bit Morton key (int32).

    Supports grids up to 1024^3 cells; keys preserve spatial locality so
    cell-sorted particle arrays give coherent HBM access in gather phases.
    """
    return (
        _part1by2(ix.astype(jnp.int32))
        | (_part1by2(iy.astype(jnp.int32)) << 1)
        | (_part1by2(iz.astype(jnp.int32)) << 2)
    )


@dataclass
class CellList:
    """Cell-sorted particle structure.

    Attributes
    ----------
    order : (N,) permutation sorting particles by cell key.
    cell_of_particle : (N,) linear cell id per *sorted* particle.
    cell_start / cell_end : (n_cells,) particle ranges per cell
        (``searchsorted`` over the sorted keys).
    n_cells_per_axis : cells per axis; cell_size : world units.
    """

    order: Array
    cell_of_particle: Array
    cell_start: Array
    cell_end: Array
    n_cells_per_axis: int
    cell_size: float
    box_size: float
    morton: bool

    @property
    def n_cells(self) -> int:
        return self.n_cells_per_axis**3

    def counts(self) -> Array:
        return self.cell_end - self.cell_start


def linear_cell_id(
    pos: Array, box_size: float, n_cells_per_axis: int, morton: bool = False
) -> Array:
    """Cell id per particle: row-major linear or Morton-interleaved."""
    n = n_cells_per_axis
    cell = jnp.clip((pos / (box_size / n)).astype(jnp.int32), 0, n - 1)
    if morton:
        return morton_encode_3d(cell[:, 0], cell[:, 1], cell[:, 2])
    return (cell[:, 2] * n + cell[:, 1]) * n + cell[:, 0]


@partial(jax.jit, static_argnames=("n_cells_per_axis", "box_size", "morton"))
def build_cell_list(
    pos: Array, *, box_size: float, n_cells_per_axis: int, morton: bool = False
) -> CellList:
    """Build the cell list: one sort + two searchsorteds, all on device.

    With ``morton=True`` the cell ranges are indexed by Morton key (use
    :func:`morton_encode_3d` to look cells up); the default row-major layout
    supports direct (ix, iy, iz) arithmetic for neighbor walks.
    """
    ids = linear_cell_id(pos, box_size, n_cells_per_axis, morton)
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    n_cells = n_cells_per_axis**3 if not morton else 1 << 30
    # morton keys are sparse in [0, 2^30): range queries still work via
    # searchsorted on demand; for the dense row-major case precompute ranges
    if morton:
        cell_start = cell_end = jnp.zeros((1,), jnp.int32)
    else:
        rng = jnp.arange(n_cells, dtype=sorted_ids.dtype)
        cell_start = jnp.searchsorted(sorted_ids, rng).astype(jnp.int32)
        cell_end = jnp.searchsorted(sorted_ids, rng, side="right").astype(jnp.int32)
    return CellList(
        order=order,
        cell_of_particle=sorted_ids,
        cell_start=cell_start,
        cell_end=cell_end,
        n_cells_per_axis=n_cells_per_axis,
        cell_size=box_size / n_cells_per_axis,
        box_size=box_size,
        morton=morton,
    )


jax.tree_util.register_pytree_node(
    CellList,
    lambda c: (
        (c.order, c.cell_of_particle, c.cell_start, c.cell_end),
        (c.n_cells_per_axis, c.cell_size, c.box_size, c.morton),
    ),
    lambda aux, leaves: CellList(*leaves, *aux),
)
