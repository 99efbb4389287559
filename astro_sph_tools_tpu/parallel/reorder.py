"""Distributed ID-matched reorder over a device mesh.

The TPU-native replacement for ``ArrayReorder_MPI``
(`/root/reference/src/astro_sph_tools/tools/_ArrayReorder.py:262-656`): the
reference root-gathers both ID orders, builds a per-element rank assignment
(~12 minutes at 3.4e9 IDs, `:572`), and moves data pair-wise through a
round-robin ``comm.sendrecv`` tournament (`:48-84,299-373`). Here the plan
*is* the exchange: a deterministic owner shard per ID and two
``lax.all_to_all`` hops over ICI, everything jit-compiled:

1. every ID is owned by shard ``id % n_devices``;
2. sources bucket their (id, value) pairs by owner and exchange
   (``all_to_all``); owners hold a sorted directory of their IDs' values;
3. targets send their wanted IDs to the owners the same way; owners answer
   by sorted lookup; the reverse ``all_to_all`` returns values in the exact
   slot layout of the request, so the requester finishes with a pure local
   gather — no scatter anywhere.

Static shapes throughout: per-destination buckets are padded to
``capacity = ceil(N_shard / n_dev * capacity_factor)``; an overflow flag is
returned instead of silent truncation (matches-by-construction workloads —
near-uniform ID hashing — keep the factor small).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _bucket_pack(ids, payloads, n_dev, cap, axis_name):
    """Sort local elements by owner shard and pack (n_dev, cap) send buffers.

    Returns (packed ids, packed payloads, slot index per local element,
    overflow flag). Padding slots carry id = -1.
    """
    n = ids.shape[0]
    owner = jnp.abs(ids) % n_dev
    order = jnp.argsort(owner)
    owner_sorted = owner[order]
    # start offset of each bucket among the sorted elements
    starts = jnp.searchsorted(owner_sorted, jnp.arange(n_dev, dtype=owner.dtype))
    counts = (
        jnp.searchsorted(owner_sorted, jnp.arange(n_dev, dtype=owner.dtype), side="right")
        - starts
    )
    overflow = jnp.any(counts > cap)
    pos_in_bucket = jnp.arange(n) - starts[owner_sorted]
    # slot of sorted element i in the (n_dev, cap) buffer
    slot_sorted = owner_sorted * cap + pos_in_bucket
    valid = pos_in_bucket < cap

    packed_ids = jnp.full((n_dev * cap,), -1, dtype=ids.dtype)
    packed_ids = packed_ids.at[jnp.where(valid, slot_sorted, n_dev * cap)].set(
        ids[order], mode="drop"
    )
    packed_payloads = []
    for payload in payloads:
        buf = jnp.zeros((n_dev * cap,) + payload.shape[1:], dtype=payload.dtype)
        buf = buf.at[jnp.where(valid, slot_sorted, n_dev * cap)].set(
            payload[order], mode="drop"
        )
        packed_payloads.append(buf.reshape((n_dev, cap) + payload.shape[1:]))

    # slot of each ORIGINAL element (inverse of the sort permutation)
    slot_of_element = jnp.zeros(n, dtype=jnp.int32)
    slot_of_element = slot_of_element.at[order].set(slot_sorted.astype(jnp.int32))

    return packed_ids.reshape(n_dev, cap), packed_payloads, slot_of_element, overflow


def _owner_lookup(owned_ids, owned_values, query_ids, default_value):
    """For each query id, the owned value (or default); -1 ids never match."""
    order = jnp.argsort(owned_ids)
    sorted_ids = owned_ids[order]
    pos = jnp.clip(jnp.searchsorted(sorted_ids, query_ids), 0, sorted_ids.shape[0] - 1)
    hit = (sorted_ids[pos] == query_ids) & (query_ids != -1)
    values = owned_values[order][pos]
    mask = hit.reshape(hit.shape + (1,) * (values.ndim - hit.ndim))
    return jnp.where(mask, values, default_value), hit


def distributed_reorder(
    source_ids: Array,
    source_data: Array,
    target_ids: Array,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    default_value: float = 0.0,
    capacity_factor: Optional[float] = None,
) -> tuple[Array, Array, Array]:
    """Reorder ``source_data`` (ordered by ``source_ids``) into the order of
    ``target_ids``, all three sharded along axis 0 over *mesh*.

    Returns (reordered data, matched mask, overflow flag). Unmatched target
    slots carry ``default_value``. Shapes must divide evenly over the mesh.

    ``capacity_factor=None`` (default) sizes the exchange buckets exactly by
    a host pass over the IDs; pass a float (e.g. 1.3) to skip that pass and
    size buckets as ``ceil(N_shard / n_dev * factor)`` — the overflow flag
    reports if any bucket spilled (results are then incomplete).
    """
    n_dev = mesh.shape[axis_name]
    ns_local = source_ids.shape[0] // n_dev
    nt_local = target_ids.shape[0] // n_dev

    def _exact_cap(ids, n_local):
        host = np.asarray(ids).reshape(n_dev, n_local)
        owner = np.abs(host) % n_dev
        worst = 1
        for shard in owner:
            worst = max(worst, int(np.bincount(shard, minlength=n_dev).max()))
        return worst

    if capacity_factor is None:
        cap_s = _exact_cap(source_ids, ns_local)
        cap_t = _exact_cap(target_ids, nt_local)
    else:
        cap_s = max(1, int(np.ceil(ns_local / n_dev * capacity_factor)))
        cap_t = max(1, int(np.ceil(nt_local / n_dev * capacity_factor)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()),
    )
    def step(src_ids, src_data, tgt_ids):
        # 1) sources -> owners
        packed_ids, (packed_data,), _, overflow_s = _bucket_pack(
            src_ids, [src_data], n_dev, cap_s, axis_name
        )
        owned_ids = jax.lax.all_to_all(
            packed_ids, axis_name, split_axis=0, concat_axis=0, tiled=False
        ).reshape(-1)
        owned_data = jax.lax.all_to_all(
            packed_data, axis_name, split_axis=0, concat_axis=0, tiled=False
        ).reshape((-1,) + packed_data.shape[2:])

        # 2) targets -> owners (requests)
        req_ids, _, slot_of_target, overflow_t = _bucket_pack(
            tgt_ids, [], n_dev, cap_t, axis_name
        )
        owner_queries = jax.lax.all_to_all(
            req_ids, axis_name, split_axis=0, concat_axis=0, tiled=False
        )

        # 3) owners answer by sorted lookup
        answers, hits = _owner_lookup(
            owned_ids, owned_data, owner_queries.reshape(-1), default_value
        )
        answers = answers.reshape((n_dev, cap_t) + answers.shape[1:])
        hits = hits.reshape(n_dev, cap_t)

        # 4) reverse exchange: responses land in the request slot layout
        back_values = jax.lax.all_to_all(
            answers, axis_name, split_axis=0, concat_axis=0, tiled=False
        ).reshape((-1,) + answers.shape[2:])
        back_hits = jax.lax.all_to_all(
            hits, axis_name, split_axis=0, concat_axis=0, tiled=False
        ).reshape(-1)

        out = back_values[slot_of_target]
        matched = back_hits[slot_of_target]
        overflow = jax.lax.pmax(overflow_s | overflow_t, axis_name)
        return out, matched, overflow

    return step(source_ids, source_data, target_ids)
