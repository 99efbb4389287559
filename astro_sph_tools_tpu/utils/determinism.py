"""Determinism checking (SURVEY.md §5 race-detection parity).

The reference's closest analogues are sha256 output-hash debugging remnants
in the MPI reorder (`tools/_ArrayReorder.py:353-362`) and cross-rank input
validation (`:164-170`). Here:

- :func:`hash_array` — stable digest of an array's bytes (host or device);
- :func:`assert_deterministic` — run a function n times and require
  bitwise-identical outputs (the deposit engines use sorted per-tile
  accumulation precisely so this holds; a regression here means a
  nondeterministic reduction crept in);
- :func:`assert_consistent_across_processes` — multihost check that all
  processes computed the same digest (replaces the reference's gather-to-
  root "can_continue" handshake with an allgather verdict).
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np


def hash_array(array) -> str:
    """sha256 of the array's raw bytes (device arrays are pulled to host)."""
    host = np.ascontiguousarray(np.asarray(array))
    digest = hashlib.sha256()
    digest.update(str(host.dtype).encode())
    digest.update(str(host.shape).encode())
    digest.update(host.tobytes())
    return digest.hexdigest()


def hash_pytree(tree) -> str:
    import jax

    digest = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        digest.update(hash_array(leaf).encode())
    return digest.hexdigest()


def assert_deterministic(fn: Callable, *args, n_runs: int = 2, **kwargs) -> str:
    """Run ``fn(*args, **kwargs)`` n times; raise if outputs differ bitwise.

    Returns the common digest on success.
    """
    digests = []
    for _ in range(n_runs):
        digests.append(hash_pytree(fn(*args, **kwargs)))
    if len(set(digests)) != 1:
        raise AssertionError(
            f"Nondeterministic outputs across {n_runs} runs: digests {digests}"
        )
    return digests[0]


def assert_consistent_across_processes(value) -> None:
    """All JAX processes must hold bitwise-identical data (DCN allgather)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    digest = hash_pytree(value)
    digest_bytes = np.frombuffer(bytes.fromhex(digest), dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(digest_bytes))
    if not (gathered == gathered[0]).all():
        raise AssertionError(
            "Cross-process inconsistency: processes hold different data "
            f"(digest mismatch on process set of {jax.process_count()})."
        )
