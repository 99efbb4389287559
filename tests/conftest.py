"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so that mesh sharding,
halo exchange, and collectives are exercised deterministically without TPU
hardware (SURVEY.md §4). Environment must be set before JAX is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA-CPU compiles of big scatter/scan programs
# are slow; cache them across test sessions.
import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS (config becomes "axon,cpu"), so
# pin the platform explicitly — tests must run on the 8-device virtual CPU
# mesh, never on the (single, shared) TPU chip.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture()
def rng(request) -> np.random.Generator:
    """Per-test deterministic generator: the seed derives from the test id
    (stable CRC32, not the randomized builtin hash) so streams never depend
    on execution order or which other tests ran."""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run the compile-heavy slow lane (full suite)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy (interpret-mode Pallas / shard_map); "
        "excluded from the default fast lane — run with --slow",
    )


def pytest_collection_modifyitems(config, items):
    """Fast lane by default (VERDICT r3 item 7): the full 44-file suite
    costs >25 min of XLA-CPU compiles on this 1-core host; the default
    lane keeps every subsystem covered at smoke depth and finishes in
    ~2-3 min. `pytest --slow` runs everything."""
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
