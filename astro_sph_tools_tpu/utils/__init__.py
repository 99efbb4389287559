"""Utilities: console/logging/settings, timing, profiling."""

from .console import (
    Settings,
    Stopwatch,
    print_debug,
    print_error,
    print_info,
    print_verbose_info,
    print_verbose_warning,
    print_warning,
    settings,
    show_times,
    timed_phase,
)
from .determinism import (
    assert_consistent_across_processes,
    assert_deterministic,
    hash_array,
    hash_pytree,
)
from .profiling import PhaseTimer, device_trace

__all__ = [
    "PhaseTimer",
    "assert_consistent_across_processes",
    "assert_deterministic",
    "hash_array",
    "hash_pytree",
    "Settings",
    "Stopwatch",
    "device_trace",
    "print_debug",
    "print_error",
    "print_info",
    "print_verbose_info",
    "print_verbose_warning",
    "print_warning",
    "settings",
    "show_times",
    "timed_phase",
]
