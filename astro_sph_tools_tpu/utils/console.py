"""Console logging, settings, and timing utilities.

Replaces the reference's external ``QuasarCode`` Console/Settings/Stopwatch
surface (used throughout, e.g. `_SnapshotEAGLE.py:483-489`,
`_CatalogueSUBFIND.py:41-64`): verbosity-gated printing with root-rank-only
mode, plus a lap-timing Stopwatch whose laps can be aggregated across JAX
processes (the TPU-native analogue of the reference's "MPI barrier delay"
probe that gathers per-rank lap skew).
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Settings:
    """Global verbosity/debug switches (parity: QuasarCode Settings)."""

    verbose: bool = False
    debug: bool = False
    show_times: bool = False
    root_only_output: bool = True


settings = Settings()


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _stamp() -> str:
    if not settings.show_times:
        return ""
    return time.strftime("[%H:%M:%S] ")


def _emit(prefix: str, message: str, stream=None) -> None:
    if settings.root_only_output and _process_index() != 0:
        return
    stream = stream or sys.stdout
    print(f"{_stamp()}{prefix}{message}", file=stream, flush=True)


def print_info(message: str) -> None:
    _emit("", message)


def print_verbose_info(message: str) -> None:
    if settings.verbose or settings.debug:
        _emit("INFO: ", message)


def print_debug(message: str) -> None:
    if settings.debug:
        _emit("DEBUG: ", message)


def print_warning(message: str) -> None:
    _emit("WARNING: ", message, stream=sys.stderr)


def print_verbose_warning(message: str) -> None:
    if settings.verbose or settings.debug:
        print_warning(message)


def print_error(message: str) -> None:
    _emit("ERROR: ", message, stream=sys.stderr)


def show_times(enable: bool = True) -> None:
    settings.show_times = enable


@dataclass
class Stopwatch:
    """Lap timer (parity: QuasarCode Stopwatch, `_CatalogueSUBFIND.py:41-49`).

    ``lap()`` records and returns the elapsed seconds since the previous lap.
    ``process_skew()`` gathers the latest lap across JAX processes and
    returns (min, max) — the replacement for the reference's MPI
    barrier-delay probe.
    """

    name: str = "stopwatch"
    _start: float = field(default_factory=time.perf_counter)
    _last: float = 0.0
    laps: list = field(default_factory=list)

    def __post_init__(self):
        self._last = self._start

    def lap(self, label: Optional[str] = None) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.laps.append((label or f"lap{len(self.laps)}", dt))
        if settings.debug:
            print_debug(f"{self.name}: {label or 'lap'} took {dt * 1e3:.2f} ms")
        return dt

    def total(self) -> float:
        return time.perf_counter() - self._start

    def process_skew(self) -> tuple[float, float]:
        """(min, max) of the last lap across JAX processes (DCN gather)."""
        last = self.laps[-1][1] if self.laps else 0.0
        try:
            import jax
            from jax.experimental import multihost_utils

            if jax.process_count() > 1:
                all_vals = multihost_utils.process_allgather(last)
                return float(all_vals.min()), float(all_vals.max())
        except Exception:
            pass
        return last, last


@contextmanager
def timed_phase(name: str):
    """Wall-clock a pipeline phase (IO, sort, deposit, collective ...) —
    SURVEY.md §5's "per-phase wall-clock" requirement."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if settings.verbose or settings.debug or settings.show_times:
            _emit("TIMING: ", f"{name}: {dt:.3f}s")
