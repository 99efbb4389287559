"""Console/settings/stopwatch/profiling utilities."""

import time

import pytest

from astro_sph_tools_tpu.utils import (
    PhaseTimer,
    Stopwatch,
    print_debug,
    print_info,
    print_verbose_info,
    settings,
    timed_phase,
)


class TestConsole:
    def test_info_always_prints(self, capsys):
        print_info("hello")
        assert "hello" in capsys.readouterr().out

    def test_verbose_gating(self, capsys):
        old = settings.verbose
        try:
            settings.verbose = False
            print_verbose_info("quiet")
            assert "quiet" not in capsys.readouterr().out
            settings.verbose = True
            print_verbose_info("loud")
            assert "loud" in capsys.readouterr().out
        finally:
            settings.verbose = old

    def test_debug_gating(self, capsys):
        old = settings.debug
        try:
            settings.debug = False
            print_debug("nope")
            assert "nope" not in capsys.readouterr().out
            settings.debug = True
            print_debug("yes")
            assert "DEBUG: yes" in capsys.readouterr().out
        finally:
            settings.debug = old


class TestStopwatch:
    def test_laps_accumulate(self):
        sw = Stopwatch("t")
        time.sleep(0.01)
        dt1 = sw.lap("one")
        dt2 = sw.lap("two")
        assert dt1 >= 0.01
        assert len(sw.laps) == 2
        assert sw.total() >= dt1 + dt2

    def test_process_skew_single_process(self):
        sw = Stopwatch("t")
        sw.lap()
        lo, hi = sw.process_skew()
        assert lo == hi


class TestPhaseTimer:
    def test_phases_accumulate(self):
        t = PhaseTimer()
        with t.phase("io"):
            time.sleep(0.01)
        with t.phase("io"):
            time.sleep(0.01)
        with t.phase("compute"):
            pass
        report = t.report()
        assert report["io"] >= 0.02
        assert "compute" in report
        assert "io" in t.summary()

    def test_timed_phase_prints_when_enabled(self, capsys):
        old = settings.show_times
        try:
            settings.show_times = True
            with timed_phase("demo"):
                pass
            assert "demo" in capsys.readouterr().out
        finally:
            settings.show_times = old
