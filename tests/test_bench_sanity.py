"""Bimodality guard in bench.py: the kernel-anchored flagship sanity
verdict must flag a contention-inflated run (the BENCH_r04 failure mode —
~2× slowdown under the load-average threshold) and pass clean runs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_kernel_tps, sanity_verdict, wait_for_quiet  # noqa: E402

N_TURNS, CPUS, KERNEL = 200_000, 32, 13_000.0
# expected = 5 × 200000 / (13000 × 32) = 2.404 s; suspect beyond 1.5× that


def test_clean_run_is_not_suspect():
    v = sanity_verdict(2.2, N_TURNS, KERNEL, CPUS)
    assert not v["suspect"]
    assert v["expected_flagship_sec"] == 2.404


def test_judge_clean_r4_timings_pass():
    for sec in (2.18, 2.79):  # the judge's two clean re-runs
        assert not sanity_verdict(sec, N_TURNS, KERNEL, CPUS)["suspect"]


def test_deliberately_loaded_run_is_flagged():
    """The r4 contaminated record: 5.77 s where clean runs sit at
    2.2-2.8 s — must be marked suspect."""
    v = sanity_verdict(5.77, N_TURNS, KERNEL, CPUS)
    assert v["suspect"]


def test_boxwide_slowdown_scales_the_expectation():
    """When the KERNEL itself measures slow (box-wide thermal state),
    the expectation scales with it — a proportionally slow flagship is
    attributable, not suspect, and the low kernel rate is in the record."""
    v = sanity_verdict(5.77, N_TURNS, KERNEL / 2, CPUS)
    assert not v["suspect"]
    assert v["kernel_tps_1core"] == KERNEL / 2


def test_measured_kernel_rate_is_plausible():
    tps = measure_kernel_tps(n_texts=1000)
    assert 500 < tps < 60_000  # the scaling-bench anti-fake anchor range


# ---- wait_for_quiet: the r6 "official record must be CLEAN, not just
# flagged" fix.  All deps injected; no real sleeping. ----


class _FakeClock:
    def __init__(self):
        self.slept = []

    def sleep(self, sec):
        self.slept.append(sec)


def _seq(values, last):
    """Iterator-backed callable: yields values then repeats ``last``."""
    it = iter(values)

    def f():
        return next(it, last)

    return f


def test_quiet_box_returns_immediately():
    clock = _FakeClock()
    rec = wait_for_quiet(
        probe_tps=_seq([], 13_500.0),
        getload=lambda: (0.4, 1.0, 2.0),
        sleep_fn=clock.sleep,
    )
    assert rec["quiet_at_start"] and rec["waited_sec"] == 0 and clock.slept == []
    assert rec["load1"] == 0.4 and rec["probe_tps"] == 13_500.0


def test_busy_box_waits_until_load_drops():
    clock = _FakeClock()
    loads = _seq([(6.2, 0, 0), (3.1, 0, 0), (1.2, 0, 0)], (1.2, 0, 0))
    rec = wait_for_quiet(
        probe_tps=_seq([], 13_000.0),
        getload=lambda: loads(),
        sleep_fn=clock.sleep,
    )
    assert rec["quiet_at_start"] and rec["probes"] == 3
    assert clock.slept == [5.0, 10.0]  # exponential backoff
    assert rec["waited_sec"] == 15.0


def test_bimodal_slow_mode_blocks_quiet_despite_low_load():
    """The r4 failure mode: load1 under every threshold but the kernel
    anchor measures the ~2×-slow state — NOT a quiet window."""
    clock = _FakeClock()
    tps = _seq([6_800.0, 6_900.0, 13_400.0], 13_400.0)
    rec = wait_for_quiet(
        probe_tps=tps,
        getload=lambda: (0.3, 0, 0),
        sleep_fn=clock.sleep,
    )
    assert rec["quiet_at_start"] and rec["probes"] == 3
    assert rec["probe_tps"] == 13_400.0


def test_never_quiet_is_bounded_and_marked():
    """If the box never goes quiet the wait is bounded (~max_wait_sec)
    and the record says so explicitly — measure-anyway, stay suspect."""
    clock = _FakeClock()
    rec = wait_for_quiet(
        max_wait_sec=120.0,
        probe_tps=_seq([], 13_000.0),
        getload=lambda: (8.0, 0, 0),
        sleep_fn=clock.sleep,
    )
    assert not rec["quiet_at_start"]
    assert rec["waited_sec"] >= 120.0
    assert sum(clock.slept) == rec["waited_sec"]
    assert max(clock.slept) == 60.0  # backoff capped
