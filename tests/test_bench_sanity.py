"""Bimodality guard in bench.py: the kernel-anchored flagship sanity
verdict must flag a contention-inflated run (the BENCH_r04 failure mode —
~2× slowdown under the load-average threshold) and pass clean runs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import measure_kernel_tps, sanity_verdict  # noqa: E402

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
