"""bench.py contamination detector (round-8 verdict, Next #4): the
monotone-decay >1.5x first-to-last signature BENCH_NOTES.md documented
([76.6, 70.2, 30.0]) must flag; normal warm-in bands must not."""

import sys

sys.path.insert(0, "/root/repo")

from bench import detect_contamination


def test_documented_contaminated_run_flags():
    # the r8 round-end slow-box run where even the median lied
    assert detect_contamination([76.6, 70.2, 30.0]) is True


def test_normal_jit_warmin_band_does_not_flag():
    # BENCH_r08.json totals_per_run: run-1 warm-in, then flat — not monotone
    assert detect_contamination([34.73, 27.187, 28.883]) is False


def test_monotone_but_shallow_decay_does_not_flag():
    # monotone but first/last = 1.2x < 1.5x threshold
    assert detect_contamination([30.0, 27.0, 25.0]) is False


def test_steep_decay_flags_and_equal_runs_do_not():
    assert detect_contamination([60.0, 45.0, 30.0]) is True
    assert detect_contamination([30.0, 30.0, 30.0]) is False


def test_too_few_or_failed_runs_never_flag():
    assert detect_contamination([76.6, 30.0]) is False          # <3 runs
    assert detect_contamination([76.6, None, 30.0]) is False    # failed run
    assert detect_contamination([]) is False
