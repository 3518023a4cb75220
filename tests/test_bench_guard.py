"""Bench-regression guard (tools/bench_guard.py) — performance as a tested
invariant.  Round 6's 30% headline drift landed silently because nothing
compared fresh numbers to a pinned baseline; this runs the real bench (own
subprocess: bench confs are local[32]/32 shuffle partitions, NOT the
local[2] test session) and fails any query whose median exceeds the
calibrated noise envelope over BENCH_PINNED.json."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
BENCH_SF_DIR = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not Path(BENCH_SF_DIR).exists(), reason="sf0.1 testdata not generated"
)
def test_bench_medians_within_pinned_envelope():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_guard.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": BENCH_SF_DIR},
        cwd=str(REPO),
    )
    report = proc.stdout.strip().splitlines()
    assert proc.returncode == 0, "\n".join(
        ln for ln in report if ln.startswith("FAIL")
    ) or proc.stderr[-2000:]
    # the guard must actually have compared (not skipped on an sf mismatch)
    assert any(ln.startswith("ok    total median") for ln in report), report


def test_guard_logic_flags_regressions_and_passes_noise():
    """Unit check of the comparison itself: same-code noise (anything up to
    max(2x, +0.5s) of the pin) passes, a real >2x regression and a missing
    query fail, and an sf mismatch skips instead of lying."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.4, "q_b": 1.0},
        "total_median": 1.4,
    }
    ok = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.85, "q_b": 1.9},  # noise band: under limit
        "value_median": 2.2,  # < 1.6 * 1.4 = 2.24
    }
    failures, _ = bench_guard.check_result(ok, pinned)
    assert failures == []

    bad = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.95, "q_b": 2.1},  # q_a > 0.9, q_b > 2.0
        "value_median": 3.05,  # > 2.24 too
    }
    failures, lines = bench_guard.check_result(bad, pinned)
    assert set(failures) == {"q_a", "q_b", "__total__"}, lines

    missing = {"sf": 0.1, "queries_median": {"q_a": 0.4}, "value_median": 0.4}
    failures, _ = bench_guard.check_result(missing, pinned)
    assert "q_b" in failures

    other_sf = {"sf": 0.01, "queries_median": {}, "value_median": 0.0}
    failures, lines = bench_guard.check_result(other_sf, pinned)
    assert failures == [] and lines[0].startswith("skip")
