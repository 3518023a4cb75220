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
    assert any(ln.startswith("ok    total") for ln in report), report


def test_perf_critical_confs_pinned(spark):
    """The guard's host-calibration normalizer (round 8) scales limits by a
    fixed CPU-bound probe — which means anything that slows the PROBE too
    (a session-conf regression: codegen off, adaptive off) would be
    normalized away instead of caught.  Those confs therefore need their own
    direct pin; this closes the normalizer's one blind spot."""
    from databricks_feature_store_flight_school_spark.session import prepare

    s = prepare(spark)
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
    assert s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert s.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    # whole-stage codegen is Spark's default ON — the probe's throughput
    # (and every headline query) assumes it; assert nothing turned it off
    assert s.conf.get("spark.sql.codegen.wholeStage", "true") == "true"


def test_guard_host_factor_scales_limits_but_keeps_discrimination():
    """A slower host (probe and queries uniformly slower) passes via the
    calibration factor; a single regressed plan on that same host still
    fails; the factor never drops limits below the pin and is capped."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.4, "q_b": 1.0},
        "total_median": 1.4,
        "calib_sec": 0.4,
    }
    # host 1.75x slower: every query 1.75x, probe 1.75x -> all pass
    slow_host = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.7, "q_b": 1.75},
        "value_median": 2.45,
        "calib_sec": 0.7,
    }
    failures, lines = bench_guard.check_result(slow_host, pinned)
    assert failures == [], lines
    assert any(ln.startswith("host") for ln in lines)

    # same slow host, but q_a regressed 4x beyond the host factor -> fails
    regressed = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.6, "q_b": 1.75},
        "value_median": 3.35,
        "calib_sec": 0.7,
    }
    failures, lines = bench_guard.check_result(regressed, pinned)
    assert failures == ["q_a"], lines

    # faster host: factor clamps at 1.0, limits stay at the pin envelope
    fast = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.95, "q_b": 1.0},
        "value_median": 1.95,
        "calib_sec": 0.2,
    }
    failures, _ = bench_guard.check_result(fast, pinned)
    assert failures == ["q_a"]

    # implausibly slow probe: factor capped at MAX_HOST_FACTOR, reported
    crawl = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.4, "q_b": 1.0},
        "value_median": 1.4,
        "calib_sec": 4.0,
    }
    _, lines = bench_guard.check_result(crawl, pinned)
    assert any("capped" in ln for ln in lines)


def test_artifact_is_self_adjudicating():
    """VERDICT r11 #3: the emitted BENCH artifact ALONE answers 'regression
    or host?' — three rounds running the committed raw medians needed a
    companion quiet-host run to interpret.  A uniformly slow host (every
    query and the probe 2x) must show pass=True with pin-host-normalized
    ratios of 1.0; a genuinely regressed query shows its true normalized
    ratio and the fail verdict.  Driver-compatible raw keys pass through."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "pinned_at": "round 8",
        "queries_median": {"q_a": 0.4, "q_b": 1.0},
        "queries_min": {"q_a": 0.4, "q_b": 1.0},
        "total_median": 1.4,
        "total_min": 1.4,
        "calib_sec": 0.4,
    }
    slow_host = {
        "metric": "headline_total_wall_sec",
        "unit": "sec",
        "sf": 0.1,
        "queries_median": {"q_a": 0.8, "q_b": 2.0},
        "queries_min": {"q_a": 0.8, "q_b": 2.0},
        "value_median": 2.8,
        "value_min": 2.8,
        "calib_sec": 0.8,
    }
    failures, lines = bench_guard.check_result(slow_host, pinned)
    art = bench_guard.build_artifact(slow_host, pinned, failures, lines)
    g = art["guard"]
    assert g["pass"] is True and g["failures"] == []
    assert g["stat"] == "min"
    assert g["normalized_ratio_vs_pin"] == {"q_a": 1.0, "q_b": 1.0}
    assert g["normalized_total_min_vs_pin"] == 1.0
    assert g["normalized_total_median_vs_pin"] == 1.0
    assert g["calib_sec"] == 0.8 and g["pinned_calib_sec"] == 0.4
    # raw driver-contract keys survive verbatim at the top level
    assert art["metric"] == "headline_total_wall_sec"
    assert art["queries_min"] == {"q_a": 0.8, "q_b": 2.0}

    # real regression on the same slow host: normalized ratio shows 4x on
    # the offender and the verdict fails — no companion run needed
    regressed = {**slow_host,
                 "queries_min": {"q_a": 3.2, "q_b": 2.0},
                 "queries_median": {"q_a": 3.2, "q_b": 2.0},
                 "value_min": 5.2, "value_median": 5.2}
    failures, lines = bench_guard.check_result(regressed, pinned)
    art = bench_guard.build_artifact(regressed, pinned, failures, lines)
    assert art["guard"]["pass"] is False
    assert art["guard"]["failures"] == ["q_a", "__total__"]
    assert art["guard"]["normalized_ratio_vs_pin"]["q_a"] == 4.0
    assert art["guard"]["normalized_ratio_vs_pin"]["q_b"] == 1.0


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


def test_guard_prefers_min_stat_when_both_sides_carry_it():
    """Round-8 noise model: a spike can contaminate 2 of 3 reps, poisoning
    the median while the min stays clean — the guard must pass that run.
    Conversely a real plan regression raises the min too — still fails.
    Results without queries_min (older pins) fall back to medians."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.4},
        "queries_min": {"q_a": 0.35},
        "total_median": 0.4,
        "total_min": 0.35,
    }
    # median poisoned by spikes (1.2 > 0.9 limit) but the min is clean
    spiky = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.2},
        "queries_min": {"q_a": 0.38},
        "value_median": 1.2,
        "value_min": 0.38,
    }
    failures, lines = bench_guard.check_result(spiky, pinned)
    assert failures == [], lines

    # a real regression raises the min beyond max(2x, +0.5s) -> fails
    regressed = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.2},
        "queries_min": {"q_a": 1.1},
        "value_median": 1.2,
        "value_min": 1.1,
    }
    failures, _ = bench_guard.check_result(regressed, pinned)
    assert set(failures) == {"q_a", "__total__"}

    # old pin without queries_min: falls back to the median comparison
    old_pin = {"sf": 0.1, "queries_median": {"q_a": 0.4}, "total_median": 0.4}
    failures, _ = bench_guard.check_result(spiky, old_pin)
    assert failures == ["q_a", "__total__"]


def test_guard_total_check_never_mixes_statistics():
    """A pin with per-query mins but NO total_min must compare totals
    median-vs-median — comparing a fresh (systematically lower) min against
    1.6x a pinned MEDIAN would loosen the systemic-slowdown guard."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.0},
        "queries_min": {"q_a": 0.5},
        "total_median": 1.0,  # no total_min
    }
    # fresh min passes the per-query check, but the median total regressed
    # 1.7x — mixed-statistic comparison (min 0.9 vs 1.6*1.0) would hide it
    run = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.7},
        "queries_min": {"q_a": 0.9},
        "value_median": 1.7,
        "value_min": 0.9,
    }
    failures, lines = bench_guard.check_result(run, pinned)
    assert failures == ["__total__"], lines
    assert any("total median" in ln for ln in lines)


def test_ratchet_is_host_normalized_and_needs_two_sightings():
    """maybe_ratchet (round-10 semantics, ADVICE r9): candidates are
    converted to PIN-HOST units via the calibration ratio, park in
    pending_ratchet on first sighting, and land only when a second passing
    run confirms — at the more conservative (larger) of the two values.
    calib_sec never changes (pins keep one provenance); runs without a
    calibration on either side never ratchet; an unconfirmed pending entry
    is cleared by a run that doesn't reproduce it."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_median": {"q_a": 1.0, "q_b": 1.0},
        "total_median": 2.0,
        "calib_sec": 0.2,
    }
    # host 2x FASTER than the pin host (calib 0.1): raw q_a=0.3 normalizes
    # to 0.6 — still beats 0.9, but only parks as pending on first sight
    run1 = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.3, "q_b": 0.95},
        "value_median": 1.25,
        "calib_sec": 0.1,
    }
    notes = bench_guard.maybe_ratchet(run1, pinned)
    assert pinned["queries_median"]["q_a"] == 1.0  # not yet
    assert pinned["pending_ratchet"]["q_a[median]"] == pytest.approx(0.6)
    # q_b raw 0.95 normalizes to 1.9 -> not a candidate; total 1.25 -> 2.5
    # normalized -> not a candidate either
    assert [n for n in notes if n.startswith("pending q_a")] and len(notes) == 1

    # second sighting on the pin host itself (factor 1.0): confirms at the
    # LARGER of the two normalized sightings
    run2 = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.7, "q_b": 1.0},
        "value_median": 1.9,  # >= 0.9 * pinned total: not a total candidate
        "calib_sec": 0.2,
    }
    notes = bench_guard.maybe_ratchet(run2, pinned)
    assert pinned["queries_median"]["q_a"] == pytest.approx(0.7)
    assert "pending_ratchet" not in pinned
    assert any("confirmed twice" in n for n in notes)

    # a lucky one-off that the next run does NOT reproduce gets cleared
    lucky = dict(
        run1, queries_median={"q_a": 0.2, "q_b": 1.0}, value_median=1.95, calib_sec=0.2
    )
    bench_guard.maybe_ratchet(lucky, pinned)
    assert "q_a[median]" in pinned["pending_ratchet"]
    normal = dict(run2, queries_median={"q_a": 0.69, "q_b": 1.0})
    notes = bench_guard.maybe_ratchet(normal, pinned)
    assert "pending_ratchet" not in pinned
    assert any("not reproduced" in n for n in notes)
    assert pinned["queries_median"]["q_a"] == pytest.approx(0.7)  # unchanged

    # calibration provenance is immutable under ratcheting
    assert pinned["calib_sec"] == 0.2

    # no calibration on the fresh run -> no ratcheting at all
    before = {k: (dict(v) if isinstance(v, dict) else v) for k, v in pinned.items()}
    nocal = {"sf": 0.1, "queries_median": {"q_a": 0.1}, "value_median": 0.1}
    assert bench_guard.maybe_ratchet(nocal, pinned) == []
    assert pinned == before

    # a host beyond the normalization band (ratio 4.0 > MAX_HOST_FACTOR) is
    # un-normalizable: refuse to ratchet entirely rather than clamp — a
    # clamped factor would confirm pins the pin host can never reach
    toofast = {
        "sf": 0.1,
        "queries_median": {"q_a": 0.1, "q_b": 0.1},
        "value_median": 0.3,
        "calib_sec": 0.05,
    }
    assert bench_guard.maybe_ratchet(toofast, pinned) == []
    assert pinned == before

    # sf mismatch: never ratchet across scales
    other = dict(run2, sf=0.01)
    assert bench_guard.maybe_ratchet(other, pinned) == []
    assert pinned == before


def test_artifact_records_skip_on_sf_mismatch_instead_of_pass():
    """ADVICE r12 #4: when check_result short-circuits on an sf mismatch
    (no comparison ran, failures empty), the artifact must NOT assert
    pass=true — it records pass=None with an explicit skipped status, and
    the normalized-ratio block is absent (there is nothing to adjudicate
    with).  A same-sf run keeps status='pass'/'fail' alongside the boolean."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_min": {"q_a": 0.4},
        "queries_median": {"q_a": 0.4},
        "total_median": 0.4,
        "total_min": 0.4,
        "calib_sec": 0.4,
    }
    other_sf = {
        "sf": 1.0,
        "queries_min": {"q_a": 0.5},
        "queries_median": {"q_a": 0.5},
        "value_min": 0.5,
        "value_median": 0.5,
        "calib_sec": 0.4,
    }
    failures, lines = bench_guard.check_result(other_sf, pinned)
    assert failures == [] and lines and lines[0].startswith("skip")
    art = bench_guard.build_artifact(other_sf, pinned, failures, lines)
    g = art["guard"]
    assert g["pass"] is None
    assert g["status"].startswith("skipped: sf mismatch")
    assert "normalized_ratio_vs_pin" not in g
    assert "normalized_total_min_vs_pin" not in g

    # same sf: boolean + status stay in agreement
    same_sf = {**other_sf, "sf": 0.1}
    failures, lines = bench_guard.check_result(same_sf, pinned)
    art = bench_guard.build_artifact(same_sf, pinned, failures, lines)
    assert art["guard"]["pass"] is True and art["guard"]["status"] == "pass"


def test_retryable_failures_filters_non_query_entries():
    """ADVICE r13 #1: a failure list holding only ``__total__`` (systemic
    slowdown, every per-query min passing) or a pinned-but-absent name must
    not reach run_headline — it would select zero queries and crash with an
    IndexError before the guard report printed or the artifact was emitted."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    result = {"queries_min": {"q_a": 0.2, "q_b": 0.3}}
    assert bench_guard.retryable_failures(["__total__"], result) == []
    assert bench_guard.retryable_failures(["q_pinned_but_absent"], result) == []
    assert bench_guard.retryable_failures(
        ["__total__", "q_b", "q_gone"], result
    ) == ["q_b"]
    # and run_headline itself now refuses an empty selection loudly
    import bench

    with pytest.raises(ValueError, match="no headline queries selected"):
        bench.run_headline(None, BENCH_SF_DIR, names=["not_a_query"])


def test_ratchet_excludes_retried_queries_and_totals():
    """ADVICE r13 #2: a query the guard re-measured holds a best-of-8-reps
    min — extra chances to park an artificially low pending-ratchet pin —
    so retried names (and the totals folding them in) never ratchet."""
    sys.path.insert(0, str(REPO / "tools"))
    import bench_guard

    pinned = {
        "sf": 0.1,
        "queries_min": {"q_a": 1.0, "q_b": 1.0},
        "queries_median": {"q_a": 1.0, "q_b": 1.0},
        "total_min": 2.0,
        "total_median": 2.0,
        "calib_sec": 0.2,
    }
    result = {
        "sf": 0.1,
        "queries_min": {"q_a": 0.5, "q_b": 0.5},
        "queries_median": {"q_a": 0.5, "q_b": 0.5},
        "value_min": 1.0,
        "value_median": 1.0,
        "calib_sec": 0.2,
        "retried": ["q_a"],
    }
    changed = bench_guard.maybe_ratchet(result, pinned)
    joined = "; ".join(changed)
    assert "q_b[min]" in joined and "q_a[" not in joined
    # totals include the retried value -> no total ratchet this run
    assert "total[" not in joined
    # pins themselves untouched until a second sighting
    assert pinned["queries_min"] == {"q_a": 1.0, "q_b": 1.0}

    # without a retry the same run ratchets q_a and the totals as before
    pinned2 = {
        "sf": 0.1,
        "queries_min": {"q_a": 1.0},
        "queries_median": {"q_a": 1.0},
        "total_min": 2.0,
        "total_median": 2.0,
        "calib_sec": 0.2,
    }
    clean = {k: v for k, v in result.items() if k != "retried"}
    joined2 = "; ".join(bench_guard.maybe_ratchet(clean, pinned2))
    assert "q_a[min]" in joined2 and "total[min]" in joined2


def test_retry_path_cannot_reach_cli_emitted_json():
    """VERDICT r13 #10: the guard's retry merge must never migrate into the
    numbers bench.py's CLI prints.  bench.main prints the raw run_headline
    result; neither it nor run_headline may contain retry/merge logic —
    the retry lives only in tools/bench_guard.main, downstream of the CLI."""
    import inspect

    import bench

    main_src = inspect.getsource(bench.main)
    assert "run_headline(spark, sf_dir)" in main_src
    assert "json.dumps" in main_src
    for forbidden in ("retry", "check_result", "queries_min["):
        assert forbidden not in main_src
    # bench.py never imports guard code at all: the retry merge is
    # syntactically unreachable from the CLI
    bench_src = inspect.getsource(bench)
    assert "import bench_guard" not in bench_src
    assert "from tools" not in bench_src
    assert "check_result" not in bench_src


@pytest.mark.skipif(
    not Path(BENCH_SF_DIR).exists(), reason="sf0.1 testdata not generated"
)
def test_bench_result_echoes_effective_parallelism(spark):
    """PERF_r13 flagged ``suspect_cpus_ignored`` because the bench JSON never
    reported the master / parallelism the session actually ran with —
    at sf0.1 every headline query is overhead-bound, so an 8-vs-32-core
    probe reads ~1.0 either way.  The additive echo keys give the driver
    ground truth; they must reflect the live session, not the env wish."""
    import bench

    result = bench.run_headline(
        spark, BENCH_SF_DIR, reps=1, names=["q_date_parts"], calibrate=False
    )
    sc = spark.sparkContext
    assert result["master"] == sc.master
    assert result["default_parallelism"] == sc.defaultParallelism
    assert result["shuffle_partitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert result["calib_sec"] is None  # calibrate=False (guard retry path)
    # the driver-facing keys are untouched (additive-only contract)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in result


@pytest.mark.skipif(
    not (REPO / "CATALOG_PINNED.json").exists()
    or not Path(BENCH_SF_DIR).exists(),
    reason="catalog pins or sf0.1 testdata not present",
)
def test_catalog_tail_within_pinned_envelope():
    """VERDICT r13 #7: the headline guard protected 17 queries; the r13
    class of tail win (q_lsh_topk 14.6s -> 0.72s) had no ratchet and could
    regress silently until the next manual sweep.  tools/catalog_guard.py
    pins the expensive tail's warm minimums under the same calibrated
    envelope (bench_guard.check_result); this runs it end-to-end."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "catalog_guard.py")],
        capture_output=True,
        text=True,
        timeout=1800,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": BENCH_SF_DIR},
        cwd=str(REPO),
    )
    report = proc.stdout.strip().splitlines()
    assert proc.returncode == 0, "\n".join(
        ln for ln in report if ln.startswith("FAIL")
    ) or proc.stderr[-2000:]
    assert any(ln.startswith("ok    total") for ln in report), report
