"""Catalog-TAIL regression guard (r14, VERDICT r13 #7): the pin/ratchet
mechanism protected only the 17 headline queries, so a silent regression of
an optimized tail query (the r13 q_lsh_topk 14.6s -> 0.72s class of win)
would not fail anything until the next manual sweep.  This pins the
expensive tail's best-of-reps minimums in CATALOG_PINNED.json and compares a
fresh warm run against the same calibrated envelope as the headline guard
(bench_guard.check_result: max(2x pin, pin + 0.5s) x host factor, capped).

Differences from the headline guard, both deliberate:

- **No automatic ratchet.**  Tail queries are lifecycle-heavy (feature-store
  warehouse writes, iterative supersteps) and noisier than the headline
  scans; the pin only moves on an explicit ``--repin`` on a quiet host.
- **Warm minimums only.**  Every query gets one untimed warmup pass first
  (same rationale as the headline guard's warm pass): the pin describes
  steady-state capability, not JIT warm-up order.

Usage:
    python tools/catalog_guard.py            # check against pins
    python tools/catalog_guard.py --repin    # re-pin (quiet host only)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

PINNED_FILE = REPO / "CATALOG_PINNED.json"


def run_tail(spark, sf_dir: str, names: list[str], reps: int = 3) -> dict:
    """Warm best-of-reps minimums for ``names`` — the bench_catalog
    methodology (noop sink, per-query build inside the timed region),
    returned in the bench_guard result shape so check_result applies."""
    from bench import host_calibration
    from databricks_feature_store_flight_school_spark.plans import catalog

    qmap = catalog.query_map()
    names = [n for n in names if n in qmap]

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm JVM + python worker pool, then one untimed pass per query
    spark.range(2).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in names:
        _force(qmap[name](spark, sf_dir))

    mins: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"catalog_guard:{name}")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(qmap[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        mins[name] = round(min(times), 3)
        spark.sparkContext.setJobDescription(None)
    sf = Path(sf_dir).name.replace("sf", "")
    return {
        "queries_min": mins,
        "value_min": round(sum(mins.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
        "calib_sec": host_calibration(spark, reps=3),
    }


def main() -> int:
    import os

    import bench_guard
    from databricks_feature_store_flight_school_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pinned = json.loads(PINNED_FILE.read_text())
    spark = get_spark(app_name="catalog-guard")
    result = run_tail(spark, sf_dir, list(pinned["queries_min"]))
    if "--repin" in sys.argv:
        pinned["queries_min"] = result["queries_min"]
        pinned["total_min"] = result["value_min"]
        pinned["sf"] = result["sf"]
        pinned["calib_sec"] = result["calib_sec"]
        PINNED_FILE.write_text(json.dumps(pinned, indent=2) + "\n")
        print(f"re-pinned {PINNED_FILE} at total min {result['value_min']}s")
        return 0
    # same calibrated envelope as the headline guard; the pinned dict
    # carries only min-stat keys, so check_result compares mins
    failures, lines = bench_guard.check_result(result, pinned)
    retry_names = bench_guard.retryable_failures(failures, result)
    if retry_names:
        # same measurement-retry rationale as the headline guard: a
        # sustained host spike on one query's reps contaminates its min;
        # a real plan regression reproduces
        retry = run_tail(spark, sf_dir, retry_names)
        for name, got in retry["queries_min"].items():
            if got < result["queries_min"].get(name, float("inf")):
                result["queries_min"][name] = got
        result["value_min"] = round(sum(result["queries_min"].values()), 3)
        failures, lines = bench_guard.check_result(result, pinned)
        lines.insert(0, f"retry: re-measured {len(retry_names)} failing tail quer"
                        f"{'y' if len(retry_names) == 1 else 'ies'}")
    print("\n".join(lines))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
