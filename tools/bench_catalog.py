"""Time EVERY catalog query (Spark side only) with the noop sink.

Triage tool for optimization rounds: the headline bench (bench.py) covers 17
queries; this sweeps all ~222 so the slow tail is visible.  Each query is
built then forced sequentially (the feature-store queries' temp-warehouse
contract), timed over ``--reps`` reps in one warm session; output is one JSON
line per query on stdout (name, min, median, first) sorted slowest-first at
the end, plus a total.

Usage:
    python tools/bench_catalog.py [SF_DIR] [--reps N] [--match SUBSTR]
        [--names q_a,q_b,...] [--warmup]

``--warmup`` executes every selected query once UNTIMED before the timed
reps (codegen/JIT flush — same rationale as bench_guard's warm pass);
without it, early-alphabet queries absorb the session's warmup and rank
spuriously slow.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    match = None
    only: list[str] | None = None
    warmup = False
    sf_dir = "/root/testdata/sf0.1"
    i = 0
    pos: list[str] = []
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--match":
            match = args[i + 1]; i += 2
        elif args[i] == "--names":
            only = args[i + 1].split(","); i += 2
        elif args[i] == "--warmup":
            warmup = True; i += 1
        else:
            pos.append(args[i]); i += 1
    if pos:
        sf_dir = pos[0]

    spark = get_spark(app_name="bench_catalog")
    qmap = catalog.query_map()
    if only is not None:
        names = [n for n in only if n in qmap]
    else:
        names = sorted(n for n in qmap if match is None or match in n)

    # warm JVM + python worker pool once, untimed
    spark.range(2).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    if warmup:
        for name in names:
            try:
                _force(qmap[name](spark, sf_dir))
            except Exception:
                pass

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        times = []
        err = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                _force(qmap[name](spark, sf_dir))
            except Exception as e:  # guard raises (by design at scale) etc.
                err = f"{type(e).__name__}: {e}"[:200]
                break
            times.append(round(time.perf_counter() - t0, 3))
        if err:
            results[name] = {"err": err}
            print(json.dumps({"name": name, "err": err}), flush=True)
        else:
            rec = {
                "first": times[0],
                "min": min(times),
                "median": sorted(times)[len(times) // 2],
            }
            results[name] = rec
            print(json.dumps({"name": name, **rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    from bench import host_calibration

    calib = host_calibration(spark, reps=3)
    timed = {k: v for k, v in results.items() if "min" in v}
    ranked = sorted(timed.items(), key=lambda kv: -kv[1]["min"])
    print("\n== slowest by min ==", file=sys.stderr)
    for name, rec in ranked[:40]:
        print(f"{rec['min']:8.3f}s  {name}", file=sys.stderr)
    total = round(sum(v["min"] for v in timed.values()), 3)
    print(json.dumps({"total_min_sec": total, "n": len(timed),
                      "errors": [k for k, v in results.items() if "err" in v],
                      "sf_dir": sf_dir, "reps": reps, "calib_sec": calib}))


if __name__ == "__main__":
    main()
