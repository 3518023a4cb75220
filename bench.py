"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The metric is total wall-clock over the headline set; per-query seconds are
reported individually.  Each query is forced with a write to the ``noop``
sink: unlike count() (which lets Catalyst prune projected expressions and
under-measure narrow maps), noop executes the full plan — every expression,
join, and shuffle — while paying zero sink cost.

Cross-round comparability note: the driver regenerates /root/testdata between
rounds.  Since round 4 the parquet files ship as a SINGLE row group per
table, and parquet is only splittable at row-group granularity — so every
scan is one task regardless of spark.sql.files.maxPartitionBytes, putting a
serial ~0.4 s floor (warm) under each lineitem-reading query that multi-
row-group data did not have.  Round-over-round totals should be read with
that layout shift (and single-tenant host noise) in mind; the per-query
seconds are the comparable signal.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402

#: headline queries: one per major operator family (join+agg, wide agg,
#: top-k, window, horizontal, dates, semi-join, text, dedup, fingerprint,
#: vectors, events, multimodal)
HEADLINE = [
    "q_flagship_regional_revenue",
    "q_pricing_summary",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_window_topn_per_customer",
    "q_horizontal_countif",
    "q_date_parts",
    "q_semi_join",
    "q_returned_item_customers",
    "q_large_volume_orders",
    "q_text_stats",
    "q_doc_fingerprint",
    "q_content_hash_dedup",
    "q_cosine_topk",
    "q_tumbling_window",
    "q_user_event_stats",
    "q_image_decode",
]


def _force(df) -> None:
    """Execute the FULL plan (noop sink); fall back to count() if the noop
    source is unavailable on this build."""
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def host_calibration(spark, reps: int = 5) -> float:
    """Median seconds of a fixed CPU-bound Spark job — a host-speed probe.

    The job (xxhash64 over a 300M-row range, 32 partitions, one partial+final
    agg) exercises exactly what makes the headline queries slow on a slow
    host — whole-stage-codegen throughput and task scheduling — with zero
    I/O, zero data dependence, and no plan that any engine change would
    alter.  The regression guard divides a fresh calibration by the pinned
    one to tell "this HOST is slower" (every query and the probe slow down
    together) from "this PLAN regressed" (one query slows down, the probe
    does not).  Run AFTER the headline loop so it measures a warm JVM and
    never perturbs the round-over-round first-run metric."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(reps):
        # perf_counter, same clock as the headline loop: the probe's median
        # feeds the guard's host factor, so it must not mix a coarser,
        # NTP-adjustable wall clock into the ratio
        t0 = time.perf_counter()
        (
            spark.range(0, 300_000_000, 1, 32)
            .select((F.xxhash64("id") % 1_000_000).alias("h"))
            .agg(F.sum("h"))
            .write.format("noop").mode("overwrite").save()
        )
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[reps // 2], 3)


def run_headline(
    spark, sf_dir: str, reps: int = 3, warmup: bool = False,
    names: list[str] | None = None, calibrate: bool = True,
) -> dict:
    """Run the headline set in an already-warm session and return the bench
    result dict (same shape as the JSON line ``main`` prints).  Shared by
    the CLI and the regression guard (tools/bench_guard.py).

    ``names`` restricts the run to a subset of HEADLINE (the guard's
    retry-on-failure re-measures just the failing queries); the CLI always
    runs the full set.  ``calibrate=False`` skips the host-calibration probe
    (the guard's retry discards it anyway — ADVICE r13 #4); the CLI always
    calibrates.

    ``warmup=True`` executes every headline query once UNTIMED before the
    timed reps, flushing whole-stage-codegen compilation and JIT out of the
    measurement: the first queries of a fresh JVM otherwise pay multi-second
    warm-up that lands in their medians (the round-8 guard measured the
    first query at 2.3x its steady state from this alone).  The guard warms
    up (its pin describes steady-state capability); the CLI does not (its
    first-run total stays comparable with earlier rounds' cold numbers)."""
    sf = Path(sf_dir).name.replace("sf", "")
    qmap = catalog.query_map()
    wanted = HEADLINE if names is None else [n for n in HEADLINE if n in names]
    names = [n for n in wanted if n in qmap]
    if not names:
        # e.g. a guard retry whose failure list held only __total__ or a
        # pinned-but-absent name — nothing to measure, and qmap[names[0]]
        # below would otherwise raise an opaque IndexError (ADVICE r13 #1)
        raise ValueError("run_headline: no headline queries selected")

    # warm the JVM + parquet footers once, outside timing
    _force(qmap[names[0]](spark, sf_dir))
    # warm the Python worker pool once, outside timing: the first pandas-UDF
    # stage of a session pays worker spawn + numpy/pandas import (~2s); a
    # long-lived cluster's workers are resident (spark.python.worker.reuse),
    # so steady-state is what the multimodal queries should measure.
    spark.range(2).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # reps per query within one warm session; the FIRST rep keeps the
    # metric comparable with earlier rounds, the per-query MEDIAN is the
    # de-noised signal (single-tenant host noise + the single-row-group scan
    # floor dominate round-over-round first-run deltas)
    per_query: dict[str, float] = {}
    per_query_median: dict[str, float] = {}
    per_query_min: dict[str, float] = {}
    total = 0.0
    if warmup:
        for name in names:
            _force(qmap[name](spark, sf_dir))
    for name in names:
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(qmap[name](spark, sf_dir))
            times.append(time.perf_counter() - t0)
        per_query[name] = round(times[0], 3)
        per_query_median[name] = round(sorted(times)[reps // 2], 3)
        # min = capability: shared-host noise only ADDS time to a rep, so
        # the best rep is the least-contaminated measurement of the plan
        # itself — a real plan regression (extra shuffle, lost broadcast,
        # UDF fallback) raises the minimum too.  The regression guard
        # compares mins; the median stays for cross-round reporting.
        per_query_min[name] = round(min(times), 3)
        total += times[0]

    sc = spark.sparkContext
    return {
        "metric": "headline_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "queries_median": per_query_median,
        "queries_min": per_query_min,
        "value_median": round(sum(per_query_median.values()), 3),
        "value_min": round(sum(per_query_min.values()), 3),
        "reps": reps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib_sec": host_calibration(spark) if calibrate else None,
        # Effective-parallelism echo (additive keys, round 14): the driver's
        # low-core scaling probe could not distinguish "SPARK_GRAFT_CPUS
        # honored but the queries are overhead-bound at this SF" from
        # "ignored" (PERF_r13 flagged suspect_cpus_ignored) — these report
        # the ground truth the session actually ran with.
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "env_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    print(json.dumps(run_headline(spark, sf_dir)))


if __name__ == "__main__":
    main()
