"""AQE skew-join evidence (VERDICT r9 #5): measure Spark's runtime skew
split actually firing on a deliberately skewed join key at scale, against
the engine's pre-planned `salted_join` fallback — so SCALING.md's "AQE
handles residual skew" claim carries a committed measurement instead of a
conf name.

Workload: lineitem at the given SF with a zipf-ish derived key — 95% of
rows share key 0, the rest spread over 1..999 — joined to a 1000-row dim.
Broadcast is disabled so the join is a shuffled sort-merge join, the shape
AQE's OptimizeSkewedJoin targets (a broadcast would dodge the skew rather
than split it, which is of course the FIRST fix when the dim side is
small; this demo measures the case where it isn't available).

Three runs, same plan shape:

- ``aqe_skew``   — AQE on, skewJoin on (engine defaults): the hot
  partition splits into advisory-sized chunks at runtime; the executed
  plan's SortMergeJoin prints ``skew=true`` (asserted).
- ``no_skew``    — AQE on, skewJoin OFF: one task carries 95% of the
  fact side; wall = straggler time.
- ``salted``     — ``operators/skew.salted_join`` with the measured-
  profile auto factor: the pre-shuffle fix that also works where AQE's
  cannot (non-SMJ plans, aggregation-before-join shapes).

Usage:  python tools/skew_aqe_demo.py [SF_DIR] [OUT_JSON]
Prints one JSON line; the committed run (sf10) lands in SKEW_AQE.json and
its numbers in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.operators.skew import (  # noqa: E402
    auto_salted_join,
    key_skew_profile,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import load_table  # noqa: E402


def skewed_sides(spark, sf_dir: str):
    """(fact, dim): lineitem with 95% of rows on key 0, and a 1000-key dim."""
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 20 != 0, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(1000)))
        .cast("bigint")
        .alias("k"),
        "l_quantity",
        "l_extendedprice",
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 0.001).alias("rate")
    )
    return fact, dim


def run_once(fact, dim, how: str) -> tuple[float, str]:
    """One timed join+aggregate; returns (seconds, executed-plan text)."""
    if how == "salted":
        joined = auto_salted_join(fact, dim, "k")
    else:
        joined = fact.join(dim, "k")
    out = joined.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_extendedprice") * (1 + F.col("rate"))).alias("adj"),
    )
    t0 = time.perf_counter()
    row = out.collect()[0]
    sec = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert row["rows"] > 0
    return sec, plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="skew-aqe-demo")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact, dim = skewed_sides(spark, sf_dir)
        profile = key_skew_profile(fact, "k")

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        run_once(fact, dim, "plain")  # codegen/JIT warmup, untimed
        aqe_sec, aqe_plan = run_once(fact, dim, "plain")
        skew_fired = "skew=true" in aqe_plan

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        no_skew_sec, _ = run_once(fact, dim, "plain")
        salted_sec, _ = run_once(fact, dim, "salted")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        result = {
            "sf_dir": sf_dir,
            "fact_rows": profile["n_rows"],
            "hot_key_rows": profile["max_rows"],
            "skew_ratio": round(profile["skew_ratio"], 1),
            "aqe_skew_fired": skew_fired,
            "aqe_skew_sec": round(aqe_sec, 2),
            "no_skew_sec": round(no_skew_sec, 2),
            "salted_sec": round(salted_sec, 2),
        }
        print(json.dumps(result))
        if out_json:
            Path(out_json).write_text(json.dumps(result, indent=2) + "\n")
        if not skew_fired:
            raise SystemExit(
                "AQE skew split did NOT fire — partition below "
                "skewedPartitionThresholdInBytes at this SF?"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


if __name__ == "__main__":
    main()
