"""Continuous-ingestion dedup walkthrough (operators/dedup.py +
operators/dedup_store.py): bootstrap a persisted bucketed dedup index, run
increments against it with the maintained hot-bucket guard, append each
increment's admissions (layout-preserving), watch the consistency guard
catch a stale band-key table, and compact (OPTIMIZE analog).

Run:  python examples/ingestion_loop_demo.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = __file__.rsplit("/examples/", 1)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from databricks_feature_store_flight_school_spark.operators import (  # noqa: E402
    append_dedup_increment,
    bootstrap_dedup_store,
    build_dedup_index,
    compact_dedup_index,
    drop_published,
    incremental_dedup,
    index_band_keys,
)
from databricks_feature_store_flight_school_spark.operators.skew import (  # noqa: E402
    bucketed_table,
    write_bucketed,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="ingestion-loop-demo", shuffle_partitions=4)
    pid = os.getpid()
    idx_t, bnd_t, hot_t, cnt_t = (
        f"ing{pid}_index", f"ing{pid}_bands", f"ing{pid}_hot", f"ing{pid}_counts"
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    slices = [docs.where(F.col("doc_id") % 3 == j) for j in (1, 2)]
    # synthetic ids (replays, the stale-row demo) must sit ABOVE every real
    # doc_id at ANY sf_dir this demo is pointed at — a fixed 1e6 offset
    # collides with real ids from sf30 up (1.5M docs); derive it instead
    # (one scalar collect; this is a walkthrough, not an operator)
    id_base = docs.agg(F.max("doc_id")).first()[0] + 1

    # 1. bootstrap: index bucketed by content_hash, band keys by
    #    (band, bucket); bootstrap_dedup_store then builds the hot-bucket
    #    and (band,bucket)-counts side tables and stamps the persisted
    #    stats that make every later append INCREMENT-SIZED (no append job
    #    ever scans the index or band-key tables again)
    write_bucketed(
        build_dedup_index(corpus, "doc_id", "text"), idx_t, "content_hash",
        num_buckets=4,
    )
    write_bucketed(
        index_band_keys(bucketed_table(spark, idx_t), "doc_id", bands=16),
        bnd_t, ["band", "bucket"], num_buckets=4,
    )
    bootstrap_dedup_store(spark, idx_t, bnd_t, hot_table=hot_t, counts_table=cnt_t)
    print("bootstrap index docs:", spark.table(idx_t).count())

    # 2. the loop: dedup each increment against the persisted tables
    #    (replays of the PREVIOUS increment's admissions must be caught —
    #    that's what the per-append band-key maintenance buys)
    prev = corpus
    for step, fresh in enumerate(slices, start=1):
        replays = prev.limit(5).select(
            (F.col("doc_id") + id_base * step).alias("doc_id"), "text"
        )
        increment = fresh.unionAll(replays)
        accepted, acc_index = incremental_dedup(
            increment,
            bucketed_table(spark, idx_t),
            "doc_id",
            "text",
            threshold=0.7,
            index_bands=bucketed_table(spark, bnd_t),
            index_hot_buckets=spark.table(hot_t),
        )
        n = accepted.count()
        n_replays_escaped = accepted.where(F.col("doc_id") >= id_base).count()
        assert n_replays_escaped == 0, "a replay of an admitted doc escaped"
        append_dedup_increment(
            spark, idx_t, bnd_t, acc_index, hot_table=hot_t, counts_table=cnt_t
        )
        print(f"step {step}: accepted {n}, index now {spark.table(idx_t).count()}")
        prev = fresh

    # 3. the guard: append index rows WITHOUT their band keys -> the next
    #    increment refuses to run against the stale band table
    stale_id = id_base * 100
    build_dedup_index(
        spark.createDataFrame([(stale_id, "lone stale row demo")],
                              "doc_id long, text string"),
        "doc_id", "text",
    ).write.mode("append").bucketBy(4, "content_hash").format(
        "parquet"
    ).saveAsTable(idx_t)
    try:
        incremental_dedup(
            docs.limit(1), bucketed_table(spark, idx_t), "doc_id", "text",
            threshold=0.7, index_bands=bucketed_table(spark, bnd_t),
            verify_index_bands=True,
        )
        raise AssertionError("stale band table not detected")
    except ValueError as exc:
        print("stale band table caught:", str(exc).split(" — ")[0])

    # repair: append the missing band keys (what append_dedup_increment
    # would have done) — compaction verifies consistency and would
    # otherwise refuse to bless the stale pair
    index_band_keys(
        bucketed_table(spark, idx_t).where(F.col("doc_id") == stale_id),
        "doc_id", bands=16,
    ).write.mode("append").bucketBy(4, "band", "bucket").format(
        "parquet"
    ).saveAsTable(bnd_t)

    # 4. compaction: K appends left K files per bucket; restore one each.
    #    Every swap (and the per-append hot refresh above) publishes
    #    atomically via view indirection — a concurrent reader never sees
    #    a missing table.
    stats = compact_dedup_index(
        spark, idx_t, bnd_t, hot_table=hot_t, counts_table=cnt_t
    )
    print("compaction files:", stats["files_before"], "->", stats["files_after"])

    for t in (idx_t, bnd_t, hot_t, cnt_t):
        drop_published(spark, t)
    print("OK")


if __name__ == "__main__":
    main()
