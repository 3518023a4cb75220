"""Streaming incremental-view-maintenance pipeline, end to end:

    custom Python streaming source (jsonl landing zone, offset-replayable)
      -> foreachBatch merge into a versioned feature table
        -> materialized-view refresh off the table's change feed
          -> incremental JDBC publish of the view state to an online store

with a RESTART mid-stream proving the composition's delivery guarantees:
the source replays from checkpointed offsets, the merge is idempotent by
primary key, the MV refresh is exactly-once by construction (the applied-
source-version marker publishes atomically with the state snapshot), and
the incremental JDBC publish is at-least-once with an idempotent
delete-then-insert upsert — so every stage converges even if any batch is
retried.

Run:  python examples/streaming_ivm_demo.py  [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = __file__.rsplit("/examples/", 1)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    DoubleType, IntegerType, StructField, StructType,
)

from databricks_feature_store_flight_school_spark.featurestore import (  # noqa: E402
    FeatureStoreClient,
)
from databricks_feature_store_flight_school_spark.sources.pydatasource import (  # noqa: E402
    JsonlDocsDataSource,
)
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402

JDBC_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def land(landing: str, name: str, orders: list[tuple[int, int, float]]) -> None:
    """Drop one jsonl file into the landing zone: each line is a raw order
    event (order_id as doc_id, payload as the text column) — the
    'documents' schema of the custom source carrying arbitrary JSON."""
    with open(os.path.join(landing, name), "w", encoding="utf-8") as fh:
        for order_id, cust, amount in orders:
            fh.write(json.dumps({
                "doc_id": order_id,
                "text": json.dumps({"cust": cust, "amount": amount}),
                "source": "orders",
            }) + "\n")


def run_stream(spark, fs: FeatureStoreClient, landing: str, checkpoint: str,
               jdbc_url: str) -> None:
    """One availableNow pass over whatever the landing zone holds that the
    checkpoint has not seen yet; each micro-batch runs the full
    merge -> refresh -> publish chain."""

    def process(batch_df, batch_id: int) -> None:
        parsed = batch_df.select(
            F.col("doc_id").alias("order_id"),
            F.from_json("text", "cust INT, amount DOUBLE").alias("o"),
        ).select("order_id", "o.cust", "o.amount")
        # idempotent by key: a replayed batch merges the same post-images.
        # (Within one batch the landing files carry distinct order_ids; a
        # source with intra-batch key churn would dedupe here first.)
        fs.write_table("orders_live", parsed, mode="merge")
        fs.refresh_materialized_view("cust_stats")
        fs.publish_table(
            "cust_stats", jdbc_url, table="cust_stats_online",
            mode="incremental", properties=JDBC_PROPS,
        )

    (
        spark.readStream.format("jsonl_docs")
        .option("path", landing)
        .load()
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def check_view(spark, fs: FeatureStoreClient, jdbc_url: str) -> None:
    """The invariants: maintained view == from-scratch recompute of the
    base's final state, and the online mirror == the view state."""
    got = {
        r["cust"]: (r["total"], r["n_orders"], round(r["avg_amount"], 9))
        for r in fs.read_materialized_view("cust_stats").collect()
    }
    want = {
        r["cust"]: (r["total"], r["n_orders"], round(r["avg_amount"], 9))
        for r in fs.read_table("orders_live").groupBy("cust").agg(
            F.sum("amount").alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("amount").alias("avg_amount"),
        ).collect()
    }
    assert got == want, (got, want)
    online = (
        spark.read.format("jdbc").option("url", jdbc_url)
        .option("dbtable", "cust_stats_online")
        .option("driver", JDBC_PROPS["driver"])
        .load()
    )
    mirror = {r["cust"]: r["_n_rows"] for r in online.collect()}
    state = {r["cust"]: r["_n_rows"] for r in fs.read_table("cust_stats").collect()}
    assert mirror == state, (mirror, state)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sivm_")
    landing = os.path.join(workdir, "landing")
    checkpoint = os.path.join(workdir, "checkpoint")
    os.makedirs(landing, exist_ok=True)
    jdbc_url = f"jdbc:derby:{workdir}/online_db;create=true"

    spark = get_spark(app_name="streaming-ivm-demo", shuffle_partitions=4)
    spark.dataSource.register(JsonlDocsDataSource)
    fs = FeatureStoreClient(spark, os.path.join(workdir, "warehouse"))

    fs.create_feature_table(
        "orders_live", keys="order_id",
        schema=StructType([
            StructField("order_id", IntegerType()),
            StructField("cust", IntegerType()),
            StructField("amount", DoubleType()),
        ]),
    )
    fs.create_materialized_view(
        "cust_stats", "orders_live", "cust",
        {
            "total": ("sum", "amount"),
            "n_orders": ("count", "*"),
            "avg_amount": ("avg", "amount"),
            "sd_amount": ("stddev_samp", "amount"),
        },
    )

    # -- phase 1: two files land, stream consumes them ----------------------
    land(landing, "batch-001.jsonl", [(1, 0, 10.0), (2, 1, 20.0), (3, 0, 30.0)])
    land(landing, "batch-002.jsonl", [(4, 1, 40.0), (5, 2, 50.0)])
    run_stream(spark, fs, landing, checkpoint, jdbc_url)
    check_view(spark, fs, jdbc_url)
    print("phase 1 (bootstrap):")
    fs.read_materialized_view("cust_stats").orderBy("cust").show()

    # -- phase 2: RESTART — more files landed while the stream was down -----
    # batch-003 re-prices order 2 and MOVES order 3 to cust 2; batch-004
    # inserts order 6.  The restarted query resumes from the checkpoint, so
    # only the new files replay; every stage re-converges.
    land(landing, "batch-003.jsonl", [(2, 1, 25.0), (3, 2, 30.0)])
    land(landing, "batch-004.jsonl", [(6, 0, 60.0)])
    run_stream(spark, fs, landing, checkpoint, jdbc_url)
    check_view(spark, fs, jdbc_url)
    print("phase 2 (after restart + group-moving updates):")
    fs.read_materialized_view("cust_stats").orderBy("cust").show()

    # -- phase 3: an out-of-band DELETE rides the same change feed ----------
    # (GDPR-style erasure issued directly against the table, not the stream:
    # the MV and the online mirror still converge because both consume the
    # table's change feed, not the stream.)
    fs.delete_from_table(
        "orders_live",
        spark.createDataFrame([(5,)], "order_id INT"),
    )
    fs.refresh_materialized_view("cust_stats")
    fs.publish_table(
        "cust_stats", jdbc_url, table="cust_stats_online",
        mode="incremental", properties=JDBC_PROPS,
    )
    check_view(spark, fs, jdbc_url)
    print("phase 3 (after the delete of order 5):")
    fs.read_materialized_view("cust_stats").orderBy("cust").show()

    # caught-up: refresh and publish are version no-ops
    v = fs.get_feature_table("cust_stats").current_version
    fs.refresh_materialized_view("cust_stats")
    fs.publish_table(
        "cust_stats", jdbc_url, table="cust_stats_online",
        mode="incremental", properties=JDBC_PROPS,
    )
    assert fs.get_feature_table("cust_stats").current_version == v
    print("OK")


if __name__ == "__main__":
    main()
