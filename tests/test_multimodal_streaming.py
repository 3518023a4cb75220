"""Multimodal binary plumbing + Structured Streaming equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from databricks_feature_store_flight_school_spark.multimodal import (
    FEATURE_DIM,
    attach_media_meta,
    decode_image_batch,
    extract_features,
    frame_sample,
)
from databricks_feature_store_flight_school_spark.operators import tumbling_window_agg
from databricks_feature_store_flight_school_spark.sources import load_table
from databricks_feature_store_flight_school_spark.streaming import (
    read_event_stream,
    run_stream_to_memory,
    streaming_window_counts,
)


def _media_df(spark):
    # synthesise binary payloads from document text (no codec libs in env)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    return docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))


def test_attach_media_meta(spark):
    df = attach_media_meta(_media_df(spark), "blob", "image")
    row = df.select("media_meta.*").first()
    assert row["media_type"] == "image"
    assert row["byte_size"] > 0
    assert len(row["checksum"]) == 64
    assert [f.name for f in df.schema["media_meta"].dataType.fields] == [
        "media_type", "byte_size", "checksum",
    ]


def test_decode_batch_schema_and_determinism(spark):
    df = _media_df(spark)
    out1 = {r["doc_id"]: r for r in decode_image_batch(df, "doc_id", "blob").collect()}
    out2 = {r["doc_id"]: r for r in decode_image_batch(df, "doc_id", "blob").collect()}
    assert len(out1) == 20
    for doc_id, r in out1.items():
        assert r["width"] >= 16 and r["height"] >= 16 and r["mode"] in ("RGB", "L")
        assert r["byte_size"] > 0
        # deterministic fake: identical across runs
        assert tuple(r) == tuple(out2[doc_id])


def test_extract_features_shape(spark):
    out = extract_features(_media_df(spark), "doc_id", "blob").collect()
    assert len(out) == 20
    vec = [float(x) for x in out[0]["feature"].split(",")]
    assert len(vec) == FEATURE_DIM
    assert abs(sum(vec) - 1.0) < 1e-3  # normalised histogram


def test_frame_sample_explodes(spark):
    out = frame_sample(_media_df(spark), "doc_id", "blob", frame_size=64, stride=2).collect()
    assert len(out) > 20  # fan-out happened
    assert all(len(r["frame_bytes"]) <= 64 for r in out)
    assert all(r["frame_index"] % 2 == 0 for r in out)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    """The streaming window agg over the bounded replay must equal the batch
    window agg — same expressions, same data (batch-first contract)."""
    stream = read_event_stream(spark, sf_dir)
    agg = streaming_window_counts(stream, "1 hour", watermark="100 hours")
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["event_count"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = tumbling_window_agg(
        ev, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("event_count"), F.round(F.sum("value"), 2).alias("total_value")],
    )
    want = {
        (r["window_start"], r["event_type"]): (r["event_count"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


def test_stateful_user_stats_equals_batch(spark, sf_dir):
    """applyInPandasWithState running per-user stats: the last update per
    user after the bounded replay must equal the batch groupBy."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        stateful_user_stats,
    )

    stream = read_event_stream(spark, sf_dir)
    stats = stateful_user_stats(stream, watermark="100 hours")
    run_stream_to_memory(stats, "user_stats", output_mode="update")
    got = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in spark.sql("SELECT * FROM user_stats").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert len(got) > 0
    assert got == want


def test_user_stats_agg_jvm_equals_stateful_shape(spark, sf_dir):
    """The JVM agg-composition twin (user_stats_agg_jvm) must produce the
    identical per-user stats as the applyInPandasWithState shape — same
    schema, same values — so choosing the ~16x-faster JVM state path
    (STREAM_THROUGHPUT.json) is a pure implementation swap whenever the
    state is expressible as aggregates."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        USER_STATS_SCHEMA,
        read_event_stream,
        run_stream_to_memory,
        user_stats_agg_jvm,
    )

    stream = read_event_stream(spark, sf_dir)
    stats = user_stats_agg_jvm(stream, watermark="100 hours")
    assert [f.name for f in stats.schema.fields] == [
        c.split()[0] for c in USER_STATS_SCHEMA.split(", ")
    ]
    run_stream_to_memory(stats, "user_stats_jvm", output_mode="update")
    got = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in spark.sql("SELECT * FROM user_stats_jvm").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert len(got) > 0
    assert got == want


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """Session windows through the streaming engine over the bounded replay
    must match the batch session_window_agg (same merge semantics)."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        streaming_session_counts,
    )
    from databricks_feature_store_flight_school_spark.operators import session_window_agg

    stream = read_event_stream(spark, sf_dir)
    agg = streaming_session_counts(stream, gap="10 minutes", watermark="100 hours")
    run_stream_to_memory(agg, "sess_counts", output_mode="complete")
    got = {
        (r["session_start"], r["user_id"]): r["event_count"]
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = session_window_agg(
        ev, "ts", "10 minutes", ["user_id"], [F.count(F.lit(1)).alias("event_count")]
    )
    want = {
        (r["window_start"], r["user_id"]): r["event_count"] for r in batch.collect()
    }
    assert len(got) > 0
    assert got == want


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode with a short watermark must finalise (emit) only windows
    the watermark has passed — the state-bounding contract at scale."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    rows = [
        (dt.datetime(2024, 1, 1, 10, 0, 30), 1.0),
        (dt.datetime(2024, 1, 1, 10, 1, 30), 2.0),
        (dt.datetime(2024, 1, 1, 12, 0, 0), 9.0),  # advances the watermark far
    ]
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("value", DoubleType())]
    )
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.sum("value").alias("v"))
        .select(F.col("w.start").alias("start"), "v")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["start"]: r["v"] for r in spark.sql("SELECT * FROM wm_out").collect()}
    # the two 10:0x windows are final (watermark = 12:00 - 10min passed them);
    # the 12:00 window is still open -> NOT emitted in append mode
    assert got == {
        dt.datetime(2024, 1, 1, 10, 0): 1.0,
        dt.datetime(2024, 1, 1, 10, 1): 2.0,
    }


def test_stream_to_feature_table_converges_to_batch(spark, sf_dir, tmp_path):
    """foreachBatch merge ingestion: after the bounded replay, the feature
    table must equal the batch per-user aggregate (streaming continuation of
    compute_and_write)."""
    from databricks_feature_store_flight_school_spark.featurestore import (
        FeatureStoreClient,
    )
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        stream_to_feature_table,
    )

    client = FeatureStoreClient(spark, str(tmp_path / "stream_wh"))
    stream = read_event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "100 hours")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    client.create_feature_table("user_features", keys="user_id", schema=agg.schema)
    stream_to_feature_table(agg, client, "user_features")

    got = {
        r["user_id"]: (r["event_count"], r["total_value"])
        for r in client.read_table("user_features").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_count"], r["total_value"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert len(got) > 0
    assert got == want


def test_streaming_dedup_drops_replayed_events(spark, tmp_path):
    """Replaying the same events through a watermarked dropDuplicates yields
    each key once."""
    import datetime as dt

    from databricks_feature_store_flight_school_spark.streaming.stream import (
        streaming_dedup,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [StructField("event_id", LongType()), StructField("ts", TimestampType())]
    )
    rows = [(i, dt.datetime(2024, 1, 1, 10, i % 5)) for i in range(10)]
    # redelivery with a DIFFERENT timestamp (at-least-once redelivery shape):
    # state keys on event_id alone, so these must still dedup
    replay = [(i, ts + dt.timedelta(minutes=1)) for i, ts in rows]
    src = str(tmp_path / "dup_src")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    spark.createDataFrame(replay, schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_out").collect()]
    assert sorted(got) == list(range(10))  # each id exactly once


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join (purchase <- preceding clicks) must emit
    exactly the batch interval join's pairs."""
    from databricks_feature_store_flight_school_spark.plans.queries_events import (
        q_interval_join,
    )
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        streaming_interval_join,
    )

    ev = read_event_stream(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    joined = streaming_interval_join(
        p, c, key="user_id", left_ts="p_ts", right_ts="c_ts", lookback="30 minutes"
    )
    run_stream_to_memory(joined, "ssj_out", output_mode="append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT purchase_id, click_id FROM ssj_out").collect()
    }
    want = {
        (r["purchase_id"], r["click_id"])
        for r in q_interval_join(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_checkpoint_restart_recovers_state(spark, tmp_path):
    """Checkpointed restart: run 1 ingests file A; file A is then DELETED and
    file B added; run 2 (same checkpoint) must (a) not fail over the missing
    already-committed input, (b) resume the aggregation state, so final
    counts equal the batch aggregate over A+B even though run 2 could only
    ever read B.  Proves both offset tracking and state recovery — a fresh
    run 2 would produce B-only counts for every key."""
    import os

    from databricks_feature_store_flight_school_spark.featurestore import (
        FeatureStoreClient,
    )
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        stream_to_feature_table,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    client = FeatureStoreClient(spark, str(tmp_path / "wh"))

    batch_a = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "user_id long, value double"
    )
    batch_b = spark.createDataFrame(
        [(1, 1.0), (3, 2.0)], "user_id long, value double"
    )

    def run_once():
        stream = spark.readStream.schema("user_id long, value double").parquet(src)
        agg = stream.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        stream_to_feature_table(
            agg, client, "ckpt_features", checkpoint_dir=ckpt,
            query_name="ckpt_ingest",
        )

    os.makedirs(src, exist_ok=True)
    batch_a.toPandas().to_parquet(src + "/a.parquet")
    from pyspark.sql.types import StructType

    client.create_feature_table(
        "ckpt_features",
        keys="user_id",
        schema=StructType.fromDDL("user_id long, event_count long, total_value double"),
    )
    run_once()
    got1 = {
        r["user_id"]: (r["event_count"], r["total_value"])
        for r in client.read_table("ckpt_features").collect()
    }
    assert got1 == {1: (2, 15.0), 2: (1, 7.0)}

    os.remove(src + "/a.parquet")  # run 2 cannot re-read A; only the checkpoint knows it
    batch_b.toPandas().to_parquet(src + "/b.parquet")
    run_once()
    got2 = {
        r["user_id"]: (r["event_count"], r["total_value"])
        for r in client.read_table("ckpt_features").collect()
    }
    # state recovered: user 1 = A's 2 events + B's 1; user 2 untouched; user 3 new
    assert got2 == {1: (3, 16.0), 2: (1, 7.0), 3: (1, 2.0)}


def test_stateful_streaming_under_rocksdb_state_store(spark, sf_dir):
    """The OSS RocksDB state store provider (the 100 TB state backend: spills
    streaming state to local disk instead of pinning it in executor heap,
    changelog-checkpointable) must produce byte-identical results to the
    default HDFS-backed provider for our stateful shapes.  Runs the
    applyInPandasWithState per-user stats AND a windowed agg under RocksDB
    and checks both against their batch twins; also asserts via the query's
    state-operator custom metrics that RocksDB actually served the state
    (a silently ignored conf would pass parity while proving nothing).
    rocksdbjni ships inside pyspark's jars — no extra dependency."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        stateful_user_stats,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        progresses = []
        for name, agg, mode in [
            (
                "rocks_user_stats",
                stateful_user_stats(read_event_stream(spark, sf_dir), watermark="100 hours"),
                "update",
            ),
            (
                "rocks_win_counts",
                streaming_window_counts(
                    read_event_stream(spark, sf_dir), "1 hour", watermark="100 hours"
                ),
                "complete",
            ),
        ]:
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            progresses.append(q.lastProgress)

        got_stats = {
            r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
            for r in spark.sql("SELECT * FROM rocks_user_stats").collect()
        }
        got_win = {
            (r["window_start"], r["event_type"]): (r["event_count"], r["total_value"])
            for r in spark.sql("SELECT * FROM rocks_win_counts").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    # the state operators must report RocksDB-specific custom metrics —
    # proof the provider engaged rather than silently defaulting
    for prog in progresses:
        ops = prog["stateOperators"] if prog else []
        assert ops, prog
        metrics = ops[0].get("customMetrics", {})
        assert any(k.startswith("rocksdb") for k in metrics), metrics

    ev = load_table(spark, sf_dir, "events")
    want_stats = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    want_win = {
        (r["window_start"], r["event_type"]): (r["event_count"], r["total_value"])
        for r in tumbling_window_agg(
            ev, "ts", "1 hour", ["event_type"],
            [F.count(F.lit(1)).alias("event_count"), F.round(F.sum("value"), 2).alias("total_value")],
        ).collect()
    }
    assert len(got_stats) > 0 and got_stats == want_stats
    assert len(got_win) > 0 and got_win == want_win


def test_transform_with_state_equals_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 typed-state API, RocksDB store):
    the last update per user must equal the batch groupBy — same contract
    the applyInPandasWithState form is pinned to.

    Skipped when google.protobuf is absent: transformWithState's driver-side
    state protocol is protobuf-based, and this container does not ship the
    package (pip install is off-limits).  The applyInPandasWithState twin
    above carries the stateful-parity guarantee everywhere; this test arms
    itself automatically in environments with protobuf."""
    pytest.importorskip("google.protobuf")
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        stateful_user_stats_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, sf_dir)
        stats = stateful_user_stats_tws(stream, watermark="100 hours")
        run_stream_to_memory(stats, "user_stats_tws", output_mode="update")
        got = {
            r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
            for r in spark.sql("SELECT * FROM user_stats_tws").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    ev = load_table(spark, sf_dir, "events")
    want = {
        r["user_id"]: (r["event_count"], r["total_value"], r["first_ts"], r["last_ts"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert len(got) > 0
    assert got == want


def test_extract_features_arrow_matches_pandas(spark):
    """mapInArrow featurizer must produce byte-identical features to the
    mapInPandas form (same histogram, same formatting) for every blob."""
    from databricks_feature_store_flight_school_spark.multimodal.binary import (
        extract_features_arrow,
    )

    df = _media_df(spark)
    want = {r["doc_id"]: r["feature"] for r in extract_features(df, "doc_id", "blob").collect()}
    got = {r["doc_id"]: r["feature"] for r in extract_features_arrow(df, "doc_id", "blob").collect()}
    assert got == want and len(got) == 20


def test_streaming_interval_left_join_emits_unmatched(spark, sf_dir):
    """LEFT OUTER stream-stream interval join: below a watermark-safe cutoff
    the emitted set must equal the batch left join — including purchases
    with NO attributing click (null click_id), which the inner form drops."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        streaming_interval_join_left,
    )

    ev = read_event_stream(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    joined = streaming_interval_join_left(
        p, c, key="user_id", left_ts="p_ts", right_ts="c_ts",
        lookback="30 minutes", watermark="10 minutes",
    )
    run_stream_to_memory(joined, "ssj_left_out", output_mode="append")
    rows = spark.sql("SELECT purchase_id, click_id, p_ts FROM ssj_left_out").collect()

    evb = load_table(spark, sf_dir, "events")
    pb = evb.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    cb = evb.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (pb.user_id == cb.c_user)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
    )
    batch = pb.join(cb, cond, "left_outer").collect()

    # 1) matched pairs emit eagerly: full equality with the batch inner set
    got_pairs = {(r["purchase_id"], r["click_id"]) for r in rows if r["click_id"] is not None}
    want_pairs = {
        (r["purchase_id"], r["click_id"]) for r in batch if r["click_id"] is not None
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0

    # 2) null emission is watermark-driven and finalises up to a horizon the
    #    engine chooses; up to the horizon it must be EXACTLY the batch
    #    unmatched set (no false nulls anywhere, no gaps below the horizon)
    got_nulls = {r["purchase_id"]: r["p_ts"] for r in rows if r["click_id"] is None}
    assert got_nulls, "no unmatched purchases exercised"
    want_nulls = {
        r["purchase_id"]: r["p_ts"] for r in batch if r["click_id"] is None
    }
    assert set(got_nulls) <= set(want_nulls), "streaming emitted a FALSE null row"
    horizon = max(got_nulls.values())
    missed = {
        pid for pid, ts in want_nulls.items() if ts <= horizon and pid not in got_nulls
    }
    assert not missed, f"unmatched purchases below the horizon never emitted: {missed}"


def test_chained_streaming_aggregations_equal_batch(spark, sf_dir):
    """Two chained stateful aggregations in ONE streaming query (hourly ->
    daily rollup): finalized daily windows must equal the batch two-level
    rollup; the live tail (not yet past the watermark) is allowed to be
    absent but never wrong."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        streaming_hourly_daily_rollup,
    )

    stream = read_event_stream(spark, sf_dir)
    daily = streaming_hourly_daily_rollup(stream, watermark="1 hour")
    run_stream_to_memory(daily, "daily_rollup", output_mode="append")
    got = {
        r["day_start"]: (r["daily_count"], r["hours_seen"])
        for r in spark.sql("SELECT * FROM daily_rollup").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window(F.col("ts"), "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("hourly_count")
    )
    want = {
        r["day_start"]: (r["daily_count"], r["hours_seen"])
        for r in hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"))
        .agg(
            F.sum("hourly_count").alias("daily_count"),
            F.count(F.lit(1)).alias("hours_seen"),
        )
        .select(F.col("d.start").alias("day_start"), "daily_count", "hours_seen")
        .collect()
    }
    assert len(got) > 0
    for day, vals in got.items():
        assert want.get(day) == vals, f"finalized day {day} diverges from batch"
    # everything except at most the trailing open day must have finalised
    assert len(got) >= len(want) - 1


def test_pil_decode_real_images(spark):
    """Env-gated (arms when PIL appears): decode REAL PNG bytes with
    codec='pil' and check width/height/mode against the images we encoded;
    the deterministic stub path (codec='stub', what the oracle-checked
    catalog queries pin) stays byte-identical regardless of environment."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")

    blobs = []
    for i, (w, h, mode) in enumerate([(7, 5, "RGB"), (12, 3, "L")]):
        im = PIL_Image.new(mode, (w, h))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        blobs.append((i, bytearray(buf.getvalue()), w, h, mode))

    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in blobs], "doc_id long, blob binary"
    )
    out = {
        r["doc_id"]: (r["width"], r["height"], r["mode"])
        for r in decode_image_batch(df, "doc_id", "blob", codec="pil").collect()
    }
    assert out == {i: (w, h, mode) for i, _, w, h, mode in blobs}


def test_decode_codec_validation(spark):
    """codec='pil' without PIL raises cleanly; bad codec name rejected;
    'auto' falls back to the stub here (container has no PIL)."""
    df = spark.createDataFrame([(1, bytearray(b"xx"))], "doc_id long, blob binary")
    with pytest.raises(ValueError, match="unknown codec"):
        decode_image_batch(df, "doc_id", "blob", codec="jpeg")
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(RuntimeError, match="PIL is not installed"):
            decode_image_batch(df, "doc_id", "blob", codec="pil")
        auto = decode_image_batch(df, "doc_id", "blob", codec="auto").collect()[0]
        stub = decode_image_batch(df, "doc_id", "blob", codec="stub").collect()[0]
        assert (auto["width"], auto["height"], auto["mode"]) == (
            stub["width"], stub["height"], stub["mode"],
        )


def test_resize_images_stub_contract(spark):
    """Resize (brief's multimodal op list): deterministic stub produces
    exactly width*height bytes per blob, row count preserved, repeat-run
    identical; empty blobs handled."""
    from databricks_feature_store_flight_school_spark.multimodal.binary import (
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(200)))), (2, bytearray(b"")),
         (3, bytearray(b"xyz"))],
        "doc_id long, blob binary",
    )
    out1 = {r["doc_id"]: r for r in resize_images(df, "doc_id", "blob", 8, 6).collect()}
    out2 = {r["doc_id"]: r for r in resize_images(df, "doc_id", "blob", 8, 6).collect()}
    assert set(out1) == {1, 2, 3}
    for i in (1, 2, 3):
        assert out1[i]["byte_size"] == 48
        assert len(out1[i]["resized"]) == 48
        assert (out1[i]["out_width"], out1[i]["out_height"]) == (8, 6)
        assert bytes(out1[i]["resized"]) == bytes(out2[i]["resized"])
    # downsample of a monotone stream stays monotone (evenly-spaced sample)
    vals = list(out1[1]["resized"])
    assert vals == sorted(vals)


def test_resize_images_pil_real(spark):
    """Env-gated: real PIL resize roundtrip — output decodes to the target
    dimensions."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    from databricks_feature_store_flight_school_spark.multimodal.binary import (
        resize_images,
    )

    im = PIL_Image.new("RGB", (32, 20))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id long, blob binary")
    row = resize_images(df, "doc_id", "blob", 8, 5, codec="pil").collect()[0]
    back = PIL_Image.open(io.BytesIO(bytes(row["resized"])))
    assert (back.width, back.height) == (8, 5)


def test_streaming_interval_full_join_emits_both_unmatched_sides(spark, sf_dir):
    """FULL OUTER stream-stream interval join: matched pairs equal the batch
    inner set; unmatched rows from BOTH sides (purchases with no prior
    click, clicks that never converted) emit null-padded below each side's
    watermark horizon — never a false null, never a gap below the horizon."""
    from databricks_feature_store_flight_school_spark.streaming.stream import (
        read_event_stream,
        run_stream_to_memory,
        streaming_interval_join_full,
    )

    ev = read_event_stream(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    joined = streaming_interval_join_full(
        p, c, key="user_id", left_ts="p_ts", right_ts="c_ts",
        lookback="30 minutes", watermark="10 minutes",
    )
    # single coalesced key column — selecting it must not be ambiguous, and
    # unmatched rows from either side must still carry their key
    assert joined.columns.count("user_id") == 1
    joined = joined.select("purchase_id", "click_id", "p_ts", "c_ts")
    run_stream_to_memory(joined, "ssj_full_out", output_mode="append")
    rows = spark.sql(
        "SELECT purchase_id, click_id, p_ts, c_ts FROM ssj_full_out"
    ).collect()

    evb = load_table(spark, sf_dir, "events")
    pb = evb.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    cb = evb.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (pb.user_id == cb.c_user)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
    )
    batch = pb.join(cb, cond, "full_outer").collect()

    got_pairs = {
        (r["purchase_id"], r["click_id"]) for r in rows
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    want_pairs = {
        (r["purchase_id"], r["click_id"]) for r in batch
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    assert got_pairs == want_pairs and len(want_pairs) > 0

    # left-null side (unmatched purchases)
    got_lnull = {r["purchase_id"]: r["p_ts"] for r in rows
                 if r["click_id"] is None and r["purchase_id"] is not None}
    want_lnull = {r["purchase_id"]: r["p_ts"] for r in batch
                  if r["click_id"] is None and r["purchase_id"] is not None}
    assert set(got_lnull) <= set(want_lnull), "false null on the purchase side"
    if got_lnull:
        horizon = max(got_lnull.values())
        missed = {k for k, ts in want_lnull.items()
                  if ts <= horizon and k not in got_lnull}
        assert not missed, f"unmatched purchases below horizon missing: {missed}"

    # right-null side (clicks that never converted)
    got_rnull = {r["click_id"]: r["c_ts"] for r in rows
                 if r["purchase_id"] is None and r["click_id"] is not None}
    want_rnull = {r["click_id"]: r["c_ts"] for r in batch
                  if r["purchase_id"] is None and r["click_id"] is not None}
    assert set(got_rnull) <= set(want_rnull), "false null on the click side"
    assert got_rnull or got_lnull, "no unmatched rows exercised on either side"
    if got_rnull:
        horizon = max(got_rnull.values())
        missed = {k for k, ts in want_rnull.items()
                  if ts <= horizon and k not in got_rnull}
        assert not missed, f"unconverted clicks below horizon missing: {missed}"
