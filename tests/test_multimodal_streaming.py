"""Multimodal binary plumbing + Structured Streaming equivalence tests."""

from __future__ import annotations

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
