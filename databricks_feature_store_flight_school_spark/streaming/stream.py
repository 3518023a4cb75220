"""Structured Streaming variants of the batch window operators
(SURVEY.md §2.12 / §7 step 4: batch-equivalents first — the DuckDB oracle is
batch — with the readStream+watermark path shipped here on the same window
expressions, so batch and streaming results agree by construction).

The events table stands in for a stream: ``read_event_stream`` replays its
parquet through ``readStream`` (schema declared explicitly — streaming scans
never infer), and the aggregations reuse operators/windows.py expressions.

Scale notes: watermarks bound state (late rows beyond the watermark drop out
of the store); tumbling/sliding aggs keep one state row per (window, keys);
session windows merge state entries per key.  Output mode 'append' only
emits finalised windows — the production sink mode; tests use availableNow
so the whole replay finishes deterministically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import prepare


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, normalising the nanosecond ts
    exactly like the batch loader (sources/tables.py)."""
    prepare(spark)
    import os

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file stream source lists a DIRECTORY; select just events.parquet
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        # Integer division — see sources/tables.py:load_table for why `/ 1000`
        # (double division) would put ~12% of timestamps 1 µs off the oracle.
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # Watermarks track an event-time INSTANT, so Spark requires TIMESTAMP
        # (LTZ) — EventTimeWatermark rejects TIMESTAMP_NTZ outright.  The
        # session timezone is pinned to UTC (session.py), so this cast maps
        # each wall-clock value to the same numeric instant and the streaming
        # results stay comparable with the batch (NTZ) twins.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_window_counts(
    stream: DataFrame,
    duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding counts per event_type — the streaming
    twin of operators.windows.tumbling_window_agg/sliding_window_agg."""
    win = (
        F.window(F.col("ts"), duration)
        if slide is None
        else F.window(F.col("ts"), duration, slide)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def streaming_session_counts(
    stream: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows per user — streaming twin of
    session_window_agg (state merges sessions as events arrive)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "event_count",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "append", timeout_sec: int = 120
) -> None:
    """Execute a streaming aggregation to completion against the bounded
    replay (Trigger.AvailableNow) into an in-memory sink table named
    ``query_name``.  Returns once all available data is processed."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - safety net
        q.stop()


# -- custom stateful operator -------------------------------------------------

USER_STATS_SCHEMA = "user_id bigint, event_count bigint, total_value double, first_ts timestamp, last_ts timestamp"
_USER_STATE_SCHEMA = "event_count bigint, total_value double, first_ts timestamp, last_ts timestamp"


def stateful_user_stats(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user event count / value sum / first-last seen, emitted on every
    trigger update.

    This is the operator shape Structured Streaming's built-in windows can't
    express: arbitrary per-key state evolved by user code.  State is one
    small tuple per user (bounded by key cardinality, not event volume);
    the watermark lets the store evict keys once their state can no longer
    change.  Arrow batches cross to the Python worker per (key-group, trigger)
    — never per row.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        count, total, first_ts, last_ts = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((count, total, first_ts, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_count": [count],
                "total_value": [round(total, 2)],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_USER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_stats_agg_jvm(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """JVM agg-composition twin of :func:`stateful_user_stats`: the SAME
    per-user running stats (count / value sum / first-last seen) expressed
    as a plain streaming groupBy aggregation — count, sum, min(ts), max(ts)
    are all built-in stateful aggregates, so the state machinery stays
    entirely JVM-side (whole-stage-codegen update, no Arrow transfer, no
    Python worker round-trip per trigger).

    This is the measured answer to the applyInPandasWithState throughput
    gap (STREAM_THROUGHPUT.json: the Python-worker shape runs ~16x below
    the JVM stateful shapes): when the per-key state a pipeline needs IS
    expressible as an aggregate composition, compose aggregates and keep
    the 100 TB state path JVM-only; reach for applyInPandasWithState /
    transformWithState only when user-code state transitions (timers,
    conditional evictions, non-algebraic updates) genuinely cannot be
    written as aggregates.  Output schema matches USER_STATS_SCHEMA so the
    parity test pins both shapes to the same batch groupBy."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def stream_to_feature_table(
    agg: DataFrame,
    client,
    table_name: str,
    query_name: str = "feature_ingest",
    timeout_sec: int = 120,
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming feature ingestion: merge each micro-batch of a streaming
    aggregation into a registered feature table (foreachBatch -> the engine's
    merge-upsert writer).

    This is the continuous version of ``compute_and_write(mode='merge')`` —
    the feature table converges to what the batch aggregation over all data
    would produce, while serving reads between micro-batches.  Output mode
    'update' so each trigger emits only changed keys; the merge writer
    upserts them by primary key.  Late data is bounded by the upstream
    watermark; per-batch dedup is the writer's validation (one row per key
    per micro-batch is guaranteed by the grouped aggregation itself).

    ``checkpoint_dir`` makes the pipeline RESTARTABLE: source offsets (e.g.
    which files were already ingested) and the aggregation state survive a
    stop/start, so a relaunched query resumes from where the previous run
    committed instead of recounting history — the recovery contract
    tests/test_multimodal_streaming.py pins by deleting already-processed
    input before the restart.  Without it Spark allocates a temp checkpoint
    good for exactly one run.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        client.write_table(table_name, batch_df, mode="merge")

    writer = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_sec)
    if q.isActive:  # pragma: no cover - safety net
        q.stop()


def streaming_dedup(
    stream: DataFrame, key_cols: list[str], watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Streaming once-per-key dedup within the watermark window:
    ``dropDuplicatesWithinWatermark`` keys state on ``key_cols`` ALONE — a
    replay of the same key with a *different* timestamp (the common
    at-least-once redelivery shape) is still dropped, and each key's state
    entry is evicted once the watermark passes its first-seen event time.
    The unbounded-stream form of exact dedup (at-least-once sources ->
    effectively-once sinks).  A key reappearing after the watermark horizon
    is treated as new; size the watermark to the source's redelivery window."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join within a time interval: each left row pairs
    with right rows of the same ``key`` whose timestamp falls in
    ``[left_ts - lookback, left_ts]`` — the attribution-join shape (purchase
    <- preceding clicks).

    Both sides are watermarked and the join condition carries the time bound,
    so Spark derives a state-eviction horizon for BOTH buffers: a buffered
    right row is dropped once the left watermark passes (right_ts + lookback);
    state stays bounded on unbounded streams.  Column names must be disjoint
    apart from ``key`` (pre-project with aliases).

    Batch twin: q_interval_join (plans/queries_events.py) — identical
    expression tree on the static frame, checked against DuckDB; the
    streaming/batch parity test is tests/test_multimodal_streaming.py.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond).drop(r[key])


# -- transformWithState (Spark 4 successor to applyInPandasWithState) ---------


def user_stats_processor():
    """Per-user running stats as a Spark 4 ``StatefulProcessor`` — the
    transformWithStateInPandas twin of :func:`stateful_user_stats`.

    Differences that matter at scale vs applyInPandasWithState:
    - state is TYPED and FINE-GRAINED (a ValueState per composite here; list/
      map state and per-key timers are also available) instead of one opaque
      tuple, so the store tracks exactly what changed;
    - requires the RocksDB state store provider, which scales state past
      executor heap (changelog-checkpointed) — the 100 TB state story.

    Emits one row per updated user per micro-batch (same contract as the
    applyInPandasWithState form, so the parity test pins both to the batch
    groupBy).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats",
                "event_count bigint, total_value double, first_ts timestamp, last_ts timestamp",
            )

        def handleInputRows(self, key, rows, timerValues):
            count, total, first_ts, last_ts = (
                self._state.get() if self._state.exists() else (0, 0.0, None, None)
            )
            for pdf in rows:
                count += len(pdf)
                total += float(pdf["value"].sum())
                lo, hi = pdf["ts"].min(), pdf["ts"].max()
                first_ts = lo if first_ts is None else min(first_ts, lo)
                last_ts = hi if last_ts is None else max(last_ts, hi)
            self._state.update((count, total, first_ts, last_ts))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_count": [count],
                    "total_value": [round(total, 2)],
                    "first_ts": [first_ts],
                    "last_ts": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return UserStats()


def stateful_user_stats_tws(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """transformWithStateInPandas form of :func:`stateful_user_stats`.
    Caller must enable the RocksDB state store provider (see
    tests/test_multimodal_streaming.py) — transformWithState requires it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=user_stats_processor(),
            outputStructType=USER_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def streaming_interval_join_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER join within a time interval: like
    :func:`streaming_interval_join`, but left rows with NO matching right
    row in ``[left_ts - lookback, left_ts]`` are still emitted — with null
    right columns — once the watermark guarantees no matching right row can
    still arrive (purchases WITHOUT an attributing click are the rows a
    conversion funnel must not silently drop).

    The null emission is watermark-driven: an unmatched left row buffers in
    state until the right-side watermark passes its interval's upper bound,
    then emits exactly once.  That is the contract that keeps outer-join
    state bounded on unbounded streams — and why rows near the live head of
    the stream emit only after the watermark advances past them (the parity
    test compares against the batch left join below a watermark-safe
    cutoff)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "left_outer").drop(r[key])


def streaming_interval_join_full(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream FULL OUTER join within a time interval: unmatched rows
    from EITHER side emit with nulls for the other side once the opposite
    watermark passes their join window (clicks that never converted AND
    purchases that were never preceded by a click, in one query).  Same
    bounded-state contract as the left-outer form: a row buffers only until
    the watermark proves no match can still arrive, then emits exactly
    once.  Both sides therefore need watermarks AND the time-interval
    condition — Spark rejects an unbounded full-outer stream join, which is
    the engine enforcing the 100 TB rule (state must provably drain).

    The result carries a SINGLE ``key`` column — ``coalesce(left.key,
    right.key)`` — so unmatched rows from either side still have their key
    populated and ``result[key]`` is never ambiguous (the left-outer variant
    drops the right key for the same reason)."""
    # explicit aliases: both sides often derive from the SAME source stream
    # (e.g. one events feed filtered two ways), and qualified names are the
    # only unambiguous way to address each side's key after the join
    l = left.withWatermark(left_ts, watermark).alias("__sjl")
    r = right.withWatermark(right_ts, watermark).alias("__sjr")
    lk, rk = F.col(f"__sjl.{key}"), F.col(f"__sjr.{key}")
    cond = (
        (lk == rk)
        & (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    joined = l.join(r, cond, "full_outer")
    rest = [F.col(f"__sjl.{c}") for c in left.columns if c != key]
    rest += [F.col(f"__sjr.{c}") for c in right.columns if c != key]
    return joined.select(F.coalesce(lk, rk).alias(key), *rest)


def streaming_hourly_daily_rollup(
    stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """CHAINED stateful aggregations in one streaming query (supported since
    Spark 3.5/4 for window-on-window): hourly event counts roll up into
    daily totals without an intermediate sink — the two-level dashboard
    rollup that previously required two queries and a staging table.

    The second aggregation windows over the FIRST's window-start event time
    (``window_time``/window column propagation keeps the event-time
    lineage), so both levels share one watermark and finalise together in
    append mode.  State: one row per open hour + one per open day."""
    hourly = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("hourly_count"))
    )
    return (
        hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"))
        .agg(
            F.sum("hourly_count").alias("daily_count"),
            F.count(F.lit(1)).alias("hours_seen"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            "daily_count",
            "hours_seen",
        )
    )
