"""Batch time-window aggregations over event streams (SURVEY.md §2.12).

The reference has no streaming/window surface; these are the mandated
extensions, built on the built-in ``F.window`` / ``F.session_window``
expressions so the *same* aggregation code serves batch frames here and
Structured Streaming frames in streaming/stream.py (Spark evaluates these
expressions identically in both modes — that is the point of choosing them
over hand-rolled bucketing).

All helpers return ``window_start``/``window_end`` as proper timestamps;
catalog queries stringify for the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Non-overlapping fixed windows: each row lands in exactly one bucket.
    Partial aggregation happens map-side per (window, keys) — the exchange
    carries one row per bucket, not per event."""
    win = F.window(F.col(ts), duration)
    return (
        df.groupBy(win.alias("w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window_agg(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Overlapping windows: each row replicates into duration/slide buckets
    (Spark expands this inside the window expression — the only row
    amplification in the pipeline, factor = duration/slide)."""
    win = F.window(F.col(ts), duration, slide)
    return (
        df.groupBy(win.alias("w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_window_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Data-driven windows: a session extends while consecutive events are
    < gap apart; ``window_end`` is last event + gap (Spark semantics).  In
    batch mode Spark plans this as sort-within-key + merge, the same
    gaps-and-islands computation the SQL oracle spells out with lag()."""
    win = F.session_window(F.col(ts), gap)
    return (
        df.groupBy(win.alias("w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
