"""Streaming throughput probe: drive the stateful streaming operators over
the events table at a chosen SF under the RocksDB state store provider and
print one JSON line of events/sec per shape.

Why this exists: the batch scale sweeps (SCALING.md) show the relational
and LLM-pipeline operators travel linearly to sf10, but said nothing about
the STREAMING operators' state machinery — the part that behaves
differently at scale (per-key state reads/writes against the store on
every micro-batch).  This probe runs four stateful shapes —
applyInPandasWithState per-user stats, its JVM agg-composition twin
(user_stats_agg_jvm — identical output, parity-pinned; the pair prices
the Python-worker boundary), windowed agg, and
dropDuplicatesWithinWatermark — to completion over the bounded replay
(Trigger.AvailableNow) with RocksDB serving the state (the 100 TB backend:
executor-local disk, changelog-checkpointable), and reports wall seconds +
events/sec.  Numbers are single-batch lower bounds: a real deployment
amortizes source listing and sink setup across micro-batches.

Usage:  python tools/stream_throughput.py [SF_DIR]
        (default /root/testdata/sf0.1; pass a tools/gen_testdata.py dir
         for sf1+)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from databricks_feature_store_flight_school_spark.streaming.stream import (  # noqa: E402
    read_event_stream,
    stateful_user_stats,
    streaming_dedup,
    streaming_window_counts,
    user_stats_agg_jvm,
)


def _run(agg, name: str, mode: str) -> float:
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("noop")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.isActive:  # pragma: no cover - safety net
        q.stop()
        raise RuntimeError(f"{name} did not finish in 600s")
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream-throughput")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    n_events = spark.read.parquet(str(Path(sf_dir) / "events.parquet")).count()

    shapes = {
        "stateful_user_stats": (
            stateful_user_stats(read_event_stream(spark, sf_dir), watermark="100 hours"),
            "update",
        ),
        # the JVM agg-composition twin of the same per-user stats: measures
        # what the Python-worker boundary costs when the state IS an
        # aggregate composition (the 100 TB default; reach for
        # applyInPandasWithState only for non-algebraic state)
        "user_stats_agg_jvm": (
            user_stats_agg_jvm(read_event_stream(spark, sf_dir), watermark="100 hours"),
            "update",
        ),
        "window_counts": (
            streaming_window_counts(
                read_event_stream(spark, sf_dir), "1 hour", watermark="100 hours"
            ),
            "complete",
        ),
        "dedup_within_watermark": (
            streaming_dedup(
                read_event_stream(spark, sf_dir), ["user_id", "event_type"],
                watermark="100 hours",
            ),
            "append",
        ),
    }
    result = {"sf_dir": sf_dir, "n_events": n_events, "state_store": "rocksdb", "shapes": {}}
    for name, (agg, mode) in shapes.items():
        sec = _run(agg, name, mode)
        result["shapes"][name] = {
            "wall_sec": round(sec, 2),
            "events_per_sec": int(n_events / sec),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
