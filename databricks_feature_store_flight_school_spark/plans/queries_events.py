"""Event-table queries: batch time windows, as-of join, JSON extraction,
pivot (SURVEY.md §2.12 streaming/json extensions, batch-first so the DuckDB
oracle can check them; streaming/stream.py reuses the same window helpers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import (
    asof_join,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from ..sources import load_table
from .catalog import register


def _ts_str(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


@register(
    "q_tumbling_window",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS event_count,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "events", "window",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event type."""
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        ev, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("event_count"), F.round(F.sum("value"), 2).alias("total_value")],
    )
    return out.select(
        _ts_str(F.col("window_start")).alias("window_start"),
        "event_type", "event_count", "total_value",
    )


@register(
    "q_sliding_window",
    """
    WITH slid AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
             value
      FROM events, (SELECT unnest([0, 1]) AS k)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS event_count,
           round(avg(value), 6) AS avg_value
    FROM slid
    GROUP BY 1
    """,
    "events", "window",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: every event contributes to
    exactly 2 buckets (the oracle replicates rows over k∈{0,1} offsets)."""
    ev = load_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        ev, "ts", "1 hour", "30 minutes", [],
        [F.count(F.lit(1)).alias("event_count"), F.round(F.avg("value"), 6).alias("avg_value")],
    )
    return out.select(
        _ts_str(F.col("window_start")).alias("window_start"),
        "event_count", "avg_value",
    )


@register(
    "q_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts >= lag(ts) OVER w + INTERVAL '10 minutes'
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS event_count,
           round(sum(value), 2) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    "events", "window", "session",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 10-minute inactivity gap.  Spark's
    session_window: a session absorbs an event iff its ts < current session
    end (start + gap), end = last event + gap — exactly the oracle's
    gaps-and-islands with `ts >= prev + gap` starting a new island."""
    ev = load_table(spark, sf_dir, "events")
    out = session_window_agg(
        ev, "ts", "10 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("event_count"), F.round(F.sum("value"), 2).alias("session_value")],
    )
    return out.select(
        "user_id",
        _ts_str(F.col("window_start")).alias("session_start"),
        _ts_str(F.col("window_end")).alias("session_end"),
        "event_count", "session_value",
    )


@register(
    "q_asof_join",
    """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS ts_signup,
           round(s.value, 2) AS value_signup
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    "events", "asof",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness: each purchase joined to the user's most
    recent signup at-or-before it (backward inclusive as-of).  Uses the
    union+window idiom of operators/asof.py — no per-key range explosion."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["value"], suffix="_signup",
    )
    return joined.select(
        "event_id",
        "user_id",
        _ts_str(F.col("ts")).alias("purchase_ts"),
        _ts_str(F.col("ts_signup")).alias("ts_signup"),
        # payload col keeps its name ("value") — no collision with left side
        F.round(F.col("value"), 2).alias("value_signup"),
    )


@register(
    "q_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS event_count,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    "events", "json",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props column (get_json_object, F7/§2.12
    json territory), bucketed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.get_json_object(F.col("props"), "$.k").cast("int") % 10).alias("k_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("k_bucket")
    )


@register(
    "q_events_pivot",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
    "events", "pivot",
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type to per-user count columns.  Explicit value list =
    single-pass conditional aggregation (no extra distinct-values job)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .fillna(0)
    )


@register(
    "q_user_event_stats",
    """
    SELECT user_id,
           count(*) AS event_count,
           round(sum(value), 2) AS total_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    GROUP BY user_id
    """,
    "events", "agg", "streaming-twin",
)
def q_user_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.stateful_user_stats (applyInPandasWithState):
    the stateful operator's converged output equals this groupBy — asserted
    in tests/test_multimodal_streaming.py; here the oracle pins the values."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.round(F.sum("value"), 2).alias("total_value"),
        _ts_str(F.min("ts")).alias("first_ts"),
        _ts_str(F.max("ts")).alias("last_ts"),
    )


@register(
    "q_json_schema_parse",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "events", "json",
)
def q_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with a DECLARED schema (one parse into a
    struct; repeated get_json_object re-parses the document per path — at
    100 TB declare the schema once and prune into the struct)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField("k", IntegerType())])
    ev = load_table(spark, sf_dir, "events").withColumn(
        "p", F.from_json(F.col("props"), schema)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(F.col("p.k")), 6).alias("avg_k"),
            F.max(F.col("p.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_interval_join",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.event_id AS click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
    "events", "join", "interval",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval attribution join: every purchase paired with the same
    user's clicks in the preceding 30 minutes — the batch twin of
    streaming/stream.py::streaming_interval_join (identical expression tree;
    streaming/batch parity asserted in tests/test_multimodal_streaming.py).

    Plan shape: the equality conjunct (user_id) keys a SortMergeJoin — the
    range conjuncts ride along as join filters, so there is no nested-loop
    blowup; both sides shuffle once on user_id.  At 100 TB the same plan
    holds (clicks/purchases co-partition by user), and skewed power-users
    split via AQE skew-join."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "user_id",
        _ts_str(F.col("p_ts")).alias("purchase_ts"),
        "click_id",
        _ts_str(F.col("c_ts")).alias("click_ts"),
    )


@register(
    "q_funnel_steps",
    """
    WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, min(e.ts) AS v_ts FROM events e
          JOIN s ON s.user_id = e.user_id
          WHERE e.event_type = 'view' AND e.ts > s.s_ts GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.v_ts GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS signup_users,
           (SELECT count(*) FROM v) AS viewed_after_signup,
           (SELECT count(*) FROM p) AS purchased_after_view
    """,
    "events", "funnel", "agg",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> first later view -> first later purchase):
    users surviving each ORDERED step, where each stage anchors on the
    previous stage's first qualifying timestamp.  Each stage is one
    user-keyed aggregate joined to the (shrinking) previous stage — the
    per-user stage tables are entity-scale, so they carry NO forced
    broadcast (AQE broadcasts them at low SF; at 100 TB they hash-join
    co-keyed on user_id), and the event table is scanned per stage with
    the event_type filter pushed down, never self-joined row-to-row."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("signup_users"))
        .crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("viewed_after_signup"))))
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("purchased_after_view")))
        )
    )


@register(
    "q_retention_cohorts",
    """
    WITH firsts AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
    SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
           date_diff('day', date_trunc('day', f.first_ts), date_trunc('day', e.ts)) // 7
               AS weeks_since,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "events", "retention", "agg",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by the ISO week of their first
    event, activity bucketed by whole weeks since that first event, distinct
    actives per (cohort, week).  The per-user first-event table is
    entity-scale (NO forced broadcast — AQE decides; co-keyed hash join at
    100 TB) — one event scan, one distinct-count shuffle; no per-user
    windows over the full stream."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    weeks_since = F.floor(
        F.datediff(F.date_trunc("day", F.col("ts")), F.date_trunc("day", F.col("first_ts")))
        / 7
    ).cast("long")
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            F.date_format(F.date_trunc("week", F.col("first_ts")), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            weeks_since.alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "q_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM t
    ORDER BY prev_type, next_type
    """,
    "events", "window", "sequence",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag() pairs each event with its predecessor (one shuffle on user_id),
    then the count matrix normalises per source state with a window over the
    |event_types|² aggregate — the session-mining primitive behind
    next-action prediction and anomalous-flow detection.  The expensive
    partitioning is entity-keyed (scales with users); the probability
    normalisation runs on the tiny transition matrix."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return (
        t.withColumn("p", F.round(F.col("n") / F.sum("n").over(wp), 6))
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


@register(
    "q_variant_json",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k,
           max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    "events", "json", "variant",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    parse_json once into a Variant column, then typed variant_get paths —
    the open-schema ingestion shape (parse at scan, bind types at use).
    Unlike get_json_object (string re-parse per extraction), the variant
    binary encoding parses each props document ONCE however many fields the
    query pulls.  The oracle twin states the same result via DuckDB's JSON
    extraction."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_time_weighted_avg",
    """
    WITH obs AS (
        SELECT user_id, ts, value,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events
        WHERE user_id < 20 AND event_type = 'view'
    )
    SELECT user_id,
           round(sum(value * date_diff('second', ts, next_ts))
                 / sum(date_diff('second', ts, next_ts)), 6) AS twap,
           round(avg(value), 6) AS naive_avg,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM obs
    WHERE next_ts IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    "events", "window", "timeseries",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average (TWAP): each observation weighted by how long it
    held until the next one — the correct mean for irregularly-sampled
    state (sensor readings, prices, feature values), shown against the
    naive row-mean it corrects.  One lead() per user partition; the weights
    are interval durations, computed in-plan."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").where(
        (F.col("user_id") < 20) & (F.col("event_type") == "view")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    obs = ev.select(
        "user_id", "ts", "value", F.lead("ts").over(w).alias("next_ts")
    ).where(F.col("next_ts").isNotNull())
    dur = F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    return (
        obs.groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * dur) / F.sum(dur), 6).alias("twap"),
            F.round(F.avg("value"), 6).alias("naive_avg"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@register(
    "q_changepoint",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, sum(value) AS v
        FROM events GROUP BY 1
    ),
    split AS (
        SELECT d, v,
               avg(v) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_before,
               avg(v) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mean_after,
               count(*) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_before,
               count(*) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_after
        FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS split_day,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after,
           round(abs(mean_before - mean_after), 2) AS level_shift
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY abs(mean_before - mean_after) DESC, d) AS rn
        FROM split
        WHERE n_before >= 5 AND n_after >= 5
    )
    WHERE rn = 1
    """,
    "events", "window", "changepoint",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection (binary-segmentation step): the split
    day maximising the level shift |mean(before) - mean(after)| of daily
    totals, edges excluded (>= 5 days each side) — the drift alarm that
    pages before a dashboard eyeballs it.  Both running means come from two
    frames over ONE ordered pass of the days table; the argmax is a
    row_number over the same day-sized frame.

    level_shift rounds to 2 decimals (the means keep 6): it is a
    CANCELLATION of two large means, so it inherits their absolute
    summation-order noise, not their relative one — at sf100 the engines'
    1.7e8-scale means disagree by ~1.5e-6 each (far inside the relative
    rule) and the ~3e-6 residue landed exactly in level_shift's 6th
    decimal.  Two decimals of an alarm magnitude is the honest precision
    at every octave."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    ob = Window.orderBy("d")
    before = ob.rowsBetween(Window.unboundedPreceding, 0)
    after = ob.rowsBetween(1, Window.unboundedFollowing)
    split = daily.select(
        "d",
        F.avg("v").over(before).alias("mean_before"),
        F.avg("v").over(after).alias("mean_after"),
        F.count(F.lit(1)).over(before).alias("n_before"),
        F.count(F.lit(1)).over(after).alias("n_after"),
    ).where((F.col("n_before") >= 5) & (F.col("n_after") >= 5))
    shift = F.abs(F.col("mean_before") - F.col("mean_after"))
    w = Window.orderBy(shift.desc(), "d")
    return (
        split.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("split_day"),
            F.round("mean_before", 6).alias("mean_before"),
            F.round("mean_after", 6).alias("mean_after"),
            F.round(shift, 2).alias("level_shift"),
        )
    )
