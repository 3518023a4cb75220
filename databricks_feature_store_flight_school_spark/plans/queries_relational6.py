"""Round-5 catalog additions: time-series diagnostics, model-evaluation and
statistical-test shapes, data profiling, and an in-plan iterative graph
algorithm — each with a DuckDB oracle twin (SURVEY.md §2.12 extensions;
the reference contains none of these — its analytics surface stops at
``summary()``, Feature_Store_Telco_Churn_Sean_Original.py:32).

Scale posture notes are per-query; the common rules: fact passes are single
grouped aggregates, corpus scalars fold in as 1-row broadcasts (never an
eager ``.count()``), entity-cardinality ranks go through
operators/ranks.global_row_number / global_ntile, and partition-less windows
only ever see bounded rollups (days, nations) — enforced by
tools/explain_audit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..operators.ranks import global_ntile, global_row_number
from ..sources import load_table
from .catalog import register

_ACF_LAGS = 7


@register(
    "q_autocorrelation",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, sum(value) AS v FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT v,
               """ + ",\n               ".join(
        f"lag(v, {k}) OVER (ORDER BY d) AS l{k}" for k in range(1, _ACF_LAGS + 1)
    ) + """
        FROM daily
    ),
    st AS (
        """ + "\n        UNION ALL\n        ".join(
        f"SELECT {k} AS lag, v, l{k} AS v_lag FROM lagged"
        for k in range(1, _ACF_LAGS + 1)
    ) + """
    )
    SELECT lag,
           count(v_lag) AS n_pairs,
           round(corr(v, v_lag), 6) AS acf
    FROM st GROUP BY lag ORDER BY lag
    """,
    "window", "timeseries", "stats",
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (ACF) of daily event value at lags 1..7 —
    the seasonality/persistence diagnostic run before any forecasting model
    (a weekly cycle shows as a lag-7 peak).  Fact pass is one grouped
    daily aggregate; the lag windows and the 7-way unpivot run over the
    |calendar days| rollup (bounded; audit-whitelisted), and corr() pairs
    drop nulls identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "v", *[F.lag("v", k).over(w).alias(f"l{k}") for k in range(1, _ACF_LAGS + 1)]
    )
    pairs = ", ".join(f"{k}, l{k}" for k in range(1, _ACF_LAGS + 1))
    st = lagged.selectExpr(
        "v", f"stack({_ACF_LAGS}, {pairs}) AS (lag, v_lag)"
    )
    return (
        st.groupBy("lag")
        .agg(
            F.count("v_lag").alias("n_pairs"),
            F.round(F.corr("v", "v_lag"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "q_decile_lift",
    """
    WITH cust AS (
        SELECT o_custkey,
               round(sum(o_totalprice), 2) AS revenue,
               max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS converted
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT converted,
               ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
        FROM cust
    ),
    overall AS (SELECT avg(converted) AS rate_all FROM cust)
    SELECT decile,
           count(*) AS n_customers,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(avg(converted), 6) AS conversion_rate,
           round(avg(converted) / (SELECT rate_all FROM overall), 6) AS lift
    FROM scored
    GROUP BY decile ORDER BY decile
    """,
    "window", "agg", "model-eval",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift chart — the standard model-evaluation readout (score the
    population, cut into score deciles, compare each decile's outcome rate
    to the base rate); here the 'score' is customer revenue and the outcome
    is having an open order.  The decile cut uses
    operators/ranks.global_ntile (two-pass range-partitioned, exact SQL
    NTILE ties), NOT a single-task global ntile — the customer aggregate is
    entity-cardinality.  The base rate folds in as a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "converted"
        ),
    )
    scored = global_ntile(
        cust, [F.col("revenue").desc(), F.col("o_custkey")], 10, bucket_col="decile"
    )
    # base rate from the checkpointed scored frame, not a second fact pass
    overall = scored.agg(F.avg("converted").alias("rate_all"))
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.avg("converted").alias("__rate"),
        )
        .crossJoin(F.broadcast(overall))
        .select(
            "decile",
            "n_customers",
            "n_converted",
            F.round("__rate", 6).alias("conversion_rate"),
            F.round(F.col("__rate") / F.col("rate_all"), 6).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "q_mann_whitney",
    """
    WITH ranked AS (
        SELECT o_orderpriority = '1-URGENT' AS g,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r
        FROM orders
    ),
    s AS (
        SELECT sum(CASE WHEN g THEN r END) AS r1,
               sum(CASE WHEN g THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS n2
        FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 2) AS u_stat,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * 1.0 * n2 / 2.0)
                 / sqrt(n1 * 1.0 * n2 * (n1 + n2 + 1) / 12.0), 6) AS z_stat
    FROM s
    """,
    "window", "stats", "hypothesis-test",
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do URGENT orders draw from the same
    price distribution as the rest?  The nonparametric two-sample test —
    the robust alternative to the t-test for skewed monetary values.

    Ranks are FACT-cardinality (every order), so they come from
    operators/ranks.global_row_number; both engines rank with the same
    unique (value, key) order, so the statistic is exact.  (With a unique
    tie-break this is the row_number variant of the test; o_totalprice ties
    are broken by key on BOTH sides identically.)  Normal approximation
    z = (U - mu) / sigma — valid at any n this query would see."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").alias("g"),
        "o_totalprice",
        "o_orderkey",
    )
    ranked = global_row_number(o, ["o_totalprice", "o_orderkey"], rank_col="r")
    s = ranked.agg(
        F.sum(F.when(F.col("g"), F.col("r"))).alias("r1"),
        F.sum(F.when(F.col("g"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("g"), 1).otherwise(0)).alias("n2"),
    )
    n1, n2, r1 = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("r1").cast("double"),
    )
    u = r1 - n1 * (n1 + 1) / 2.0
    z = (u - n1 * n2 / 2.0) / F.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    return s.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(u, 2).alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
    )


_PR_ITERS = 10
_PR_DAMP = 0.85


def _pagerank_oracle() -> str:
    iters = "".join(
        f""",
    pr{i + 1} AS (
        SELECT n.node,
               0.15 / (SELECT n_nodes FROM nn)
               + 0.85 * COALESCE(c.contrib, 0) AS r
        FROM nodes n LEFT JOIN (
            SELECT t.dst AS node, sum(t.p * p.r) AS contrib
            FROM trans t JOIN pr{i} p ON p.node = t.src
            GROUP BY t.dst
        ) c ON c.node = n.node
    )"""
        for i in range(_PR_ITERS)
    )
    return f"""
    WITH nodes AS (SELECT n_nationkey AS node FROM nation),
    nn AS (SELECT count(*) AS n_nodes FROM nodes),
    edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               sum(l.l_extendedprice) AS w
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    trans AS (
        SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges
    ),
    pr0 AS (
        SELECT node, 1.0 / (SELECT n_nodes FROM nn) AS r FROM nodes
    ){iters}
    SELECT n_name AS nation, round(r, 6) AS pagerank
    FROM pr{_PR_ITERS} JOIN nation ON n_nationkey = node
    ORDER BY pagerank DESC, nation
    """


@register(
    "q_nation_pagerank",
    _pagerank_oracle(),
    "graph", "iterative", "join",
)
def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (edge src = customer
    nation, dst = supplier nation, weight = traded value), 10 power
    iterations as GRAPH-SIZED DRIVER MATH (r13) — the same fit boundary as
    k-means centroids and the PCA eigensolve: ONE distributed fact pass
    builds the edge aggregate, the transition matrix it collapses to is
    ≤ |nations|² rows (625 — bounded by the GRAPH, not the corpus, at any
    scale factor), and iterating a 25-vector 10 times is numpy work, not
    cluster work.  The previous shape unrolled the recurrence in the plan:
    every iteration re-derived the 4-table fact join (63 parquet scans /
    52 exchanges in the before-plan, 6.5s at sf0.1); pinning the matrix and
    iterating in-plan still paid ~3 stages per iteration of pure local-mode
    latency.  The driver form runs the fact pass once and nothing else
    (guide §8: decide with small rows).  The oracle mirrors the recurrence
    as a chain of CTEs; both sides round to 6 decimals, far above the
    last-ulp reassociation between numpy's fixed-order dot and a grouped
    SQL SUM.

    Dangling-node mass is deliberately NOT redistributed (identical formula
    both sides; no TPC-H nation is dangling anyway).  Row order is
    irrelevant to the gate (value-multiset compare)."""
    import numpy as np
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    edges = (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice")
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.sum("l_extendedprice").alias("w"))
    )
    trans = edges.withColumn(
        "p", F.col("w") / F.sum("w").over(Window.partitionBy("src"))
    ).select("src", "dst", "p")

    # the ONLY distributed work: the fact pass behind `trans` (and the
    # 25-row nation scan).  Everything collected is graph-bounded.
    nation_rows = n.select("n_nationkey", "n_name").collect()
    node_ids = sorted(r["n_nationkey"] for r in nation_rows)
    names = {r["n_nationkey"]: r["n_name"] for r in nation_rows}
    idx = {node: i for i, node in enumerate(node_ids)}
    n_nodes = len(node_ids)
    P = np.zeros((n_nodes, n_nodes))
    for row in trans.collect():
        P[idx[row["src"]], idx[row["dst"]]] = row["p"]
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(_PR_ITERS):
        # contrib_j = Σ_i p_ij·r_i; missing contribs are the zero rows of P
        # (the COALESCE(contrib, 0) of the SQL twin)
        r = (1 - _PR_DAMP) / n_nodes + _PR_DAMP * (P.T @ r)
    out = spark.createDataFrame(
        [(names[node], float(r[idx[node]])) for node in node_ids],
        "nation string, pagerank double",
    )
    return out.select(
        "nation", F.round("pagerank", 6).alias("pagerank")
    ).orderBy(F.col("pagerank").desc(), "nation")


_PROFILE_COLS = ["c_mktsegment", "c_nationkey", "c_acctbal", "c_name"]


@register(
    "q_null_profile",
    "\n    UNION ALL\n".join(
        f"""
    SELECT '{col}' AS column_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct
    FROM customer"""
        for col in _PROFILE_COLS
    ),
    "agg", "profiling",
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (row count, null count, exact
    distinct count) — the schema-drift / completeness check run before any
    pipeline ingests a new table (the engine's programmatic analog of the
    reference's eyeballed ``summary()``, SO:32).  ONE aggregate pass
    computes every column's stats; the unpivot to rows happens on the
    1-row aggregate via stack — the scan is never repeated per column."""
    cust = load_table(spark, sf_dir, "customer")
    agg = cust.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{i}")
            for i, c in enumerate(_PROFILE_COLS)
        ],
        *[
            F.countDistinct(F.col(c)).alias(f"nd_{i}")
            for i, c in enumerate(_PROFILE_COLS)
        ],
    )
    stack = ", ".join(
        f"'{c}', nn_{i}, nd_{i}" for i, c in enumerate(_PROFILE_COLS)
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, n_distinct)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@register(
    "q_dau_mau",
    """
    WITH dau AS (
        SELECT date_trunc('month', CAST(ts AS DATE)) AS m, CAST(ts AS DATE) AS d,
               count(DISTINCT user_id) AS dau
        FROM events GROUP BY 1, 2
    ),
    mau AS (
        SELECT date_trunc('month', CAST(ts AS DATE)) AS m,
               count(DISTINCT user_id) AS mau
        FROM events GROUP BY 1
    )
    SELECT strftime(mau.m, '%Y-%m') AS month,
           mau,
           round(avg(dau), 6) AS avg_dau,
           round(avg(dau) / mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.m = mau.m
    GROUP BY mau.m, mau
    ORDER BY month
    """,
    "agg", "distinct", "engagement",
)
def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — the product-engagement ratio (avg daily actives
    over monthly actives).  Two distinct-count aggregates over the same
    scan keyed by (month, day) and (month); the join is |months|-sized.
    At 100 TB exact count-distinct shuffles the (key, user) pairs once per
    granularity — the approx_count_distinct sketch variant is one function
    swap away (cf. q_sketch_rollup for mergeable HLL rollups)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    dau = ev.groupBy(
        F.date_trunc("month", d).alias("m"), d.alias("d")
    ).agg(F.countDistinct("user_id").alias("dau"))
    mau = ev.groupBy(F.date_trunc("month", d).alias("m2")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        dau.join(F.broadcast(mau), dau.m == mau.m2)
        .groupBy(F.date_format("m", "yyyy-MM").alias("month"), "mau")
        .agg(F.avg("dau").alias("__avg_dau"))
        .select(
            "month",
            "mau",
            F.round("__avg_dau", 6).alias("avg_dau"),
            F.round(F.col("__avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("month")
    )


@register(
    "q_dow_seasonality",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, sum(value) AS v FROM events GROUP BY 1
    )
    SELECT CAST(strftime(d, '%w') AS INT) + 1 AS dow,
           count(*) AS n_days,
           round(avg(v), 6) AS avg_daily_value,
           round(avg(v) / (SELECT avg(v) FROM daily), 6) AS seasonal_index
    FROM daily
    GROUP BY 1 ORDER BY 1
    """,
    "agg", "timeseries", "seasonality",
)
def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index (per-DOW average daily value over the
    overall daily average; 1 = Sunday, Spark's dayofweek convention) — the
    profile that decides whether a forecast needs weekly terms.  One fact
    pass to the daily rollup; the DOW aggregate and the grand-mean
    broadcast run on |days| rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    overall = daily.agg(F.avg("v").alias("grand"))
    return (
        daily.groupBy(F.dayofweek("d").alias("dow"))
        .agg(F.count(F.lit(1)).alias("n_days"), F.avg("v").alias("__avg"))
        .crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            F.round("__avg", 6).alias("avg_daily_value"),
            F.round(F.col("__avg") / F.col("grand"), 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "q_lorenz_curve",
    """
    WITH cust AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT revenue,
               ntile(10) OVER (ORDER BY revenue, o_custkey) AS decile
        FROM cust
    ),
    per AS (
        SELECT decile, count(*) AS n_customers, sum(revenue) AS rev
        FROM scored GROUP BY decile
    ),
    tot AS (SELECT sum(rev) AS total FROM per)
    SELECT decile,
           n_customers,
           round(sum(rev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 / total, 6) AS cum_revenue_share
    FROM per, tot
    ORDER BY decile
    """,
    "window", "stats", "inequality",
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile resolution — cumulative revenue share of the
    poorest 10%, 20%, ... of customers (the curve whose area the
    oracle-checked q_gini_coefficient integrates).  Composition of the
    round-5 primitives: global_ntile buckets the entity aggregate
    (range-partitioned, no single-task sort); the running share then runs
    over the 10-row decile table (bounded; audit-whitelisted); the grand
    total folds in as a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    scored = global_ntile(
        cust, [F.col("revenue"), F.col("o_custkey")], 10, bucket_col="decile"
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("revenue").alias("rev")
    )
    tot = per.agg(F.sum("rev").alias("total"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.round(F.sum("rev").over(w) / F.col("total"), 6).alias(
                "cum_revenue_share"
            ),
        )
        .orderBy("decile")
    )


@register(
    "q_key_skew_profile",
    """
    WITH k AS (
        SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ),
    s AS (
        SELECT count(*) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               round(avg(n), 6) AS avg_rows,
               CAST(max(n) AS BIGINT) AS max_rows
        FROM k
    ),
    top AS (
        SELECT key, n FROM k ORDER BY n DESC, key LIMIT 5
    )
    SELECT s.n_keys, s.n_rows, s.avg_rows, s.max_rows,
           round(s.max_rows / s.avg_rows, 6) AS skew_ratio,
           (SELECT min(key) FROM top) AS a_heavy_key
    FROM s
    """,
    "agg", "skew", "diagnostics",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the profiling pass run BEFORE choosing a
    join strategy (salting threshold, AQE skew-join expectations,
    posting-list caps): per-key row counts, max/avg skew ratio, and a
    representative heavy key.  One grouped aggregate + a 1-row reduction +
    a 5-row TakeOrderedAndProject; nothing key-ordered ever sorts
    globally.  Pairs with operators/skew.salted_join, which consumes
    exactly this ratio to pick its salt factor."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.round(F.avg("n"), 6).alias("avg_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
    )
    top = k.orderBy(F.col("n").desc(), "key").limit(5)
    heavy = top.agg(F.min("key").alias("a_heavy_key"))
    return (
        s.crossJoin(F.broadcast(heavy))
        .select(
            "n_keys",
            "n_rows",
            "avg_rows",
            "max_rows",
            F.round(F.col("max_rows") / F.col("avg_rows"), 6).alias("skew_ratio"),
            "a_heavy_key",
        )
    )


@register(
    "q_activity_bitmap",
    """
    WITH d AS (
        SELECT user_id,
               CAST(strftime(CAST(ts AS DATE), '%d') AS INT) AS dom
        FROM events
        WHERE user_id < 40 AND CAST(ts AS DATE) >= DATE '2024-01-01'
                           AND CAST(ts AS DATE) < DATE '2024-02-01'
    )
    SELECT user_id,
           CAST(bit_or(CAST(1 AS BIGINT) << (dom - 1)) AS BIGINT) AS days_mask,
           bit_count(bit_or(CAST(1 AS BIGINT) << (dom - 1))) AS days_active,
           CAST(min(dom) AS INT) AS first_day
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
    "agg", "bitmap", "engagement",
)
def q_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month presence encoded as a BITMAP (bit i-1 set = active on
    day i, January 2024): the roaring-bitmap-style trick that turns
    per-entity day SETS into one bigint — set union becomes bit_or,
    cardinality becomes bit_count, and cross-period retention becomes
    bitwise AND of two masks.  One grouped aggregate; the mask is
    mergeable, so partial aggregation combines map-side like any sum."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    # shiftleft's Python signature takes a literal shift; the SQL form takes
    # a column shift amount, so the bit goes through F.expr
    mask = F.bit_or(
        F.expr("shiftleft(CAST(1 AS BIGINT), dayofmonth(to_date(ts)) - 1)")
    )
    return (
        ev.where(
            (F.col("user_id") < 40)
            & (d >= F.lit("2024-01-01"))
            & (d < F.lit("2024-02-01"))
        )
        .groupBy("user_id")
        .agg(
            mask.cast("bigint").alias("days_mask"),
            F.bit_count(mask).alias("days_active"),
            F.min(F.dayofmonth(d)).cast("int").alias("first_day"),
        )
        .orderBy("user_id")
    )


@register(
    "q_peak_concurrency",
    """
    WITH pts AS (
        SELECT date_trunc('minute', ts) AS m, 1 AS delta FROM events
        UNION ALL
        SELECT date_trunc('minute', ts + INTERVAL 5 MINUTE) AS m, -1 AS delta
        FROM events
    ),
    net AS (
        SELECT m, sum(delta) AS net FROM pts GROUP BY m
    ),
    run AS (
        SELECT m,
               sum(net) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS concurrent
        FROM net
    )
    SELECT CAST(m AS DATE) AS day,
           CAST(max(concurrent) AS BIGINT) AS peak_concurrent
    FROM run
    GROUP BY 1
    ORDER BY 1
    """,
    "window", "timeseries", "sweep",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day via the interval-sweep trick: each
    event opens a 5-minute presence interval, endpoints become +1/-1
    deltas, and the running sum of deltas IS the concurrency at every
    instant — the capacity-planning statistic (max simultaneous sessions /
    connections / streams).

    Scale: deltas aggregate to MINUTE level first (one grouped pass — the
    running input is |calendar minutes|, not |events|), and the running
    sum uses operators/ranks.global_prefix_sum rather than a partition-less
    window, so even at years x per-second resolution the sweep never
    funnels through one task."""
    from ..operators.ranks import global_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    opens = ev.select(F.date_trunc("minute", "ts").alias("m"), F.lit(1).alias("delta"))
    closes = ev.select(
        F.date_trunc("minute", F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("m"),
        F.lit(-1).alias("delta"),
    )
    net = opens.unionByName(closes).groupBy("m").agg(F.sum("delta").alias("net"))
    run = global_prefix_sum(net, ["m"], "net", sum_col="concurrent")
    return (
        run.groupBy(F.col("m").cast("date").alias("day"))
        .agg(F.max("concurrent").cast("bigint").alias("peak_concurrent"))
        .orderBy("day")
    )


@register(
    "q_ks_test",
    """
    WITH base AS (
        SELECT o_totalprice AS v,
               CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END AS g1,
               CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS g2
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    ),
    lv AS (SELECT v, sum(g1) AS n1, sum(g2) AS n2 FROM base GROUP BY v),
    run AS (
        SELECT sum(n1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
               sum(n2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2
        FROM lv
    ),
    tot AS (
        SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
        FROM lv
    )
    SELECT t1 AS n_1995, t2 AS n_1996,
           round(max(abs(c1 * 1.0 / t1 - c2 * 1.0 / t2)), 6) AS ks_stat,
           max(abs(c1 * 1.0 / t1 - c2 * 1.0 / t2))
             > 1.358 * sqrt((t1 + t2) * 1.0 / (t1 * 1.0 * t2)) AS significant_95
    FROM run, tot
    GROUP BY t1, t2
    """,
    "window", "stats", "hypothesis-test", "drift",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test — did the order-price distribution
    shift between 1995 and 1996?  The distribution-drift detector that
    complements q_feature_drift_psi (PSI needs binning; KS compares the full
    ECDFs: statistic = max |F1(v) - F2(v)|).

    Scale shape: one grouped pass to VALUE LEVELS (per-value counts for
    both groups), then BOTH running counts from a single multi-column
    global_prefix_sum (one range exchange, one offsets broadcast — never a
    partition-less window over the level table), totals folded in as a
    1-row broadcast.  The ECDF differences are exact integer ratios, so the
    statistic matches the oracle bit-for-bit."""
    from ..operators.ranks import global_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    base = o.where(yr.isin(1995, 1996)).select(
        F.col("o_totalprice").alias("v"),
        F.when(yr == 1995, 1).otherwise(0).alias("g1"),
        F.when(yr == 1996, 1).otherwise(0).alias("g2"),
    )
    lv = base.groupBy("v").agg(F.sum("g1").alias("n1"), F.sum("g2").alias("n2"))
    run = global_prefix_sum(lv, ["v"], ["n1", "n2"], ["c1", "c2"])
    # group totals == terminal cumulative counts: no second fact pass
    tot = run.agg(
        F.max("c1").cast("bigint").alias("t1"),
        F.max("c2").cast("bigint").alias("t2"),
    )
    diff = F.abs(F.col("c1") / F.col("t1") - F.col("c2") / F.col("t2"))
    crit = 1.358 * F.sqrt((F.col("t1") + F.col("t2")) / (F.col("t1") * F.col("t2").cast("double")))
    return (
        run.crossJoin(F.broadcast(tot))
        .groupBy("t1", "t2")
        .agg(
            F.round(F.max(diff), 6).alias("ks_stat"),
            (F.max(diff) > F.max(crit)).alias("significant_95"),
        )
        .select(
            F.col("t1").alias("n_1995"),
            F.col("t2").alias("n_1996"),
            "ks_stat",
            "significant_95",
        )
    )


@register(
    "q_percentile_scalable",
    """
    WITH lv AS (
        SELECT l_extendedprice AS v, count(*) AS n FROM lineitem GROUP BY 1
    ),
    run AS (
        SELECT v, sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c
        FROM lv
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM lv)
    SELECT CAST(max(N) AS BIGINT) AS n_rows,
           min(CASE WHEN c >= ceil(0.50 * N) THEN v END) AS p50,
           min(CASE WHEN c >= ceil(0.95 * N) THEN v END) AS p95,
           min(CASE WHEN c >= ceil(0.99 * N) THEN v END) AS p99
    FROM run, tot
    """,
    "window", "stats", "percentile",
)
def q_percentile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles WITHOUT a sort and WITHOUT per-group value
    buffering — the 100 TB percentile recipe: aggregate to value LEVELS
    (one grouped pass), cumulative counts via the range-partitioned
    global_prefix_sum, then each percentile is `min v with cum >= ceil(p*N)`
    in one reduction.  Contrast the built-ins: exact `percentile` buffers
    every value per group in executor memory, `approx_percentile` trades
    exactness for a sketch (cf. q_sketch_rollup); the level-table form is
    exact at any scale for discrete-ish value domains (prices, durations,
    token counts — cardinality bounded by the domain, not the row count)."""
    from ..operators.ranks import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    lv = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # Spark resolves case-insensitively by default, so the total's alias
    # must not collide with the level count "n"
    run = global_prefix_sum(lv, ["v"], "n", sum_col="c").drop("n")
    # N == the terminal cumulative count: read it off the checkpointed run
    # instead of re-aggregating the fact table
    tot = run.agg(F.max("c").cast("bigint").alias("n_total"))

    def pick(p: float):
        return F.min(
            F.when(F.col("c") >= F.ceil(F.lit(p) * F.col("n_total")), F.col("v"))
        )

    return (
        run.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_total").cast("bigint").alias("n_rows"),
            pick(0.50).alias("p50"),
            pick(0.95).alias("p95"),
            pick(0.99).alias("p99"),
        )
    )


@register(
    "q_seasonal_decompose",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, round(sum(value), 2) AS v
        FROM events GROUP BY 1
    ),
    ma AS (
        SELECT d, v,
               CASE WHEN count(*) OVER w = 7
                    THEN avg(v) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, v,
           round(trend, 6) AS trend,
           round(v - trend, 6) AS detrended
    FROM ma
    ORDER BY day
    """,
    "window", "timeseries", "decomposition",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition step 1: centred 7-day moving-average TREND
    over the daily series plus the detrended residual (what a seasonal-
    adjustment or anomaly model consumes next).  Edge days with fewer than
    7 neighbours get NULL trend (both engines apply the same exact-count
    guard).  One fact pass to the daily rollup; the centred frame runs over
    |calendar days| (bounded; audit-whitelisted)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trend = F.when(F.count(F.lit(1)).over(w) == 7, F.avg("v").over(w))
    return (
        daily.withColumn("trend", trend)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "v",
            F.round("trend", 6).alias("trend"),
            F.round(F.col("v") - F.col("trend"), 6).alias("detrended"),
        )
        .orderBy("day")
    )


@register(
    "q_growth_accounting",
    """
    WITH um AS (
        SELECT DISTINCT user_id, date_trunc('month', CAST(ts AS DATE)) AS m
        FROM events
    ),
    flags AS (
        SELECT user_id, m,
               min(m) OVER (PARTITION BY user_id) AS first_m,
               lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
        FROM um
    )
    SELECT strftime(m, '%Y-%m') AS month,
           count(*) AS active_users,
           CAST(sum(CASE WHEN m = first_m THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN prev_m = m - INTERVAL 1 MONTH THEN 1 ELSE 0 END) AS BIGINT) AS retained_users,
           CAST(sum(CASE WHEN m <> first_m
                     AND (prev_m IS NULL OR prev_m < m - INTERVAL 1 MONTH)
                    THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users
    FROM flags
    GROUP BY m
    ORDER BY month
    """,
    "window", "agg", "engagement",
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the Social-Capital MAU framework): each month's
    actives split into NEW (first month ever), RETAINED (also active the
    previous month), and RESURRECTED (returning after a gap).  One distinct
    pass to (user, month), user-keyed windows (entity-partitioned — scales
    horizontally), then a months-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    um = ev.select(
        "user_id", F.date_trunc("month", F.to_date("ts")).alias("m")
    ).distinct()
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("m")
    flags = um.select(
        "m",
        F.min("m").over(wu).alias("first_m"),
        F.lag("m").over(wo).alias("prev_m"),
    )
    is_retained = F.col("prev_m") == F.col("m") - F.expr("INTERVAL 1 MONTH")
    return (
        flags.groupBy(F.date_format("m", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.when(F.col("m") == F.col("first_m"), 1).otherwise(0)).alias(
                "new_users"
            ),
            F.sum(F.when(is_retained, 1).otherwise(0)).alias("retained_users"),
            F.sum(
                F.when(
                    (F.col("m") != F.col("first_m"))
                    & (
                        F.col("prev_m").isNull()
                        | (F.col("prev_m") < F.col("m") - F.expr("INTERVAL 1 MONTH"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("resurrected_users"),
        )
        .orderBy("month")
    )


@register(
    "q_triangle_count",
    """
    WITH e0 AS MATERIALIZED (
        -- MATERIALIZED is load-bearing: e0 is referenced four times
        -- (e1/e2/e3 + the scalar edge count), and DuckDB's default CTE
        -- inlining replays the fact-table join per reference — at sf1 that
        -- spilled past 60 GB of temp disk before failing.  Materialized,
        -- the fact pass runs once and the triangle joins see ~|nations|^2
        -- edges.
        SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
                        greatest(c.c_nationkey, s.s_nationkey) AS b
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges
    FROM e0 e1
    JOIN e0 e2 ON e2.a = e1.b
    JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    "graph", "join",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the undirected nation trade graph — the graph
    clustering-coefficient primitive, via the canonical ORIENTED edge
    enumeration (every edge stored once as a < b; each triangle a<b<c is
    then found exactly once by the two-hop join a-b, b-c closed by a-c).
    The fact pass reduces to distinct dimension-key edges first; the
    triangle joins run on the edge table, never on facts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.select("l_orderkey", "l_suppkey")
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
    )
    # pin the edge table ONCE (<= |nations|² rows): it feeds four consumers
    # (e1/e2/e3 + the edge count), and without the checkpoint each one
    # replays the fact-table join — the same 4x replay the oracle needed
    # AS MATERIALIZED for (whitelisted in tools/eager_audit.py: AQE
    # materialises the fact pass at plan-build)
    e0 = pairs.select(
        F.least("c_nationkey", "s_nationkey").alias("a"),
        F.greatest("c_nationkey", "s_nationkey").alias("b"),
    ).distinct().localCheckpoint(eager=False)
    e1 = e0.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e0.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e0.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    edges = e0.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return tri.crossJoin(F.broadcast(edges))


@register(
    "q_roc_auc",
    """
    WITH scored AS (
        SELECT o_orderstatus = 'O' AS label,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r
        FROM orders
    ),
    s AS (
        SELECT sum(CASE WHEN label THEN r END) AS r1,
               sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS n_neg
        FROM scored
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           round((r1 - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * 1.0 * n_neg), 6) AS auc
    FROM s
    """,
    "window", "stats", "model-eval",
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the rank-sum identity AUC = (R+ - n+(n+ +1)/2) / (n+ n-)
    — the probability a random positive outranks a random negative, i.e.
    the model-evaluation twin of q_mann_whitney (here: does order price
    'predict' open status?).  One FACT-cardinality rank through
    operators/ranks.global_row_number + one reduction; no sorting the world
    through a single task, no per-threshold ROC sweep."""
    from ..operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "O").alias("label"),
        "o_totalprice",
        "o_orderkey",
    )
    ranked = global_row_number(o, ["o_totalprice", "o_orderkey"], rank_col="r")
    s = ranked.agg(
        F.sum(F.when(F.col("label"), F.col("r"))).alias("r1"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("label"), 1).otherwise(0)).alias("n_neg"),
    )
    np_, nn, r1 = (
        F.col("n_pos").cast("double"),
        F.col("n_neg").cast("double"),
        F.col("r1").cast("double"),
    )
    return s.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round((r1 - np_ * (np_ + 1) / 2.0) / (np_ * nn), 6).alias("auc"),
    )


@register(
    "q_referential_integrity",
    """
    SELECT 'lineitem->orders' AS fk,
           (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    ORDER BY fk
    """,
    "agg", "join", "data-quality",
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each foreign key —
    the ingest-gate check a warehouse runs before exposing a snapshot
    (the engine's programmatic analog of a constraint the reference's
    Delta tables would declare).  Each FK is one LEFT ANTI join reduced to
    a count; dimension sides broadcast, fact sides never shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")

    def audit(fact: DataFrame, fk: str, dim: DataFrame, pk: str, name: str) -> DataFrame:
        total = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        orphans = (
            fact.select(F.col(fk))
            .join(dim.select(F.col(pk).alias(fk)), on=fk, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return (
            total.crossJoin(F.broadcast(orphans))
            .select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(audit(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionByName(audit(li, "l_suppkey", s, "s_suppkey", "lineitem->supplier"))
        .orderBy("fk")
    )
