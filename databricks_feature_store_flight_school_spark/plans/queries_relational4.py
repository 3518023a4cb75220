"""Fourth relational batch: the last four TPC-H query shapes (Q8, Q13, Q20,
Q21), completing 22/22 on the driver's simplified star schema.  Where the
schema lacks a column the original uses (partsupp, commit/receipt dates,
p_mfgr), the predicate is adapted but the *plan shape* — the thing the engine
must execute well at 100 TB — is preserved and noted per query.  Same oracle
conventions as queries_relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from .catalog import register


@register(
    "q_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "join", "agg", "subquery",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): an 8-way join where one
    nation's share of regional revenue is a conditional-sum / sum ratio per
    order year.  Every dimension (part, customer->nation->region chain,
    supplier->nation) broadcasts; the only shuffle is the final small
    groupBy on year.  The p_type and r_name filters are pushed into the
    dimension scans so the fact join shrinks before it widens."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    c = load_table(spark, sf_dir, "customer")
    # customer-side nation restricted to the market region
    cn = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.select("p_partkey"), F.col("p_partkey") == l.l_partkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority NOT LIKE '1-%'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "join", "agg", "outer",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    with an extra non-key join predicate (priority NOT LIKE), so customers
    with zero qualifying orders survive with c_count = 0, then a second
    aggregation over the first's result.  Two shuffles by design (custkey,
    then c_count) — the second input is already tiny.  count(o_orderkey)
    counts non-null matches only, exactly the outer-join-aware semantics the
    original exercises."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").like("1-%")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_part_promotion_suppliers",
    """
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT sp.l_suppkey
        FROM (
            SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
            FROM lineitem l
            WHERE l.l_partkey IN (
                      SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey, l.l_partkey
        ) sp
        WHERE sp.qty > 0.5 * (
            SELECT max(sp2.qty)
            FROM (
                SELECT l2.l_suppkey, l2.l_partkey, sum(l2.l_quantity) AS qty
                FROM lineitem l2
                WHERE l2.l_partkey IN (
                          SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
                  AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l2.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY l2.l_suppkey, l2.l_partkey
            ) sp2
            WHERE sp2.l_partkey = sp.l_partkey
        )
    )
    ORDER BY s.s_name
    """,
    "join", "subquery", "semi",
)
def q_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers stocking promotion parts), adapted to the
    partsupp-free schema: 'availqty > half of shipped volume' becomes
    'supplier shipped more than half of the TOP supplier's volume for that
    part in the window'.  The plan shape is intact: a name-LIKE part filter
    feeding an IN, a grouped per-(supplier, part) aggregate, a correlated
    per-part threshold (decorrelated to a groupwise-max join, Q2/Q17 style),
    and a final semi join back to supplier.  The per-part max is a second
    small aggregate over the same grouped result — computed once, broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(red, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    per_part_max = sp.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.max("qty").alias("max_qty")
    )
    qualified = (
        sp.join(per_part_max, F.col("pp_key") == F.col("l_partkey"))
        .where(F.col("qty") > 0.5 * F.col("max_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(qualified, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q_waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    "join", "subquery", "semi", "anti",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the sole late
    supplier on a multi-supplier order.  'Late' is adapted to the
    commit/receipt-free schema as shipping >90 days after the order date.

    The oracle states it as correlated EXISTS / NOT EXISTS; the Spark plan
    uses the standard decorrelated rewrite — ONE extra aggregate per order
    (distinct suppliers, distinct LATE suppliers) instead of two correlated
    per-row probes of the fact table.  That turns what a naive engine runs as
    two additional lineitem self-joins into a single reusable shuffle on
    l_orderkey, the rewrite you want at 100 TB."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    lo = l.join(
        o.select("o_orderkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey")
    ).withColumn("is_late", late)
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    sole_late = per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        lo.where(F.col("is_late"))
        .join(sole_late, F.col("po_key") == F.col("l_orderkey"))
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q_sketch_rollup",
    None,  # sketch estimates are implementation-defined -> rows-only
    "agg", "sketch", "rows-only",
    pinned_by=("test_sketch_rollup_matches_exact_within_error", "test_freq_items_sketch_covers_exact_heavy_hitters"),
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level MERGEABLE-summary rollup — the pattern that makes 100 TB
    distinct-count/quantile dashboards cheap: leaf aggregates build
    Datasketches HLL (distinct customers) and KLL (account-balance quantile)
    sketches per nation; the region level merges the *sketches*
    (hll_union_agg / kll merge), never re-touching the fact rows.  Accuracy
    vs the exact aggregates is pinned in tests/test_operators.py."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("cust_hll"),
            F.kll_sketch_agg_double("c_acctbal").alias("bal_kll"),
        )
    )
    # KLL exposes a scalar two-sketch merge (not an aggregate): collect the
    # handful of nation sketches per region and fold them — the collected
    # list is dimension-sized (nations per region), never fact-sized.
    merged_kll = F.aggregate(
        F.slice(F.col("klls"), 2, F.size(F.col("klls"))),
        F.element_at(F.col("klls"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("cust_hll")).alias("est_customers"),
            F.collect_list("bal_kll").alias("klls"),
        )
        .select(
            "n_regionkey",
            "est_customers",
            F.kll_sketch_get_quantile_double(merged_kll, F.lit(0.5)).alias(
                "est_median_bal"
            ),
        )
        .orderBy("n_regionkey")
    )


@register(
    "q_regression_aggregates",
    """
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n_pairs,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_unit,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS base_price,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS fit_r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg", "stats", "regression",
)
def q_regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares as AGGREGATES (regr_slope /
    regr_intercept / regr_r2): the closed-form per-segment trend fit that
    would otherwise tempt a grouped-map pandas UDF.  Same one-pass
    (n, Σx, Σy, Σxy, Σx²) partial+final merge as corr/covar — fully
    distributed, no Python, mergeable across partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).alias("n_pairs"),
            F.round(F.regr_slope(y, x), 6).alias("price_per_unit"),
            F.round(F.regr_intercept(y, x), 6).alias("base_price"),
            F.round(F.regr_r2(y, x), 6).alias("fit_r2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_window_ignore_nulls",
    """
    WITH flagged AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price
        FROM orders
        WHERE o_custkey < 50
    )
    SELECT o_custkey, o_orderkey,
           round(lag(big_price IGNORE NULLS) OVER w, 2) AS prev_big_price,
           round(last_value(big_price IGNORE NULLS) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_last_big
    FROM flagged
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    "window", "nulls",
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation — the gap-bridging form of lag /
    last_value: each order sees the most recent PRECEDING big-ticket price,
    skipping orders that had none (null).  The sparse-event forward-fill
    primitive (same mechanics as observation carry-forward in PIT feature
    pipelines)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    big = F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # lag(x IGNORE NULLS) == last non-null over the strictly-preceding frame
    prev = F.last("big_price", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.last("big_price", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.withColumn("big_price", big)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(prev, 2).alias("prev_big_price"),
            F.round(running, 2).alias("running_last_big"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_string_agg",
    """
    SELECT n.n_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments,
           count(DISTINCT c.c_mktsegment) AS n_segments
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_custkey < 200
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    "agg", "strings",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): the distinct market segments per
    nation, sorted then joined — deterministic despite partial-aggregation
    order because the sort happens AFTER collect (array_sort o collect_set),
    exactly how a distributed engine must phrase ordered concatenation."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("n_name")
    )


@register(
    "q_date_spine_gapfill",
    """
    WITH months AS (
        SELECT unnest(generate_series(
            TIMESTAMP '1998-01-01 00:00:00',
            TIMESTAMP '1998-12-01 00:00:00',
            INTERVAL 1 MONTH)) AS month_start
    ),
    rev AS (
        SELECT date_trunc('month', o_orderdate) AS month_start,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders
        WHERE o_custkey < 20
          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1
    )
    SELECT strftime(m.month_start, '%Y-%m-%d') AS month,
           coalesce(rev.revenue, 0.0) AS revenue,
           coalesce(rev.n_orders, 0) AS n_orders
    FROM months m LEFT JOIN rev ON rev.month_start = m.month_start
    ORDER BY month
    """,
    "dates", "gapfill", "join",
)
def q_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine + gap fill: generate every month of 1998 with
    ``sequence``/explode, left-join the sparse revenue aggregate, zero-fill
    the holes — the report-completeness idiom (a month with no orders must
    appear as 0, not vanish).  The spine is 12 rows: generated driver-free,
    joined broadcast."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_custkey") < 20)
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    rev = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    spine = load_table(spark, sf_dir, "region").limit(1).select(
        F.explode(
            F.sequence(
                F.lit("1998-01-01").cast("timestamp_ntz"),
                F.lit("1998-12-01").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    return (
        spine.join(F.broadcast(rev), "month_start", "left")
        .select(
            F.date_format("month_start", "yyyy-MM-dd").alias("month"),
            F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("month")
    )
