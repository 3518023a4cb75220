"""Third relational batch: the remaining TPC-H shapes expressible on the
driver's simplified star schema (no partsupp / commit-receipt dates), plus
grouping sets, unpivot, and exact percentiles.  Same oracle conventions as
queries_relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from .catalog import register


@register(
    "q_nation_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    "join", "agg",
)
def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by year.
    Both nation dims broadcast twice under different aliases; the nation
    filters reach the dimension scans so the fact join shrinks first."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q_product_type_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount) - 0.9 * p.p_retailprice * l.l_quantity), 4) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    "join", "agg",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus 90%-of-retail supply cost — the
    partsupp-free stand-in) by supplier nation and year for one product
    family.  The part LIKE filter prunes the fact rows via the dim join
    before any wide shuffle; part/supplier are sf-proportional, so neither
    carries a forced broadcast hint (AQE broadcasts at low SF)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.9 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(F.round(F.sum(amount), 4).alias("profit"))
        .orderBy(F.col("nation"), F.col("order_year").desc())
    )


@register(
    "q_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "join", "agg", "subquery",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum half-year revenue.
    The revenue aggregate is computed once and self-referenced for the max
    (a 1-row broadcast), not recomputed per row."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        s.join(revenue, revenue.supplier_no == s.s_suppkey)
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%' AND p.p_size IN (5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
    "join", "agg", "distinct",
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp-free: distinct suppliers observed shipping
    the part): NOT-LIKE + IN-list predicates pushed to the dim scan, exact
    distinct count per group; the filtered part dim is sf-proportional, so
    AQE (not a hint) chooses the join strategy."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


@register(
    "q_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
    "join", "filter",
)
def q_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive range predicates spanning
    both join sides — Catalyst extracts the common p_partkey equi-key and
    keeps the OR as a post-join filter; the p_brand IN superset is pushed to
    the part scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    # no broadcast hint on part: it is sf-proportional (sf x 200k rows), so
    # a forced broadcast is the same 100x OOM the supplier hint was (r5
    # verdict); AQE broadcasts it at low SF on its own.  revenue rounds at
    # 2 (money convention — single group over ~360k rows at sf1 puts the
    # 4th decimal inside summation-order noise).
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_rich_customers_no_orders",
    """
    SELECT substr(c.c_name, 10, 1) AS name_digit,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    ORDER BY 1
    """,
    "join", "agg", "subquery", "anti",
)
def q_rich_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders — uncorrelated scalar subquery (1-row broadcast) + left-anti
    join (the date scope keeps the result non-empty on the dense testdata)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("name_digit")
    )


@register(
    "q_nation_value_share",
    """
    WITH nation_value AS (
        SELECT n.n_name, round(sum(s.s_acctbal), 2) AS nation_bal
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name)
    SELECT n_name, nation_bal
    FROM nation_value
    WHERE nation_bal > (SELECT 0.05 * sum(nation_bal) FROM nation_value)
    ORDER BY nation_bal DESC, n_name
    """,
    "agg", "subquery",
)
def q_nation_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free: supplier account balance per nation
    vs a fraction-of-global threshold).  The grouped aggregate is reused for
    the global sum — one shuffle, then a 1-row broadcast filter."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nation_value = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("s_acctbal"), 2).alias("nation_bal"))
    )
    threshold = nation_value.agg((0.05 * F.sum("nation_bal")).alias("__thr"))
    return (
        nation_value.crossJoin(F.broadcast(threshold))
        .where(F.col("nation_bal") > F.col("__thr"))
        .select("n_name", "nation_bal")
        .orderBy(F.col("nation_bal").desc(), "n_name")
    )


@register(
    "q_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 6) AS q1_quantity
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg", "percentile",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (DuckDB ``quantile_cont``
    semantics), computed via the level-table operators/ranks.group_quantile_cont
    (round 10): Spark's builtin exact ``percentile`` buffers a value->count
    map per group and its final merge holds every distinct price of 60M
    rows in one buffer — measured killing the sf10 JVM in the full-catalog
    sweep.  The level-table form's window input is the value domain, not the row count, and returns identical values.  The
    sketch-based scale path for unbounded groups is percentile_approx."""
    from ..operators.ranks import group_quantile_cont

    li = load_table(spark, sf_dir, "lineitem")
    price = group_quantile_cont(
        li, "l_returnflag", "l_extendedprice",
        {"__med": 0.5, "__p90": 0.9},
    )
    qty = group_quantile_cont(li, "l_returnflag", "l_quantity", {"__q1": 0.25})
    return (
        price.join(qty, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("__med", 6).alias("median_price"),
            F.round("__p90", 6).alias("p90_price"),
            F.round("__q1", 6).alias("q1_quantity"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS order_count
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "agg", "grouping-sets",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form cube/rollup specialize):
    one Expand node feeding a single aggregate — not two scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS order_count
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "q_unpivot",
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
    "setops", "unpivot",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide attributes into (attr, val) rows — the inverse of
    q_events_pivot; a zero-shuffle Expand, not a self-union of scans."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice")
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")
    )


@register(
    "q_salted_join",
    """
    SELECT c.c_mktsegment,
           count(*) AS order_count,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    "join", "skew",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (operators/skew.py): result-identical to
    the plain join — the oracle is exactly that — but hot customer keys are
    spread over 8 shuffle partitions before the exchange.  AQE's skew
    splitting handles post-shuffle SMJ skew; salting is the pre-planned form
    that works for every join strategy."""
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, customer, on="o_custkey", how="inner", salt=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_window_dist_functions",
    """
    SELECT s_suppkey,
           round(s_acctbal, 2) AS acctbal,
           round(percent_rank() OVER w, 9) AS bal_pct_rank,
           round(cume_dist() OVER w, 9) AS bal_cume_dist
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
    "window",
)
def q_window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) over a global
    ordering, computed WITHOUT the single-partition window: the order key
    (s_acctbal, s_suppkey) is unique, so percent_rank = (i-1)/(N-1) and
    cume_dist = i/N over operators/ranks.global_row_number's two-pass
    range-partitioned rank — identical values, horizontal scaling (supplier
    grows with SF)."""
    from ..operators.ranks import global_row_number

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ranked = global_row_number(sup, ["s_acctbal", "s_suppkey"], rank_col="__i")
    total = sup.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round((F.col("__i") - 1) / (F.col("__n") - 1), 9).alias("bal_pct_rank"),
            F.round(F.col("__i") / F.col("__n"), 9).alias("bal_cume_dist"),
        )
    )


@register(
    "q_array_agg",
    """
    SELECT n_regionkey,
           list_sort(list(n_name)) AS nations,
           len(list(n_name)) AS nation_count
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    "agg", "arrays",
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_list is order-nondeterministic after a
    shuffle, so results are sort_array-normalised (same rule the oracle
    applies with list_sort) — the deterministic form of grouped collection."""
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nations"),
            F.count(F.lit(1)).alias("nation_count"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "q_regexp_extract",
    """
    SELECT regexp_extract(p_name, '^([a-z]+) ', 1) AS adjective,
           count(*) AS part_count,
           round(avg(p_retailprice), 6) AS avg_price
    FROM part
    GROUP BY 1
    ORDER BY 1
    """,
    "functions", "regex",
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (Java and RE2 agree on this anchored class
    pattern), grouped aggregation over the extracted token."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy(F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("adjective"))
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
        .orderBy("adjective")
    )


@register(
    "q_window_range_between",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS trailing_90d_spend
    FROM orders
    """,
    "window", "range",
)
def q_window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): trailing-90-day
    spend per customer.  Ordered by epoch seconds so the frame is an
    arithmetic range both engines implement identically."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_90d_spend"),
    )


@register(
    "q_date_arithmetic",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
           (year(o_orderdate) * 100 + month(o_orderdate)) AS order_month_id,
           CAST(dayofweek(o_orderdate) AS INT) AS order_dow
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00'
    """,
    "functions", "dates",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: interval add, day difference, month id,
    day-of-week (both engines: Sunday=0? DuckDB dayofweek Sunday=0,
    Spark dayofweek Sunday=1 — aligned by subtracting 1)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp_ntz")
    )
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("order_month_id"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
    )


@register(
    "q_group_normalize",
    """
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_custkey))
                 / stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS price_zscore
    FROM orders
    QUALIFY count(*) OVER (PARTITION BY o_custkey) > 1
    """,
    "pandas", "applyInPandas", "window",
)
def q_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer z-score normalisation, the
    canonical 'custom per-group computation' shape (each key group becomes
    one pandas frame on a worker).  The oracle is the equivalent window SQL
    — for THIS computation the pure-window form is what production should
    use (no Python); applyInPandas is for logic windows can't express, and
    this query pins that the grouped-map plumbing computes exactly what the
    relational form does.  Single-row groups are dropped (stddev undefined)."""
    import pandas as pd

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o_custkey": pdf["o_custkey"], "o_orderkey": pdf["o_orderkey"]}
        )
        if len(pdf) < 2:
            return out.iloc[0:0].assign(price_zscore=0.0)
        z = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()) / pdf[
            "o_totalprice"
        ].std(ddof=1)
        return out.assign(price_zscore=z.round(6))

    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(normalize, "o_custkey bigint, o_orderkey bigint, price_zscore double")
    )


@register(
    "q_stats_aggregates",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_discount), 9) AS discount_stddev,
           round(var_samp(l_tax), 9) AS tax_variance
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg", "stats",
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (corr/covar/stddev/variance) — one pass,
    partial+final merge of (n, sum, sum-of-products) sketches per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
            F.round(F.stddev_samp("l_discount"), 9).alias("discount_stddev"),
            F.round(F.var_samp("l_tax"), 9).alias("tax_variance"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_argmax_aggregates",
    """
    SELECT o_orderpriority,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           round(max(o_totalprice), 2) AS top_price,
           min_by(o_orderkey,
                  CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                      * 10000000000 + o_orderkey) AS earliest_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "agg", "argmax",
)
def q_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates (max_by / min_by): the single-pass form of
    'row with the extreme value per group' — no self-join, no window.
    min_by ties ARE possible on o_orderdate (several orders share the
    earliest day at sf>=0.1), so the ordering key is the composite
    (days-since-epoch, orderkey) packed into one BIGINT — min_by stays a
    single-pass aggregate and both engines pick the same row.  max_by on
    o_totalprice keeps the raw key (price ties don't occur in the fixture;
    caught at sf0.1 by the multi-SF replica sweep, round 5)."""
    o = load_table(spark, sf_dir, "orders")
    date_key = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint") * 10000000000 + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.round(F.max("o_totalprice"), 2).alias("top_price"),
            F.min_by("o_orderkey", date_key).alias("earliest_order"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_sessionize_by_lag",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w <= 600
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    "window", "events", "sessionize",
)
def q_sessionize_by_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag + running sum — the window-function
    route to session ids (F.session_window is the built-in twin,
    q_session_window).  Useful when the session id itself must persist."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ts reads as TIMESTAMP_NTZ from parquet, which has no direct cast to
    # long; hop through TIMESTAMP (session tz is pinned UTC -> deterministic,
    # matches the oracle's epoch(ts)).
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            (epoch_s - F.lag(epoch_s).over(w)) <= 600,
            0,
        ).otherwise(1),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(wrun))
    return (
        sessions.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_full_outer_join",
    """
    WITH buyers AS (SELECT o_custkey AS custkey, count(*) AS n_orders
                    FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
                    GROUP BY o_custkey),
    holders AS (SELECT c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
                FROM customer WHERE c_acctbal > 9000)
    SELECT coalesce(b.custkey, h.custkey) AS custkey,
           coalesce(b.n_orders, 0) AS n_orders,
           coalesce(h.acctbal, 0.0) AS acctbal,
           (b.custkey IS NOT NULL AND h.custkey IS NOT NULL) AS in_both
    FROM buyers b FULL OUTER JOIN holders h ON h.custkey = b.custkey
    """,
    "join", "outer",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets (recent buyers x high-balance
    holders) with coalesced keys — rows survive from BOTH unmatched sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers = (
        o.where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .groupBy(F.col("o_custkey").alias("b_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    holders = c.where(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("h_custkey"), F.round("c_acctbal", 2).alias("acctbal")
    )
    return (
        buyers.join(holders, buyers.b_custkey == holders.h_custkey, "full_outer")
        .select(
            F.coalesce("b_custkey", "h_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("acctbal", F.lit(0.0)).alias("acctbal"),
            (F.col("b_custkey").isNotNull() & F.col("h_custkey").isNotNull()).alias("in_both"),
        )
    )


@register(
    "q_percentile_approx",
    None,  # t-digest sketch values are Spark-specific -> rows-only
    "agg", "percentile", "approx", "rows-only",
    pinned_by=("test_percentile_approx_error_bound",),
)
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx: the sketch (fixed-memory) scale path of
    q_percentiles — at 100 TB an exact percentile means a full sort per
    group; the approx form merges bounded sketches instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("median_price_approx"),
            F.percentile_approx("l_extendedprice", 0.9, 10000).alias("p90_price_approx"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_map_functions",
    """
    WITH agg AS (SELECT o_orderstatus AS k, count(*) AS v
                 FROM orders GROUP BY 1),
    m AS (SELECT map_from_entries(list(row(k, v) ORDER BY k)) AS mp FROM agg)
    SELECT unnest(map_keys(mp)) AS status,
           unnest(map_values(mp)) AS order_count,
           len(map_keys(mp)) AS n_statuses
    FROM m
    ORDER BY status
    """,
    "functions", "maps",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type round trip: grouped counts -> map_from_entries -> map_keys /
    map_values exploded back to rows (arrays_zip keeps key/value rows
    aligned).  Entries are key-sorted on both sides — map iteration order is
    otherwise engine-defined."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderstatus").alias("k")).agg(
        F.count(F.lit(1)).alias("v")
    )
    m = agg.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("k", "v")))
        ).alias("mp")
    )
    return (
        m.select(
            F.explode(F.arrays_zip(F.map_keys("mp"), F.map_values("mp"))).alias("e"),
            F.size(F.map_keys("mp")).alias("n_statuses"),
        )
        .select(
            F.col("e.0").alias("status"),
            F.col("e.1").alias("order_count"),
            "n_statuses",
        )
        .orderBy("status")
    )


@register(
    "q_month_over_month",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month_id,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1)
    SELECT month_id, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month_id), 2) AS mom_change,
           round(100.0 * (revenue - lag(revenue) OVER (ORDER BY month_id))
                 / lag(revenue) OVER (ORDER BY month_id), 6) AS mom_pct
    FROM monthly
    ORDER BY month_id
    """,
    "window", "agg", "analytics",
)
def q_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over an aggregate: monthly revenue with month-over-month delta
    and percent change.  The window reuses the aggregate's output directly —
    the monthly rollup is tiny, so the global-order window is a single
    ~80-row partition, not a scale hazard."""
    from pyspark.sql.window import Window

    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("month_id")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("month_id")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month_id",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_change"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 6).alias("mom_pct"),
    ).orderBy("month_id")


@register(
    "q_revenue_pareto",
    """
    WITH per_cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS cust_revenue
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT o_custkey, cust_revenue,
             row_number() OVER (ORDER BY cust_revenue DESC, o_custkey) AS rnk,
             sum(cust_revenue) OVER (ORDER BY cust_revenue DESC, o_custkey
                                     ROWS UNBOUNDED PRECEDING) AS running_revenue,
             sum(cust_revenue) OVER () AS total_revenue
      FROM per_cust)
    SELECT rnk, o_custkey, cust_revenue,
           round(running_revenue / total_revenue, 9) AS cumulative_share
    FROM ranked
    WHERE rnk <= 100
    ORDER BY rnk
    """,
    "window", "agg", "analytics",
)
def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto curve: top-100 customers by revenue with cumulative share of
    the total.  The top-100 cut runs FIRST as ``orderBy().limit(100)``
    (TakeOrderedAndProject: per-partition heaps, no global sort over the
    entity-cardinality rollup), the grand total folds in as a 1-row
    broadcast, and the rank/running-sum window then touches only the 100
    surviving rows — the running sum over the ordered top-100 equals the
    running sum over all customers at those ranks, so values are
    unchanged."""
    from pyspark.sql.window import Window

    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("cust_revenue"))
    )
    totals = per_cust.agg(F.sum("cust_revenue").alias("__total"))
    order = [F.col("cust_revenue").desc(), F.col("o_custkey")]
    top = per_cust.orderBy(*order).limit(100)
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(Window.orderBy(*order)).alias("rnk"),
            "o_custkey",
            "cust_revenue",
            F.round(
                F.sum("cust_revenue").over(w_run) / F.col("__total"), 9
            ).alias("cumulative_share"),
        )
        .orderBy("rnk")
    )


@register(
    "q_histogram",
    """
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 13
                ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS price_bucket,
           count(*) AS order_count,
           round(min(o_totalprice), 2) AS bucket_min,
           round(max(o_totalprice), 2) AS bucket_max
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    "agg", "histogram",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (12 bins over [0, 600k); the
    oracle spells out the same binning rule — DuckDB has no width_bucket):
    single-pass grouped count per bin."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
                "price_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
        .orderBy("price_bucket")
    )


@register(
    "q_status_transitions",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderstatus,
             lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS prev_status
      FROM orders)
    SELECT prev_status, o_orderstatus AS next_status, count(*) AS transitions
    FROM seq WHERE prev_status IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "window", "agg", "analytics",
)
def q_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition counts: consecutive order statuses per
    customer (lag window) aggregated into a transition matrix."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = load_table(spark, sf_dir, "orders").select(
        F.lag("o_orderstatus").over(w).alias("prev_status"),
        F.col("o_orderstatus").alias("next_status"),
    )
    return (
        seq.where(F.col("prev_status").isNotNull())
        .groupBy("prev_status", "next_status")
        .agg(F.count(F.lit(1)).alias("transitions"))
        .orderBy("prev_status", "next_status")
    )


@register(
    "q_group_size_profile",
    """
    SELECT lines_per_order, count(*) AS order_count
    FROM (SELECT l_orderkey, count(*) AS lines_per_order
          FROM lineitem GROUP BY l_orderkey)
    GROUP BY lines_per_order
    ORDER BY lines_per_order
    """,
    "agg", "profiling", "skew",
)
def q_group_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size distribution (double aggregation): how many orders have N
    line items — the data-profiling query behind skew decisions (a heavy
    tail here means the join/agg key needs salting or AQE skew handling)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("lines_per_order"))
        .groupBy("lines_per_order")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("lines_per_order")
    )


@register(
    "q_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice), 2) AS small_qty_revenue,
           count(*) AS small_qty_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_threshold
    """,
    "join", "agg", "subquery",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below half
    the per-part average — a correlated aggregate subquery, decorrelated the
    scalable way: ONE groupBy(l_partkey) pre-aggregate, then a join back to
    the fact instead of a per-row subquery re-execution.  The per-part
    average table is |part|-sized — sf-proportional, so it carries no
    forced broadcast (AQE decides; co-keyed hash join at 100 TB); the fact
    table is scanned once, not once per row.
    Reference ships no subqueries (SURVEY.md §2.12) — this is the driver-set
    extension shape."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(part.where(F.col("p_brand") == "Brand#1").select("p_partkey"),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("small_qty_lines"),
        )
    )


@register(
    "q_groupwise_min_joinback",
    """
    SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice AS min_price
    FROM part p
    JOIN (SELECT p_type, min(p_retailprice) AS mn
          FROM part GROUP BY p_type) m
      ON m.p_type = p.p_type AND p.p_retailprice = m.mn
    ORDER BY p.p_type, p.p_partkey
    """,
    "join", "agg", "subquery",
)
def q_groupwise_min_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-free): recover the full row(s) achieving the
    per-group minimum by joining the grouped MIN back to the base table —
    the classic groupwise-minimum plan.  Unlike the window-rank variant
    (q_window_topn_per_customer) this keeps ties and needs no per-partition
    sort: aggregate once (map-side partial), broadcast the small
    group->min table, one stage.  Reference has no aggregates at all
    (SURVEY.md §2.4) — extension shape."""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_type").alias("m_type")).agg(
        F.min("p_retailprice").alias("mn")
    )
    return (
        part.join(
            F.broadcast(mins),
            (F.col("m_type") == F.col("p_type")) & (F.col("p_retailprice") == F.col("mn")),
        )
        .select("p_type", "p_partkey", "p_name", F.col("p_retailprice").alias("min_price"))
        .orderBy("p_type", "p_partkey")
    )


@register(
    "q_price_band_join",
    """
    SELECT b.tier, count(*) AS orders_in_tier,
           round(sum(o.o_totalprice), 2) AS tier_revenue
    FROM orders o
    JOIN (VALUES ('budget', 0.0, 25000.0),
                 ('mid', 25000.0, 120000.0),
                 ('premium', 120000.0, 300000.0),
                 ('luxury', 300000.0, 1e12)) AS b(tier, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.tier
    ORDER BY b.tier
    """,
    "join", "non-equi", "agg",
)
def q_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: assign each order to an *irregular* price tier via
    a non-equi BETWEEN join — the interval-lookup shape that arithmetic
    binning (q_histogram's equi-width buckets) cannot express.  The band
    table is rows-tiny, so the right physical plan IS a broadcast
    nested-loop join: each fact row scans 4 in-memory intervals, no
    shuffle, no sort.  At 100 TB the fact side streams through unchanged;
    if the band table ever grew large (thousands of intervals), the scale
    path is bucketing both sides on a coarsened grid (floor(price/step))
    and equi-joining before the residual range filter.  Reference has no
    non-equi joins (SURVEY.md §2.3) — extension shape."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 25_000.0),
            ("mid", 25_000.0, 120_000.0),
            ("premium", 120_000.0, 300_000.0),
            ("luxury", 300_000.0, 1e12),
        ],
        "tier string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("orders_in_tier"),
            F.round(F.sum("o_totalprice"), 2).alias("tier_revenue"),
        )
        .orderBy("tier")
    )


@register(
    "q_boolean_aggregates",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_above_1k,
           bool_or(o_totalprice > 400000) AS any_above_400k,
           count(*) FILTER (o_orderstatus = 'F') AS finished_orders,
           count(*) AS total_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "agg",
)
def q_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: ``bool_and``/``bool_or`` (ANSI EVERY/ANY)
    plus a FILTER-clause conditional count (``count_if``).  All are plain
    partial+final hash aggregates — each executor reduces its partition to
    one boolean/long per group before the single shuffle, so the reduction
    is map-side like any sum.  Reference has no aggregates (SURVEY.md §2.4)
    — extension shape."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_above_400k"),
            F.count_if(F.col("o_orderstatus") == "F").alias("finished_orders"),
            F.count(F.lit(1)).alias("total_orders"),
        )
        .orderBy("o_orderpriority")
    )
