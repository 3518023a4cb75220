"""Second batch of relational queries: remaining TPC-H shapes, deeper
window/string/math/null-handling coverage, cube/grouping sets, correlated
subqueries (SURVEY.md §2.12 completions).  Same oracle conventions as
queries_relational.py (identity rounding, stringified dates, tie-broken
top-k)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register


def _date(col: str):
    return F.date_format(F.col(col), "yyyy-MM-dd")


# -- TPC-H shapes -----------------------------------------------------------

@register(
    "q_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS promo_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
    "agg", "filter",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+scalar agg — every predicate reaches
    the parquet reader; no shuffle at all (single-row partial agg merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 25)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("promo_revenue"))


@register(
    "q_late_shipment_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL '60 days')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "join", "agg",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a cross-table predicate -> left_semi join
    on the pre-filtered pair condition."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate.cast("date"), 60).cast("timestamp_ntz")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_returned_item_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "join", "agg", "topk",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returns the most merchandise."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_priority_shipmode",
    """
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    "join", "agg",
)
def q_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts split by priority class over a
    non-equi extra join predicate."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_promo_revenue_pct",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'STANDARD%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS standard_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    """,
    "join", "agg",
)
def q_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue; part is
    broadcast (dimension) so the fact scan never shuffles."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("STANDARD%"), rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("standard_pct")
        )
    )


@register(
    "q_large_volume_orders",
    """
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(q.sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    "join", "agg", "having",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: pre-aggregated IN-subquery folded into a join (the
    aggregate shrinks the fact side before any wide join)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            _date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


# -- window depth -----------------------------------------------------------

@register(
    "q_window_rank_dense_ntile",
    """
    SELECT c_custkey, c_acctbal,
           rank() OVER w AS bal_rank,
           dense_rank() OVER w AS bal_dense_rank,
           ntile(4) OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    "window",
)
def q_window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    "q_window_lead_first_last",
    """
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_order_price,
           round(last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_order_price,
           round(lead(o_totalprice) OVER w, 2) AS next_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window",
)
def q_window_lead_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_order_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_order_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_order_price"),
    )


@register(
    "q_moving_average",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_3
    FROM orders
    """,
    "window",
)
def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 6).alias("moving_avg_3"),
    )


# -- grouping sets / cube / counts ------------------------------------------

@register(
    "q_cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS order_count,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "agg", "cube",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q_count_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS distinct_customers,
           count(*) AS order_count
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "agg", "distinct",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (expand+two-phase agg under the hood); the
    approximate HLL variant is q_approx_count_distinct (rows-only)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_approx_count_distinct",
    None,  # HyperLogLog++ sketch values are Spark-specific -> rows-only
    "agg", "approx", "rows-only",
    pinned_by=("test_approx_count_distinct_error_bound",),
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct: the sketch answer at unbounded-cardinality
    scale (HLL++, fixed memory per group vs countDistinct's expand)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )


# -- correlated / scalar subqueries ----------------------------------------

@register(
    "q_above_nation_average",
    """
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
    "subquery", "window",
)
def q_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated the scalable way: one window
    average per nation instead of a per-row subquery re-execution."""
    w = Window.partitionBy("c_nationkey")
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("__nation_avg", F.avg("c_acctbal").over(w))
        .where(F.col("c_acctbal") > F.col("__nation_avg"))
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "q_global_scalar_subquery",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
    "subquery",
)
def q_global_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: the single-row aggregate broadcasts as
    a literal into every partition's filter (cross-join of a 1-row frame)."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg((1.5 * F.avg("o_totalprice")).alias("__threshold"))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("__threshold"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


# -- scalar function coverage ----------------------------------------------

@register(
    "q_string_functions",
    """
    SELECT upper(c_mktsegment) AS seg_upper,
           substr(c_name, 1, 9) AS name_prefix,
           concat(c_name, '#', CAST(c_nationkey AS VARCHAR)) AS name_tag,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           (c_name LIKE '%0001%') AS has_0001
    FROM customer
    """,
    "functions", "strings",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_nationkey").cast("string")).alias("name_tag"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.col("c_name").like("%0001%").alias("has_0001"),
    )


@register(
    "q_math_functions",
    """
    SELECT l_linenumber,
           round(sum(abs(l_extendedprice - l_retail)), 2) AS abs_diff_sum,
           round(sum(ceil(l_quantity / 7.0)), 2)::BIGINT AS ceil_sum,
           round(sum(floor(l_quantity / 7.0)), 2)::BIGINT AS floor_sum,
           round(sum(sqrt(l_quantity)))::BIGINT AS sqrt_sum,
           round(sum(ln(l_extendedprice)))::BIGINT AS ln_sum,
           round(sum(CAST(l_quantity AS BIGINT) % 5), 2)::BIGINT AS mod_sum
    FROM (SELECT l_linenumber, l_quantity, l_extendedprice,
                 l_quantity * 1000.0 AS l_retail
          FROM lineitem)
    GROUP BY l_linenumber
    ORDER BY l_linenumber
    """,
    "functions", "math",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt_sum/ln_sum are 600M-term sums of IRRATIONAL per-row values, so
    their sub-unit decimals are pure summation-order noise at the top
    octave (sf100 measured the engines ~1e-4 apart at 3.7e7 magnitude —
    12 significant digits, beyond double reproducibility for that many
    terms); both round to integer BIGINT, the scale-robust precision.
    abs_diff_sum keeps 2 decimals: its magnitude (1.7e11) puts the
    relative compare rule's tolerance well above the same noise."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "l_retail", F.col("l_quantity") * 1000.0
    )
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.round(F.sum(F.abs(F.col("l_extendedprice") - F.col("l_retail"))), 2).alias("abs_diff_sum"),
            F.round(F.sum(F.ceil(F.col("l_quantity") / 7.0)), 2).alias("ceil_sum"),
            F.round(F.sum(F.floor(F.col("l_quantity") / 7.0)), 2).alias("floor_sum"),
            F.round(F.sum(F.sqrt("l_quantity")), 0).cast("bigint").alias("sqrt_sum"),
            F.round(F.sum(F.log("l_extendedprice")), 0).cast("bigint").alias("ln_sum"),
            F.round(F.sum(F.col("l_quantity").cast("bigint") % 5), 2).alias("mod_sum"),
        )
        .orderBy("l_linenumber")
    )


@register(
    "q_null_functions",
    """
    SELECT count(*) AS total,
           sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)::BIGINT AS zero_discounts,
           round(sum(coalesce(nullif(l_discount, 0.0), 0.01)))::BIGINT AS floored_discount_sum,
           sum(CASE WHEN l_tax IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS tax_not_null
    FROM lineitem
    """,
    "functions", "nulls",
)
def q_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floored_discount_sum rounds to integer BIGINT: a 600M-term sum of
    sub-unit floats carries ~2e-3 cross-engine summation-order noise at
    sf100 (3e7 magnitude), beyond any fixed decimal count — integer is
    the scale-robust precision (same r12 rule as q_math_functions)."""
    li = load_table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(nz.isNull(), 1).otherwise(0)).alias("zero_discounts"),
        F.round(F.sum(F.coalesce(nz, F.lit(0.01))), 0).cast("bigint").alias("floored_discount_sum"),
        F.sum(F.when(F.col("l_tax").isNotNull(), 1).otherwise(0)).alias("tax_not_null"),
    )


@register(
    "q_union_all_cross",
    """
    SELECT r_name AS name, 'region' AS kind FROM region
    UNION ALL
    SELECT n_name AS name, 'nation' AS kind FROM nation
    """,
    "setops",
)
def q_union_all_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, no dedup exchange)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("kind")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    return r.unionByName(n)


@register(
    "q_cross_join",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name
    FROM region r CROSS JOIN nation n
    """,
    "join", "cross",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (tiny×tiny only; broadcast NL join)."""
    r = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    n = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("nation_name"))
    return r.crossJoin(F.broadcast(n))


@register(
    "q_date_trunc",
    """
    SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
           count(*) AS order_count,
           round(sum(o_totalprice), 2) AS quarter_total
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    "dates", "agg",
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.date_trunc("quarter", F.col("o_orderdate")), "yyyy-MM-dd").alias("quarter_start")
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("quarter_total"),
        )
        .orderBy("quarter_start")
    )
