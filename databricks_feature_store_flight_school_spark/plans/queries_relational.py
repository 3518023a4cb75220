"""Core relational operator queries (SURVEY.md §2.1–§2.8, §2.12 additions).

Every query here has an exact ANSI-SQL oracle twin.  Conventions shared with
the oracle (the driver value-hashes after sorting columns by name):

- every float output is rounded, on BOTH sides, at the number of decimals the
  value is *exactly* representable in (money sums: 2; discount products: 4;
  tax-compounded: 6; true-real averages: 6).  Identity-rounding at the value's
  own precision means floating-point summation-order noise between Spark and
  DuckDB can never straddle a rounding boundary and flip the hash;
- timestamps are projected out as 'yyyy-MM-dd' strings;
- every top-k sort carries a unique tie-break key so the selected SET is
  deterministic across engines.

Scale notes are inline per query; the common ones: dimension tables
(region/nation/supplier/part at TPC-H proportions) are broadcast explicitly so
the 100 TB fact scan never shuffles for them, and aggregations are expressed
so Catalyst plans partial (map-side) aggregation before the exchange.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .catalog import register


def _date(col: str):
    """Project a timestamp column as a 'yyyy-MM-dd' string (oracle: strftime)."""
    return F.date_format(F.col(col), "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# Flagship: scan -> filter -> project -> 4-way join -> agg -> sort
# ---------------------------------------------------------------------------

@register(
    "q_flagship_regional_revenue",
    """
    SELECT r.r_name AS region_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS line_count,
           round(avg(l.l_discount), 6) AS avg_discount
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus <> 'P'
    GROUP BY r.r_name
    ORDER BY revenue DESC
    """,
    "join", "agg", "flagship",
)
def q_flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region over non-pending orders.

    Scale: lineitem⨝orders is the only fact-fact shuffle (co-keyed on
    orderkey); customer is mid-sized (hash join, AQE may broadcast at low SF);
    nation/region are broadcast explicitly.  Aggregation is partial+final.

    Revenue rounds at 2 decimals (TPC-H money convention): at sf1 a region
    group sums ~800k discount products to ~3.4e10, where double-summation
    reordering noise reaches the 4th decimal — the sf1 replica sweep caught
    Spark and DuckDB disagreeing by 1e-4 there (same class as the r5
    sum_charge fix; at another 100x, sums this wide move to DECIMAL).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        )
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped staples
# ---------------------------------------------------------------------------

@register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "agg", "filter",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide partial+final aggregation after a pushed-down
    range filter.  `.explain` shows the shipdate predicate in PushedFilters
    and a two-level HashAggregate — the 100 TB plan of record."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_shipping_priority",
    """
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    "join", "agg", "topk",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> fact join -> top-k.
    The limit-after-sort is a TakeOrderedAndProject (no full sort at scale).
    Tie-break on orderkey keeps the top-10 SET engine-independent."""
    customer = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp_ntz")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            "revenue",
            _date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


@register(
    "q_local_supplier_volume",
    """
    SELECT n.n_name AS nation_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    "join", "agg",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a non-key equality (customer and
    supplier in the same nation).

    100 TB plan: the region restriction is resolved FIRST into the
    qualifying nationkey set (region ⨝ nation — at most 25 rows, always
    broadcastable), which then semi-join-filters BOTH customer and supplier
    *below* the fact joins, so only qualifying rows ever enter the
    orders/lineitem shuffles.  supplier itself carries NO broadcast hint —
    it is sf-proportional (sf × 10k rows), so a forced broadcast is an OOM
    at 100×; AQE is free to broadcast it when the runtime size allows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    qual_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    nkeys = qual_nations.select("n_nationkey")
    customer = customer.join(
        F.broadcast(nkeys), customer.c_nationkey == nkeys.n_nationkey, "left_semi"
    )
    supplier = supplier.join(
        F.broadcast(nkeys), supplier.s_nationkey == nkeys.n_nationkey, "left_semi"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(qual_nations), supplier.s_nationkey == qual_nations.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (P1-P7)
# ---------------------------------------------------------------------------

@register(
    "q_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.08 AND l_returnflag = 'R'
    """,
    "filter", "project",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate + arithmetic projection (P1/P7/F5).  All three
    predicates reach the parquet scan as PushedFilters; only 6 of 11 columns
    are read (ReadSchema pruning)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_quantity") > 45)
            & F.col("l_discount").between(0.02, 0.08)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        )
    )


@register(
    "q_dynamic_projection",
    """
    SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
    """,
    "project",
)
def q_dynamic_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complement-of-set column pruning via schema introspection — the
    reference's service-column selection idiom
    (Feature_Store_Telco_Churn_Flight_School.py:127-133)."""
    customer = load_table(spark, sf_dir, "customer")
    excluded = {"c_name", "c_acctbal"}
    kept = [c for c in customer.columns if c not in excluded]
    return customer.select(*kept)


@register(
    "q_case_when_priority",
    """
    SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                WHEN o_orderpriority = '2-HIGH' THEN 2
                WHEN o_orderpriority = '3-MEDIUM' THEN 3
           END AS priority_rank,
           count(*) AS order_count,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1
    ORDER BY 1 NULLS LAST
    """,
    "predicate", "agg",
)
def q_case_when_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained when with NO otherwise -> null for unmatched rows — the exact
    null-injection semantics of includes/setup.py:214-217 (P6/F6)."""
    pr = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(pr.alias("priority_rank"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(F.col("priority_rank").asc_nulls_last())
    )


@register(
    "q_fillna_repair",
    """
    SELECT o_orderkey,
           coalesce(CASE WHEN o_orderstatus <> 'P' THEN o_totalprice END, 0.0) AS effective_price
    FROM orders
    """,
    "predicate",
)
def q_fillna_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null injection then fillna repair — P4/P6 composed, mirroring
    TotalCharges blank->null->fillna(0.0) (setup.py:219-221, FS:133)."""
    orders = load_table(spark, sf_dir, "orders")
    withnull = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") != "P", F.col("o_totalprice")).alias("effective_price"),
    )
    return withnull.fillna({"effective_price": 0.0})


@register(
    "q_cast_trim_length",
    """
    SELECT length(trim(p_type)) AS type_len,
           count(*) AS part_count,
           round(sum(CAST(p_size AS DOUBLE)), 2) AS total_size
    FROM part
    GROUP BY 1
    ORDER BY 1
    """,
    "functions",
)
def q_cast_trim_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String trim/length + explicit cast (F2/F3, setup.py:219-221)."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy(F.length(F.trim(F.col("p_type"))).alias("type_len"))
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.round(F.sum(F.col("p_size").cast("double")), 2).alias("total_size"),
        )
        .orderBy("type_len")
    )


#: Murmur3_x86_32(seed=42) — Spark's ``F.hash`` — re-implemented in pure
#: DuckDB SQL so q_hash_bucket gets a VALUE-matched oracle instead of the
#: rows-only fallback it carried through round 9.  The fold walks the
#: UTF-8 bytes exactly like Spark's ``Murmur3_x86_32.hashUnsafeBytes``:
#: 4-byte little-endian blocks mixK1+mixH1'd in order (``list_reduce``
#: seeded with 42), then each tail byte mixed INDIVIDUALLY (Spark departs
#: from canonical murmur3 here — the tail is per-byte, not one partial
#: block), then fmix with the byte length.  32-bit wraparound rides
#: UBIGINT products masked ``% 2^32`` (max product (2^32-1)^2 fits
#: unsigned 64-bit); the result is re-signed to match Spark's int.
#: Byte addressing uses ``ascii(substr(...))`` == byte value, valid
#: because c_name is ASCII by construction; non-ASCII input would need
#: blob indexing.  Verified bit-exact vs F.hash on every customer row
#: plus empty/1-3-byte-tail edge strings.
_MURMUR3_ORACLE = """
    WITH f AS (
      SELECT c_custkey,
        octet_length(encode(c_name))::UBIGINT AS n,
        list_transform(
          range(0, (octet_length(encode(c_name)) // 4)::BIGINT),
          i -> ( ascii(substr(c_name, (4*i+1)::INT, 1))::UBIGINT
               + 256      * ascii(substr(c_name, (4*i+2)::INT, 1))::UBIGINT
               + 65536    * ascii(substr(c_name, (4*i+3)::INT, 1))::UBIGINT
               + 16777216 * ascii(substr(c_name, (4*i+4)::INT, 1))::UBIGINT )
        ) || list_transform(
          range((4 * (octet_length(encode(c_name)) // 4))::BIGINT,
                octet_length(encode(c_name))::BIGINT),
          i -> ascii(substr(c_name, (i+1)::INT, 1))::UBIGINT
        ) AS raw_ks
      FROM customer
    ),
    k AS (
      SELECT c_custkey, n,
        list_transform(raw_ks, k -> (
          ((((((k * 3432918353) % 4294967296) << 15)
             | (((k * 3432918353) % 4294967296) >> 17)) & 4294967295)
           * 461845907) % 4294967296
        )) AS ks
      FROM f
    ),
    h AS (
      SELECT c_custkey, n,
        list_reduce(list_prepend(42::UBIGINT, ks), (h, k) -> (
          (((((xor(h, k) << 13) | (xor(h, k) >> 19)) & 4294967295) * 5)
           + 3864292196) % 4294967296
        )) AS h1
      FROM k
    ),
    fm1 AS (SELECT c_custkey, xor(h1, n) AS a FROM h),
    fm2 AS (SELECT c_custkey,
                   (xor(a, a >> 16) * 2246822507) % 4294967296 AS b FROM fm1),
    fm3 AS (SELECT c_custkey,
                   (xor(b, b >> 13) * 3266489909) % 4294967296 AS c FROM fm2),
    mm AS (
      SELECT c_custkey,
        CASE WHEN xor(c, c >> 16) >= 2147483648
             THEN xor(c, c >> 16)::BIGINT - 4294967296
             ELSE xor(c, c >> 16)::BIGINT END AS mm3
      FROM fm3
    )
    SELECT c_custkey, (mm3 % 100) < 35 AS last_call_escalated FROM mm
"""


@register("q_hash_bucket", _MURMUR3_ORACLE, "functions")
def q_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random bucketing: hash(key) % 100 < 35, the
    synthetic-label idiom of Feature_Store_Telco_Churn_Flight_School.py:157.
    Spark % keeps the dividend sign, so negative hashes pass the < 35 test
    (~67% true, not 35%) — reproduced exactly; the oracle is a bit-exact
    Murmur3_x86_32 fold in DuckDB SQL (:data:`_MURMUR3_ORACLE`), upgraded
    round 10 from the rows-only fallback."""
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            (F.hash(F.col("c_name")) % 100 < 35).alias("last_call_escalated"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / distinct / set ops / semi-anti (§2.12 additions)
# ---------------------------------------------------------------------------

@register(
    "q_topk_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    "topk",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit -> TakeOrderedAndProject: each partition keeps a 25-row
    heap, driver merges — no global sort at 100 TB."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            _date("o_orderdate").alias("orderdate"),
        )
    )


@register(
    "q_distinct",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "distinct",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct == groupBy-all-cols; partial aggregation makes the exchange
    carry only unique pairs (15 rows from any SF)."""
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_union",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
    "setops",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) via unionByName + distinct."""
    a = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.unionByName(b).distinct()


@register(
    "q_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    "setops",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no RECENT order, via EXCEPT (distinct semantics; the
    date scope keeps the result non-empty on the dense testdata where every
    customer has ordered at least once)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@register(
    "q_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setops",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0).select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.intersect(o)


@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    "join",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: probe side streams, no payload columns shuffled from the
    build side — the scalable EXISTS."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q_anti_join",
    """
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    """,
    "join",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order after mid-2000 (the date
    scope keeps the result non-empty — the dense testdata gives every
    customer some order)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_nationkey")


# ---------------------------------------------------------------------------
# Aggregation depth: having, rollup, summary stats, horizontal count-if
# ---------------------------------------------------------------------------

@register(
    "q_groupby_having",
    """
    SELECT c_nationkey, count(*) AS customer_count,
           round(avg(c_acctbal), 6) AS avg_balance
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) > 3
    ORDER BY c_nationkey
    """,
    "agg",
)
def q_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_balance"),
        )
        .where(F.col("customer_count") > 3)
        .orderBy("c_nationkey")
    )


@register(
    "q_rollup",
    """
    SELECT c_mktsegment, c_nationkey, count(*) AS customer_count
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
    "agg",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via rollup (grand total + per-segment +
    per-segment-nation)."""
    return (
        load_table(spark, sf_dir, "customer")
        .rollup("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )


@register(
    "q_summary_stats",
    """
    SELECT count(l_quantity) AS cnt,
           round(avg(l_quantity), 6) AS mean_qty,
           round(stddev_samp(l_quantity), 6) AS std_qty,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(avg(l_extendedprice), 6) AS mean_price,
           round(stddev_samp(l_extendedprice), 6) AS std_price
    FROM lineitem
    """,
    "agg", "summary",
)
def q_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.summary()-equivalent statistics (A1, Sean_Original.py:32) expressed
    as one declarative aggregate; exact interpolated median via percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_quantity").alias("cnt"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
    )


_COUNTIF_FLAGS = [
    ("l_returnflag", "R"),
    ("l_linestatus", "F"),
]


def _horizontal_countif_cols():
    """Σ over columns of boolean flags — the pure-Column rewrite of the
    reference's pandas UDF (FS:413-416); stays in whole-stage codegen."""
    flags = [F.when(F.col(c) == v, 1).otherwise(0) for c, v in _COUNTIF_FLAGS]
    flags.append(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
    flags.append(F.when(F.col("l_tax") > 0.04, 1).otherwise(0))
    return reduce(add, flags)


_COUNTIF_ORACLE = """
    SELECT (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
          + CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END
          + CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
          + CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS flag_count,
           count(*) AS line_count
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
"""


@register("q_horizontal_countif", _COUNTIF_ORACLE, "agg", "horizontal")
def q_horizontal_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row count-if across columns (A2), JVM-side Column form."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(_horizontal_countif_cols().alias("flag_count"))
        .agg(F.count(F.lit(1)).alias("line_count"))
        .orderBy("flag_count")
    )


@register("q_horizontal_countif_pandas", _COUNTIF_ORACLE, "agg", "horizontal", "pandas-udf")
def q_horizontal_countif_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same count-if as an Arrow-batched pandas UDF — API-compatibility
    path for the reference's @pandas_udf('int') (FS:413-416/U1).  Kept out of
    hot paths at scale; exists to prove the JVM<->Python Arrow boundary."""
    from ..functions.horizontal import count_if_pandas_udf

    li = load_table(spark, sf_dir, "lineitem")
    udf = count_if_pandas_udf()
    return (
        li.withColumn(
            "flag_count",
            udf(
                F.col("l_returnflag"),
                F.col("l_linestatus"),
                F.col("l_discount"),
                F.col("l_tax"),
            ),
        )
        .groupBy("flag_count")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .orderBy("flag_count")
    )


# ---------------------------------------------------------------------------
# Window functions (§2.12)
# ---------------------------------------------------------------------------

@register(
    "q_window_topn_per_customer",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    "window", "topk",
)
def q_window_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k = row_number over a partitioned window; one shuffle on
    the partition key, rank filter applied before any further pipeline."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@register(
    "q_window_lag_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
    "window",
)
def q_window_lag_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() for per-entity history — days between consecutive orders (null
    for each customer's first order)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date")).alias("days_since_prev"),
    )


@register(
    "q_window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
    "window",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend: cumulative frame over an ordered window."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Date functions (§2.8 additions for o_orderdate/l_shipdate)
# ---------------------------------------------------------------------------

@register(
    "q_date_parts",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           count(*) AS order_count,
           round(sum(o_totalprice), 2) AS monthly_total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "dates", "agg",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("monthly_total"),
        )
        .orderBy("order_year", "order_month")
    )
