"""SQL-subquery surface and resampling statistics: correlated EXISTS /
NOT EXISTS, correlated LATERAL derived tables, and the Poisson bootstrap —
the three shapes a SQL-first user of the reference would reach for that the
catalog had not yet exercised as *surface* (their semantics overlap semi/
anti joins and windows, which is exactly the point: Catalyst decorrelates
them INTO those scalable plans, and the queries pin that).

Reference scope note: the reference's query surface is Spark SQL cells
(Feature_Store_Telco_Churn_Sean_Original.py:59-66 runs plain SELECTs);
subquery forms come with that surface for free, so they belong in the
parity catalog even though no reference cell happens to use one.

Scale rules as everywhere in the catalog: the EXISTS pair decorrelates to
one semi + one anti hash join co-partitioned on the same key (one fact
shuffle each, no per-row re-execution); the LATERAL top-k decorrelates to
a partitioned window rank (never a nested loop over the fact side); the
bootstrap's 32x replicate fan-out is consumed by partial aggregation in
the same stage (map-side combine to |reps| cells per partition — the
shuffle moves 32 rows per partition, not 32x the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from .catalog import register


@register(
    "q_exists_subquery",
    """
    SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'F'
          )
    ORDER BY c.c_custkey
    """,
    "subquery", "exists", "semi-join",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS, written as actual SQL subqueries so
    the catalog pins Catalyst's RewritePredicateSubquery decorrelation:
    both predicates leave the optimizer as hash joins (LEFT SEMI for
    EXISTS, LEFT ANTI for NOT EXISTS) on ``o_custkey`` — never a per-outer-
    row re-execution.  At 100 TB both joins shuffle on the SAME key, so the
    two order-side exchanges co-partition and AQE can reuse the exchange;
    the customer side shuffles once.  Semantics match the DataFrame twins
    ``q_semi_join`` / ``q_anti_join``; this entry exists to keep the SQL
    *surface* (what a reference user types) oracle-checked, not just the
    plan it lowers to."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__ex_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__ex_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal
        FROM __ex_customer c
        WHERE EXISTS (
                SELECT 1 FROM __ex_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
              )
          AND NOT EXISTS (
                SELECT 1 FROM __ex_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F'
              )
        ORDER BY c.c_custkey
        """
    )


@register(
    "q_lateral_topk",
    """
    SELECT n.n_name, t.c_name, t.bal
    FROM nation n, LATERAL (
        SELECT c_name, round(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    ORDER BY n.n_name, t.bal DESC, t.c_name
    """,
    "subquery", "lateral", "topk",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table (top-2 customers per nation by
    balance) — the SQL-standard form of per-group top-k.  Spark's
    DecorrelateInnerQuery rewrites the correlated ORDER BY ... LIMIT into a
    rank window PARTITIONED BY the correlation key over ONE scan of the
    inner table, so at scale this is exactly the ``q_window_topn_per_
    customer`` plan (partitioned window, no nested loop, no per-nation
    re-scan).  Deterministic tie-break on ``c_custkey`` keeps both engines
    bit-identical."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("__lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.bal
        FROM __lat_nation n JOIN LATERAL (
            SELECT c_name, round(c_acctbal, 2) AS bal
            FROM __lat_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
        ORDER BY n.n_name, t.bal DESC, t.c_name
        """
    )


#: cumulative Poisson(1) CDF thresholds for the inverse-CDF weight draw;
#: both engines parse the identical decimal literals to identical doubles,
#: so the per-(row, rep) weights agree bit-for-bit.
_POIS_CDF = [
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.9196986029286058, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
]
_BOOT_REPS = 32

_POIS_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN u < {t!r} THEN {k}" for t, k in _POIS_CDF)
    + " ELSE 6 END"
)


@register(
    "q_bootstrap_ci",
    f"""
    WITH draws AS (
        SELECT o_totalprice,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                                   || CAST(rep AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u,
               rep
        FROM orders, generate_series(0, {_BOOT_REPS - 1}) AS g(rep)
    ),
    weighted AS (
        SELECT rep, o_totalprice, {_POIS_CASE_SQL} AS w FROM draws
    ),
    rep_means AS (
        SELECT rep, sum(w * o_totalprice) / sum(w) AS m
        FROM weighted GROUP BY rep
    ),
    point AS (SELECT avg(o_totalprice) AS mu FROM orders)
    SELECT round(max(mu), 4) AS mean_totalprice,
           CAST({_BOOT_REPS} AS INT) AS n_reps,
           round(stddev_samp(m), 4) AS boot_se,
           round(max(mu) - 1.96 * stddev_samp(m), 2) AS ci_lo,
           round(max(mu) + 1.96 * stddev_samp(m), 2) AS ci_hi
    FROM rep_means, point
    """,
    "stats", "bootstrap", "resampling",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap standard error / 95% CI for mean order value —
    the resampling scheme built for data too large to index (Chamandy et
    al., "Estimating Uncertainty for Massive Data Streams", Google 2012):
    instead of drawing n rows WITH replacement per replicate (needs a
    global index), each row draws its own multiplicity w ~ Poisson(1) per
    replicate, independently and locally.  The draw is DETERMINISTIC here:
    u = md5(orderkey:rep) first-8-hex / 2^32 pushed through the Poisson(1)
    inverse CDF, so both engines produce identical replicates (the catalog
    convention for anything sampled — cf. q_hash_split, q_source_mixture).

    Scale shape: the 32x replicate fan-out is a narrow ``explode`` consumed
    by partial aggregation IN THE SAME STAGE — map-side combine reduces
    each partition to 32 (rep, sum, count) cells before the shuffle, so the
    exchange carries |reps| x |partitions| rows, not 32x the fact table,
    and no replicate ever materialises.  One extra single-pass aggregate
    supplies the point estimate as a 1-row broadcast (no eager count)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # spread the md5 fan-out (r13, guide §2.5 input skew): the driver's
    # single-row-group parquet gives the scan ONE task, so all |orders| x 32
    # hash draws ran serially.  The repartition shuffles only the two
    # projected columns and only fires when the scan under-parallelizes —
    # on a many-file table it is a no-op branch (getNumPartitions is
    # file-split metadata; the plan below it has no exchange, so no job).
    point = o.agg(F.avg("o_totalprice").alias("mu"))
    dp = spark.sparkContext.defaultParallelism
    if o.rdd.getNumPartitions() < dp:
        o = o.repartition(dp)
    draws = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("rep"),
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0),
    )
    w = F.lit(6)
    for t, k in reversed(_POIS_CDF):
        w = F.when(F.col("u") < F.lit(t), F.lit(k)).otherwise(w)
    rep_means = (
        draws.withColumn("w", w)
        .groupBy("rep")
        .agg((F.sum(F.col("w") * F.col("o_totalprice")) / F.sum("w")).alias("m"))
    )
    return rep_means.crossJoin(F.broadcast(point)).agg(
        F.round(F.max("mu"), 4).alias("mean_totalprice"),
        F.lit(_BOOT_REPS).cast("int").alias("n_reps"),
        F.round(F.stddev_samp("m"), 4).alias("boot_se"),
        F.round(F.max("mu") - 1.96 * F.stddev_samp("m"), 2).alias("ci_lo"),
        F.round(F.max("mu") + 1.96 * F.stddev_samp("m"), 2).alias("ci_hi"),
    )


@register(
    "q_grouped_percentile_scalable",
    """
    WITH lv AS (
        SELECT l_returnflag, l_quantity AS v, count(*) AS n
        FROM lineitem GROUP BY 1, 2
    ),
    run AS (
        SELECT l_returnflag, v, n,
               sum(n) OVER (PARTITION BY l_returnflag ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(n) OVER (PARTITION BY l_returnflag) AS tot
        FROM lv
    )
    SELECT l_returnflag,
           CAST(max(tot) AS BIGINT) AS n_rows,
           min(CASE WHEN c >= ceil(0.50 * tot) THEN v END) AS p50,
           min(CASE WHEN c >= ceil(0.95 * tot) THEN v END) AS p95,
           min(CASE WHEN c >= ceil(0.99 * tot) THEN v END) AS p99
    FROM run
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "window", "stats", "percentile",
)
def q_grouped_percentile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles without buffering any group's values —
    the grouped form of the q_percentile_scalable recipe and the one to
    reach for when groups are both MANY and LARGE (per-customer latencies,
    per-source token counts): one grouped pass to (group, value) level
    counts, then the cumulative/total windows run PARTITIONED BY group over
    the level table, whose size is |groups| x |value domain| — independent
    of row count — so no task ever sees fact cardinality and no skewed
    group buffers its values (contrast ``percentile``'s per-group value
    buffer, q_percentile_exact).  Each percentile is `min v with cum >=
    ceil(p * tot)` folded into the final per-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    lv = li.groupBy("l_returnflag", F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql.window import Window

    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    run = lv.select(
        "l_returnflag", "v", "n",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(wt).alias("tot"),
    )

    def pick(p: float):
        return F.min(
            F.when(F.col("c") >= F.ceil(F.lit(p) * F.col("tot")), F.col("v"))
        )

    return (
        run.groupBy("l_returnflag")
        .agg(
            F.max("tot").cast("bigint").alias("n_rows"),
            pick(0.50).alias("p50"),
            pick(0.95).alias("p95"),
            pick(0.99).alias("p99"),
        )
        .orderBy("l_returnflag")
    )
