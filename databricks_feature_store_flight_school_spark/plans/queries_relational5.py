"""Fifth batch: exact grouped quantiles, a pandas grouped-agg UDAF, SCD
Type-2 interval collapse, LLM training-stream sequence packing, and BM25
document ranking.  Same oracle conventions as queries_relational.py —
identical column aliases on both sides, floats rounded before the hash.

Reference parity notes: the reference exercises no UDAF (SURVEY.md §2.10,
"No UDAF, no UDTF"); q_geomean_udaf adds the grouped-agg pandas form the
engine supports beyond the reference's scalar pandas UDF (FS:413-416).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count
from ..sources import load_table
from .catalog import register


@register(
    "q_percentile_exact",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS qty_p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
           round(quantile_cont(l_extendedprice, 0.90), 6) AS price_p90,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg", "quantiles",
)
def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped percentiles (linear interpolation, percentile_cont
    semantics) — the oracle-checkable twin of the approx_percentile sketch
    path (q_percentile_approx, rows-only).  Spark's `percentile` aggregate
    buffers each group's values; that is the deliberate trade: exact answers
    for bounded-cardinality groups, while the KLL/approx path covers
    unbounded 100 TB groups."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_p25"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("qty_p50"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_p75"),
            F.round(F.percentile("l_extendedprice", F.lit(0.90)), 6).alias("price_p90"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_geomean_udaf",
    """
    SELECT l_returnflag, l_linestatus,
           round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "agg", "pandas-udf", "udaf",
)
def q_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: per-group geometric mean computed as a
    true vectorized UDAF (pd.Series -> scalar over Arrow batches) — the
    aggregate analog of the reference's scalar pandas UDF (FS:413-416; the
    reference itself has no UDAF, SURVEY.md §2.10).  log-sum-exp form keeps
    the arithmetic overflow-safe and matches exp(avg(ln(x))) in the oracle.

    100 TB note: a grouped-agg pandas UDF materialises each group in one
    Python worker (no partial aggregation) — correct tool for moderate group
    counts with bounded group size; for unbounded groups, rewrite as
    exp(avg(ln(x))) in pure Columns, which is what the oracle twin states."""
    import numpy as np

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:  # grouped-agg: Series -> scalar
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:  # Spark disallows mixing pandas UDAFs
        return len(v)  # with built-in aggregates in one agg()

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(geomean("l_extendedprice"), 4).alias("geomean_price"),
            n_rows("l_extendedprice").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_scd2_intervals",
    """
    WITH runs AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    grouped AS (
        SELECT *, sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS run_id
        FROM runs
    ),
    intervals AS (
        SELECT o_custkey, o_orderpriority, run_id,
               min(o_orderdate) AS valid_from,
               count(*) AS n_orders
        FROM grouped
        GROUP BY o_custkey, o_orderpriority, run_id
    )
    SELECT o_custkey, o_orderpriority, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, run_id)
               AS valid_to,
           (lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, run_id)
               IS NULL) AS is_current,
           n_orders
    FROM intervals
    ORDER BY o_custkey, valid_from
    """,
    "window", "scd2", "temporal",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval collapse (gaps-and-islands): fold each customer's
    order-priority history into validity intervals [valid_from, valid_to),
    open-ended for the current run — the dimension-versioning transform a
    feature-history store runs to serve point-in-time lookups cheaply.
    Three window passes over ONE partitioning (custkey) — the change flag,
    the running run-id, and the lead for interval close all reuse the same
    shuffle; at 100 TB this is a single exchange on the entity key."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderpriority").over(w)
    chg = F.when(
        prev.isNull() | (prev != F.col("o_orderpriority")), F.lit(1)
    ).otherwise(F.lit(0))
    run_id = F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    intervals = (
        o.withColumn("chg", chg)
        .withColumn("run_id", run_id)
        .groupBy("o_custkey", "o_orderpriority", "run_id")
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # run_id breaks valid_from ties: two runs can START the same day (two
    # orders, different priorities, same o_orderdate) — without it the lead()
    # pairing is nondeterministic and the twins disagree on which interval
    # closes first.
    wi = Window.partitionBy("o_custkey").orderBy("valid_from", "run_id")
    valid_to = F.lead("valid_from").over(wi)
    return (
        intervals.select(
            "o_custkey",
            "o_orderpriority",
            "valid_from",
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
            "n_orders",
        )
        .orderBy("o_custkey", "valid_from")
    )


@register(
    "q_sequence_packing",
    """
    WITH toks AS (
        SELECT source, doc_id,
               len(string_split(trim(text), ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / 512.0) AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT source, bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
    "window", "packing", "llm-pipeline",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-stream sequence packing: concatenate each source shard's
    documents in doc_id order and split the token stream into 512-token
    context bins (bin = exclusive-prefix-sum div budget) — the
    concat-then-chunk packing an LLM pretraining pipeline runs to build
    fixed-length examples without padding waste.  The running sum partitions
    by source shard, so at 100 TB each shard packs independently — no global
    order, no single-partition window."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    n_tokens = token_count("text")
    cum_excl = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ) - F.col("n_tokens")
    return (
        d.select("source", "doc_id", n_tokens.alias("n_tokens"))
        .withColumn("bin_id", F.floor(cum_excl / F.lit(512.0)).cast("bigint"))
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )


#: BM25 hyperparameters (Robertson/Sparck Jones defaults) and the fixed query.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "vector", "merge")


def _bm25_oracle() -> str:
    tf_exprs = ",\n               ".join(
        f"len(list_filter(string_split(trim(text), ' '), w -> w = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    score_terms = " + ".join(
        f"""(ln(1 + (s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5))
             * (d.tf_{i} * ({_BM25_K1} + 1))
             / (d.tf_{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * d.dl / s.avgdl)))"""
        for i in range(len(_BM25_TERMS))
    )
    df_exprs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH d AS (
        SELECT doc_id,
               len(string_split(trim(text), ' ')) AS dl,
               {tf_exprs}
        FROM documents
    ),
    s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_exprs} FROM d)
    SELECT doc_id, round(score, 6) AS bm25, rank
    FROM (
        SELECT d.doc_id, {score_terms} AS score,
               row_number() OVER (ORDER BY {score_terms} DESC, d.doc_id) AS rank
        FROM d CROSS JOIN s
    )
    WHERE rank <= 20
    """


@register(
    "q_bm25_scores",
    _bm25_oracle(),
    "text", "ranking", "llm-pipeline",
)
def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus for a fixed 3-term query — the lexical
    retrieval scorer for hybrid (BM25 + embedding) search.  Term frequencies
    and doc length come from one scan; corpus stats (N, avgdl, per-term df)
    are a 1-row aggregate broadcast back by the cross join; top-20 lowers to
    TakeOrderedAndProject.  Everything is Column arithmetic — the scoring
    stays in whole-stage codegen, no UDF."""
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
    # (element, index), so a `t=t` default-capture would bind t to the index.
    def _tf(term: str):
        return F.size(F.filter(toks, lambda w: w == term))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)]
    per_doc = d.select(
        "doc_id", F.size(toks).alias("dl"), *tf_cols
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        term = idf * (tf * (_BM25_K1 + 1)) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    # orderBy().limit() lowers to TakeOrderedAndProject (no global sort);
    # the row_number window then runs over the surviving 20 rows only.
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", F.round("score", 6).alias("bm25"), "rank")
    )
