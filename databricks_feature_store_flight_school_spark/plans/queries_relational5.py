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
    path (q_percentile_approx, rows-only).  The quantity percentiles keep
    Spark's builtin ``percentile`` DELIBERATELY: l_quantity has a ~50-value
    domain, so its value->count aggregation buffer is bounded at any SF —
    the map form's legitimate niche.  The price percentile (unbounded
    distincts — the shape that killed the sf10 JVM via the builtin) goes
    through the level-table operators/ranks.group_quantile_cont instead
    (round 10); the KLL/approx path covers unbounded 100 TB groups."""
    from ..operators.ranks import group_quantile_cont

    li = load_table(spark, sf_dir, "lineitem")
    qty = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_p25"),
            F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("qty_p50"),
            F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_p75"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    price = group_quantile_cont(li, "l_returnflag", "l_extendedprice", {"__p90": 0.9})
    return (
        qty.join(price, "l_returnflag")
        .select(
            "l_returnflag", "qty_p25", "qty_p50", "qty_p75",
            F.round("__p90", 6).alias("price_p90"), "n_rows",
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


@register(
    "q_grouped_ols_pandas",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           regr_count(l_extendedprice, l_quantity) AS n_rows
    FROM lineitem
    WHERE l_orderkey < 1500
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg", "pandas-udf", "grouped-map", "regression",
)
def q_grouped_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS via GROUPED-MAP pandas (applyInPandas): each return-flag
    group crosses to a Python worker as one Arrow batch and numpy fits the
    line with the centered two-pass formula — the escape hatch for per-group
    model fitting that closed-form aggregates can't express (here they can,
    which is exactly what makes it oracle-checkable against regr_slope /
    regr_intercept).

    Numeric note: the centered two-pass moments (subtract the mean, then
    accumulate) match DuckDB's Welford-style regr_* to well below the 1e-6
    rounding; a naive Σxy - nx̄ȳ form would not.  100 TB note: grouped-map
    materialises whole groups — bounded group count/size is the contract;
    unbounded groups belong to the aggregate form (q_regression_aggregates).
    """
    import numpy as np

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_quantity"].to_numpy(dtype=float)
        y = pdf["l_extendedprice"].to_numpy(dtype=float)
        xc = x - x.mean()
        slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "slope": [round(slope, 6)],
                "intercept": [round(float(y.mean() - slope * x.mean()), 6)],
                "n_rows": [len(pdf)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1500)
    return (
        li.select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            fit, "l_returnflag string, slope double, intercept double, n_rows bigint"
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_histogram_bins",
    """
    SELECT bin_id,
           round(bin_id * 30000.0, 2) AS bin_lo,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM (
        SELECT o_totalprice,
               CAST(least(floor(o_totalprice / 30000.0), 19) AS BIGINT) AS bin_id
        FROM orders
    )
    GROUP BY bin_id
    ORDER BY bin_id
    """,
    "agg", "histogram",
)
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins of 30k, top bin open) over order totals
    — the distribution-profiling primitive behind feature binning and data
    audits.  Bin assignment is scan-side Column arithmetic, the groupBy
    carries 20 keys: map-side partials make this a near-free full-table
    profile at any scale."""
    o = load_table(spark, sf_dir, "orders")
    bin_id = F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19)).cast(
        "bigint"
    )
    return (
        o.select("o_totalprice", bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(
            "bin_id",
            F.round(F.col("bin_id") * 30000.0, 2).alias("bin_lo"),
            "n_orders",
            "min_price",
            "max_price",
        )
        .orderBy("bin_id")
    )


@register(
    "q_hash_split",
    """
    SELECT source, split, count(*) AS n_docs, min(doc_id) AS first_doc
    FROM (
        SELECT source, doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY source, split
    ORDER BY source, split
    """,
    "llm-pipeline", "sampling",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (~80/10/10): the split
    is a pure function of the stable document id (first md5 byte compared as
    hex text — portable across engines, unlike engine-native hash()), so the
    assignment is reproducible across runs, partitions, and engines, and
    never needs a stored membership table.  Narrow map + 60-key groupBy."""
    d = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return (
        d.select("source", "doc_id", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("source", "split")
    )


def _rrf_oracle() -> str:
    bm25_inner = _bm25_oracle()
    return f"""
    WITH bm AS (
        SELECT doc_id, rank AS r_bm FROM ({bm25_inner})
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
    cos_scored AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.q) AS sim
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id < (SELECT count(*) FROM documents)
    ),
    cs AS (
        SELECT doc_id, rank AS r_cos FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
            FROM cos_scored
        ) WHERE rank <= 20
    ),
    fused AS (
        SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
               coalesce(1.0 / (60 + bm.r_bm), 0.0)
                 + coalesce(1.0 / (60 + cs.r_cos), 0.0) AS rrf
        FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
    )
    SELECT doc_id, round(rrf, 6) AS rrf_score, rank
    FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
          FROM fused)
    WHERE rank <= 15
    """


@register(
    "q_hybrid_rrf",
    _rrf_oracle(),
    "text", "vectors", "ranking", "llm-pipeline",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the BM25 top-20 (lexical)
    and the embedding-cosine top-20 (semantic, query = vector 0) fuse as
    Σ 1/(60 + rank) — the standard RRF combiner for hybrid search.  Fusing
    bounded top-k lists (not full rankings) is the scale-honest form: each
    ranker's TakeOrderedAndProject bounds what crosses the join, and the
    outer join + final rank run on ≤40 rows.

    No eager driver action at plan-build: the corpus size (aligns vec ids
    with doc ids) and the query vector both ride the plan as 1-row
    broadcast cross-joins (the q_term_pmi corpus-scalar pattern) instead of
    a build-time ``.count()`` / ``.first()``."""
    from ..functions import vectors as V

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("__n_docs"))
    bm = q_bm25_scores(spark, sf_dir).select("doc_id", F.col("rank").alias("r_bm"))

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = (
        emb.where(F.col("vec_id") == 0)
        .select(V.to_double(F.col("embedding")).alias("__q"))
    )
    v = V.to_double(F.col("embedding"))
    sim = V.dot(v, F.col("__q")) / (V.norm(v) * V.norm(F.col("__q")))
    w = Window.orderBy(F.col("sim").desc(), "doc_id")
    cs = (
        emb.crossJoin(F.broadcast(n_docs))
        .where(F.col("vec_id") < F.col("__n_docs"))
        .crossJoin(F.broadcast(qdf))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(20)
        .withColumn("r_cos", F.row_number().over(w))
        .select("doc_id", "r_cos")
    )
    fused = (
        bm.join(cs, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (60 + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_cos")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    wf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(15)
        .withColumn("rank", F.row_number().over(wf))
        .select("doc_id", F.round("rrf", 6).alias("rrf_score"), "rank")
    )


@register(
    "q_fuzzy_part_match",
    # Distinct-NAME twin (round 10) with a DELETION-NEIGHBORHOOD candidate
    # filter (round 13, VERDICT r12 #4): edit distance is a function of
    # the names alone, so the oracle pays levenshtein once per distinct
    # name pair, then expands combinatorially — provably identical to the
    # naive block-quadratic form (verified value-equal at
    # sf0.001/0.01/0.1/1 against the round-10 SQL, itself value-matched
    # to the naive form):
    #   n_pairs(0)   = sum C(cnt,2) over (block,name) groups;
    #   n_pairs(d>0) = sum cnt1*cnt2 over unordered name pairs at dist d
    #                  per shared block;
    #   n_left(0)    = sum (cnt-1): every group member but its max id is
    #                  some pair's smaller key;
    #   n_left(d>0)  : part a is a distinct key_a at dist d iff SOME part
    #                  of a name at dist d from a's has a larger id, i.e.
    #                  a.id < max over matching groups of max_id — one
    #                  part-level join against that per-(block,name,d) max.
    # Candidate generation is FastSS-style, not quadratic: names a, b with
    # edit(a,b) <= 2 share a common string reachable by <= 2 single-char
    # DELETIONS from each (take an optimal alignment; drop from a every
    # substituted/deleted char, from b every substituted/inserted char —
    # <= 2 per side — and the matched remainders are identical), so the
    # <=2-deletion variant sets (1 + L + C(L,2) ~ 600 strings per ~30-char
    # name) are joined on variant equality and ONLY the surviving pairs
    # pay a levenshtein.  No false negatives by the argument above; false
    # positives (shared variant, distance > 2) die on the explicit
    # levenshtein.  The round-10 per-block quadratic distinct-name join
    # was value-matched through sf10 but measured 1203 s there and ~30 h
    # extrapolated at sf100 (387,840 names — the r12 sweep's oracle-side
    # wall); this form is 2.4 s at sf1 and ~5 min at sf10 (7.1M candidates
    # instead of 2.5e10 block-quadratic levenshteins), with every
    # multiply-referenced CTE MATERIALIZED (DuckDB re-inlines otherwise —
    # measured 6x at sf1).  Block expansion afterwards is linear in the
    # matched pairs (~6 shared blocks per matched name pair, measured).
    """
    WITH g AS MATERIALIZED (
        SELECT p_type AS blk, p_name AS name,
               count(*) AS cnt, max(p_partkey) AS max_id
        FROM part GROUP BY 1, 2
    ),
    nl AS (SELECT DISTINCT name, length(name)::INT AS l FROM g),
    e1 AS (SELECT name, l, unnest(generate_series(1, l)) AS i FROM nl),
    e2 AS (SELECT name, i, unnest(generate_series(i+1, l)) AS j
           FROM e1 WHERE i < l),
    vars AS MATERIALIZED (
        SELECT DISTINCT name, v FROM (
            SELECT name, name AS v FROM nl
            UNION ALL
            SELECT name, substr(name,1,i-1) || substr(name,i+1) FROM e1
            UNION ALL
            SELECT name, substr(name,1,i-1) || substr(name,i+1,j-i-1)
                         || substr(name,j+1) FROM e2
        )
    ),
    ed AS MATERIALIZED (
        SELECT n1, n2, levenshtein(n1, n2) AS edit_dist FROM (
            SELECT DISTINCT a.name AS n1, b.name AS n2
            FROM vars a JOIN vars b ON a.v = b.v AND a.name < b.name
        )
        WHERE levenshtein(n1, n2) <= 2
    ),
    np AS MATERIALIZED (
        SELECT ga.blk, ga.name AS n1, d.edit_dist,
               ga.cnt AS cnt1, gb.cnt AS cnt2,
               ga.name < gb.name AS is_lower, gb.max_id AS max2
        FROM (SELECT n1 AS na, n2 AS nb, edit_dist FROM ed
              UNION ALL
              SELECT n2, n1, edit_dist FROM ed) d
        JOIN g ga ON ga.name = d.na
        JOIN g gb ON gb.blk = ga.blk AND gb.name = d.nb
    ),
    n_pairs AS (
        SELECT 0 AS edit_dist, sum(cnt * (cnt - 1) // 2)::BIGINT AS n_pairs
        FROM g WHERE cnt >= 2
        UNION ALL
        SELECT edit_dist, sum(cnt1 * cnt2)::BIGINT AS n_pairs
        FROM np WHERE is_lower GROUP BY edit_dist
    ),
    m AS (
        SELECT blk, n1, edit_dist, max(max2) AS m_id FROM np GROUP BY 1, 2, 3
    ),
    left0 AS (
        SELECT 0 AS edit_dist, sum(cnt - 1)::BIGINT AS n_left
        FROM g WHERE cnt >= 2
    ),
    leftd AS (
        SELECT m.edit_dist, count(*)::BIGINT AS n_left
        FROM part p JOIN m ON p.p_type = m.blk AND p.p_name = m.n1
        WHERE p.p_partkey < m.m_id
        GROUP BY m.edit_dist
    ),
    lefts AS (
        SELECT * FROM left0 WHERE n_left IS NOT NULL
        UNION ALL SELECT * FROM leftd
    )
    SELECT n_pairs.edit_dist, n_pairs.n_pairs, lefts.n_left AS n_left_entities
    FROM n_pairs JOIN lefts USING (edit_dist)
    WHERE n_pairs.n_pairs > 0
    ORDER BY edit_dist
    """,
    "join", "fuzzy", "text",
)
def q_fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (levenshtein edit distance <= 2 within a
    p_type block) via the PassJoin segment-signature join
    (operators/fuzzy.py) instead of the naive block-quadratic form: two
    strings within distance k must share one of k+1 aligned segments
    exactly (pigeonhole), so candidates come from an equi-join on
    (block, length, segment, text) and only candidates pay a
    levenshtein — same rows, provably no false negatives.  The DuckDB
    oracle (round 10, candidate filter round 13) groups by distinct NAME
    and generates candidate pairs from <=2-deletion variant collisions
    (FastSS — the SQL-expressible sibling of this operator's PassJoin
    segment filter; both are complete-by-pigeonhole, both pay the
    levenshtein only on survivors) before expanding the counts
    combinatorially — equivalent by construction (edit distance depends
    only on the names), verified value-equal against the round-10 SQL at
    sf0.001/0.01/0.1/1, and 2.4 s at sf1 / ~5 min at sf10 (the round-10
    block-quadratic form measured 1203 s at sf10 and ~30 h extrapolated
    at sf100 — the r12 sweep's oracle-side wall), so the full-catalog
    sweep is one invocation at every octave (tools/check_oracle.py, no
    --skip).

    The sf1 replica sweep motivated both halves of this shape:

    - COMPUTE: p_type has 6 values, so the naive plan compares ~(n/6)²
      pairs per block AND runs the broadcast self-join probe inside the
      single-row-group scan task — one core grinding ~3.3e9 string
      comparisons at sf1.  The segment join shuffles both sides on
      high-cardinality segment text: parallel everywhere, and pair work
      scales with matches, not block size².
    - OUTPUT: the raw pair list is quadratic in name-cluster size (~52M
      rows at sf1 — bigger than the result a driver can collect, at any
      engine).  The catalog query therefore reports the bounded MATCH
      PROFILE (per-distance pair and entity counts, <= k+1 rows at any
      SF); callers who want the pairs stream them from
      ``operators/fuzzy.edit_distance_join`` directly (parity-tested),
      they don't collect them.

    Round 10b regrouped the SPARK side by distinct (block, name) before
    the segment join, mirroring its own oracle: edit distance depends only
    on the names, and names repeat heavily (2M parts / 38,784 distinct
    names at sf10), so the entity-level pair list — ~52M rows at sf1,
    >70 GB of candidate shuffle scratch at sf10 (the full-sweep ENOSPC) —
    collapses to a name-level one (thousands of rows), with entity counts
    expanded combinatorially exactly as the SQL twin does: pairs(d) =
    sum cnt_a*cnt_b over distinct-name pairs (+ C(cnt,2) within a name at
    d=0), and left entities per the same max-counterpart-id rule.  The
    levenshtein is paid once per distinct name pair on BOTH engines now."""
    from ..operators.fuzzy import edit_distance_join

    p = load_table(spark, sf_dir, "part")
    # Pin the distinct-name table once (r14, same shape as the r13 shingle
    # pin): g feeds d0, the PassJoin's five base consumers (index, probe,
    # tiny-string arm, both name re-attach sides) and the two count
    # re-attach joins — unpinned, the plan carried 23 part scans.
    g = p.groupBy("p_type", "p_name").agg(
        F.count(F.lit(1)).alias("__cnt"), F.max("p_partkey").alias("__gid")
    ).localCheckpoint(eager=False)
    # d=0: pairs/lefts within one name group (group max-id is never a
    # smaller-id side; every other member is)
    d0 = (
        g.where(F.col("__cnt") >= 2)
        .agg(
            F.lit(0).alias("edit_dist"),
            F.sum(F.col("__cnt") * (F.col("__cnt") - 1) / 2)
            .cast("bigint")
            .alias("n_pairs"),
            F.sum(F.col("__cnt") - 1).cast("bigint").alias("n_left_entities"),
        )
        .where(F.col("n_pairs").isNotNull())
    )
    # d>=1: the PassJoin over DISTINCT names; __gid (the group's max
    # part id) is a valid unique name id because part keys are unique
    name_pairs = edit_distance_join(g, "p_name", "__gid", "p_type", k=2).where(
        F.col("edit_dist") >= 1
    )
    cnts = g.select(F.col("__gid").alias("__k"), F.col("__cnt").alias("__c"))
    np = (
        name_pairs.join(cnts.withColumnRenamed("__k", "key_a").withColumnRenamed("__c", "__ca"), "key_a")
        .join(cnts.withColumnRenamed("__k", "key_b").withColumnRenamed("__c", "__cb"), "key_b")
    )
    dpairs = np.groupBy("edit_dist").agg(
        F.sum(F.col("__ca") * F.col("__cb")).cast("bigint").alias("n_pairs")
    )
    # left entities at d: parts whose id is below the max counterpart-name
    # group id for their name at that distance (both directions of each
    # name pair contribute a counterpart)
    both = name_pairs.select(
        F.col("key_a").alias("__nk"), F.col("key_b").alias("__ok"), "edit_dist"
    ).unionByName(
        name_pairs.select(
            F.col("key_b").alias("__nk"), F.col("key_a").alias("__ok"), "edit_dist"
        )
    )
    m = both.groupBy("__nk", "edit_dist").agg(F.max("__ok").alias("__mid"))
    plx = p.join(
        F.broadcast(g.select("p_type", "p_name", "__gid")), ["p_type", "p_name"]
    ).join(F.broadcast(m), F.col("__gid") == F.col("__nk"))
    dleft = (
        plx.where(F.col("p_partkey") < F.col("__mid"))
        .groupBy("edit_dist")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_left_entities"))
    )
    dd = dpairs.join(dleft, "edit_dist")
    return (
        d0.select("edit_dist", "n_pairs", "n_left_entities")
        .unionByName(dd.select("edit_dist", "n_pairs", "n_left_entities"))
        .where(F.col("n_pairs") > 0)
        .orderBy("edit_dist")
    )


@register(
    "q_feature_drift_psi",
    """
    WITH binned AS (
        SELECT CAST(least(floor(o_totalprice / 60000.0), 9) AS BIGINT) AS bin_id,
               (o_orderdate <  TIMESTAMP '2000-01-01 00:00:00') AS is_ref,
               count(*) AS n
        FROM orders
        GROUP BY 1, 2
    ),
    pivoted AS (
        SELECT bin_id,
               sum(CASE WHEN is_ref THEN n ELSE 0 END) AS n_ref,
               sum(CASE WHEN NOT is_ref THEN n ELSE 0 END) AS n_cur
        FROM binned GROUP BY bin_id
    ),
    tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM pivoted),
    frac AS (
        SELECT bin_id,
               greatest(n_ref * 1.0 / t_ref, 0.0001) AS f_ref,
               greatest(n_cur * 1.0 / t_cur, 0.0001) AS f_cur
        FROM pivoted CROSS JOIN tot
    )
    SELECT bin_id,
           round(f_ref, 6) AS f_ref,
           round(f_cur, 6) AS f_cur,
           round((f_cur - f_ref) * ln(f_cur / f_ref), 6) AS psi_term
    FROM frac
    ORDER BY bin_id
    """,
    "agg", "drift", "mlops",
)
def q_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference window (orders before
    2000) and the current window — the train/serve drift monitor a feature
    store runs per feature: equi-width bins, per-window fractions floored at
    1e-4 (the standard zero-bin guard), PSI term (f_cur - f_ref)·ln(f_cur/
    f_ref) per bin (Σ terms > 0.2 = actionable drift).  One scan builds both
    windows' histograms (conditional sums — no second pass); everything
    after runs on 10 rows."""
    o = load_table(spark, sf_dir, "orders")
    bin_id = F.least(F.floor(F.col("o_totalprice") / 60000.0), F.lit(9)).cast("bigint")
    is_ref = F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz")
    pivoted = (
        o.select(bin_id.alias("bin_id"), is_ref.alias("is_ref"))
        .groupBy("bin_id")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    tot = pivoted.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    f_ref = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(0.0001))
    f_cur = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(0.0001))
    return (
        pivoted.crossJoin(F.broadcast(tot))
        .select("bin_id", f_ref.alias("f_ref"), f_cur.alias("f_cur"))
        .select(
            "bin_id",
            F.round("f_ref", 6).alias("f_ref"),
            F.round("f_cur", 6).alias("f_cur"),
            F.round(
                (F.col("f_cur") - F.col("f_ref")) * F.log(F.col("f_cur") / F.col("f_ref")),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin_id")
    )


@register(
    "q_recursive_hierarchy",
    """
    WITH RECURSIVE walk(start_key, node, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 1000
        UNION ALL
        SELECT start_key, node // 10, depth + 1 FROM walk WHERE node > 0
    )
    SELECT depth_to_root,
           count(*) AS n_customers,
           min(start_key) AS first_key,
           max(start_key) AS last_key
    FROM (SELECT start_key, max(depth) AS depth_to_root
          FROM walk GROUP BY start_key)
    GROUP BY depth_to_root
    ORDER BY depth_to_root
    """,
    "recursive", "hierarchy", "sql",
)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): walk a synthetic
    reporting chain (parent key = key div 10, root 0) from every customer
    below 1000 and profile the depth distribution — the
    transitive-closure/hierarchy-rollup shape (org charts, BOM explosions,
    category trees) that previously needed a driver-side iteration loop
    (cf. operators/components.py).  The engine iterates the recursion in
    DISTRIBUTED steps; depth is bounded by the key chain (≤ 4 here), and
    each step is a narrow map off the prior frontier."""
    c = load_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("__rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(start_key, node, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM __rc_customer WHERE c_custkey < 1000
            UNION ALL
            SELECT start_key, node div 10, depth + 1 FROM walk WHERE node > 0
        )
        SELECT depth_to_root,
               count(*) AS n_customers,
               min(start_key) AS first_key,
               max(start_key) AS last_key
        FROM (SELECT start_key, max(depth) AS depth_to_root
              FROM walk GROUP BY start_key)
        GROUP BY depth_to_root
        ORDER BY depth_to_root
        """
    )


@register(
    "q_null_safe_join",
    """
    WITH d AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg
        FROM customer WHERE c_custkey < 100
    )
    SELECT (a.seg IS NULL) AS key_is_null,
           count(*) AS n_pairs,
           count(DISTINCT a.c_custkey) AS n_left
    FROM d a JOIN d b
      ON a.seg IS NOT DISTINCT FROM b.seg AND a.c_custkey < b.c_custkey
    GROUP BY 1
    ORDER BY key_is_null
    """,
    "join", "nulls",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi join (eqNullSafe / IS NOT DISTINCT FROM): rows whose
    derived key is NULL still pair with each other — the semantics ordinary
    `=` silently drops.  Catalyst plans eqNullSafe as a HASH join (the
    null-safe comparison is still an equi key), so the shape scales like any
    other key join; the query pins that NULL-group pairs actually appear."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    d = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("seg"),
    )
    a = d.select(F.col("c_custkey").alias("ck_a"), F.col("seg").alias("seg_a"))
    b = d.select(F.col("c_custkey").alias("ck_b"), F.col("seg").alias("seg_b"))
    return (
        a.join(b, F.col("seg_a").eqNullSafe(F.col("seg_b")) & (F.col("ck_a") < F.col("ck_b")))
        .groupBy(F.col("seg_a").isNull().alias("key_is_null"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("ck_a").alias("n_left"),
        )
        .orderBy("key_is_null")
    )


@register(
    "q_market_basket",
    # Sharded pair aggregation (round 13, VERDICT r12 #4): the round-12
    # sf100 sweep killed this twin in DuckDB — the single items-self-join
    # builds a 600M-row hash table and its ~1e9-row pair aggregate
    # out-spilled the host's free disk under the 24 GB oracle cap.  The
    # (part_a, part_b) groups partition EXACTLY by part_a, so the twin
    # shards the join+aggregate 8 ways on a.l_partkey % 8: each branch's
    # build side is 1/8 of items (fits the cap, no join spill), its
    # aggregate sees 1/8 of the pairs, and HAVING is shard-local-correct
    # because no group spans shards.  UNION ALL of the branches is the
    # exact result — value-equal to the unsharded form at
    # sf0.001/0.01/0.1/1 (DuckDB vs DuckDB), ~2x its wall at small SF
    # (8 probe passes over the materialized items) in exchange for
    # bounded spill at every octave.
    """
    WITH items AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
    pf AS MATERIALIZED (
        SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 0
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 1
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 2
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 3
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 4
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 5
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 6
        GROUP BY 1, 2
        HAVING count(*) >= 3
        UNION ALL
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        WHERE a.l_partkey % 8 = 7
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
    SELECT part_a, part_b, n_both,
           round(n_both * 1.0 / n_orders, 6) AS support,
           round(n_both * 1.0 / fa.n_part, 6) AS confidence,
           round((n_both * 1.0 * n_orders) / (fa.n_part * 1.0 * fb.n_part), 6) AS lift
    FROM pairs
    JOIN pf fa ON fa.l_partkey = part_a
    JOIN pf fb ON fb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b
    """,
    "agg", "join", "basket",
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (market-basket): part pairs co-ordered in >= 3
    orders with support / confidence(a->b) / lift — the frequent-itemset
    pair mining shape (the 2-itemset core of Apriori, which is where the
    join cost lives).  The basket self-join keys on the ORDER (baskets are
    small, so per-basket pair fan-out is bounded by basket size², not
    corpus size).  Item frequencies join back UNHINTED on the part key:
    |pf| is item-catalog-proportional (sf×200k), so a forced broadcast is
    an OOM at 100× — AQE broadcasts it while it is actually small and
    shuffle-joins it when it is not (the q_local_supplier_volume rule);
    only the 1-row basket count is hint-broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    # basket count folded INTO the plan (1-row broadcast cross join), not an
    # eager driver .count() — no extra distinct job at query-build time
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    pf = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= 3)
    )
    fa = pf.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    fb = pf.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_both",
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_both").cast("double") * F.col("n_orders"))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
    )


@register(
    "q_weighted_median",
    """
    WITH lv AS (
        SELECT l_returnflag, l_quantity,
               sum(l_extendedprice) AS wt, count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2
    ),
    w AS (
        SELECT l_returnflag, l_quantity, n_rows,
               sum(wt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                             ROWS UNBOUNDED PRECEDING) AS cum_wt,
               sum(wt) OVER (PARTITION BY l_returnflag) AS tot_wt
        FROM lv
    )
    SELECT l_returnflag,
           min(l_quantity) AS weighted_median_qty,
           CAST(sum(n_rows) AS BIGINT) AS n_rows_at_or_after
    FROM w
    WHERE cum_wt >= tot_wt / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "window", "agg", "stats",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (50% of revenue weight, not of row count), computed
    over the VALUE-LEVEL table, not the fact table: the fact pass is one
    grouped aggregate to (returnflag, quantity) weight sums (~|levels| rows),
    and the running/total-weight windows run over that bounded level table —
    a 3-value partition key never sees fact-table cardinality, so the
    skewed-window scale-killer of windowing the raw rows is gone.
    ``n_rows_at_or_after`` sums level row-counts (all rows of the boundary
    level count, by level-granularity definition).  The pattern generalises
    to any weighted quantile (change the /2)."""
    li = load_table(spark, sf_dir, "lineitem")
    lv = li.groupBy("l_returnflag", "l_quantity").agg(
        F.sum("l_extendedprice").alias("wt"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wo = Window.partitionBy("l_returnflag").orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("l_returnflag")
    w = lv.select(
        "l_returnflag",
        "l_quantity",
        "n_rows",
        F.sum("wt").over(wo).alias("cum_wt"),
        F.sum("wt").over(wt).alias("tot_wt"),
    )
    return (
        w.where(F.col("cum_wt") >= F.col("tot_wt") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("weighted_median_qty"),
            F.sum("n_rows").cast("bigint").alias("n_rows_at_or_after"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_entropy_profile",
    """
    WITH c AS (
        SELECT user_id % 10 AS user_bucket, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT user_bucket, event_type, n,
               sum(n) OVER (PARTITION BY user_bucket) AS tot
        FROM c
    )
    SELECT user_bucket,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot)), 6) AS entropy,
           count(*) AS n_types
    FROM t
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
    "agg", "stats", "entropy",
)
def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per user bucket — the
    behavioral-diversity / anomaly-profiling statistic (uniform mix = high
    entropy, single-action bots = near zero).  Two narrow aggregations over
    the same key prefix; the entropy itself runs on |buckets|x|types| rows."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.withColumn("tot", F.sum("n").over(Window.partitionBy("user_bucket")))
    p = F.col("n") / F.col("tot")
    return (
        t.groupBy("user_bucket")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .orderBy("user_bucket")
    )


@register(
    "q_ab_test_proportions",
    """
    WITH assign AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
               max(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT grp, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
        FROM assign GROUP BY grp
    ),
    s AS (
        SELECT
            max(CASE WHEN grp = 'A' THEN conv * 1.0 / n END) AS p_a,
            max(CASE WHEN grp = 'B' THEN conv * 1.0 / n END) AS p_b,
            max(CASE WHEN grp = 'A' THEN n END) AS n_a,
            max(CASE WHEN grp = 'B' THEN n END) AS n_b,
            sum(conv) * 1.0 / sum(n) AS p_pool
        FROM g
    )
    SELECT round(p_a, 6) AS p_a, round(p_b, 6) AS p_b,
           n_a, n_b,
           round((p_a - p_b)
                 / sqrt(NULLIF(p_pool * (1 - p_pool), 0)
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat,
           (abs((p_a - p_b)
                / sqrt(NULLIF(p_pool * (1 - p_pool), 0)
                       * (1.0 / n_a + 1.0 / n_b))) > 1.959964)
               AS significant_95
    FROM s
    """,
    "agg", "stats", "abtest",
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (A/B experiment readout): deterministic
    user_id-parity assignment, per-user conversion (any purchase), pooled
    z statistic and the 95% significance verdict — the experiment-analysis
    aggregate every feature-rollout pipeline ends with.  Two key-shuffles
    (user grouping, then 2-row group stats); the test statistic itself is a
    1-row computation."""
    ev = load_table(spark, sf_dir, "events")
    assign = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150), 1
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "grp", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
        )
    )
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("bigint").alias("conv")
    )
    s = g.agg(
        F.max(F.when(F.col("grp") == "A", F.col("conv") / F.col("n"))).alias("p_a"),
        F.max(F.when(F.col("grp") == "B", F.col("conv") / F.col("n"))).alias("p_b"),
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("n_b"),
        (F.sum("conv") / F.sum("n")).alias("p_pool"),
    )
    # Degenerate experiments (everyone or no one converts) make
    # p_pool*(1-p_pool) exactly 0: the z denominator is sqrt(0) and ANSI
    # mode throws DIVIDE_BY_ZERO instead of emitting ±inf.  Guard the
    # variance term to NULL (the oracle mirrors with NULLIF) — "no testable
    # variance" reads as NULL z, NULL verdict on both engines.
    var_term = F.col("p_pool") * (1 - F.col("p_pool"))
    z = (F.col("p_a") - F.col("p_b")) / F.sqrt(
        F.when(var_term > 0, var_term)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return s.select(
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        "n_a",
        "n_b",
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.959964).alias("significant_95"),
    )


@register(
    "q_new_customers_running",
    """
    WITH firsts AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS first_month
        FROM orders GROUP BY o_custkey
    ),
    monthly AS (
        SELECT first_month, count(*) AS new_customers
        FROM firsts GROUP BY first_month
    )
    SELECT strftime(first_month, '%Y-%m-%d') AS month,
           new_customers,
           CAST(sum(new_customers) OVER (ORDER BY first_month
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_customers
    FROM monthly
    ORDER BY month
    """,
    "window", "agg", "distinct",
)
def q_new_customers_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over time — via the scalable first-seen
    rewrite: a running count of distinct customers is exactly the running
    sum of first-appearance counts, so the unbounded 'distinct over a
    growing frame' (which no engine supports directly) becomes one
    entity-keyed aggregate + a months-sized window.  The cardinality that
    reaches the window is |months|, regardless of fact size."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("first_month")
    )
    monthly = firsts.groupBy("first_month").agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    w = Window.orderBy("first_month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.select(
            F.date_format("first_month", "yyyy-MM-dd").alias("month"),
            "new_customers",
            F.sum("new_customers").over(w).cast("bigint").alias("cumulative_customers"),
        )
        .orderBy("month")
    )


@register(
    "q_rfm_segments",
    """
    WITH rfm AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey,
               ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           min(o_custkey) AS first_cust
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    "window", "agg", "segmentation",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency/frequency/monetary quintiles
    cross-tabulated into segment cells — the classic lifecycle-marketing
    featurization.  Each quintile comes from operators/ranks.global_ntile
    (two-pass range-partitioned rank; exact SQL NTILE tie handling), NOT a
    partition-less ``ntile(5) OVER (ORDER BY ...)`` — the customer aggregate
    is entity-cardinality, and three single-task global sorts over 10^8+
    customers would serialize the whole query at 100 TB."""
    from ..operators.ranks import global_ntile

    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = rfm
    for col, out in (
        ("last_order", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        scored = global_ntile(
            scored, [F.col(col).desc(), F.col("o_custkey")], 5, bucket_col=out
        )
    scored = scored.select("o_custkey", "r_score", "f_score", "m_score")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").alias("first_cust"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_longest_streak",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, count(*) AS streak_days,
               min(d) AS streak_start
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(streak_days) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
    "window", "streak", "sequence",
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands on
    the calendar: date minus dense row number is constant within a run) —
    the engagement metric behind retention features.  One distinct pass and
    one user-partitioned window; everything stays keyed by the entity."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_days").cast("bigint").alias("longest_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


@register(
    "q_mad_robust",
    """
    WITH med AS (
        SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(max(m.med_price), 4) AS median_price,
           round(quantile_cont(abs(l.l_extendedprice - m.med_price), 0.5), 4) AS mad_price,
           count(*) AS n_rows
    FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    "agg", "stats", "robust",
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the outlier-robust dispersion
    statistic (the robust-scaling alternative to stddev for feature
    normalisation): group median first, broadcast it back, then the median
    of absolute deviations.  Both medians run over unbounded-distinct
    price values, so both go through the level-table
    operators/ranks.group_quantile_cont (round 10 — the builtin map-based
    ``percentile`` held every distinct price in one buffer and killed the
    sf10 JVM); two level-table passes over the same 3-value grouping key."""
    from ..operators.ranks import (
        group_quantile_cont_levels, group_value_levels,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # ONE fact scan + level reduction serves BOTH medians (r14, guide §2.3):
    # the deviation pass's levels derive from the price levels themselves —
    # |v - med| maps each (group, price, count) level to a deviation level
    # with counts re-merged — so the second percentile never rescans or
    # re-shuffles the fact table (it was a second full scan + row-level
    # shuffle before).  Values are bit-identical: same level multiset,
    # same cumulative-window interpolation.
    lv = group_value_levels(li, "l_returnflag", "l_extendedprice")
    med = group_quantile_cont_levels(
        lv, "l_returnflag", {"med_price": 0.5}
    ).select("l_returnflag", "med_price")
    dev_lv = (
        lv.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            F.abs(F.col("__v") - F.col("med_price")).alias("__v"),
            "__ln",
        )
        .groupBy("l_returnflag", "__v")
        .agg(F.sum("__ln").alias("__ln"))
    )
    mad = group_quantile_cont_levels(dev_lv, "l_returnflag", {"__mad": 0.5})
    return (
        med.join(mad, "l_returnflag")
        .select(
            "l_returnflag",
            F.round("med_price", 4).alias("median_price"),
            F.round("__mad", 4).alias("mad_price"),
            F.col("__qn").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_order_gap_distribution",
    """
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT CAST(least(floor(gap_days / 30.0), 12) AS BIGINT) AS gap_bucket_months,
           count(*) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY 1
    ORDER BY gap_bucket_months
    """,
    "window", "agg", "retention",
)
def q_order_gap_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution: per-customer lag() gaps between
    consecutive orders, bucketed by month — the repurchase-cadence signal
    behind churn-risk features.  One entity-keyed window, then a 13-key
    histogram aggregate; the cadence of millions of customers profiles in
    two narrow passes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        )
    ).where(F.col("gap_days").isNotNull())
    bucket = F.least(F.floor(F.col("gap_days") / 30.0), F.lit(12)).cast("bigint")
    return (
        gaps.groupBy(bucket.alias("gap_bucket_months"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").cast("bigint").alias("min_days"),
            F.max("gap_days").cast("bigint").alias("max_days"),
        )
        .orderBy("gap_bucket_months")
    )


@register(
    "q_argminmax_aggregates",
    """
    SELECT o_custkey,
           count(*) AS n_orders,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           round(max(o_totalprice), 2) AS biggest_price,
           arg_min(o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                     || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS first_orderkey
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    "agg", "argmax",
)
def q_argminmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (ARG_MAX / ARG_MIN) aggregates: the order id that
    carries each customer's max price, and the earliest order id — the
    'value at the extreme of another column' aggregate that replaces a
    rank-window + filter with a single partial+final agg pass.

    Determinism note: o_totalprice is continuous (ties measure-zero), but
    same-day orders DO occur — so the date-based arg_min orders by a
    composite lexicographic key (formatted date || zero-padded orderkey),
    the portable way to give an arg-extreme an explicit tiebreak (DuckDB's
    arg_min has no struct ordering)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
            F.min_by(
                "o_orderkey",
                F.concat(
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
                    F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
                ),
            ).alias("first_orderkey"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q_chi_square",
    """
    WITH obs AS (
        SELECT c_mktsegment AS seg, n_regionkey AS region, count(*) AS o
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    margins AS (
        SELECT seg, region, o,
               sum(o) OVER (PARTITION BY seg) AS row_tot,
               sum(o) OVER (PARTITION BY region) AS col_tot,
               sum(o) OVER () AS grand_tot
        FROM obs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(grand_tot) AS BIGINT) AS n_customers,
           round(sum(pow(o - row_tot * col_tot * 1.0 / grand_tot, 2)
                     / (row_tot * col_tot * 1.0 / grand_tot)), 6) AS chi_square
    FROM margins
    """,
    "agg", "stats", "chisquare",
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (market segment x region): observed
    vs expected (row x column margins / grand total) over the contingency
    cells — the categorical-dependence screen feature selection runs before
    one-hot-encoding correlated columns.  The fact pass is one groupBy; the
    margins are windows over the |segments| x |regions| cell table, so the
    statistic itself is a near-free computation regardless of row count."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    obs = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("n_regionkey").alias("region"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    m = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("region")).alias("col_tot"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("grand_tot"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand_tot")
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("grand_tot").cast("bigint").alias("n_customers"),
        F.round(F.sum(F.pow(F.col("o") - exp, F.lit(2.0)) / exp), 6).alias(
            "chi_square"
        ),
    )


@register(
    "q_pareto_frontier",
    """
    SELECT p.p_partkey, p.p_name,
           round(p.p_retailprice, 2) AS price,
           p.p_size
    FROM part p
    WHERE p.p_partkey < 500
      AND NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_partkey < 500
            AND q.p_retailprice <= p.p_retailprice
            AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
      )
    ORDER BY price, p_size
    """,
    "join", "anti", "skyline",
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: parts not DOMINATED on the
    (price low, size high) trade-off — no other part is at least as good on
    both axes and strictly better on one.  Stated as NOT EXISTS in the
    oracle; the Spark plan uses the equivalent anti join.  At 100 TB the
    O(n²) dominance join wants a pre-filter: rank-bucket one axis and only
    compare against better-or-equal buckets — the frontier itself is tiny,
    so the window pre-pass kills almost all candidates."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_partkey") < 500)
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )
    q = p.select(
        F.col("p_retailprice").alias("q_price"), F.col("p_size").alias("q_size")
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") > F.col("p_size"))
        )
    )
    return (
        p.join(q, dominated, "left_anti")
        .select(
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("price"),
            "p_size",
        )
        .orderBy("price", "p_size")
    )


@register(
    "q_linear_interpolation",
    """
    WITH grid AS (
        SELECT user_id, unnest(generate_series(
            TIMESTAMP '2024-01-10 00:00:00',
            TIMESTAMP '2024-01-10 23:00:00',
            INTERVAL 1 HOUR)) AS g_ts
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10)
    ),
    pts AS (
        SELECT user_id, ts, value FROM events
        WHERE user_id < 10 AND event_type = 'view'
    ),
    joined AS (
        SELECT g.user_id, g.g_ts, p.ts, p.value,
               CASE WHEN p.ts <= g.g_ts THEN p.ts END AS before_ts,
               CASE WHEN p.ts > g.g_ts THEN p.ts END AS after_ts
        FROM grid g LEFT JOIN pts p ON p.user_id = g.user_id
    ),
    bounds AS (
        SELECT user_id, g_ts,
               max(before_ts) AS t0,
               min(after_ts) AS t1,
               max(CASE WHEN ts = (SELECT max(p2.ts) FROM pts p2
                                   WHERE p2.user_id = joined.user_id AND p2.ts <= joined.g_ts)
                        THEN value END) AS v0,
               max(CASE WHEN ts = (SELECT min(p3.ts) FROM pts p3
                                   WHERE p3.user_id = joined.user_id AND p3.ts > joined.g_ts)
                        THEN value END) AS v1
        FROM joined
        GROUP BY user_id, g_ts
    )
    SELECT user_id,
           strftime(g_ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
           round(CASE
             WHEN t0 IS NULL THEN v1
             WHEN t1 IS NULL THEN v0
             WHEN t1 = t0 THEN v0
             ELSE v0 + (v1 - v0) * date_diff('second', t0, g_ts)
                        / date_diff('second', t0, t1)
           END, 6) AS value_interp
    FROM bounds
    ORDER BY user_id, grid_ts
    """,
    "window", "timeseries", "interpolation",
)
def q_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample irregular per-user series onto an hourly grid with LINEAR
    interpolation between the surrounding observations (edges clamp to the
    nearest point) — the sensor/metric alignment step before any
    multivariate time-series model.

    The Spark plan is the scalable form: union the grid with the points,
    bracket each grid instant with one window pass (last non-null before /
    first non-null after, both value and timestamp carried atomically as
    structs), then blend.  One user-keyed exchange; no per-grid-point
    subqueries (the oracle states those only because DuckDB lacks
    IGNORE NULLS navigation across a union as cleanly)."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    pts = ev.where((F.col("user_id") < 10) & (F.col("event_type") == "view")).select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    # grid users = ALL users < 10 (matching the oracle's grid CTE), not just
    # those with view events: a user with no observations still gets grid
    # rows with NULL value_interp on both sides
    users = ev.where(F.col("user_id") < 10).select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
                F.lit("2024-01-10 23:00:00").cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("g_ts"),
    )
    unioned = pts.select(
        "user_id", F.col("ts").alias("t"), F.struct("ts", "value").alias("obs"),
        F.lit(0).alias("is_grid"), F.lit(None).cast("timestamp_ntz").alias("g_ts"),
    ).unionByName(
        grid.select(
            "user_id", F.col("g_ts").alias("t"),
            F.lit(None).cast("struct<ts:timestamp_ntz,value:double>").alias("obs"),
            F.lit(1).alias("is_grid"), "g_ts",
        )
    )
    # grid rows sort AFTER a coincident observation (is_grid=1) so an exact
    # hit brackets as [obs, next] and interpolates to exactly obs.value
    wb = W.partitionBy("user_id").orderBy("t", "is_grid").rowsBetween(
        W.unboundedPreceding, -1
    )
    wa = W.partitionBy("user_id").orderBy("t", "is_grid").rowsBetween(
        1, W.unboundedFollowing
    )
    before = F.last("obs", ignorenulls=True).over(wb)
    after = F.first("obs", ignorenulls=True).over(wa)
    return (
        unioned.withColumn("b", before)
        .withColumn("a", after)
        .where(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.date_format("g_ts", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
            F.round(
                F.when(F.col("b").isNull(), F.col("a")["value"])
                .when(F.col("a").isNull(), F.col("b")["value"])
                .when(F.col("a")["ts"] == F.col("b")["ts"], F.col("b")["value"])
                .otherwise(
                    F.col("b")["value"]
                    + (F.col("a")["value"] - F.col("b")["value"])
                    * (F.unix_timestamp("g_ts") - F.unix_timestamp(F.col("b")["ts"]))
                    / (
                        F.unix_timestamp(F.col("a")["ts"])
                        - F.unix_timestamp(F.col("b")["ts"])
                    )
                ),
                6,
            ).alias("value_interp"),
        )
        .orderBy("user_id", "grid_ts")
    )


@register(
    "q_bipartite_degree",
    """
    WITH edges AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    deg AS (
        SELECT l_partkey, count(*) AS part_degree FROM edges GROUP BY l_partkey
    )
    SELECT part_degree,
           count(*) AS n_parts,
           CAST(min(l_partkey) AS BIGINT) AS first_part
    FROM deg
    GROUP BY part_degree
    ORDER BY part_degree
    """,
    "agg", "graph",
)
def q_bipartite_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part-supplier bipartite graph (edges =
    distinct co-occurrences in lineitem): how many suppliers each part is
    sourced from, histogrammed — the graph-profiling pass that sizes
    joins/partitions before heavier graph work (cf. connected components in
    operators/components.py).  Distinct-edges then two narrow aggregates;
    the shuffle key is the edge endpoint, never the fact row."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    deg = edges.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("part_degree"))
    return (
        deg.groupBy("part_degree")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("l_partkey").cast("bigint").alias("first_part"),
        )
        .orderBy("part_degree")
    )


@register(
    "q_cohort_ltv",
    """
    WITH firsts AS (
        SELECT o_custkey, min(date_trunc('year', o_orderdate)) AS cohort_year
        FROM orders GROUP BY o_custkey
    ),
    rev AS (
        SELECT f.cohort_year,
               date_diff('year', f.cohort_year, date_trunc('year', o.o_orderdate))
                   AS year_offset,
               sum(o.o_totalprice) AS revenue
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT strftime(cohort_year, '%Y') AS cohort,
           year_offset,
           round(revenue, 2) AS revenue,
           round(sum(revenue) OVER (PARTITION BY cohort_year
                                    ORDER BY year_offset
                                    ROWS UNBOUNDED PRECEDING), 2)
               AS cumulative_ltv
    FROM rev
    ORDER BY cohort, year_offset
    """,
    "window", "agg", "cohort",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: revenue by (signup-year cohort, years since
    signup) with the running cumulative LTV per cohort — the monetary
    companion to the retention-count matrix (q_retention_cohorts).  The
    per-customer first-order pass and the revenue rollup share the customer
    key; the LTV window runs on |cohorts| x |offsets| rows."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("year", F.min("o_orderdate")).alias("cohort_year")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_year",
            (
                F.year(F.date_trunc("year", F.col("o_orderdate")))
                - F.year(F.col("cohort_year"))
            ).alias("year_offset"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("cohort_year").orderBy("year_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rev.select(
            F.date_format("cohort_year", "yyyy").alias("cohort"),
            "year_offset",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.sum("revenue").over(w), 2).alias("cumulative_ltv"),
        )
        .orderBy("cohort", "year_offset")
    )


@register(
    "q_topdown_allocation",
    """
    WITH cust_rev AS (
        SELECT n.n_nationkey, c.c_custkey, sum(o.o_totalprice) AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE c.c_custkey < 300
        GROUP BY 1, 2
    )
    SELECT n_nationkey, c_custkey,
           round(revenue, 2) AS revenue,
           round(1000000.0 * revenue / sum(revenue) OVER (PARTITION BY n_nationkey),
                 6) AS allocated_target
    FROM cust_rev
    ORDER BY n_nationkey, c_custkey
    """,
    "window", "allocation",
)
def q_topdown_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-down proportional allocation: a per-nation target (1M) distributed
    to customers proportional to their revenue share — the forecast-
    reconciliation / budget-allocation transform.  One grouped rollup plus a
    share window over the SAME nation partitioning; allocation preserves the
    group total by construction."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_nationkey", "c_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_nationkey")
    return (
        rev.select(
            "n_nationkey",
            "c_custkey",
            F.round("revenue", 2).alias("revenue"),
            F.round(
                F.lit(1000000.0) * F.col("revenue") / F.sum("revenue").over(w), 6
            ).alias("allocated_target"),
        )
        .orderBy("n_nationkey", "c_custkey")
    )


@register(
    "q_source_vocab_overlap",
    """
    WITH vocab AS (
        SELECT DISTINCT source,
               unnest(list_distinct(string_split(trim(text), ' '))) AS term
        FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
    ),
    sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS common
        FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, common,
           round(common * 1.0 / (sa.n + sb.n - common), 6) AS vocab_jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    "text", "dedup", "setops",
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-source similarity by VOCABULARY Jaccard (distinct terms per
    shard, pairwise overlap) — the source-level redundancy screen run before
    committing full document-level dedup between two ingested corpora.  The
    heavy work is one distinct over (source, term); the pair join runs on
    vocabulary, not documents."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    from ..functions.text import tokens

    vocab = d.select(
        "source", F.explode(F.array_distinct(tokens("text"))).alias("term")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "term")
    b = vocab.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "common",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("vocab_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "q_benford_audit",
    """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS first_digit
        FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT count(*) AS total FROM digits)
    SELECT first_digit,
           count(*) AS observed,
           round(count(*) * 1.0 / max(n.total), 6) AS observed_freq,
           round(ln(1.0 + 1.0 / first_digit) / ln(10.0), 6) AS benford_freq
    FROM digits CROSS JOIN n
    GROUP BY first_digit
    ORDER BY first_digit
    """,
    "agg", "audit", "stats",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed leading-
    digit frequencies against log10(1 + 1/d) — the fraud/data-quality screen
    for fabricated numeric columns.  Digit extraction is scan-side string
    arithmetic; the histogram is 9 keys."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        # floor() explicitly: Spark's double->bigint cast TRUNCATES while
        # DuckDB's rounds half-even — floor is the portable spelling
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).cast("bigint").alias("first_digit")
    )
    n = digits.agg(F.count(F.lit(1)).alias("total"))
    return (
        digits.crossJoin(F.broadcast(n))
        .groupBy("first_digit")
        .agg(
            F.count(F.lit(1)).alias("observed"),
            F.round(F.count(F.lit(1)) / F.max("total"), 6).alias("observed_freq"),
        )
        .withColumn(
            "benford_freq",
            F.round(
                F.log(1.0 + 1.0 / F.col("first_digit")) / F.log(F.lit(10.0)), 6
            ),
        )
        .orderBy("first_digit")
    )


@register(
    "q_grouping_id",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
    """,
    "agg", "rollup", "grouping",
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals disambiguated by GROUPING()/grouping_id: the bitmask
    that tells a real 'A' group from the 'ALL' subtotal a NULL-coalesced
    label would conflate — required the moment a rolled-up dimension is
    itself nullable.  Same partial+final aggregation as any rollup; the
    grouping id is plan metadata, not data."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "gid",
            "n_rows",
            "sum_qty",
        )
        .orderBy("gid", "rf", "ls")
    )


@register(
    "q_rolling_corr",
    """
    WITH daily AS (
        SELECT l_shipdate AS d,
               sum(l_quantity) AS qty,
               sum(l_extendedprice) AS rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_shipdate
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(corr(qty, rev) OVER (
               ORDER BY epoch(d)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 6)
               AS corr_30d,
           CAST(count(*) OVER (
               ORDER BY epoch(d)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_days
    FROM daily
    ORDER BY day
    """,
    "window", "stats", "rolling",
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day correlation between daily shipped quantity and revenue
    — second-moment statistics over a RANGE (time) frame, the regime-shift
    detector for co-moving metrics.  The fact table collapses to one row per
    day first, so the sliding window runs over days, not line items; the
    range frame is seconds-keyed (epoch) identically on both engines.

    The correlation is assembled from guarded moment sums rather than
    ``F.corr``: under Spark 4's default ANSI mode a frame with zero
    variance (possible at sparse scale factors — caught by the sf0.001
    oracle-subset net) makes corr's internal division THROW; the explicit
    form yields NULL there, which is exactly DuckDB corr's answer."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum("l_quantity").alias("qty"), F.sum("l_extendedprice").alias("rev")
    )
    w = (
        Window.orderBy(F.unix_timestamp(F.col("d").cast("timestamp")))
        .rangeBetween(-2592000, 0)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("qty").over(w)
    sy = F.sum("rev").over(w)
    sxx = F.sum(F.col("qty") * F.col("qty")).over(w)
    syy = F.sum(F.col("rev") * F.col("rev")).over(w)
    sxy = F.sum(F.col("qty") * F.col("rev")).over(w)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when((vx > 0) & (vy > 0), (n * sxy - sx * sy) / F.sqrt(vx * vy))
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(corr, 6).alias("corr_30d"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_days"),
        )
        .orderBy("day")
    )


@register(
    "q_survival_km",
    """
    WITH spans AS (
        SELECT o_custkey,
               date_diff('day', min(o_orderdate), max(o_orderdate)) AS lifetime_days,
               (max(o_orderdate) < TIMESTAMP '2002-06-01 00:00:00') AS churned
        FROM orders GROUP BY o_custkey
    ),
    ev AS (
        SELECT CAST(floor(lifetime_days / 30.0) AS BIGINT) AS t,
               count(*) FILTER (WHERE churned) AS d,
               count(*) AS leaving
        FROM spans GROUP BY 1
    ),
    risk AS (
        SELECT t, d,
               sum(leaving) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_at_risk
        FROM ev
    )
    SELECT t AS month_bucket, d AS churn_events,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           round(exp(sum(ln(greatest(1.0 - d * 1.0 / n_at_risk, 1e-12)))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) AS survival
    FROM risk
    WHERE d > 0
    ORDER BY month_bucket
    """,
    "window", "stats", "survival",
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over customer lifetimes (first->last
    order, censored for customers still active near the horizon): the
    at-risk count is a REVERSE running sum over event times, and the
    survival product Π(1 - d/n) becomes exp of a running sum of logs — the
    standard trick that turns an inherently sequential product into two
    window passes over the (tiny) event-time table.  Fact work is one
    customer-keyed aggregate."""
    o = load_table(spark, sf_dir, "orders")
    spans = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("lifetime_days"),
        (
            F.max("o_orderdate") < F.lit("2002-06-01").cast("timestamp_ntz")
        ).alias("churned"),
    )
    ev = spans.groupBy(
        F.floor(F.col("lifetime_days") / 30.0).cast("bigint").alias("t")
    ).agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = ev.withColumn("n_at_risk", F.sum("leaving").over(w_desc))
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the terminal bucket has d == n_at_risk (survival exactly 0): floor the
    # factor at 1e-12 so ln stays defined on both engines; exp of the summed
    # logs then rounds to 0.0 at 6 decimals, which IS the KM value there
    surv = F.exp(
        F.sum(
            F.log(F.greatest(1.0 - F.col("d") / F.col("n_at_risk"), F.lit(1e-12)))
        ).over(w_asc)
    )
    return (
        risk.withColumn("survival", F.round(surv, 6))
        .where(F.col("d") > 0)
        .select(
            F.col("t").alias("month_bucket"),
            F.col("d").alias("churn_events"),
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            "survival",
        )
        .orderBy("month_bucket")
    )


@register(
    "q_ewma",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, round(sum(value), 2) AS v
        FROM events GROUP BY 1
    ),
    framed AS (
        SELECT d, v,
               array_agg(v) OVER (ORDER BY d
                                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS win
        FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, v,
           round(list_reduce(win, (acc, x) -> 0.7 * acc + 0.3 * x), 6) AS ewma
    FROM framed
    ORDER BY day
    """,
    "window", "timeseries", "ewma",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.3) of daily totals —
    the sequential recurrence s_t = a*x_t + (1-a)*s_{t-1} expressed
    relationally: a bounded 20-row frame collects into an array and a fold
    runs the recurrence PER ROW (initialised at the frame's oldest value).
    No cross-row driver state, no UDF: the recurrence length is bounded by
    the frame, so the cost is frame-length work per row — the portable way
    to run short recurrences (EWMA, debounce, decay counters) at scale."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    w = W.orderBy("d").rowsBetween(-19, 0)
    framed = daily.withColumn("win", F.collect_list("v").over(w))
    ewma = F.aggregate(
        F.slice(F.col("win"), 2, F.size(F.col("win"))),
        F.element_at(F.col("win"), 1),
        lambda acc, x: F.lit(0.7) * acc + F.lit(0.3) * x,
    )
    return (
        framed.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "v",
            F.round(ewma, 6).alias("ewma"),
        )
        .orderBy("day")
    )


@register(
    "q_gini_coefficient",
    """
    WITH cust AS (
        SELECT o_custkey, sum(o_totalprice) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT revenue,
               row_number() OVER (ORDER BY revenue, o_custkey) AS i,
               count(*) OVER () AS n,
               sum(revenue) OVER () AS tot
        FROM cust
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           round(sum((2.0 * i - n - 1) * revenue) / (max(n) * max(tot)), 6) AS gini
    FROM ranked
    """,
    "window", "stats", "inequality",
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (0 = equal, 1 =
    one customer is everything) via the rank formula
    G = Σ (2i - n - 1) x_i / (n Σx) over revenue-sorted customers — the
    inequality audit for revenue, token-budget, or traffic distributions.

    The rank comes from operators/ranks.global_row_number (two-pass
    range-partitioned row_number), NOT a global ``Window.orderBy`` — the
    entity aggregate is customer-cardinality, and a partition-less window
    would sort every customer through one task at 100 TB.  n and Σx fold in
    as a 1-row broadcast cross join; the only global window left is the
    rank primitive's bounded per-partition-offsets table."""
    from ..operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    ranked = global_row_number(cust, ["revenue", "o_custkey"], rank_col="i")
    # totals from the CHECKPOINTED ranked frame — not a second customer
    # aggregation over the fact table
    totals = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("revenue").alias("tot")
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.round(
                F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("revenue"))
                / (F.max("n") * F.max("tot")),
                6,
            ).alias("gini"),
        )
    )


@register(
    "q_hhi_concentration",
    """
    WITH supp_rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               sum(l.l_extendedprice) AS revenue
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ), shares AS (
        SELECT s_nationkey,
               revenue / sum(revenue) OVER (PARTITION BY s_nationkey) AS share
        FROM supp_rev
    )
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(pow(share, 2)) * 10000, 6) AS hhi
    FROM shares
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
    "window", "agg", "concentration",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation (x10000, antitrust convention: <1500 competitive, >2500
    concentrated) — squared market shares summed per market.  Shares come
    from a window over the supplier-level aggregate; the fact pass is one
    grouped sum."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    supp_rev = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    share = F.col("revenue") / F.sum("revenue").over(
        Window.partitionBy("s_nationkey")
    )
    return (
        supp_rev.withColumn("share", share)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.round(F.sum(F.pow(F.col("share"), F.lit(2.0))) * 10000, 6).alias("hhi"),
        )
        .orderBy("s_nationkey")
    )
