"""Embedding-table queries: cosine similarity search (exact + LSH),
nearest-neighbour near-dup join (SURVEY.md §2.12 similarity extensions).

Oracle note: Spark computes dot/norm with `F.aggregate` over
double-cast elements (strict left-to-right IEEE summation); the DuckDB twin
casts to DOUBLE[] and uses list_dot_product/list_cosine_similarity, which
run the same sequential accumulation — results are bit-identical, and both
sides round to 6 decimals anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import vectors as V
from ..operators import similarity as S
from ..operators.similarity import cosine_topk, lsh_topk, nearest_neighbor_join
from ..sources import load_table
from .catalog import register


@register(
    "q_cosine_topk",
    """
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(q.v, c.v) AS sim
      FROM q JOIN c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    "vectors", "similarity", "topk",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors: the correctness
    baseline for ANN.  Query side broadcast; corpus scan stays partitioned."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


@register(
    "q_nearest_neighbor_dedup",
    """
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE vec_id < 200),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             a.label AS query_label, b.label AS neighbor_label,
             list_cosine_similarity(a.v, b.v) AS sim
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, query_label, neighbor_label,
           round(sim, 6) AS cosine_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    "vectors", "similarity", "neardup",
)
def q_nearest_neighbor_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup primitive: top-1 neighbour for every vector
    in a 200-vector slice (exact all-pairs on the slice; LSH below is the
    full-corpus path)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    nn = nearest_neighbor_join(emb, "vec_id", "embedding")
    labels = emb.select("vec_id", "label")
    return (
        nn.join(labels.withColumnRenamed("vec_id", "query_id")
                      .withColumnRenamed("label", "query_label"), "query_id")
        .join(labels.withColumnRenamed("vec_id", "neighbor_id")
                    .withColumnRenamed("label", "neighbor_label"), "neighbor_id")
        .select(
            "query_id", "neighbor_id", "query_label", "neighbor_label",
            F.round("cosine_sim", 6).alias("cosine_sim"),
        )
    )


@register(
    "q_lsh_topk",
    None,  # approximate (recall depends on plane draw) -> rows-only
    "vectors", "similarity", "lsh", "rows-only",
    pinned_by=("test_lsh_topk_recall",),
)
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-5 for 10 queries — the scale
    path: candidates drawn from the UNION of 12 independent 6-plane sign
    tables (multi-table LSH, the standard recall dial), deterministic
    planes from seed 42.  On this near-orthogonal random corpus the
    12x6 config examines ~17% of the corpus for recall ~0.5 (pinned in
    test_lsh_topk_recall); clustered real embeddings sit far above that."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = lsh_topk(
        emb, queries, "vec_id", "embedding", k=5, n_planes=6, dim=64,
        n_tables=12,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


@register(
    "q_ivf_topk",
    None,  # approximate (recall depends on quantizer training) -> rows-only
    "vectors", "similarity", "ivf", "rows-only",
    pinned_by=("test_ivf_topk_recall", "test_ivf_persisted_index_prunes_partitions_and_matches_inmemory"),
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for 10 queries: spherical-kmeans coarse
    quantizer (16 cells, trained on a deterministic sample), nprobe=2 —
    each query scans ~2/16 of the corpus instead of all of it.  Recall vs
    the exact q_cosine_topk is asserted in tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.ivf_topk(emb, queries, "vec_id", "embedding", k=5, n_centroids=16, nprobe=2)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


@register(
    "q_cosine_topk_arrow",
    None,  # numpy pairwise summation differs from sequential in the last ulp
    "vectors", "similarity", "pandas-udf", "rows-only",
    pinned_by=("test_arrow_cosine_topk_matches_exact",),
)
def q_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy twin of q_cosine_topk (matrix ops per Arrow batch instead
    of interpreted higher-order lambdas — ~1.8x at sf0.1).  Value parity
    with the exact form is asserted in tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    out = S.arrow_cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim"), "rank"
    )


@register(
    "q_embedding_neardup_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 4000 AND b.vec_id < 4000
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
    "vectors", "dedup", "neardup",
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup PAIRS above a similarity threshold (the
    symmetric-pair form of nearest-neighbor dedup).  All-pairs is exactness
    ground truth for the LSH/IVF scale paths; ordered ids halve the
    candidate space.

    The exact twin is BOUNDED to a deterministic id slice (vec_id < 4000 —
    a no-op at the driver SFs, whose corpora are smaller): an O(n²) ground
    truth is only useful at sizes where n² is computable, and Catalyst
    lowers the inequality join to a broadcast nested loop whose probe
    parallelism is the scan's task count — on single-row-group parquet
    that's ONE task doing every dot product.  The full-corpus path is
    q_lsh_neardup_pairs (banded candidates, exact verify, recall-pinned).

    Norms are hoisted BEFORE the join: cosine() would evaluate three
    interpreted higher-order aggregates per pair; precomputing |v| once per
    vector leaves one dot per pair with bit-identical arithmetic
    (dot / (|a|*|b|), same float op order) — ~3x on the O(n^2) stage."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 4000)
    a = emb.select(F.col("vec_id").alias("id_a"), V.to_double(F.col("embedding")).alias("va"))
    # spread the nested-loop STREAM side across the cluster: a trivial
    # shuffle of <=4000 rows buys task-count parallelism for the O(n^2) probe
    a = a.repartition(spark.sparkContext.defaultParallelism).withColumn(
        "na", V.norm(F.col("va"))
    )
    b = a.select(
        F.col("id_a").alias("id_b"), F.col("va").alias("vb"), F.col("na").alias("nb")
    )
    denom = F.col("na") * F.col("nb")
    sim = F.when(denom > 0, V.dot(F.col("va"), F.col("vb")) / denom)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", sim)
        .where(F.col("cosine_sim") >= 0.35)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )


@register(
    "q_lsh_neardup_pairs",
    None,  # approximate (recall depends on plane draws) -> rows-only
    "vectors", "dedup", "neardup", "lsh", "rows-only",
    pinned_by=("test_lsh_neardup_pairs_recall",),
)
def q_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH twin of q_embedding_neardup_pairs — the 100 TB path for
    threshold near-dup PAIRS: same schema (id_a, id_b, cosine_sim), but
    candidates come from per-(table, bucket) self-joins instead of the full
    O(n²) cross join, then exact cosine verifies each candidate (no false
    positives; recall ≥0.9 vs the exact pairs is asserted in
    tests/test_operators.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.lsh_neardup_pairs(emb, "vec_id", "embedding", threshold=0.35, dim=64)
    return out.select(
        "id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim")
    )


@register(
    "q_array_hof",
    """
    SELECT vec_id,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.1)) AS n_large,
           (len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.25)) > 0) AS any_gt_025,
           (len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) >= 0.3)) = 0) AS all_lt_03,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS sq_norm
    FROM embeddings
    """,
    "vectors", "arrays", "hof",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order predicates (exists / forall / filter / transform+
    aggregate) over the embedding column — the expression family every
    array-typed pipeline leans on."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = V.to_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0.1)).alias("n_large"),
        F.exists(v, lambda x: x > 0.25).alias("any_gt_025"),
        F.forall(v, lambda x: F.abs(x) < 0.3).alias("all_lt_03"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
    )


@register(
    "q_embedding_centroids",
    """
    SELECT label, i - 1 AS dim_idx,
           round(avg(e), 6) AS centroid,
           count(*) AS n_vectors
    FROM (
        SELECT label,
               unnest(CAST(embedding AS DOUBLE[])) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    )
    WHERE i <= 8
    GROUP BY label, i
    ORDER BY label, dim_idx
    """,
    "vectors", "agg",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (first 8 dims flattened to rows) — the
    class-prototype aggregation behind clustering seeds, label smearing and
    centroid-based retrieval.  posexplode turns the vector column into
    (label, dim, value) rows; one groupBy(label, dim) computes every centroid
    component with map-side partial sums — no driver collect, no UDF, and the
    shuffle carries scalars, never whole vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(V.to_double(F.col("embedding"))).alias("i", "e"))
        .where(F.col("i") < 8)
        .groupBy("label", F.col("i").alias("dim_idx"))
        .agg(
            F.round(F.avg("e"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim_idx")
    )


@register(
    "q_vector_quantize",
    """
    SELECT vec_id,
           round(maxabs, 6) AS maxabs,
           round(sqrt(err / 64.0), 6) AS rms_quant_err
    FROM (
        SELECT vec_id, maxabs,
               list_reduce(
                   list_prepend(0.0, list_transform(
                       e, x -> pow(x - round(x * (127.0 / maxabs)) / (127.0 / maxabs), 2)
                   )),
                   (acc, x) -> acc + x
               ) AS err
        FROM (
            SELECT vec_id,
                   CAST(embedding AS DOUBLE[]) AS e,
                   list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS maxabs
            FROM embeddings
        )
        WHERE maxabs > 0
    )
    ORDER BY vec_id
    """,
    "vectors", "quantize",
)
def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization audit: per-vector scale
    (127 / max|x|) and the RMS round-trip error — the compression step a
    100 TB embedding store runs before ANN serving (4x smaller, dot products
    in int8 SIMD).  Pure Column higher-order functions: quantize, dequantize
    and the error reduction all stay in the scan stage; nothing shuffles
    (the final ORDER BY is presentation-only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = V.to_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = F.lit(127.0) / F.col("maxabs")
    err = F.aggregate(
        F.transform(
            F.col("e"),
            lambda x: F.pow(x - F.round(x * scale) / scale, F.lit(2.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # err must see the RAW maxabs: computing it in the same select that
    # re-aliases "maxabs" to its rounded form would resolve the name against
    # the rounded output column and shift the scale.
    return (
        emb.select("vec_id", e.alias("e"), maxabs.alias("maxabs"))
        .where(F.col("maxabs") > 0)
        .select("vec_id", "maxabs", err.alias("err"))
        .select(
            "vec_id",
            F.round("maxabs", 6).alias("maxabs"),
            F.round(F.sqrt(F.col("err") / F.lit(64.0)), 6).alias("rms_quant_err"),
        )
        .orderBy("vec_id")
    )


@register(
    "q_kmeans_assign",
    """
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
               FROM embeddings WHERE vec_id < 8),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    scored AS (
        SELECT v.vec_id, c.cid, list_distance(v.vec, c.cvec) AS dist
        FROM v CROSS JOIN c
    )
    SELECT vec_id, cid AS cluster, round(dist, 6) AS l2_dist
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    "vectors", "clustering",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step) as pure Column
    expressions: every vector against 8 fixed centroids (the lowest-id
    embeddings), Euclidean argmin with first-wins ties — oracle-checkable
    exactness baseline for the iterative fit (q_kmeans_clusters).  Centroids
    fold into the plan as literals; assignment is a narrow map over the scan,
    nothing shuffles."""
    from ..operators.clustering import l2_assign_nearest

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        r["v"]
        for r in emb.where(F.col("vec_id") < 8)
        .select("vec_id", V.to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .collect()
    ]
    out = l2_assign_nearest(emb, "vec_id", "embedding", cents)
    return out.select(
        F.col("id").alias("vec_id"),
        "cluster",
        F.round("l2_dist", 6).alias("l2_dist"),
    )


@register(
    "q_kmeans_clusters",
    None,  # iterative fit: centroid float accumulation is engine-specific
    "vectors", "clustering", "rows-only",
    pinned_by=("test_kmeans_fit_matches_numpy",),
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (Lloyd's, k=8, 3 iterations,
    deterministic lowest-id init): per-cluster membership counts and mean
    cosine to the centroid.  Assignment is one Arrow matmul per batch;
    the centroid update groupBy moves k x dim scalars, never vectors.
    Numpy single-node parity is pinned in tests/test_operators.py."""
    from ..operators.clustering import assign_clusters, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iters=3)
    assigned = assign_clusters(emb, "vec_id", "embedding", cents, keep_vec=True)
    cent_arr = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in cents
    ])
    cvec = F.element_at(cent_arr, F.col("cluster") + 1)
    cos = V.dot(F.col("v"), cvec) / V.norm(F.col("v"))  # centroids are unit-norm
    return (
        assigned.withColumn("cos_to_centroid", cos)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cos_to_centroid"), 4).alias("mean_cos"),
        )
        .orderBy("cluster")
    )


@register(
    "q_semantic_dedup",
    None,  # cluster-bucketed candidates: recall is probabilistic by design
    "vectors", "dedup", "clustering", "rows-only",
    pinned_by=("test_semantic_dedup_recall",),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: spherical-kmeans buckets
    (k=auto — grows with the corpus so mean bucket size stays bounded;
    floor 8, multi-assign 3) generate candidates, exact cosine >= 0.35 verifies
    — same schema and threshold as the exact all-pairs ground truth
    (q_embedding_neardup_pairs) and the banded-LSH twin
    (q_lsh_neardup_pairs); recall vs exact is asserted in
    tests/test_operators.py.  Candidate cost is per-cluster-squared, not
    corpus-squared."""
    from ..operators.clustering import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup_pairs(emb, "vec_id", "embedding", threshold=0.35)
    return out.select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))


@register(
    "q_embedding_covariance",
    """
    WITH x AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               unnest(embedding) AS v
        FROM embeddings
    )
    SELECT a.i AS i, b.i AS j,
           round(covar_samp(CAST(a.v AS DOUBLE), CAST(b.v AS DOUBLE)), 6) AS cov
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    "vectors", "stats", "pca",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full covariance matrix of the embedding space (upper triangle, d=64 ->
    2080 cells) — the distributed heavy step of PCA / whitening / Mahalanobis
    outlier scoring: eigendecomposition of this d x d result is k-sized
    driver math (numpy.linalg.eigh), exactly like kmeans centroids.

    Shape: posexplode to (vec_id, dim, value), self-join per vector (fan-out
    d^2/2 per row — bounded by DIMENSION, not corpus), then ONE grouped
    covar_samp.  Scale-safe because partial aggregation bounds the shuffle
    to d^2 cells per map partition regardless of corpus size; the vector
    table itself is never shuffled on anything wider than vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode(V.to_double(F.col("embedding"))).alias("i", "v")
    )
    a = x.select("vec_id", F.col("i").alias("ai"), F.col("v").alias("av"))
    b = x.select("vec_id", F.col("i").alias("bi"), F.col("v").alias("bv"))
    return (
        a.join(b, "vec_id")
        .where(F.col("ai") <= F.col("bi"))
        .groupBy(F.col("ai").alias("i"), F.col("bi").alias("j"))
        .agg(F.round(F.covar_samp("av", "bv"), 6).alias("cov"))
        .orderBy("i", "j")
    )


@register(
    "q_embedding_pca",
    None,  # rows-only: no SQL eigensolver; pinned vs numpy in tests
    "vectors", "pca", "rows-only",
    pinned_by=("test_pca_matches_numpy_reference",),
)
def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every embedding onto its top-2 principal components
    (operators/pca.py): fit = the oracle-checked covariance plan + k-sized
    driver eigh (like k-means centroids); projection = one narrow JVM map
    (dot with broadcast literal eigenvectors).  Declared rows-only — DuckDB
    has no eigensolver — with the full fit/project path pinned against a
    numpy reference in tests/test_operators.py."""
    from ..operators.pca import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean = pca_fit(emb, "embedding", k=2)
    return pca_project(emb, "embedding", comps, mean).select(
        "vec_id",
        "label",
        F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    )
