"""Similarity search over embedding columns (SURVEY.md §2.12: brute-force
cosine top-k baseline + LSH-bucketed approximate variant as the scale path).

Scale design:

- **brute-force top-k** (the exactness baseline): broadcast the (small) query
  set against the full corpus — the corpus scan is embarrassingly parallel,
  each partition keeps a k-heap via the rank window; no corpus shuffle when
  the query side is broadcast.  Cost O(|corpus| * |queries| * dim).
- **all-pairs knn (self-join)**: quadratic — only for corpus slices; the
  production path is below.
- **hyperplane LSH**: deterministic random hyperplanes fold into the plan as
  literals; vectors bucket by sign pattern, candidates only within a bucket
  (plus optional multiprobe neighbours).  Turns all-pairs into per-bucket
  joins; recall tunes with number of planes/probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, hyperplane_bucket, to_double


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        to_double(F.col(vec_col)).alias(f"{prefix}_vec"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector over the corpus
    (self-matches excluded).  Output: query_id, neighbor_id, cosine_sim, rank."""
    c = _prep(corpus, id_col, vec_col, "neighbor")
    q = _prep(queries, id_col, vec_col, "query")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("query_vec"), F.col("neighbor_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def nearest_neighbor_join(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Top-1 neighbour for EVERY vector (exact, all-pairs) — the embedding-
    cosine near-dup primitive.  Quadratic: use lsh_topk at scale."""
    return cosine_topk(df, df, id_col, vec_col, k=1)


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket.  Same output shape as cosine_topk (rank within candidates)."""
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = first["d"]
    planes = random_planes(dim, n_planes, seed)
    c = _prep(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", hyperplane_bucket(F.col("neighbor_vec"), planes)
    )
    q = _prep(queries, id_col, vec_col, "query").withColumn(
        "bucket", hyperplane_bucket(F.col("query_vec"), planes)
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("query_vec"), F.col("neighbor_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
