"""Distributed k-means clustering and SemDeDup-style semantic deduplication
over embedding columns (LLM-pipeline extensions, SURVEY.md §2.12).

Scale design (Lloyd's on Spark, no MLlib/RDDs):

- **assignment** is a narrow map: centroids travel as a closure of one
  Arrow-batched numpy UDF (k x dim floats, kilobytes), each batch does a
  single (batch x dim) @ (dim x k) matmul + argmax — no join, no shuffle.
- **centroid update** is one groupBy: posexplode turns vectors into
  (cluster, dim, value) rows, avg() runs with map-side partial aggregation,
  and only k x dim scalars ever reach the driver per iteration.
- **iterations** are driver-orchestrated (Lloyd's is inherently iterative),
  but each pass is a full-parallel scan; lineage stays flat because every
  iteration re-reads the source plan with new literal centroids.
- **SemDeDup** (Abbas et al. 2023: cluster, then dedup WITHIN clusters)
  turns all-pairs O(n²) cosine dedup into Σ cluster² with exact verify —
  the same candidate-then-verify contract as the banded-LSH path
  (operators/similarity.lsh_neardup_pairs), with cluster membership instead
  of hash collisions generating candidates.  Multi-assignment (each vector
  joins its ``n_assign`` nearest clusters) recovers near-boundary pairs the
  hard partition would miss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import dot, to_double
from .similarity import _prep, verify_pairs_in_buckets


def _lit_vec(c: list[float]):
    return F.array(*[F.lit(float(x)) for x in c])


def l2_assign_nearest(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Assign every vector to the nearest centroid by EUCLIDEAN distance,
    entirely in Column expressions (centroids fold into the plan as
    literals).  Ties break toward the lower cluster index — array_position
    returns the FIRST occurrence of the min.

    Output: (id, cluster [0-based], l2_dist).  This is the oracle-checkable
    exactness baseline (DuckDB twin: list_distance + argmin QUALIFY); the
    iterative fit below uses the Arrow path for speed.
    """
    v = to_double(F.col(vec_col))
    dists = F.array(
        *[
            F.sqrt(
                F.aggregate(
                    F.zip_with(v, _lit_vec(c), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            for c in centroids
        ]
    )
    return df.select(
        F.col(id_col).alias("id"),
        (F.array_position((d := dists), F.array_min(d)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("l2_dist"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iters: int = 3,
) -> list[list[float]]:
    """Spherical k-means (Lloyd's) over the FULL corpus, distributed.

    Deterministic: initial centroids are the k lowest-id vectors (no RNG),
    assignment ties break toward the lower cluster index, and the centroid
    update averages in deterministic (cluster, dim) groups.  Returns
    unit-norm centroids (k x dim plain lists).

    Driver footprint per iteration: k x dim floats (the updated centroids) —
    never data rows.  Empty clusters keep their previous centroid.
    """
    seed_rows = (
        df.select(F.col(id_col).alias("i"), to_double(F.col(vec_col)).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit needs at least k={k} rows to seed centroids; "
            f"the corpus has only {len(seed_rows)}"
        )
    cent = np.array([r["v"] for r in seed_rows], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    base = df.select(to_double(F.col(vec_col)).alias("v"))
    d = cent.shape[1]
    for _ in range(n_iters):
        # assignment + centroid partial sums FUSED into one Arrow pass
        # (r13): each batch runs the argmax matmul (same first-max
        # tie-break as assign_clusters) and reduces to per-cluster
        # (Σ vectors, count) partials — one row of k·d + k numbers per
        # batch.  The previous shape ran the pandas assignment, exploded
        # n×d (cluster, dim, value) rows, shuffled them into a
        # groupBy(cluster, dim) and collected — a shuffle and two extra
        # stages per iteration for the same k×d driver result (the partial
        # sums differ from the grouped SUM only in float association,
        # inside the 1e-6 numpy-parity pin).
        C = cent.copy()

        def _partials(it, C=C):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["v"].values)
                a = np.argmax(V @ C.T, axis=1)
                sums = np.zeros((k, d))
                for j in np.unique(a):
                    sums[j] = V[a == j].sum(axis=0)
                cnts = np.bincount(a, minlength=k)
                yield pd.DataFrame(
                    {
                        "sums": [sums.reshape(-1).tolist()],
                        "cnts": [cnts.tolist()],
                    }
                )

        rows = base.mapInPandas(
            _partials, "sums array<double>, cnts array<long>"
        ).collect()
        acc = np.zeros((k, d))
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:
            acc += np.asarray(r["sums"]).reshape(k, d)
            cnt += np.asarray(r["cnts"], dtype=np.int64)
        new = cent.copy()
        for j in range(k):
            if cnt[j] > 0:
                m = acc[j] / cnt[j]
                new[j] = m / max(np.linalg.norm(m), 1e-12)
        cent = new
    return cent.round(9).tolist()


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    keep_vec: bool = False,
) -> DataFrame:
    """Cosine (dot-on-unit-centroids) cluster assignment as ONE Arrow-batched
    numpy matmul per batch.  Output: (id, cluster [0-based][, v]).  Narrow
    map — centroids ship inside the serialized UDF, nothing shuffles."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def _nearest(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.values)
        return pd.Series(np.argmax(V @ C.T, axis=1).astype(np.int32))

    v = to_double(F.col(vec_col))
    cols = [F.col(id_col).alias("id"), _nearest(v).alias("cluster")]
    if keep_vec:
        cols.append(v.alias("v"))
    return df.select(*cols)


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    k: int | str = "auto",
    n_iters: int = 3,
    n_assign: int = 3,
    max_bucket_size: int | None = 20_000,
) -> DataFrame:
    """SemDeDup-style semantic near-dup PAIRS: spherical-kmeans buckets
    generate candidates (each vector joins its ``n_assign`` nearest
    clusters), exact cosine verifies every candidate — no false positives;
    recall vs the exact all-pairs form is asserted in tests.

    ``max_bucket_size`` is the skew guard on the verify stage: k-means has
    no size bound, so a degenerate clustering (one cluster absorbing a large
    corpus fraction) would otherwise hand one task an O(cluster × dim)
    vector load + O(cluster²) matmul.  The verifier fails fast with the
    cluster id instead of OOMing — the remedy is a larger ``k`` (finer
    buckets), not a bigger executor.

    ``k="auto"`` (default) makes that remedy automatic across SFs: k grows
    with the corpus so the MEAN bucket holds ~max_bucket_size/2 assignments
    (floor 8, matching the fixed-k behavior at small corpora).  The sizing
    count is one scalar job folded into the (whitelisted-eager) k-means
    fit — the guard still backstops skewed clusterings, auto-k only bounds
    the balanced case.

    Output: (id_a, id_b, cosine_sim), id_a < id_b, cosine_sim >= threshold.
    """
    if k == "auto":
        target = (max_bucket_size or 20_000) // 2
        n = df.count()
        k = max(8, -(-n_assign * n // target))  # ceil div
    centroids = kmeans_fit(df, id_col, vec_col, k=k, n_iters=n_iters)
    v = _prep(df, id_col, vec_col, "x")
    # multi-assignment: top-n_assign centroid indices per vector in ONE
    # Arrow matmul + stable argsort per batch (r13) — same descending-dot,
    # ties-toward-lower-bucket order as the posexplode + row_number window
    # it replaces, minus k interpreted dot-aggregates per row AND the
    # per-vector rank window's shuffle
    from .similarity import _top_buckets_udf

    tagged = v.select(
        "x_id", "x_vec", "x_norm",
        F.explode(
            _top_buckets_udf(centroids, n_assign)(F.col("x_vec"))
        ).alias("bucket"),
    )
    # exact verify INSIDE each cluster bucket (blocked matmul) — vectors
    # travel once per assignment, matches-only leave the worker; see
    # similarity.verify_pairs_in_buckets for the quadratic-vs-linear
    # data-movement argument (the sf1 sweep measured the per-candidate
    # re-attach form at 704s; this form runs the same corpus in seconds)
    return verify_pairs_in_buckets(
        tagged, ["bucket"], threshold, max_bucket_size=max_bucket_size
    )
