"""Distributed PCA over ``array<float>`` embedding columns (SURVEY.md §2.12
similarity-search family: dimensionality reduction before ANN / clustering /
whitening).

Split exactly like k-means (operators/clustering.py): the DATA-sized work is
distributed Column math, the MODEL-sized work is driver numpy —

- **fit**: per-dimension means + the d x d covariance matrix come back from
  one grouped aggregation (pair-exploded, partial-agg bounded to d^2 cells
  per map partition — the same plan as the oracle-checked
  q_embedding_covariance); ``numpy.linalg.eigh`` on the d x d result is
  k-sized driver math, like k-means centroids.
- **project**: each output component is one dot product of the centred
  vector with a broadcast literal eigenvector — pure JVM higher-order
  functions, a narrow map over the scan, no shuffle, no Python worker.

Determinism: eigh is deterministic for a fixed symmetric matrix; each
component's SIGN is normalised (first nonzero loading made positive) so two
fits of the same data project identically — eigenvector sign is otherwise
arbitrary, which is also why PCA is declared rows-only for the DuckDB gate
(no SQL eigensolver) and pinned against a numpy reference in
tests/test_operators.py instead.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vectors import to_double


def covariance_and_mean(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(d x d sample covariance, d mean vector) of an array column —
    driver result is MODEL-sized (d^2 + d floats), never data rows.
    ONE scan: the per-dimension means ride along as avg(x_i) on the
    diagonal cells of the same pair aggregation that produces the
    covariances."""
    # upper-triangle (dim_i, dim_j, x_i, x_j) pairs generated PER ROW with a
    # nested higher-order transform — no row id, no self-join (a join keyed
    # on monotonically_increasing_id would instantiate the id twice and can
    # mispair; cf. the ranks primitive's checkpoint note).  Fan-out is
    # d^2/2 per row — bounded by dimension, and partial aggregation caps the
    # shuffle at d^2 cells per map partition.
    pairs = df.select(
        F.explode(
            F.expr(
                f"flatten(transform({vec_col}, (x, i) ->"
                f" transform(slice({vec_col}, i + 1, size({vec_col}) - i),"
                f" (y, j) -> struct(i AS ai, i + j AS bi,"
                f" CAST(x AS DOUBLE) AS av, CAST(y AS DOUBLE) AS bv))))"
            )
        ).alias("p")
    ).select("p.*")
    cells = (
        pairs.groupBy("ai", "bi")
        .agg(F.covar_samp("av", "bv").alias("c"), F.avg("av").alias("m"))
        .collect()
    )
    d = max(r["bi"] for r in cells) + 1 if cells else 0
    cov = np.zeros((d, d))
    mean = np.zeros(d)
    for r in cells:
        if r["c"] is None:
            # covar_samp needs >= 2 observations; with a single input row it
            # returns NULL, which would otherwise surface as an opaque
            # numpy TypeError below.
            raise ValueError(
                "covariance_and_mean needs at least 2 rows in "
                f"'{vec_col}' (covar_samp returned NULL for cell "
                f"({r['ai']}, {r['bi']}))"
            )
        cov[r["ai"], r["bi"]] = cov[r["bi"], r["ai"]] = r["c"]
        if r["ai"] == r["bi"]:
            mean[r["ai"]] = r["m"]
    return cov, mean


def pca_fit(df: DataFrame, vec_col: str, k: int) -> tuple[list[list[float]], list[float]]:
    """Top-k principal components (sign-normalised, rows of a k x d list)
    and the d-dim mean, ready for :func:`pca_project`."""
    cov, mean = covariance_and_mean(df, vec_col)
    d = cov.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range [1, {d}]")
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    comps = eigvecs[:, ::-1][:, :k].T  # k x d, descending eigenvalue
    for row in comps:
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1.0
    return comps.round(12).tolist(), mean.round(12).tolist()


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def pca_project(
    df: DataFrame,
    vec_col: str,
    components: list[list[float]],
    mean: list[float],
    prefix: str = "pc",
) -> DataFrame:
    """Append ``pc1..pck`` = dot(vec - mean, component) — narrow JVM map."""
    centred = F.zip_with(
        to_double(F.col(vec_col)), _lit_vec(mean), lambda x, m: x - m
    )
    out = df
    for j, comp in enumerate(components, start=1):
        proj = F.aggregate(
            F.zip_with(centred, _lit_vec(comp), lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"{prefix}{j}", proj)
    return out
