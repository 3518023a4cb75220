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

    ONE scan, Arrow-batched (r13, guide §4.2): each pandas batch reduces to
    centred partial moments — (n, mean, Σ(x-mean)(x-mean)ᵀ) — as two numpy
    matrix ops; one row of d + d² doubles leaves each BATCH, and the driver
    merges the partials with the pairwise-update formula (Chan et al.), the
    same numerically-stable co-moment algebra covar_samp runs internally.
    The previous form generated d²/2 struct pairs per row with a nested
    interpreted transform and shuffled them into a (d², ) covar_samp
    aggregate — |rows|·d²/2 exploded structs (4.2M at sf0.1, measured
    ~2.5s of the 3.2s q_embedding_pca total; the Arrow pass is ~0.2s).
    Shuffle-free: the partials come back through collect of
    (#batches × (d²+d)) doubles — still model-sized.

    Exactness: pinned to 1e-6 of a full-numpy two-pass reference in
    tests/test_operators.py::test_pca_matches_numpy_reference (the merge
    tree differs from covar_samp's only in partial boundaries, both are
    exact co-moment algebra up to float reassociation)."""
    import pandas as pd

    def _partials(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__v"].values).astype(np.float64)
            nb = len(X)
            mb = X.mean(axis=0)
            Xc = X - mb
            Mb = Xc.T @ Xc
            yield pd.DataFrame(
                {
                    "n": [nb],
                    "mean": [mb.tolist()],
                    "scatter": [Mb.reshape(-1).tolist()],
                }
            )

    rows = (
        # NULL vectors: the pre-r13 exploded-HOF form silently dropped them
        # (transform over NULL -> NULL, explode drops it); np.stack over a
        # batch containing None would instead raise an opaque worker error,
        # so filter explicitly to preserve the old semantics (ADVICE r13 #3)
        df.select(to_double(F.col(vec_col)).alias("__v"))
        .where(F.col("__v").isNotNull())
        .mapInPandas(
            _partials, "n long, mean array<double>, scatter array<double>"
        )
        .collect()
    )
    if not rows:
        raise ValueError(
            f"covariance_and_mean needs at least 2 rows in '{vec_col}'"
        )
    d = len(rows[0]["mean"])
    n_tot = 0
    mean = np.zeros(d)
    M = np.zeros((d, d))
    for r in rows:
        nb = r["n"]
        mb = np.asarray(r["mean"])
        Mb = np.asarray(r["scatter"]).reshape(d, d)
        if n_tot == 0:
            n_tot, mean, M = nb, mb, Mb
            continue
        delta = mb - mean
        n_new = n_tot + nb
        M = M + Mb + np.outer(delta, delta) * (n_tot * nb / n_new)
        mean = mean + delta * (nb / n_new)
        n_tot = n_new
    if n_tot < 2:
        raise ValueError(
            f"covariance_and_mean needs at least 2 rows in '{vec_col}' "
            f"(got {n_tot})"
        )
    return M / (n_tot - 1), mean


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
