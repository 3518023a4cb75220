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
import pandas as pd  # noqa: F401  (pandas-UDF type hints resolve via module globals)
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot, norm, to_double


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """id + double vector + HOISTED norm.  cosine() per candidate pair would
    run three interpreted higher-order aggregates (dot + two norms);
    computing |v| once per vector leaves one dot per pair.  Bit-identical:
    dot/(|a|*|b|) with the same op order (IEEE multiply commutes)."""
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        to_double(F.col(vec_col)).alias(f"{prefix}_vec"),
    ).withColumn(f"{prefix}_norm", norm(F.col(f"{prefix}_vec")))


def _pair_cosine():
    """cosine from hoisted norms: query/neighbor columns from _prep."""
    denom = F.col("query_norm") * F.col("neighbor_norm")
    return F.when(denom > 0, dot(F.col("query_vec"), F.col("neighbor_vec")) / denom)


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
        .withColumn("cosine_sim", _pair_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def arrow_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """cosine_topk with the similarity computed by an Arrow-batched numpy
    pandas UDF instead of higher-order Column functions.

    Same output shape and (up to float summation order) the same values as
    cosine_topk.  HOF lambdas evaluate interpreted, one element at a time;
    numpy does the whole Arrow batch as two matrix ops — measured ~1.8x
    faster at sf0.1 and widening with pair count.  cosine_topk remains the
    oracle-exact baseline (strict left-to-right IEEE sums match DuckDB
    bit-for-bit; numpy's pairwise summation may differ in the last ulp).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.values)
        B = np.stack(b.values)
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    c = _prep(corpus, id_col, vec_col, "neighbor")
    q = _prep(queries, id_col, vec_col, "query")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _cos(F.col("query_vec"), F.col("neighbor_vec")))
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


def _signature_udf(plane_sets: list[list[list[float]]]):
    """pandas UDF computing ALL tables' sign-LSH bucket ids in one numpy
    matmul per Arrow batch: bit i of table t = sign(v · plane_sets[t][i]),
    bucket = Σ bit_i << i — bit-for-bit the ids ``hyperplane_bucket``
    (functions/vectors.py) builds from interpreted Column HOFs, at matrix
    speed.  Stacking the per-table planes into one (L·P, dim) matrix turns
    L·P interpreted dot-aggregates per row into a single (batch × dim) @
    (dim × L·P) product — measured 14.6s → sub-second on q_lsh_topk's
    12×6 config at sf0.1, same ~20x the banded near-dup path measured at
    sf0.01.  The plane matrix ships inside the serialized UDF (tens of KiB),
    not via broadcast."""
    n_tables = len(plane_sets)
    n_planes = len(plane_sets[0])
    planes = np.asarray(plane_sets, dtype=np.float64).reshape(
        n_tables * n_planes, -1
    )
    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def _signatures(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.values)
        bits = (V @ planes.T) >= 0
        buckets = (bits.reshape(len(V), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series([row.tolist() for row in buckets])

    return _signatures


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 16,
    n_iters: int = 8,
    sample_rows: int = 4096,
    seed: int = 42,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: spherical k-means on a bounded,
    deterministic sample (FAISS-style — quantizers train on a sample, never
    the full corpus; the driver holds only ``sample_rows × dim`` floats).
    Returns unit-norm centroids as plain lists, ready to fold into the plan
    as literals."""
    pdf = (
        corpus.select(to_double(F.col(vec_col)).alias("v"))
        .limit(sample_rows)
        .toPandas()
    )
    x = np.array(pdf["v"].tolist(), dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine == dot on unit vectors
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                cent[j] = m / max(np.linalg.norm(m), 1e-12)
    return cent.round(6).tolist()


def _centroid_dots(vec, centroids: list[list[float]]):
    """array<double> of dot(vec, centroid_i) — pure Column expressions, the
    centroids are plan literals (no join, no Python worker).  Fine for a
    SMALL side (the query probes); for corpus-sized assignment use
    :func:`_argmax_bucket_udf` / :func:`_top_buckets_udf` — k interpreted
    dim-length dot-aggregates per row is the same interpreted-HOF tax the
    LSH signatures paid (see _signature_udf)."""
    return F.array(
        *[dot(vec, F.array(*[F.lit(float(v)) for v in c])) for c in centroids]
    )


def _argmax_bucket_udf(centroids: list[list[float]], base: int = 1):
    """pandas UDF: 1-based (or ``base``-based) nearest-centroid bucket by
    dot product, one numpy matmul per Arrow batch — same first-max
    tie-break as ``array_position(dots, array_max(dots))`` (np.argmax
    returns the first maximum)."""
    C = np.asarray(centroids, dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _nearest(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.values)
        return pd.Series((np.argmax(V @ C.T, axis=1) + base).astype(np.int32))

    return _nearest


def _top_buckets_udf(centroids: list[list[float]], n_top: int, base: int = 0):
    """pandas UDF: the ``n_top`` nearest centroid indices (``base``-based,
    descending dot, ties toward the LOWER index — stable argsort matches
    the row_number(ORDER BY cdot DESC, bucket ASC) form it replaces)."""
    C = np.asarray(centroids, dtype=np.float64)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def _top(vec: pd.Series) -> pd.Series:
        V = np.stack(vec.values)
        D = V @ C.T
        idx = np.argsort(-D, axis=1, kind="stable")[:, :n_top] + base
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return _top


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed under their
    nearest coarse centroid; each query probes its ``nprobe`` nearest lists
    and ranks exact cosine inside them.  Same output shape as cosine_topk.

    Scale path: assignment is a narrow map (centroids are literals), so the
    only shuffle is the final per-query rank window; corpus cells can be
    written once (partitionBy bucket) and reused across query batches —
    each probe then scans |corpus| * nprobe / n_centroids instead of all."""
    centroids = train_ivf_centroids(
        corpus, vec_col, n_centroids=n_centroids, seed=seed
    )
    # corpus assignment: ONE Arrow matmul per batch (same first-max
    # tie-break as the Column array_position form it replaces — r13)
    c = _prep(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", _argmax_bucket_udf(centroids)(F.col("neighbor_vec"))
    )
    # query side: top-nprobe buckets via posexplode + rank (query set is small)
    q = (
        _prep(queries, id_col, vec_col, "query")
        .select(
            "query_id",
            "query_vec",
            "query_norm",
            F.posexplode(_centroid_dots(F.col("query_vec"), centroids)).alias(
                "pos", "cdot"
            ),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), "pos")
            ),
        )
        .where(F.col("probe_rank") <= nprobe)
        .select(
            "query_id", "query_vec", "query_norm",
            (F.col("pos") + 1).cast("int").alias("bucket"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _pair_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 24,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dup PAIRS above a cosine threshold via banded hyperplane LSH —
    the 100 TB twin of the all-pairs form (q_embedding_neardup_pairs):
    candidates come only from same-bucket collisions, then exact cosine
    verifies each candidate, so output pairs are never false positives and
    recall tunes with (n_planes, n_tables).

    Banding math: a pair at angle θ collides in one table with
    p = (1 - θ/π)^n_planes and in ANY of L tables with 1-(1-p)^L.  At the
    default threshold 0.35 (θ≈69.5°, p≈0.614): 4 planes × 24 tables gives
    ≈0.97 expected recall; higher-similarity pairs approach 1.0.

    Scale design (vs the O(n²) baseline):
    - verification happens INSIDE each (table, bucket) group as one blocked
      numpy matmul (``applyInPandas``): vectors travel to their buckets once
      per table — L·n rows, LINEAR in the corpus — and only threshold-
      PASSING pairs leave the worker.  The previous design shuffled only
      (id, table, bucket) tags and re-attached vectors per candidate pair,
      which is quadratic data movement (2 vectors × FP·n² candidates): at
      a low threshold sign-LSH admits most random pairs (θ≈70° → ~79% of
      all pairs collide in ≥1 of 24 tables), and the sf1 sweep measured
      that as ~160 GB of Arrow transfer, 12x slower than the in-bucket
      matmul.  L·n beats FP·n² whenever n > L/FP — i.e. always at scale;
    - Σ bucket² compute replaces the full n² cross product, and the final
      dedup shuffles only matches (per-pair max over tables), never the
      candidate multiset;
    - plane literals ship inside the signature UDF (no broadcast);
    - ``max_bucket_size`` guards the quadratic term (the same skew guard as
      the Jaccard shingle join): a degenerate bucket — e.g. a near-constant
      embedding direction collapsing a whole corpus slice onto one sign
      pattern — would cost bucket² on its own.  Overfull buckets are dropped
      from candidate generation (their pairs can still surface via the other
      L-1 tables, so recall degrades gracefully instead of the job dying);
      pass None to disable.  It also bounds the matmul block memory
      (block_rows × bucket floats).
    Output: (id_a, id_b, cosine_sim) with id_a < id_b, verified exact.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = first["d"]
    v = _prep(df, id_col, vec_col, "x")
    # All L tables' signatures in ONE Arrow-batched matmul: stacking the
    # per-table planes into a (L*n_planes, dim) matrix turns 96 interpreted
    # higher-order dot-aggregates per row into a single numpy (batch x dim) @
    # (dim x L*P) product — same bucket ids (bit i = sign(v . plane_i), same
    # seed-derived planes as the Column form), measured ~20x faster at
    # sf0.01.  The plane matrix ships inside the serialized UDF (24 KiB at
    # dim 64), not via broadcast.
    _signatures = _signature_udf(
        [random_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    )

    tagged = v.select(
        "x_id", "x_vec", "x_norm",
        F.posexplode(_signatures(F.col("x_vec"))).alias("table", "bucket"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("table", "bucket")
        tagged = tagged.withColumn("__bn", F.count(F.lit(1)).over(w)).where(
            F.col("__bn") <= max_bucket_size
        ).drop("__bn")

    return verify_pairs_in_buckets(tagged, ["table", "bucket"], threshold)


def verify_pairs_in_buckets(
    tagged: DataFrame, group_cols: list[str], threshold: float,
    block: int = 512, max_bucket_size: int | None = 20_000,
) -> DataFrame:
    """Exact-cosine pair verification INSIDE candidate buckets — the shared
    tail of every bucketed near-dup scheme (banded LSH tables, k-means
    cluster buckets): ``tagged`` carries (x_id, x_vec, x_norm) plus the
    bucket key columns, each group runs one blocked numpy matmul, and only
    threshold-passing pairs leave the worker.  Vectors travel to buckets
    once per assignment (LINEAR in corpus × assignments) instead of twice
    per candidate pair (quadratic — the sf1 sweep measured the per-pair
    re-attach at ~160 GB of Arrow transfer for the LSH form); the final
    cross-bucket dedup shuffles matches only.

    Memory contract (per task): ``applyInPandas`` materialises the WHOLE
    bucket — bucket_size × dim float64 for the stacked vectors, plus
    block × bucket_size for each sims slab — so a skewed bucketing (one
    k-means cluster holding a large corpus fraction, a degenerate LSH sign
    pattern) concentrates an O(bucket²) matmul and an O(bucket × dim) load
    on ONE executor core.  ``max_bucket_size`` fails fast inside the worker
    with the offending bucket key instead of letting that task OOM; callers
    whose scheme can shed buckets gracefully (LSH's other L-1 tables) should
    ALSO pre-filter overfull buckets before tagging.  ``None`` disables the
    guard — only safe when the bucketing is known-bounded upstream.

    Zero-norm vectors never match (SQL-style: cosine with an undefined
    denominator is NULL, not 0 — masked to -inf below so no threshold,
    including <= 0.0, can admit them)."""
    th = float(threshold)
    id_type = tagged.schema["x_id"].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"

    def _verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if max_bucket_size is not None and len(pdf) > max_bucket_size:
            key = {c: pdf[c].iloc[0] for c in group_cols}
            raise ValueError(
                f"candidate bucket {key} holds {len(pdf)} vectors "
                f"(> max_bucket_size={max_bucket_size}); a single task would "
                f"materialise the whole bucket — re-bucket finer (more "
                f"clusters / narrower bands) or raise max_bucket_size "
                f"deliberately"
            )
        ids = pdf["x_id"].to_numpy()
        V = np.stack(pdf["x_vec"].values)
        norms = pdf["x_norm"].to_numpy().astype(np.float64)
        outs_a, outs_b, outs_s = [], [], []
        for s0 in range(0, len(ids), block):
            d = V[s0:s0 + block] @ V.T
            denom = np.outer(norms[s0:s0 + block], norms)
            sims = np.divide(
                d, denom, out=np.full_like(d, -np.inf), where=denom > 0
            )
            ia, ib = np.nonzero(sims >= th)
            ga = ia + s0
            keep = ids[ga] < ids[ib]  # orientation + drops self-pairs
            outs_a.append(ids[ga][keep])
            outs_b.append(ids[ib][keep])
            outs_s.append(sims[ia[keep], ib[keep]])
        if not outs_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outs_a),
                "id_b": np.concatenate(outs_b),
                "cosine_sim": np.concatenate(outs_s),
            }
        )

    bucket_pairs = tagged.groupBy(*group_cols).applyInPandas(
        _verify_bucket, out_schema
    )
    # per-pair dedup across buckets: shuffles MATCHES only (the sim is the
    # same float either way; max is just the deterministic pick)
    return bucket_pairs.groupBy("id_a", "id_b").agg(
        F.max("cosine_sim").alias("cosine_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket(s).  Same output shape as cosine_topk (rank within candidates).

    ``n_tables`` is the standard recall dial for sign-LSH: one table's
    bucket only holds neighbors sharing ALL ``n_planes`` signs (a pair at
    angle θ collides with prob (1-θ/π)^n_planes — a few % for realistic
    neighbors), so the multi-table form draws candidates from the UNION of
    L independent plane sets: collision prob 1-(1-p)^L.  Cost stays linear
    — each corpus vector is tagged L times (posexplode), the per-table
    bucket join is the same broadcast equi-join, and a pair colliding in
    several tables is scored once per collision but collapses to one row in
    a (query, neighbor) max-aggregate that shuffles only id/score triples,
    never vectors."""
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d"))
        dim = first.first()["d"]
    plane_sets = [random_planes(dim, n_planes, seed + t) for t in range(n_tables)]
    # all L tables' bucket ids in ONE Arrow matmul per batch (same ids as the
    # interpreted hyperplane_bucket Column form — see _signature_udf): the
    # corpus tagging was 12 tables x 6 planes x dim-64 interpreted
    # dot-aggregates per row, measured 14.6s at sf0.1 on a 2000-row corpus;
    # the matmul form is sub-second
    sig = _signature_udf(plane_sets)

    def _tag(df: DataFrame, role: str) -> DataFrame:
        return df.select(
            "*", F.posexplode(sig(F.col(f"{role}_vec"))).alias("table", "bucket")
        )

    c = _tag(_prep(corpus, id_col, vec_col, "neighbor"), "neighbor")
    q = _tag(_prep(queries, id_col, vec_col, "query"), "query")
    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _pair_cosine())
        # collapse multi-table collisions: same exact cosine either way, so
        # max is just the deterministic pick; only (qid, nid, sim) triples
        # cross this exchange
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
) -> list[list[float]]:
    """Materialise the IVF index: corpus vectors written as parquet
    PARTITIONED BY their coarse-quantizer cell (``bucket=<i>/`` directories),
    centroids persisted as JSON beside the data.  Returns the centroids.

    This is the write-once half of the ANN serving story: build cost is one
    corpus pass (narrow assignment map + partitioned write); every later
    query batch probes only its ``nprobe`` cell directories — the scan reads
    |corpus| * nprobe / n_centroids bytes, enforced by partition pruning
    (asserted from the plan in tests/test_operators.py)."""
    import json
    import os

    centroids = train_ivf_centroids(
        corpus, vec_col, n_centroids=n_centroids, seed=seed
    )
    # same Arrow argmax assignment as ivf_topk — build and probe MUST agree
    c = _prep(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", _argmax_bucket_udf(centroids)(F.col("neighbor_vec"))
    )
    (
        c.select("neighbor_id", "neighbor_vec", "neighbor_norm", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "cells"))
    )
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump(centroids, fh)
    return centroids


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Query a persisted IVF index (see :func:`ivf_build_index`): rank exact
    cosine inside each query's ``nprobe`` nearest cells.  Pruning is
    DYNAMIC partition pruning (round 10): the probe-assignment side is a
    filtered broadcast, so Catalyst inserts a ``dynamicpruningexpression``
    on the partition column and unprobed cell directories are skipped at
    file listing — same effect as the previous driver-side IN-list collect
    (the r5-acknowledged bounded action), with NO job at plan-build time
    and lazy composition restored.  Plan-asserted in
    tests/test_operators.py; if DPP ever declined to fire the query would
    still be CORRECT (the join filters), just unpruned."""
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as fh:
        centroids = json.load(fh)
    cells = spark.read.parquet(os.path.join(path, "cells"))

    q = (
        _prep(queries, id_col, vec_col, "query")
        .select(
            "query_id",
            "query_vec",
            "query_norm",
            F.posexplode(_centroid_dots(F.col("query_vec"), centroids)).alias(
                "pos", "cdot"
            ),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("cdot").desc(), "pos")
            ),
        )
        .where(F.col("probe_rank") <= nprobe)
        .select(
            "query_id", "query_vec", "query_norm",
            (F.col("pos") + 1).cast("int").alias("bucket"),
        )
    )
    scored = (
        cells.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", _pair_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
