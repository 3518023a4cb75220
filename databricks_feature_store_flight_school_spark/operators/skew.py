"""Skew- and layout-aware join helpers — the explicit 100 TB machinery
(SURVEY.md §7 step 5) that complements AQE's runtime skew splitting.

- :func:`salted_join` — pre-planned salting for joins whose key histogram is
  known-skewed (a handful of hot keys holding a large share of rows).  AQE's
  skew-join splitting only handles sort-merge joins after the shuffle has
  already materialized the skewed partition; salting removes the hot
  partition *before* the shuffle, and works for any join the optimizer picks.
- :func:`write_bucketed` / :func:`bucketed_table` — persist both sides of a
  recurring equi-join bucketed by the join key with the same bucket count:
  Spark's bucketed scan then co-locates matching keys, and the join plan has
  NO Exchange at all (asserted in tests/test_skew_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``salt`` shuffle
    partitions.

    Left rows get a per-row salt in [0, salt); the (small-to-medium) right
    side is replicated ``salt``x so every (key, salt) bucket finds its match.
    Each formerly-hot shuffle partition becomes ``salt`` even ones at the
    cost of a ``salt``x right-side shuffle volume — the right side should be
    the dimension table.  Result is column- and row-identical to
    ``left.join(right, on, how)`` for the supported hows.

    The salt comes from a uniform hash of the whole left row rather than
    rand(): deterministic replay (a retried task re-salts identically, so no
    duplicate/lost rows on speculative execution), no RNG state.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    l = left.withColumn(
        SALT, F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(salt))
    )
    r = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    return l.join(r, on=keys + [SALT], how=how).drop(SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Both sides of a recurring join written with the SAME bucket columns and
    count join with zero Exchanges — at 100 TB that turns every retrieval
    join from a full shuffle into a local zip of pre-hashed files.  Sorting
    within buckets additionally removes the Sort under sort-merge joins.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.read.table(table)
