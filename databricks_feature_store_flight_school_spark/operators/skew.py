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


def key_skew_profile(df: DataFrame, on: str | list[str]) -> dict:
    """Join-key histogram diagnostic (the q_key_skew_profile shape as a
    reusable primitive): one grouped count + a 1-row reduction, returning
    ``{"n_keys", "n_rows", "max_rows", "avg_rows", "skew_ratio"}``.

    This is an explicit, bounded measurement job — |distinct keys| shuffle,
    1 row to the driver.  Run it once per recurring pipeline (or off a
    sample) and feed the dict to :func:`auto_salted_join` on every
    subsequent run; profiling cost amortizes exactly like statistics
    collection in a warehouse."""
    keys = [on] if isinstance(on, str) else list(on)
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("__n").alias("n_rows"),
            F.max("__n").alias("max_rows"),
        )
        .first()
    )
    n_keys = row["n_keys"] or 0
    n_rows = row["n_rows"] or 0
    max_rows = row["max_rows"] or 0
    avg = (n_rows / n_keys) if n_keys else 0.0
    return {
        "n_keys": n_keys,
        "n_rows": n_rows,
        "max_rows": max_rows,
        "avg_rows": avg,
        "skew_ratio": (max_rows / avg) if avg else 0.0,
    }


def auto_salt_factor(
    profile: dict, num_partitions: int, max_salt: int = 64
) -> int:
    """Salt factor from a measured key histogram: split the hottest key into
    enough sub-partitions that its share sinks to one even shuffle
    partition's worth of rows — ``ceil(max_rows / (n_rows /
    num_partitions))``, clamped to [1, max_salt].  1 means "don't salt"
    (the hot key already fits an even partition)."""
    n_rows = profile.get("n_rows") or 0
    max_rows = profile.get("max_rows") or 0
    if n_rows <= 0 or max_rows <= 0:
        return 1
    even_share = n_rows / max(1, num_partitions)
    return max(1, min(int(max_salt), -(-max_rows // max(1, int(even_share)))))


def auto_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    profile: dict | None = None,
    max_salt: int = 64,
) -> DataFrame:
    """:func:`salted_join` with the salt factor DERIVED from the left side's
    measured key histogram instead of a caller-supplied constant.

    ``profile`` is a :func:`key_skew_profile` dict; pass a cached one to
    make this a pure plan transform (no job at build).  Without it, one
    bounded diagnostic job runs here — measured is better than guessed: a
    constant salt on a uniform key wastes a ``salt``× right-side shuffle,
    and no constant survives a 100× data drift.  When the histogram says
    the hottest key already fits one even shuffle partition (factor 1), the
    plain join is returned untouched and AQE keeps runtime control."""
    keys = [on] if isinstance(on, str) else list(on)
    if profile is None:
        profile = key_skew_profile(left, keys)
    parts = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    factor = auto_salt_factor(profile, parts, max_salt)
    if factor <= 1:
        return left.join(right, on=keys, how=how)
    return salted_join(left, right, keys, how=how, salt=factor)


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
