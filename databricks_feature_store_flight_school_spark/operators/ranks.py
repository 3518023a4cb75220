"""Scalable global ranks (SURVEY.md §2.12 window extensions).

``Window.orderBy(...)`` with no partition key funnels the ENTIRE input
through one task — fine for a 30-row daily rollup, fatal for an
entity-cardinality table (billions of customers at 100 TB).  This module is
the two-pass range-partitioned replacement:

1. ``repartitionByRange(order_by)`` assigns every row a partition id that
   respects the global order (equal keys land together — RangePartitioner
   binary-searches on the key, so ties never straddle a boundary);
2. per-partition ``row_number`` runs in parallel (one window group per
   range partition);
3. partition row-counts fold into exclusive prefix-sum OFFSETS — a bounded
   table (``num_partitions`` rows, the one place a global window is safe) —
   broadcast back and added to the local rank.

Everything stays in-plan (no driver collect; the offsets come back as a
broadcast join).  The pid-tagged frame is pinned with a LAZY
``localCheckpoint`` — a correctness requirement, not an optimisation: the
offsets branch and the rank branch both read the range-partitioned data, and
without a single shared materialisation they instantiate the range exchange
TWICE; ``repartitionByRange`` samples its boundaries with an RDD-id-derived
seed (and ``spark_partition_id`` blocks ReuseExchange canonicalisation), so
the two instantiations can disagree on partition boundaries and the offsets
would be added to the wrong partitions' local ranks (observed: duplicate and
out-of-range global ranks).  The checkpoint materialises the pid assignment
once (on first action, MEMORY_AND_DISK) and both branches consume that same
RDD.  Global rank is inherently a pipeline breaker — this is the same
materialisation every engine's sort-based rank pays; callers should
``select`` down to needed columns first since lineage (and column pruning)
stops at the checkpoint.

Callers must pass a TOTAL order (include a unique tie-break column) or row
numbers are engine-dependent — same contract as ``row_number`` itself.
Order entries may be column names or sort Columns (``F.col(c).desc()``):
``repartitionByRange`` and ``Window.orderBy`` both honour sort direction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"
_TOTAL = "__rank_total"


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    rank_col: str = "i",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_by)`` without the single-task
    global window: returns ``df`` plus a 1-based ``rank_col`` (long)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # lazy checkpoint pins ONE range partitioning for both consumers below —
    # see module docstring; without it the two branches may re-sample
    # different range boundaries and produce corrupt global ranks
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    # exclusive prefix sum over <= num_partitions rows: the bounded global
    # window (whitelisted in tools/explain_audit.py)
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFFSET)
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    return (
        ranged.withColumn(_LOCAL, F.row_number().over(w_local))
        .join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_prefix_sum(
    df: DataFrame,
    order_by: Sequence[str | Column],
    value_col: str | Sequence[str],
    sum_col: str | Sequence[str] = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(value) OVER (ORDER BY order_by ROWS UNBOUNDED PRECEDING)``
    without the single-task global window: per-partition running sums plus a
    bounded broadcast of preceding-partition VALUE totals.  Accepts several
    value columns at once (e.g. per-group indicator counts for a KS test) —
    they share ONE range exchange and one offsets broadcast.  Same
    total-order and checkpoint contract as :func:`global_row_number`."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    sum_cols = [sum_col] if isinstance(sum_col, str) else list(sum_col)
    if len(value_cols) != len(sum_cols):
        raise ValueError("value_col and sum_col lists must align")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = ranged.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__t{i}") for i, v in enumerate(value_cols)]
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__t{i}").over(w_off), F.lit(0)).alias(f"{_OFFSET}{i}")
            for i in range(len(value_cols))
        ],
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged
    for i, v in enumerate(value_cols):
        out = out.withColumn(f"{_LOCAL}{i}", F.sum(v).over(w_local))
    out = out.join(F.broadcast(offsets), _PID)
    for i, s in enumerate(sum_cols):
        out = out.withColumn(s, F.col(f"{_OFFSET}{i}") + F.col(f"{_LOCAL}{i}"))
    drop = [_PID] + [f"{_LOCAL}{i}" for i in range(len(value_cols))] + [
        f"{_OFFSET}{i}" for i in range(len(value_cols))
    ]
    return out.drop(*drop)


def global_ntile(
    df: DataFrame,
    order_by: Sequence[str | Column],
    n: int,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_by)`` on the range-partitioned rank —
    exact SQL NTILE semantics (the first ``N % n`` buckets take one extra
    row), so results hash-match an oracle's ntile.  Total row count folds in
    as a 1-row broadcast, never a driver scalar."""
    ranked = global_row_number(df, order_by, rank_col="__i", num_partitions=num_partitions)
    # count the CHECKPOINTED ranked frame, not df — no second source scan
    total = ranked.agg(F.count(F.lit(1)).alias(_TOTAL))
    i, N = F.col("__i"), F.col(_TOTAL)
    small = F.floor(N / n)           # rows in a small bucket
    rem = N % n                      # number of big buckets (small+1 rows)
    big_span = rem * (small + 1)     # rows covered by big buckets
    bucket = F.when(small == 0, i).when(
        i <= big_span, F.floor((i - 1) / (small + 1)) + 1
    ).otherwise(rem + F.floor((i - big_span - 1) / small) + 1)
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("__i", _TOTAL)
    )


def global_percent_rank(
    df: DataFrame,
    order_by: Sequence[str | Column],
    rank_col: str = "pct_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``percent_rank()``-shaped (i-1)/(N-1) over the range-partitioned
    row_number.  NOTE: this is percent-of-position over a TOTAL order (the
    caller's tie-break decides equal keys), which equals SQL percent_rank
    exactly when the order is unique."""
    ranked = global_row_number(df, order_by, rank_col="__i", num_partitions=num_partitions)
    total = ranked.agg(F.count(F.lit(1)).alias(_TOTAL))
    pr = F.when(F.col(_TOTAL) > 1, (F.col("__i") - 1) / (F.col(_TOTAL) - 1)).otherwise(
        F.lit(0.0)
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(rank_col, pr)
        .drop("__i", _TOTAL)
    )


def group_quantile_cont(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value: str | Column,
    ps: dict[str, float],
) -> DataFrame:
    """EXACT interpolated percentiles per group (``percentile_cont`` /
    Spark ``percentile`` semantics: index p*(n-1), linear interpolation),
    computed SORT-BASED instead of map-based — one row per group with one
    column per ``ps`` entry (alias -> p), plus ``__qn`` (the group's
    non-null count, droppable).

    Why not the builtin: Spark's exact ``percentile`` aggregate buffers a
    value->count map per group, and the final merge holds EVERY distinct
    value of a group in one in-memory buffer — over a high-distinct column
    (prices: millions of distincts at sf10) that map measured KILLING the
    local[32] JVM (round-10 full sf10 sweep, q_percentiles).

    This form is the LEVEL-TABLE recipe (same family as
    q_percentile_scalable's percentile_disc): one grouped pass reduces the
    facts to (group, value, count) levels — sized by the value DOMAIN, not
    the row count — then a cumulative-count window per group and
    fixed-width conditional sums pick the interpolation: the level
    containing position floor(p*(n-1))+1 contributes weight (1-frac), the
    level containing the next position contributes frac (one level can be
    both).  Same answers as the builtin, bounded memory at any group
    cardinality, and the window input is |levels|, never |rows|.  The
    per-group window still funnels each group's LEVELS through one task —
    groups here are low-cardinality by contract (flags, segments); the
    KLL sketch (q_percentile_approx) is the unbounded everything path.

    NULL values are excluded from the computation but NOT from the group
    list (exact ``percentile``-under-GROUP-BY semantics, pinned against the
    builtin in tests/test_operators.py): a group whose values are ALL null
    still appears, with NULL percentiles and ``__qn`` 0.  Nulls ride the
    same grouped pass as one extra level per affected group (they sort
    first with a zeroed effective count, so they can never win a position
    match) — no second input scan.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    lv = group_value_levels(df, groups, value)
    return group_quantile_cont_levels(lv, groups, ps)


def group_value_levels(
    df: DataFrame, group_cols: str | Sequence[str], value: str | Column
) -> DataFrame:
    """The (group, ``__v``, ``__ln``) level table :func:`group_quantile_cont`
    reduces its input to — exposed (r14) so a caller computing SEVERAL
    quantile passes over transforms of the SAME column (q_mad_robust's
    median-then-MAD) can derive the second pass's levels from the first's
    (|levels| rows) instead of rescanning and re-shuffling the fact table:
    ``abs(v - med)`` maps levels to levels with counts re-merged by sum."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value) if isinstance(value, str) else value
    return (
        df.select(*groups, v.alias("__v"))
        .groupBy(*groups, "__v")
        .agg(F.count(F.lit(1)).alias("__ln"))
    )


def group_quantile_cont_levels(
    lv: DataFrame, group_cols: str | Sequence[str], ps: dict[str, float]
) -> DataFrame:
    """:func:`group_quantile_cont` over a pre-reduced level table
    (columns: groups, ``__v`` value level, ``__ln`` level count) — the
    exact same cumulative-window interpolation, starting from levels."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # null levels participate with effective count 0: they keep their group
    # alive but hold no positions, so no interpolation index can land on them
    nn = F.when(F.col("__v").isNotNull(), F.col("__ln")).otherwise(F.lit(0))
    wc = (
        Window.partitionBy(*groups)
        .orderBy(F.col("__v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*groups)
    x = lv.select(
        *groups, "__v",
        nn.alias("__ln"),
        F.sum(nn).over(wc).alias("__c"),
        F.sum(nn).over(wt).alias("__n"),
    )
    aggs = []
    for alias, p in ps.items():
        idx = F.lit(float(p)) * (F.col("__n") - F.lit(1))
        lo = (F.floor(idx) + 1).cast("long")
        frac = idx - F.floor(idx)
        lo_start = F.col("__c") - F.col("__ln")  # positions (lo_start, __c]
        in_lo = (lo > lo_start) & (lo <= F.col("__c"))
        in_hi = (lo + 1 > lo_start) & (lo + 1 <= F.col("__c")) & (frac > 0)
        contrib = (
            F.when(in_lo, (F.lit(1.0) - frac) * F.col("__v")).otherwise(F.lit(0.0))
            + F.when(in_hi, frac * F.col("__v")).otherwise(F.lit(0.0))
        )
        aggs.append(F.sum(contrib).alias(alias))
    out = x.groupBy(*groups).agg(
        *aggs, F.max("__n").alias("__qn")
    )
    # an all-null group summed only zero contributions — surface NULL, as
    # the builtin does, not 0.0
    return out.select(
        *groups,
        *[
            F.when(F.col("__qn") > 0, F.col(a)).otherwise(F.lit(None)).alias(a)
            for a in ps
        ],
        "__qn",
    )
