"""Multi-dimensional data layout: Z-order (Morton) clustering.

Range clustering (featurestore/writer.py ``cluster_columns``) solves
single-key skipping: files carry tight min/max on one column.  Queries that
filter on EITHER of two columns need interleaved ordering — Z-order — so that
both columns' min/max stay tight per file (the Delta OPTIMIZE ZORDER BY idea,
built here from first principles on open Spark primitives).

The z-value interleaves the bits of the rank of each column (rank, not raw
value, so skew and arbitrary types cannot break the interleave): columns are
mapped to dense ``ntile`` buckets (JVM-side window, no Python), bucket ids
bit-interleave into one long, and ``repartitionByRange`` over that long plus
an in-file sort gives every parquet file a compact Z-curve segment.

At 100 TB: the ntile windows are one shuffle each over (column) — at real
scale replace with ``approxQuantile``-derived bucket bounds broadcast into a
``when`` chain (no global window); the interleave/repartition/sort pipeline is
unchanged.  16 bits per dimension (65536 buckets) bounds the rank shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two non-negative ints: result bit 2i = a_i, 2i+1 = b_i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_value(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Append ``__zvalue``: the Morton code of the two columns' ntile ranks."""
    n = 1 << bits
    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    ranked = df.withColumn("__za", (F.ntile(n).over(wa) - 1).cast("long")).withColumn(
        "__zb", (F.ntile(n).over(wb) - 1).cast("long")
    )
    return ranked.withColumn(
        "__zvalue", _interleave_bits(F.col("__za"), F.col("__zb"), bits)
    ).drop("__za", "__zb")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet Z-ordered on (col_a, col_b): each output file
    covers a compact segment of the Z-curve, so min/max footer stats on BOTH
    columns are tight and a filter on either column skips most files."""
    z = zorder_value(df, col_a, col_b, bits)
    (
        z.repartitionByRange(num_files, F.col("__zvalue"))
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
