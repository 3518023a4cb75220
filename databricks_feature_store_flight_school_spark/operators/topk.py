"""Top-k helpers (SURVEY.md §2.6/§2.12).

``top_k`` lowers to TakeOrderedAndProject (per-partition heaps, driver
merge — no global sort); ``top_k_per_group`` is the row_number window idiom.
Both require a total order: callers must include a unique tie-break column,
or the selected set is engine-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
