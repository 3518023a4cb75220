"""Horizontal (across-columns, per-row) reductions.

The reference's one UDF is a vectorized count-if over six service columns
(Feature_Store_Telco_Churn_Flight_School.py:413-416).  The engine offers both
forms SURVEY.md §2.4 A2 calls for:

- :func:`count_if_columns` — pure Column expression (JVM, whole-stage
  codegen; the 100 TB hot path),
- :func:`count_if_pandas_udf` — Arrow-batched pandas UDF (API parity with the
  reference; exercises the JVM<->Python worker boundary).
"""

from __future__ import annotations

from functools import reduce
from operator import add

import pandas as pd  # noqa: F401  (needed at module scope so pandas-UDF type hints resolve)
from pyspark.sql import Column, functions as F


def count_if_columns(*conds: Column) -> Column:
    """Per-row count of true conditions, as a single JVM-side expression."""
    if not conds:
        return F.lit(0)
    return reduce(add, [F.when(c, 1).otherwise(0) for c in conds])


def count_if_equals(columns: list[str], value) -> Column:
    """Count how many of ``columns`` equal ``value`` in each row — the exact
    shape of the reference's num_optional_services (six cols == 'Yes')."""
    return count_if_columns(*[F.col(c) == value for c in columns])


def count_if_pandas_udf():
    """pandas-UDF twin of the lineitem flag count used by the query catalog:
    (returnflag=='R') + (linestatus=='F') + (discount>0.05) + (tax>0.04).

    Mirrors the reference's ``@F.pandas_udf('int')`` num_optional_services
    (FS:413-416): pd.Series in, pd.Series out, summed elementwise.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count_if(
        rf: pd.Series, ls: pd.Series, disc: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return (
            (rf == "R").astype("int32")
            + (ls == "F").astype("int32")
            + (disc > 0.05).astype("int32")
            + (tax > 0.04).astype("int32")
        )

    return _count_if
