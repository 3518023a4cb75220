"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``databricks_feature_store_flight_school_spark.plans.catalog``): every
implemented operator from SURVEY.md §2 registers a (Spark fn, oracle SQL)
pair there; this module just exposes the catalog in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from databricks_feature_store_flight_school_spark.plans import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from databricks_feature_store_flight_school_spark.plans.queries_relational import (
        q_flagship_regional_revenue,
    )

    return q_flagship_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return _catalog.oracle_map()
