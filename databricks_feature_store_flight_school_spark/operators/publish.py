"""Atomic local table publishing via view indirection (VERDICT r10 #2).

The dedup-store lifecycle (operators/dedup_store.py) must REPLACE whole
tables — the refreshed hot-bucket table on every append, the compacted
index / band-key / counts tables in ``compact_dedup_index``.  A plain
``DROP TABLE old; ALTER TABLE new RENAME TO old`` swap leaves a window
between the two catalog calls where a concurrent reader resolves nothing
and errors.  At deployment the swap rides an atomic metastore operation
(the feature-store CAS registry publish in featurestore/client.py, or
Delta's transactional OPTIMIZE); THIS module is the local analog:

- the logical name becomes a VIEW over a generation-numbered physical
  table (``name__g1``, ``name__g2``, ...);
- publishing generation N+1 is ONE catalog call — ``CREATE OR REPLACE
  VIEW name AS SELECT * FROM name__g{N+1}`` — so a reader resolving the
  name sees generation N or N+1, never a missing table;
- the PREVIOUS generation is retained until the next publish (an
  in-flight reader that already resolved the view to generation N keeps
  scanning files that still exist); generations older than that drop.

Views are erased at analysis time (a ``SELECT *`` view is a bare
SubqueryAlias), so reading through the indirection costs nothing and a
bucketed physical table's output partitioning propagates exactly as a
direct scan's would — the Exchange-free plan assertions in
tests/test_dedup_index.py hold through a published name.  Writers that
need the PHYSICAL table (bucketed appends, DESCRIBE for the bucket spec,
TBLPROPERTIES) resolve it with :func:`resolve_table`.

Migration is in-place: the first :func:`publish_table` against a plain
TABLE of the same name must drop it before creating the view — that one
conversion keeps the legacy non-atomic window (documented at the call
sites); every publish after it is atomic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

__all__ = ["current_physical", "drop_published", "publish_table", "resolve_table"]

#: view property naming the current physical generation table
PHYSICAL_PROP = "publish.physical"


def _is_view(spark: SparkSession, name: str) -> bool | None:
    """True/False for an existing view/table, None if ``name`` is absent."""
    try:
        t = spark.catalog.getTable(name)
    except Exception:  # noqa: BLE001 — AnalysisException: not found
        return None
    return t.tableType == "VIEW"


def current_physical(spark: SparkSession, name: str) -> str | None:
    """The physical generation table behind a published view, or None if
    ``name`` is not a publish-managed view."""
    if _is_view(spark, name) is not True:
        return None
    rows = spark.sql(
        f"SHOW TBLPROPERTIES {name}('{PHYSICAL_PROP}')"
    ).collect()
    if not rows or "does not have property" in rows[0]["value"]:
        # Spark renders a missing property as an error-text value
        return None
    return rows[0]["value"]


def resolve_table(spark: SparkSession, name: str) -> str:
    """The physical table to DESCRIBE / append to: the current generation
    for a published view, ``name`` itself for a plain table."""
    return current_physical(spark, name) or name


def _generation(physical: str | None, logical: str) -> int:
    if physical is None:
        return 0
    try:
        return int(physical.rsplit("__g", 1)[1])
    except (IndexError, ValueError):
        return 0


def publish_table(
    spark: SparkSession, name: str, write: Callable[[str], None]
) -> str:
    """Atomically publish new content for logical table ``name``.

    ``write(physical_name)`` must create the new physical table (any
    format/bucketing — it receives the generation-numbered name).  Returns
    the physical name published.  Sequence:

    1. write generation N+1 (readers of ``name`` are untouched);
    2. ONE ``CREATE OR REPLACE VIEW`` repoints the name (atomic in the
       session catalog — a resolving reader sees old or new, never
       neither).  First publish over a plain TABLE must drop it first:
       that single migration keeps the legacy window once;
    3. drop generations older than N (N itself is retained for in-flight
       readers that resolved the view before the repoint).

    Not a cross-process transaction log — concurrent PUBLISHERS still
    race on the generation number (last writer wins); the deployment
    answer to that is the feature-store CAS registry, which rejects a
    stale base version.  This covers the reader-during-swap hazard, which
    is the one the local lifecycle actually has."""
    prev_phys = current_physical(spark, name)
    gen = _generation(prev_phys, name) + 1
    phys = f"{name}__g{gen}"
    spark.sql(f"DROP TABLE IF EXISTS {phys}")
    write(phys)
    if _is_view(spark, name) is False:
        # legacy plain table -> view conversion: the one non-atomic window
        spark.sql(f"DROP TABLE {name}")
    spark.sql(
        f"CREATE OR REPLACE VIEW {name} "
        f"TBLPROPERTIES ('{PHYSICAL_PROP}'='{phys}') "
        f"AS SELECT * FROM {phys}"
    )
    for row in spark.sql(f"SHOW TABLES LIKE '{name}__g*'").collect():
        g = _generation(row["tableName"], name)
        if 0 < g < gen - 1:
            spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
    return phys


def drop_published(spark: SparkSession, name: str) -> None:
    """Drop a logical table regardless of publish state: the view OR plain
    table named ``name``, plus every retained generation."""
    is_view = _is_view(spark, name)
    if is_view is True:
        spark.sql(f"DROP VIEW {name}")
    elif is_view is False:
        spark.sql(f"DROP TABLE {name}")
    for row in spark.sql(f"SHOW TABLES LIKE '{name}__g*'").collect():
        spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
