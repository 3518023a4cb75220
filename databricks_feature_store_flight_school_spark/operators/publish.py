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
- publishing generation N+1 repoints the view with ONE ``ALTER VIEW name
  AS SELECT * FROM name__g{N+1}`` — a single catalog ALTER, so a reader
  resolving the name sees generation N or N+1, never a missing table.
  ``CREATE OR REPLACE VIEW`` is deliberately NOT used: Spark implements
  REPLACE as drop-then-create, and the stress test caught readers hitting
  TABLE_OR_VIEW_NOT_FOUND in that window (ALTER VIEW AS measured clean
  across hundreds of repoints under concurrent readers —
  tests/test_dedup_index.py::test_publish_swap_keeps_reader_alive);
- older generations are retained per ``retain`` (the VACUUM-retention
  analog) so in-flight readers keep scanning files that still exist.

Views are erased at analysis time (a ``SELECT *`` view is a bare
SubqueryAlias), so reading through the indirection costs nothing and a
bucketed physical table's output partitioning propagates exactly as a
direct scan's would — the Exchange-free plan assertions in
tests/test_dedup_index.py hold through a published name.  Writers that
need the PHYSICAL table (bucketed appends, DESCRIBE for the bucket spec,
TBLPROPERTIES) resolve it with :func:`resolve_table`; the view's own
stored text (``View Text``) is the single source of truth for which
generation is current.

Migration is in-place: the first :func:`publish_table` against a plain
TABLE of the same name must drop it before creating the view — that one
conversion keeps the legacy non-atomic window (documented at the call
sites); every publish after it is atomic.

Single-PUBLISHER model: concurrent publishers would race the generation
number (last writer wins) — cross-process write coordination is the
feature-store CAS registry's job, not this module's.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import SparkSession

__all__ = ["current_physical", "drop_published", "publish_table", "resolve_table"]


def _is_view(spark: SparkSession, name: str) -> bool | None:
    """True/False for an existing view/table, None if ``name`` is absent."""
    try:
        t = spark.catalog.getTable(name)
    except Exception:  # noqa: BLE001 — AnalysisException: not found
        return None
    return t.tableType == "VIEW"


def current_physical(spark: SparkSession, name: str) -> str | None:
    """The physical generation table behind a published view (parsed from
    the view's stored text — the catalog's own record of what the view
    reads), or None if ``name`` is not a publish-managed view."""
    if _is_view(spark, name) is not True:
        return None
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if r["col_name"] == "View Text":
            m = re.fullmatch(r"SELECT \* FROM (\S+)", r["data_type"].strip())
            return m.group(1) if m else None
    return None


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


def _remove_orphan_location(spark: SparkSession, table: str) -> None:
    """Delete a managed-table warehouse directory that the CURRENT catalog
    does not know about.  A run that died between writing a generation and
    dropping it leaves such an orphan; the (in-memory) catalog of the next
    session cannot see it, ``DROP TABLE IF EXISTS`` is a no-op, and the
    next ``saveAsTable`` fails with LOCATION_ALREADY_EXISTS.  Only called
    for generation-numbered names this module owns, and only when the
    catalog confirms the name is unbound."""
    if spark.catalog.tableExists(table):
        return
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table.lower()}")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(path, True)


def publish_table(
    spark: SparkSession, name: str, write: Callable[[str], None],
    retain: int = 2,
) -> str:
    """Atomically publish new content for logical table ``name``.

    ``write(physical_name)`` must create the new physical table (any
    format/bucketing — it receives the generation-numbered name).  Returns
    the physical name published.  Sequence:

    1. write generation N+1 (readers of ``name`` are untouched; an orphan
       directory left by a crashed earlier run is cleared first);
    2. ONE ``ALTER VIEW name AS SELECT * FROM`` the new generation — a
       single catalog alter, so a resolving reader sees old or new, never
       neither.  First publish over a plain TABLE (or no table) drops it
       and CREATEs the view instead: that single migration keeps the
       legacy window once;
    3. drop generations older than the newest ``retain`` (default 2:
       current + previous), so an in-flight reader that resolved the view
       before the repoint keeps scanning files that still exist.

    ``retain`` is the VACUUM-retention analog and bounds reader-staleness
    tolerance, not correctness of the swap itself: a reader whose single
    query outlives ``retain - 1`` FURTHER publishes can lose its
    generation's files mid-scan (Delta has the same property — that is
    what retention windows are for).  Size it to publish cadence vs the
    slowest reader: the default suits the dedup lifecycle, whose
    publishes are minutes apart; pass a larger value when publishing in
    tight loops over tables with concurrent readers."""
    if retain < 1:
        raise ValueError(f"retain must be >= 1, got {retain}")
    prev_phys = current_physical(spark, name)
    gen = _generation(prev_phys, name) + 1
    phys = f"{name}__g{gen}"
    spark.sql(f"DROP TABLE IF EXISTS {phys}")
    _remove_orphan_location(spark, phys)
    write(phys)
    is_view = _is_view(spark, name)
    if is_view is True:
        spark.sql(f"ALTER VIEW {name} AS SELECT * FROM {phys}")
    else:
        if is_view is False:
            # legacy plain table -> view: the one non-atomic window
            spark.sql(f"DROP TABLE {name}")
        spark.sql(f"CREATE VIEW {name} AS SELECT * FROM {phys}")
    for row in spark.sql(f"SHOW TABLES LIKE '{name}__g*'").collect():
        g = _generation(row["tableName"], name)
        if 0 < g <= gen - retain:
            spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
    return phys


def drop_published(spark: SparkSession, name: str) -> None:
    """Drop a logical table regardless of publish state: the view OR plain
    table named ``name``, every retained generation, and any orphan
    generation directories a crashed run left in the warehouse."""
    is_view = _is_view(spark, name)
    if is_view is True:
        spark.sql(f"DROP VIEW {name}")
    elif is_view is False:
        spark.sql(f"DROP TABLE {name}")
    for row in spark.sql(f"SHOW TABLES LIKE '{name}__g*'").collect():
        spark.sql(f"DROP TABLE IF EXISTS {row['tableName']}")
    # orphan generation dirs from crashed runs (catalog no longer — or in a
    # fresh in-memory catalog, never — knew them)
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    fs_path = jvm.org.apache.hadoop.fs.Path(warehouse)
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(fs_path):
        prefix = f"{name.lower()}__g"
        for status in fs.listStatus(fs_path):
            base = status.getPath().getName()
            if base == name.lower() or (
                base.startswith(prefix) and base[len(prefix):].isdigit()
            ):
                if not spark.catalog.tableExists(base):
                    fs.delete(status.getPath(), True)
