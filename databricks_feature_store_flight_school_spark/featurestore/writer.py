"""Merge-upsert writer with schema evolution (SURVEY.md §2.1 S8 — the
reference's ``compute_and_write(..., mode='merge')``, FS:230-231/FS:435).

Semantics reproduced exactly:

- **merge**: primary-key upsert — matched target rows take ALL source column
  values, unmatched source rows are inserted (Delta
  ``whenMatchedUpdateAll/whenNotMatchedInsertAll``);
- **schema evolution**: source may carry columns the target lacks
  (FS:411-435 adds NumOptionalServices/AvgPriceIncrease through a merge);
  new columns appear in the result, null for rows not touched by the merge;
- **overwrite**: full replace.

Physical strategy: if OSS delta-spark is importable we use
``DeltaTable.merge`` with ``spark.databricks.delta.schema.autoMerge.enabled``
(the transactional path for a real cluster).  In this environment Delta is not
installed, so the engine's documented fallback runs: versioned parquet
snapshots with last-writer-wins resolution —

    read target vN  ->  unionByName(allowMissingColumns=True) with a
    writer-priority column  ->  row_number() over (partition by keys
    order by priority desc) == 1  ->  write vN+1  ->  registry pointer flip

Each write lands in a fresh ``v{N}`` directory and the registry's
``current_version`` flips atomically afterwards, so concurrent readers keep a
consistent snapshot (non-transactional across tables, documented).

Scale notes: the union+window plan shuffles once on the primary key — the
same key the Delta merge join would shuffle on; with the target bucketed by
key the shuffle drops away entirely.  New-version writes rewrite the full
snapshot (Delta would rewrite only touched files); at 100 TB the Delta path
is the one to enable — same API, one config.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .registry import FeatureTableMeta, Registry

try:  # OSS delta-spark, optional (not installed in this harness)
    from delta.tables import DeltaTable  # type: ignore

    _HAVE_DELTA = True
except Exception:  # pragma: no cover - absence is the tested path here
    DeltaTable = None
    _HAVE_DELTA = False


def _version_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:06d}")


def read_snapshot(
    spark: SparkSession,
    registry: Registry,
    meta: FeatureTableMeta,
    version: int | None = None,
    as_of: float | str | None = None,
) -> DataFrame:
    """Contents of a feature table (S4: ``fs.read_table``).

    ``version`` time-travels to an earlier snapshot — every merge/overwrite
    lands in its own ``v{N}`` directory, so history is queryable for free
    (the parquet-snapshot analog of Delta's ``versionAsOf``).  ``as_of``
    (epoch seconds or an ISO ``YYYY-MM-DD[ HH:MM:SS]`` string, UTC) is the
    ``timestampAsOf`` analog: the newest version PUBLISHED at or before the
    instant, resolved from the registry's per-version publish history."""
    if meta.current_version == 0:
        raise ValueError(f"feature table {meta.name} has no data yet")
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        version = _resolve_as_of(meta, as_of)
    if version is None:
        version = meta.current_version
    if not 1 <= version <= meta.current_version:
        raise ValueError(
            f"version {version} out of range [1, {meta.current_version}] "
            f"for {meta.name}"
        )
    vdir = _version_dir(registry.table_dir(meta.name), version)
    if not os.path.isdir(vdir):
        raise ValueError(
            f"version {version} of {meta.name} was retired by "
            f"vacuum_snapshots; only versions still on disk are readable "
            f"(current: v{meta.current_version})"
        )
    return spark.read.parquet(vdir)


def _resolve_as_of(meta: FeatureTableMeta, as_of: float | str) -> int:
    """Newest version with publish-instant <= as_of (timestampAsOf)."""
    if isinstance(as_of, str):
        from datetime import datetime, timezone

        fmt = "%Y-%m-%d %H:%M:%S" if " " in as_of else "%Y-%m-%d"
        as_of = datetime.strptime(as_of, fmt).replace(
            tzinfo=timezone.utc
        ).timestamp()
    history = (getattr(meta, "properties", {}) or {}).get("version_history", {})
    eligible = [int(v) for v, ts in history.items() if ts <= as_of]
    if not eligible:
        raise ValueError(
            f"no version of {meta.name} existed at or before {as_of} "
            f"(earliest publish: {min(history.values()) if history else 'none recorded'})"
        )
    return max(eligible)


def write_snapshot(
    registry: Registry, meta: FeatureTableMeta, df: DataFrame, mode: str,
    validate: bool = True, properties_update: dict | None = None,
) -> FeatureTableMeta:
    """Write ``df`` into the feature table; returns updated metadata.

    mode='overwrite' -> replace; mode='merge' -> PK upsert with schema
    evolution (see module docstring).

    ``validate`` (default on) rejects sources Delta's MERGE would reject —
    null key columns, or several source rows for one key (whose winner would
    otherwise be arbitrary).  Costs one small aggregate job over the source;
    pass False only for sources already known clean.

    ``properties_update`` lands in the registry atomically with the version
    flip (registry.publish_version) — see the materialized-view refresh for
    why that matters.
    """
    if mode not in ("merge", "overwrite"):
        raise ValueError(f"unsupported write mode: {mode}")
    merge_keys = meta.merge_keys
    missing = [k for k in merge_keys if k not in df.columns]
    if missing:
        raise ValueError(f"source is missing primary key column(s) {missing}")
    if validate and mode == "merge":
        _validate_source(df, merge_keys, meta.name)
    expectations = (getattr(meta, "properties", {}) or {}).get("expectations", {})

    spark = df.sparkSession
    table_dir = registry.table_dir(meta.name)
    if mode == "merge" and meta.current_version > 0:
        target = read_snapshot(spark, registry, meta)
        merged = _merge_frames(target, df, merge_keys)
    else:
        merged = df
    # expectations check the MERGED result, not the raw source: that is the
    # state the table would land in (Delta CHECK semantics), and it keeps a
    # schema-evolving merge source that legitimately omits a constrained
    # column checkable (the merged frame carries the target's columns)
    if validate and expectations:
        merged = _apply_expectations(merged, expectations, meta.name)

    expected = meta.current_version
    new_version = expected + 1
    # Stage into a unique dir, then CAS-publish: two racing writers would
    # otherwise both target v{N+1} and the loser's parquet job would clobber
    # the winner's committed files BEFORE the registry check could notice.
    staging = os.path.join(
        table_dir, f".staging-v{new_version:06d}-{os.getpid()}-{id(df):x}"
    )
    cluster = [c for c in getattr(meta, "cluster_columns", []) if c in merged.columns]
    if cluster:
        # range partition + in-file sort: parquet min/max stats become
        # selective on the cluster key (row-group skipping at read time)
        merged = merged.repartitionByRange(*cluster).sortWithinPartitions(*cluster)
    writer = merged.write.mode("overwrite")
    if meta.partition_columns:
        writer = writer.partitionBy(*meta.partition_columns)
    writer.parquet(staging)

    updated = registry.publish_version(
        meta.name,
        expected_version=expected,
        staging_dir=staging,
        final_dir=_version_dir(table_dir, new_version),
        schema_json=merged.schema.json(),
        properties_update=properties_update,
    )
    meta.current_version = updated.current_version
    meta.schema_json = updated.schema_json
    return updated


def _validate_source(df: DataFrame, keys: list[str], table: str) -> None:
    """One aggregate pass: no null keys, no duplicate key tuples (the
    conditions under which a merge result would be nondeterministic)."""
    from functools import reduce

    null_cond = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    bad = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where((F.col("__n") > 1) | null_cond)
        .limit(1)
        .collect()
    )
    if bad:
        row = bad[0]
        keyvals = {k: row[k] for k in keys}
        if any(v is None for v in keyvals.values()):
            raise ValueError(f"merge source for {table} has null key(s): {keyvals}")
        raise ValueError(
            f"merge source for {table} has {row['__n']} rows for key {keyvals}; "
            "a merge winner would be arbitrary (Delta MERGE rejects this too). "
            "Deduplicate the source or pass validate=False."
        )


_EXPECTATION_ACTIONS = ("fail", "drop", "warn")


def _normalize_expectations(expectations: dict) -> dict[str, tuple[str, str]]:
    """name -> (predicate, action).  A plain string value is the original
    fail-on-violation form; a dict value carries DLT-style actions:
    ``{"predicate": "x >= 0", "action": "fail"|"drop"|"warn"}``."""
    out = {}
    for name, spec in expectations.items():
        if isinstance(spec, str):
            out[name] = (spec, "fail")
        else:
            action = spec.get("action", "fail")
            if action not in _EXPECTATION_ACTIONS:
                raise ValueError(
                    f"expectation {name!r}: unknown action {action!r} "
                    f"(use one of {_EXPECTATION_ACTIONS})"
                )
            out[name] = (spec["predicate"], action)
    return out


def _apply_expectations(df: DataFrame, expectations: dict, table: str) -> DataFrame:
    """CHECK-constraint enforcement with DLT-expectation actions, evaluated
    against the write RESULT in ONE aggregate pass (NULL predicate results
    count as violations — unknown-as-fail for data-quality purposes):

    - ``fail`` (default / plain-string form): any violation rejects the
      whole write atomically, with per-expectation counts;
    - ``drop``: violating rows are removed from the written snapshot (note
      this is table-state semantics — a previously-written row violating a
      drop expectation is dropped at the next write, exactly as a new CHECK
      constraint re-validates existing data);
    - ``warn``: violations are counted and surfaced as a RuntimeWarning;
      the write proceeds untouched.

    A predicate that does not resolve against the frame (e.g. names a column
    that exists in neither target nor source) rejects the write with a clear
    per-expectation ValueError instead of an opaque AnalysisException."""
    import warnings

    norm = _normalize_expectations(expectations)
    aggs = []
    for name, (pred, _action) in norm.items():
        try:  # analysis-only plan build: no job runs
            df.select(F.expr(pred).cast("boolean"))
        except Exception as exc:
            raise ValueError(
                f"expectation {name!r} on {table} is not evaluable against "
                f"the write result (predicate {pred!r}: "
                f"{exc.__class__.__name__}); fix the predicate or drop the "
                f"expectation"
            ) from exc
        aggs.append(
            F.sum(
                F.when(
                    F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)), 0
                ).otherwise(1)
            ).alias(name)
        )
    row = df.agg(*aggs).first()
    bad_fail = {
        n: row[n] for n, (_p, a) in norm.items() if a == "fail" and row[n]
    }
    if bad_fail:
        raise ValueError(
            f"write to {table} violates expectation(s) {bad_fail} "
            f"(rows failing each predicate); fix the source or drop the "
            f"expectation"
        )
    bad_warn = {
        n: row[n] for n, (_p, a) in norm.items() if a == "warn" and row[n]
    }
    if bad_warn:
        warnings.warn(
            f"write to {table} has expectation warning(s) {bad_warn} "
            f"(rows failing each predicate; write proceeds)",
            RuntimeWarning,
            stacklevel=3,
        )
    drop_preds = [
        p for n, (p, a) in norm.items() if a == "drop" and row[n]
    ]
    for pred in drop_preds:
        df = df.where(F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)))
    return df


def _merge_frames(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Last-writer-wins upsert of ``source`` onto ``target`` by ``keys``,
    admitting source-only columns (schema evolution).

    Exactly Delta's MERGE ... WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED
    INSERT * observable semantics: for a matched key the SOURCE row wins in
    full (including nulls it carries); target rows never matched keep their
    values with null in any evolved column.
    """
    prio = "__writer_priority"
    t = target.withColumn(prio, F.lit(0))
    s = source.withColumn(prio, F.lit(1))
    unioned = t.unionByName(s, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.col(prio).desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop(prio, "__rn")
    )


def delta_available() -> bool:
    return _HAVE_DELTA


def compact_snapshot(
    spark: SparkSession,
    registry: Registry,
    meta: FeatureTableMeta,
    num_files: int | None = None,
) -> FeatureTableMeta:
    """Small-file compaction: rewrite the current snapshot into ``num_files``
    parquet files (defaults to shuffle-partition count capped by row count).

    Merge writes inherit the merge plan's shuffle partitioning, so a busy
    feature table accumulates many small files — at scale that's scan
    overhead (one task + footer read per file).  Compaction is the OPTIMIZE
    analog: same rows, new version, fewer files; readers flip atomically
    with the registry pointer like any other write.
    """
    current = read_snapshot(spark, registry, meta)
    if num_files is None:
        num_files = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 16))
    compacted = current.coalesce(num_files)
    expected = meta.current_version
    new_version = expected + 1
    table_dir = registry.table_dir(meta.name)
    staging = os.path.join(table_dir, f".staging-v{new_version:06d}-compact-{os.getpid()}")
    writer = compacted.write.mode("overwrite")
    if meta.partition_columns:
        writer = writer.partitionBy(*meta.partition_columns)
    writer.parquet(staging)
    updated = registry.publish_version(
        meta.name,
        expected_version=expected,
        staging_dir=staging,
        final_dir=_version_dir(table_dir, new_version),
        schema_json=meta.schema_json,
    )
    meta.current_version = updated.current_version
    return updated


def merge_into_delta(
    spark: SparkSession, table_path: str, source: DataFrame, keys: list[str]
) -> None:
    """Transactional MERGE via OSS delta-spark — the production write path
    at 100 TB (the reference's ``compute_and_write(mode='merge')`` rides
    Delta ACID, FS:230/FS:435): only touched files rewrite, concurrent
    writers serialize through the Delta log instead of this module's
    optimistic parquet-snapshot CAS.

    Same observable semantics as :func:`_merge_frames`:
    ``whenMatchedUpdateAll`` / ``whenNotMatchedInsertAll`` with
    ``schema.autoMerge`` on for evolved source columns; null-safe key
    equality (``<=>``) so null keys match like the window dedup does.

    delta-spark is not installed in this harness, so the wiring is pinned by
    a fake-module contract test (tests/test_featurestore.py) and raises
    cleanly when the package is absent.
    """
    try:
        from delta.tables import DeltaTable as _DeltaTable  # dynamic: testable
    except ImportError as exc:  # pragma: no cover - exercised via fake module
        raise RuntimeError(
            "delta-spark is not installed; install it or use the parquet-"
            "snapshot writer (write_snapshot)"
        ) from exc
    spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
    cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    (
        _DeltaTable.forPath(spark, table_path)
        .alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def vacuum_snapshots(
    registry: Registry,
    meta: FeatureTableMeta,
    keep_last: int = 3,
) -> list[int]:
    """Retention GC — the VACUUM analog for the parquet-snapshot format:
    delete version directories older than the ``keep_last`` most recent,
    returning the version numbers removed.

    Every merge/overwrite/compaction writes a full new ``v{N}`` directory, so
    history grows linearly with write count; at 100 TB that is the dominant
    storage cost.  Deletion never touches the registry pointer (the current
    version is always retained; ``keep_last`` is clamped to >= 1), so
    concurrent readers of RETAINED versions are unaffected — readers of a
    vacuumed version fail on their next scan exactly as with Delta VACUUM,
    which is why retention should exceed the longest-running query.
    Leftover ``.staging-*`` dirs from crashed writers are swept too.
    """
    import shutil

    keep_last = max(1, keep_last)
    table_dir = registry.table_dir(meta.name)
    removed: list[int] = []
    cutoff = meta.current_version - keep_last
    for v in range(1, cutoff + 1):
        vdir = _version_dir(table_dir, v)
        if os.path.isdir(vdir):
            shutil.rmtree(vdir)
            removed.append(v)
    for entry in os.listdir(table_dir):
        if entry.startswith(".staging-"):
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
    return removed


def delete_keys(
    registry: Registry,
    meta: FeatureTableMeta,
    keys_df: DataFrame,
) -> FeatureTableMeta:
    """Row-level DELETE by primary key (the ``DELETE FROM t WHERE key IN
    (...)`` analog; GDPR-erasure / entity-offboarding shape): the next
    snapshot is the current one anti-joined against ``keys_df`` on the
    table's merge keys.  Publishes through the same stage-then-CAS protocol
    as write_snapshot, so it serializes against concurrent merges and is
    time-travel-visible (the deleted rows remain in earlier versions until
    ``vacuum_snapshots`` retires them — exactly Delta's DELETE + VACUUM
    erasure contract).

    ``keys_df`` must carry exactly the merge-key columns (extra columns are
    ignored); deleting keys that do not exist is a no-op for those keys but
    still commits a version, like Delta's DELETE."""
    merge_keys = meta.merge_keys
    missing = [k for k in merge_keys if k not in keys_df.columns]
    if missing:
        raise ValueError(f"keys_df is missing key column(s) {missing}")
    if meta.current_version == 0:
        raise ValueError(f"feature table {meta.name} has no data yet")
    spark = keys_df.sparkSession
    target = read_snapshot(spark, registry, meta)
    remaining = target.join(
        keys_df.select(*merge_keys).distinct(), on=merge_keys, how="left_anti"
    )
    expected = meta.current_version
    new_version = expected + 1
    table_dir = registry.table_dir(meta.name)
    staging = os.path.join(
        table_dir, f".staging-v{new_version:06d}-delete-{os.getpid()}"
    )
    writer = remaining.write.mode("overwrite")
    if meta.partition_columns:
        writer = writer.partitionBy(*meta.partition_columns)
    writer.parquet(staging)
    updated = registry.publish_version(
        meta.name,
        expected_version=expected,
        staging_dir=staging,
        final_dir=_version_dir(table_dir, new_version),
        schema_json=meta.schema_json,
    )
    meta.current_version = updated.current_version
    return updated


def restore_version(
    spark: SparkSession,
    registry: Registry,
    meta: FeatureTableMeta,
    version: int,
) -> FeatureTableMeta:
    """Delta ``RESTORE TABLE ... TO VERSION AS OF`` analog: re-publish an
    earlier snapshot's rows as a NEW version (history is preserved — restore
    is itself a versioned write, so it is auditable and re-restorable, and
    concurrent writers still serialize through the same stage-then-CAS
    publish).  The restored version must still be on disk (i.e. not yet
    retired by ``vacuum_snapshots``)."""
    source = read_snapshot(spark, registry, meta, version=version)
    expected = meta.current_version
    new_version = expected + 1
    table_dir = registry.table_dir(meta.name)
    staging = os.path.join(
        table_dir, f".staging-v{new_version:06d}-restore-{os.getpid()}"
    )
    writer = source.write.mode("overwrite")
    if meta.partition_columns:
        writer = writer.partitionBy(*meta.partition_columns)
    writer.parquet(staging)
    updated = registry.publish_version(
        meta.name,
        expected_version=expected,
        staging_dir=staging,
        final_dir=_version_dir(table_dir, new_version),
        schema_json=source.schema.json(),
    )
    meta.current_version = updated.current_version
    meta.schema_json = updated.schema_json
    return updated
