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
    expectations = (getattr(meta, "properties", {}) or {}).get("expectations", {})

    spark = df.sparkSession
    table_dir = registry.table_dir(meta.name)
    validate_obs = None
    if mode == "merge" and meta.current_version > 0:
        target = read_snapshot(spark, registry, meta)
        if validate:
            # Fused path (r14, guide §1.4/§6): source-key validation rides
            # the write action as observe() metrics instead of a separate
            # groupBy+collect job, and the merge itself is an anti-join +
            # union — the TARGET is never shuffled (the union+window form
            # re-shuffled the whole snapshot per merge; at 100 TB the
            # broadcast-anti on a slice-sized source touches only the
            # scan).  A violating source is detected after the staging
            # write and REJECTED before publish — observably identical to
            # the old eager reject (staging dirs are invisible to readers).
            merged, validate_obs = _merge_frames_validated(
                target, df, merge_keys
            )
        else:
            # validate=False keeps the window form: its keep-one-arbitrary-
            # row-per-duplicate-key semantics are part of the escape-hatch
            # contract (pinned by test_merge_rejects_duplicate_and_null_
            # source_keys)
            merged = _merge_frames(target, df, merge_keys)
    else:
        merged = df
        if validate and mode == "merge":
            # merge into an empty table: no merge pass to ride — the
            # separate aggregate job shuffles only (key, count) partials,
            # far fewer bytes than a full-row window would (guide §2.3)
            _validate_source(df, merge_keys, meta.name)
    # expectations check the MERGED result, not the raw source: that is the
    # state the table would land in (Delta CHECK semantics), and it keeps a
    # schema-evolving merge source that legitimately omits a constrained
    # column checkable (the merged frame carries the target's columns).
    # Violation counting rides the write action (observe); drop-action
    # predicates filter inline (unconditional — filtering zero violating
    # rows is a no-op); fail/warn adjudicate post-write, pre-publish.
    expect_obs = None
    if validate and expectations:
        merged, expect_obs = _apply_expectations_observed(
            merged, expectations, meta.name
        )

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

    # adjudicate the fused validation/expectation metrics BEFORE publish:
    # a rejected write deletes its staging dir and raises — no version is
    # ever published, exactly like the old pre-write rejection
    if validate_obs is not None or expect_obs is not None:
        try:
            if validate_obs is not None:
                _check_validation_metrics(validate_obs.get, df, merge_keys, meta.name)
            if expect_obs is not None:
                _check_expectation_metrics(expect_obs.get, expectations, meta.name)
        except Exception:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            raise

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


def _merge_frames_validated(
    target: DataFrame, source: DataFrame, keys: list[str]
):
    """Anti-join + union upsert with the source-key validation metrics
    fused into the plan (r14).

    Semantics when the source is VALID (unique, non-null keys — the only
    case that ever publishes, because :func:`_check_validation_metrics`
    rejects the rest before the registry flip): identical to
    :func:`_merge_frames` — matched target rows are replaced by their
    source row in full, unmatched source rows are inserted, evolved
    source-only columns appear with null for untouched target rows.

    Plan shape vs the window form: the target is NEVER shuffled — matched
    rows drop via a null-safe LEFT ANTI join against the source keys
    (broadcast while the source slice is small; AQE falls back to a
    shuffled anti for genuinely large sources), and only the source side
    pays a key-partitioned window that carries the per-key source-row
    count the validation metrics read.  The old form shuffled
    target+source through one row_number window per merge — at 100 TB
    that re-shuffles the whole snapshot to apply a slice.

    Returns ``(merged_df, Observation)``; the caller must run an action on
    ``merged_df`` and then adjudicate the observation.
    """
    from functools import reduce

    from pyspark.sql import Observation

    w = Window.partitionBy(*keys)
    null_key = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    s = source.withColumn("__src_n", F.count(F.lit(1)).over(w))
    obs = Observation()
    s = s.observe(
        obs,
        F.coalesce(F.max("__src_n"), F.lit(0)).alias("dup_max"),
        F.coalesce(
            F.sum(F.when(null_key, 1).otherwise(0)), F.lit(0)
        ).alias("null_keys"),
    )
    s = s.select(*source.columns)
    # rename the join side's keys: target and source frequently share
    # lineage (an update slice derived from read_table of the same
    # snapshot), where bare attribute references are ambiguous
    skeys = s.select(*[F.col(k).alias(f"__sk_{k}") for k in keys])
    cond = None
    for k in keys:
        piece = F.col(k).eqNullSafe(F.col(f"__sk_{k}"))
        cond = piece if cond is None else cond & piece
    kept = target.join(skeys, on=cond, how="left_anti")
    return kept.unionByName(s, allowMissingColumns=True), obs


def _check_validation_metrics(
    metrics: dict, source: DataFrame, keys: list[str], table: str
) -> None:
    """Adjudicate :func:`_merge_frames_validated`'s observation after the
    write action.  On violation, re-run the classic one-pass validator to
    produce the same detailed error message (failure path only — the
    happy path never pays a second job)."""
    if metrics["dup_max"] > 1 or metrics["null_keys"] > 0:
        _validate_source(source, keys, table)
        # the aggregate raced a concurrent mutation of the source between
        # the write and the re-check; reject loudly rather than publish
        raise ValueError(
            f"merge source for {table} failed validation during the write "
            f"(max rows per key {metrics['dup_max']}, null-key rows "
            f"{metrics['null_keys']}) but passed a re-check; source is "
            f"nondeterministic — stabilize it or pass validate=False"
        )


def _apply_expectations_observed(
    df: DataFrame, expectations: dict, table: str
):
    """Expectation enforcement fused into the write action (r14): violation
    counts ride an ``observe`` over the pre-drop frame instead of a
    separate aggregate job; ``drop`` predicates filter inline
    (unconditionally — filtering zero violating rows is the identity).
    ``fail``/``warn`` adjudicate in :func:`_check_expectation_metrics`
    after the write, before publish — same outcomes as the eager form.

    Unevaluable predicates still reject at plan-build time with the same
    per-expectation ValueError."""
    from pyspark.sql import Observation

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
            F.coalesce(
                F.sum(
                    F.when(
                        F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)), 0
                    ).otherwise(1)
                ),
                F.lit(0),
            ).alias(name)
        )
    obs = Observation()
    out = df.observe(obs, *aggs)
    for name, (pred, action) in norm.items():
        if action == "drop":
            out = out.where(
                F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
            )
    return out, obs


def _check_expectation_metrics(
    metrics: dict, expectations: dict, table: str
) -> None:
    """Post-write adjudication of :func:`_apply_expectations_observed`:
    same error/warning text as the eager form, driven by the observed
    counts."""
    import warnings

    norm = _normalize_expectations(expectations)
    bad_fail = {
        n: metrics[n] for n, (_p, a) in norm.items() if a == "fail" and metrics[n]
    }
    if bad_fail:
        raise ValueError(
            f"write to {table} violates expectation(s) {bad_fail} "
            f"(rows failing each predicate); fix the source or drop the "
            f"expectation"
        )
    bad_warn = {
        n: metrics[n] for n, (_p, a) in norm.items() if a == "warn" and metrics[n]
    }
    if bad_warn:
        warnings.warn(
            f"write to {table} has expectation warning(s) {bad_warn} "
            f"(rows failing each predicate; write proceeds)",
            RuntimeWarning,
            stacklevel=3,
        )


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
