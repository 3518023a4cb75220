"""SparkSession factory and per-session preparation.

Replaces the reference's notebook bootstrap (includes/setup.py:183-229): where
the reference configures a per-user database over ad-hoc ``spark.sql`` calls,
the engine centralises session construction with the configs that matter at
100 TB scale:

- AQE on (runtime re-planning: broadcast-join demotion/promotion, partition
  coalescing, skew-join splitting),
- Arrow on (vectorised pandas interchange for the few Python-side ops),
- UTC session timezone (deterministic timestamp semantics vs the oracle),
- nanosAsLong (the driver testdata's ``events.ts`` is parquet TIMESTAMP(NANOS),
  which Spark rejects natively; we read it as long and convert in the loader).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs applied to any session the engine touches (driver-created or
# our own).  All of these are settable on a live session.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS); read as long, convert in loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Columnar parquet reads for array<float> embedding columns.
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Python DataSource V2 filter pushdown (sources/pydatasource.py prunes
    # whole files on source-equality filters).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent).

    Every public query entry point calls this so behaviour is identical
    whether the session was built by :func:`get_spark` or by the driver.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be non-settable on some builds; never fail a query
            # over session tuning.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas UDFs (scoring predictors, count-if) unpickle classes defined in
    this package on the worker side; when the driver process was started
    outside the repo the workers' sys.path lacks it.  Shipping a zip via
    ``addPyFile`` fixes that uniformly for local mode AND a real cluster.
    """
    sc = spark.sparkContext
    if getattr(sc, "_dbfs_fs_pkg_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_dir)
    base = os.path.join(
        tempfile.gettempdir(), f"dbfs_fs_spark_pkg_{os.getpid()}"
    )
    try:
        zip_path = shutil.make_archive(
            base, "zip", root_dir=repo_root, base_dir=os.path.basename(pkg_dir)
        )
        sc.addPyFile(zip_path)
        sc._dbfs_fs_pkg_shipped = True
    except Exception:
        # e.g. read-only tmp or repeated addPyFile on some builds — workers
        # that already share the repo path still function.
        pass


def get_spark(
    app_name: str = "databricks-feature-store-flight-school-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``)
    so the same entry point serves tests, bench.py, and a real cluster (where
    ``master`` is provided by spark-submit and we leave it alone).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master and master.startswith("local"):
        # Single-JVM local mode: tasks are threads, so the sweet spot for
        # post-shuffle partition size is far below the cluster default (64m
        # would coalesce the whole sf0.1 shuffle into ONE task and serialize
        # every downstream stage; measured ~10% on join-heavy queries).  On a
        # real cluster (master from spark-submit) Spark's defaults stand —
        # 1m advisory at 100 TB would explode partition counts.
        builder = builder.config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
        ).config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return prepare(builder.getOrCreate())
