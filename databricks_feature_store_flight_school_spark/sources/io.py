"""Format-uniform file sources and sinks: parquet, ORC, CSV, JSON, text.

Reference analog: the CSV ingest at includes/setup.py:206 (header +
inferSchema read) and the Delta CTAS at includes/setup.py:241-247.  The engine
generalises that one hard-coded path into a single API over every
Spark-native columnar and text format, with the scale rules applied
uniformly:

- **declared schema beats inference** — ``schema=`` skips the extra
  inference pass over the data (CSV/JSON infer by reading; at 100 TB that is
  a full extra scan).  ``infer=True`` opts back into the reference's
  behaviour for ad-hoc exploration.
- **columnar formats keep pushdown** — parquet and ORC scans accept filter
  pushdown and column pruning from Catalyst; row formats (CSV/JSON) only
  prune columns after parsing.  Nothing here interferes with either.
- **partitioned layout** — ``partition_by`` produces the
  ``col=value/`` directory layout whose partition pruning works identically
  across all formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: formats handled by read_files / write_files
FORMATS = ("parquet", "orc", "csv", "json", "text")


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    infer: bool = False,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Read ``path`` in any supported format.

    CSV defaults to the reference's header-aware shape (SU:206); pass a
    ``schema`` to skip inference (the scale path) or ``infer=True`` to
    replicate the reference's two-pass inferring read exactly.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
        if schema is None and infer:
            reader = reader.option("inferSchema", "true")
    if fmt == "json" and schema is None and not infer:
        # JSON always infers unless a schema is given; make the full-scan
        # cost explicit rather than silent.
        raise ValueError("json without schema requires infer=True (extra scan)")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    header: bool = True,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in any supported format.

    ``partition_by`` lays out ``col=value/`` directories (partition pruning);
    the text format requires a single string column named ``value``.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", str(header).lower())
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
