"""Custom Python data source (Spark 4 DataSource V2 Python API): a JSONL
document source with one input partition per file and filter pushdown on
the ``source`` column.

Why it exists: the reference's only out-of-warehouse ingestion is a wget +
inferred CSV read (SURVEY.md §2.1 S1/S11).  The engine's equivalent for
"data that is not in a warehouse table yet" is this declarative source —
the idiomatic Spark 4 extension point, so reads stay parallel (partition
per file), schema-first (no inference pass), and prunable, instead of a
driver-side download loop.

Scale notes:
- ``partitions()`` lists files driver-side (metadata only); each executor
  task opens exactly its own file — same parallelism contract as the
  built-in file sources.
- ``pushFilters`` accepts EqualTo filters on ``source`` (derived from the
  file name) and prunes whole files BEFORE tasks launch — partition
  pruning, expressed in ~10 lines of Python.
- rows stream out per line (no whole-file materialisation).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType


SCHEMA_DDL = "doc_id bigint, text string, source string"


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options["path"]
        self._source_filters: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept EqualTo('source', v) — file-level pruning; everything else
        is returned for Spark to re-apply.

        The filter list is an AND conjunction, so successive EqualTo values
        INTERSECT: ``source='a' AND source='b'`` keeps no files (None means
        "no source constraint", distinct from the empty intersection)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source",):
                new = {f.value}
                self._source_filters = (
                    new if self._source_filters is None
                    else self._source_filters & new
                )
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".jsonl")
        )
        if self._source_filters is not None:
            files = [
                f for f in files if os.path.splitext(f)[0] in self._source_filters
            ]
        return [_JsonlPartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition: _JsonlPartition) -> Iterator[tuple]:
        source = os.path.splitext(os.path.basename(partition.path))[0]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield (int(rec["doc_id"]), rec.get("text"), source)


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir)`` after
    ``spark.dataSource.register(JsonlDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return JsonlDocsReader(self.options)
