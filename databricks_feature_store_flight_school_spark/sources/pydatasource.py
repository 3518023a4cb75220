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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
        """One partition per file.  Source-named files (``web.jsonl``) prune
        at FILE level under a consumed source filter; writer-produced
        ``part-*.jsonl`` files (multi-source, source stored per record)
        always survive file pruning and filter at RECORD level in read() —
        the consumed filter must be honoured somewhere."""
        files = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".jsonl")
        )
        if self._source_filters is not None:
            files = [
                f
                for f in files
                if f.startswith("part-")
                or os.path.splitext(f)[0] in self._source_filters
            ]
        return [_JsonlPartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition: _JsonlPartition) -> Iterator[tuple]:
        stem = os.path.splitext(os.path.basename(partition.path))[0]
        file_source = None if stem.startswith("part-") else stem
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                source = rec.get("source", file_source) or file_source
                if (
                    self._source_filters is not None
                    and source not in self._source_filters
                ):
                    continue
                yield (int(rec["doc_id"]), rec.get("text"), source)


@dataclass
class _JsonlCommit(WriterCommitMessage):
    tmp_path: str


class JsonlDocsWriter(DataSourceWriter):
    """Write half of the V2 surface (custom Python SINK): each task streams
    its partition into a staging ``.part-*.jsonl.tmp`` file (records carry
    the source inline), and the driver-side two-phase commit renames every
    staged file into place — or deletes them all on abort, so a failed job
    leaves no partial output visible.  ``overwrite`` clears previous
    ``*.jsonl`` at commit time, after all tasks have staged successfully."""

    def __init__(self, options: dict, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator: Iterator) -> _JsonlCommit:
        import uuid

        tmp = os.path.join(self.dir, f".part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        {
                            "doc_id": row.doc_id,
                            "text": row.text,
                            "source": row.source,
                        }
                    )
                    + "\n"
                )
                n += 1
        if n == 0:  # empty partition: nothing to commit
            os.remove(tmp)
            return _JsonlCommit(tmp_path="")
        return _JsonlCommit(tmp_path=tmp)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.dir):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.dir, f))
        for m in messages:
            if m and m.tmp_path:
                final = os.path.join(
                    self.dir,
                    os.path.basename(m.tmp_path)[1:-len(".tmp")],
                )
                os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


def _read_jsonl_file(path: str) -> Iterator[tuple]:
    stem = os.path.splitext(os.path.basename(path))[0]
    file_source = None if stem.startswith("part-") else stem
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            yield (int(rec["doc_id"]), rec.get("text"), rec.get("source", file_source))


class JsonlDocsStreamReader(SimpleDataSourceStreamReader):
    """STREAMING half of the read surface (Spark 4 Python
    ``SimpleDataSourceStreamReader``): tail the directory for new ``.jsonl``
    files; the offset is the sorted list of files already consumed, so the
    source is RESTARTABLE — ``readBetweenOffsets`` deterministically
    replays any (start, end] range from the same offsets after a crash,
    which is exactly the replayability contract structured streaming
    checkpoints rely on.  New files are discovered in sorted-name order;
    a file is the ingestion unit (append-only directories, the classic
    landing-zone shape)."""

    def __init__(self, options: dict):
        self.dir = options["path"]

    def _files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._files() if f not in seen]
        rows: list[tuple] = []
        for f in new:
            rows.extend(_read_jsonl_file(os.path.join(self.dir, f)))
        end = {"seen": sorted(seen | set(new))}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        delta = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        for f in delta:
            path = os.path.join(self.dir, f)
            if os.path.exists(path):
                yield from _read_jsonl_file(path)

    def commit(self, end: dict) -> None:
        # offsets are self-contained (file lists); nothing to clean up
        pass


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs").option("path", dir)`` /
    ``spark.readStream.format("jsonl_docs")...`` /
    ``df.write.format("jsonl_docs").option("path", dir).mode(...)`` after
    ``spark.dataSource.register(JsonlDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return JsonlDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return JsonlDocsStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        names = [f.name for f in schema.fields]
        if names != ["doc_id", "text", "source"]:
            raise ValueError(
                f"jsonl_docs writes (doc_id, text, source) frames, got {names}"
            )
        return JsonlDocsWriter(self.options, overwrite)
