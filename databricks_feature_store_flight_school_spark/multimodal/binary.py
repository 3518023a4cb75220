"""Multimodal (image/audio/video) column plumbing — SURVEY.md §2.12.

Media travel as opaque ``binary`` columns with a typed metadata struct; the
decode / feature-extract / frame-sample stages are Arrow-batched
``mapInPandas`` operators so each Python worker touches whole record batches,
never rows.

The actual codec step is STUBBED (this container ships no image/audio
libraries): if PIL/soundfile were importable the real decoders would slot in
where ``_decode_stub`` sits; instead a clearly-marked deterministic fake
derives metadata from the byte stream, keeping every Spark-side contract —
schema, partitioning, UDF signature, Arrow batch shape — real and tested.

Scale notes: binary payloads never pass through a shuffle here (all three
operators are narrow maps); pair with
``spark.sql.files.maxPartitionBytes`` sizing so a partition of blobs fits the
worker's memory, and keep metadata-only branches (filters on the struct) in
separate small columns so scans can prune the blob column entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder, absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

#: typed metadata carried alongside every media blob
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("byte_size", LongType()),
        StructField("checksum", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("byte_size", LongType()),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", StringType()),  # csv of FEATURE_DIM floats
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """``binaryFile`` source: path, modificationTime, length, content.
    The S11-analog ingest for media directories."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Add the typed metadata struct (computed JVM-side: no Python)."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(b).cast("long").alias("byte_size"),
            F.sha2(b, 256).alias("checksum"),
        ),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic FAKE image decode (no codec libs in the container).

    Derives (width, height, mode) purely from byte content so tests and the
    oracle gate are reproducible regardless of environment.  The real codec
    is :func:`_decode_pil` (selected via ``codec='pil'``/``'auto'``)."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mode = "RGB" if n % 2 == 0 else "L"
    return width, height, mode


def _decode_pil(payload: bytes) -> tuple[int, int, str]:
    """Real image decode via PIL (env-gated: the harness container ships no
    codec libraries, so this path is exercised by the skipif-armed parity
    test in tests/test_multimodal_streaming.py when PIL appears)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, im.mode


def decode_image_batch(
    df: DataFrame, id_col: str, binary_col: str, codec: str = "stub"
) -> DataFrame:
    """mapInPandas decode: binary column -> (width, height, mode, byte_size).

    Arrow batches cross the JVM->Python boundary once per batch; the worker
    loops the batch in C-speed pandas ops where possible.

    ``codec``: ``'stub'`` (default — deterministic fake, any byte payload,
    what the oracle-checked catalog queries pin), ``'pil'`` (real decode of
    actual image bytes; requires PIL), or ``'auto'`` (pil when importable,
    stub otherwise)."""
    if codec == "auto":
        codec = "pil" if _HAVE_PIL else "stub"
    if codec not in ("stub", "pil"):
        raise ValueError(f"unknown codec {codec!r}: use 'stub', 'pil', or 'auto'")
    if codec == "pil" and not _HAVE_PIL:
        raise RuntimeError("codec='pil' but PIL is not installed")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = pdf[binary_col].map(len).astype("int64")
            if codec == "pil":
                decoded = [_decode_pil(b) for b in pdf[binary_col]]
                w = pd.Series([d[0] for d in decoded], dtype="int32", index=pdf.index)
                h = pd.Series([d[1] for d in decoded], dtype="int32", index=pdf.index)
                mode = [d[2] for d in decoded]
            else:
                # the stub derives everything from byte length -> vectorize
                # the whole Arrow batch instead of looping Python per row
                # (same values as _decode_stub, ~4x less worker time)
                w = (16 + n % 64).astype("int32")
                h = (16 + (n // 64) % 64).astype("int32")
                mode = np.where(n % 2 == 0, "RGB", "L")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": w,
                    "height": h,
                    "mode": mode,
                    "byte_size": n,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode, DECODED_SCHEMA)


def extract_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """mapInPandas feature extraction stub: FEATURE_DIM floats per blob,
    derived deterministically from byte histograms (stands in for a CNN/
    audio-embedding forward pass; the Spark plumbing is identical)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # one histogram pass for the WHOLE Arrow batch: concatenate the
            # blobs, bincount (row_index * DIM + byte % DIM) — same values as
            # the per-row loop, no per-row numpy dispatch overhead
            lens = pdf[binary_col].map(len).to_numpy(dtype="int64")
            rows = len(lens)
            if rows and lens.sum():
                all_bytes = np.frombuffer(b"".join(pdf[binary_col]), dtype=np.uint8)
                row_idx = np.repeat(np.arange(rows), lens)
                flat = row_idx * FEATURE_DIM + (all_bytes % FEATURE_DIM)
                hist = np.bincount(flat, minlength=rows * FEATURE_DIM).reshape(
                    rows, FEATURE_DIM
                )
            else:  # pragma: no cover - empty batch / all-empty blobs
                hist = np.zeros((rows, FEATURE_DIM), dtype="int64")
            totals = np.maximum(hist.sum(axis=1), 1)
            feats = [
                ",".join(f"{v / t:.6f}" for v in h) for h, t in zip(hist, totals)
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.select(id_col, binary_col).mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, id_col: str, binary_col: str, frame_size: int = 1024, stride: int = 4
) -> DataFrame:
    """Frame sampling stub for video-ish payloads: split the byte stream into
    ``frame_size`` chunks, keep every ``stride``-th (a real sampler seeks
    keyframes; the fan-out/explode shape is the same)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[binary_col]):
                n_frames = max(1, len(b) // frame_size)
                for i in range(0, n_frames, stride):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_size: (i + 1) * frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": frames,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(sample, FRAME_SCHEMA)


def extract_features_arrow(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """mapInArrow twin of :func:`extract_features`: the batch arrives as a
    pyarrow RecordBatch and the result returns as one — no pandas object
    boxing on either side of the Python worker.

    For binary-heavy columns this is the leanest Python crossing Spark
    offers: pyarrow's binary buffers expose the raw bytes + offsets
    directly, so the whole batch histogram runs off two zero-copy numpy
    views (values, offsets) instead of a Python-object bytes column.
    Value parity with the mapInPandas form is pinned in
    tests/test_multimodal_streaming.py.
    """
    import pyarrow as pa

    def featurize(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np

        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            blobs = batch.column(batch.schema.get_field_index(binary_col))
            combined = blobs.combine_chunks() if hasattr(blobs, "combine_chunks") else blobs
            # the zero-copy reads below hard-code binary() layout (int32
            # offsets at buffers()[1]); a large_binary column (int64 offsets)
            # would silently misread — fail loudly on layout drift instead
            if combined.type != pa.binary():
                raise TypeError(
                    f"extract_features_arrow expects a binary column, got "
                    f"{combined.type}; cast large_binary down or extend the "
                    f"offset handling"
                )
            rows = len(combined)
            off_buf = combined.buffers()[1]
            if off_buf is None:  # empty / all-null batch ships no offsets
                lens = np.zeros(rows, dtype=np.int64)
                values = np.empty(0, dtype=np.uint8)
            else:
                # zero-copy views straight off the Arrow buffers: [validity,
                # offsets(int32), data]; combined.offset accounts for slices
                raw_off = np.frombuffer(off_buf, dtype=np.int32)
                start = combined.offset
                offsets = raw_off[start : start + rows + 1].astype(np.int64)
                data_buf = combined.buffers()[2]
                values = (
                    np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
                    if data_buf is not None
                    else np.empty(0, dtype=np.uint8)
                )
                lens = np.diff(offsets)
            if rows and lens.sum():
                row_idx = np.repeat(np.arange(rows), lens)
                flat = row_idx * FEATURE_DIM + (values % FEATURE_DIM)
                hist = np.bincount(flat, minlength=rows * FEATURE_DIM).reshape(
                    rows, FEATURE_DIM
                )
            else:  # pragma: no cover - empty batch / all-empty blobs
                hist = np.zeros((rows, FEATURE_DIM), dtype="int64")
            totals = np.maximum(hist.sum(axis=1), 1)
            feats = [
                ",".join(f"{v / t:.6f}" for v in h) for h, t in zip(hist, totals)
            ]
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(feats, type=pa.string())],
                names=["doc_id", "feature"],
            )

    return df.select(id_col, binary_col).mapInArrow(featurize, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("resized", BinaryType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("byte_size", LongType()),
    ]
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic FAKE resize: sample the byte stream down (or repeat it
    up) to exactly ``width*height`` bytes — the real op is _resize_pil; the
    stub keeps schema/batching/determinism testable without codec libs."""
    target = max(1, width * height)
    n = len(payload)
    if n == 0:
        return b"\x00" * target
    # evenly-spaced index sample (floor(i * n / target)) — deterministic,
    # monotone, works for both down- and up-sizing
    return bytes(payload[(i * n) // target] for i in range(target))


def _resize_pil(payload: bytes, width: int, height: int) -> bytes:
    """Real resize via PIL (env-gated like _decode_pil): decode, LANCZOS
    resample, re-encode PNG."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        out = im.resize((width, height), Image.LANCZOS)
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int,
    height: int,
    codec: str = "stub",
) -> DataFrame:
    """mapInPandas resize: binary -> resized binary + output dims (the
    preprocessing step before a vision encoder; SURVEY.md §2.12 multimodal).

    Same codec contract as :func:`decode_image_batch`: ``'stub'`` (default,
    deterministic byte resample — what tests pin), ``'pil'`` (real LANCZOS
    resample + PNG re-encode), ``'auto'``.  Narrow map — blobs never cross
    a shuffle; output row count == input row count."""
    if codec == "auto":
        codec = "pil" if _HAVE_PIL else "stub"
    if codec not in ("stub", "pil"):
        raise ValueError(f"unknown codec {codec!r}: use 'stub', 'pil', or 'auto'")
    if codec == "pil" and not _HAVE_PIL:
        raise RuntimeError("codec='pil' but PIL is not installed")
    resize = _resize_pil if codec == "pil" else _resize_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize(b, width, height) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "resized": out,
                    "out_width": pd.Series([width] * len(out), dtype="int32"),
                    "out_height": pd.Series([height] * len(out), dtype="int32"),
                    "byte_size": pd.Series([len(b) for b in out], dtype="int64"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, RESIZED_SCHEMA)
