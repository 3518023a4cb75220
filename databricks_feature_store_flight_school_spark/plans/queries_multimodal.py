"""Multimodal-column queries (SURVEY.md §2.12 extensions): binary payload
plumbing over the ``documents`` table.

The testdata ships no real media files, so payloads are derived
deterministically (``encode(text, 'UTF-8')``) — which makes the *plumbing*
(BinaryType columns, typed metadata structs, Arrow-batched ``mapInPandas``
decode / frame-sample) fully oracle-checkable: the decode stub in
multimodal/binary.py computes metadata as pure functions of the byte stream,
so DuckDB can replicate them in SQL.  Only the byte-histogram feature
extraction is rows-only (per-byte loops are not reasonably SQL-expressible).

Scale notes: every operator here is a narrow map over the blob column — no
shuffle touches binary data; the one groupBy (frame stats) aggregates only
(doc_id, int) pairs after the blobs are reduced worker-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..multimodal import binary as M
from ..sources import load_table
from .catalog import register


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a BinaryType payload column (UTF-8 bytes of the text —
    stands in for an image/audio blob; byte-exact in both engines)."""
    return load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )


@register(
    "q_media_meta",
    """
    SELECT doc_id,
           'image' AS media_type,
           octet_length(encode(text)) AS byte_size,
           sha256(text) AS checksum
    FROM documents
    """,
    "multimodal", "binary",
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata struct over a binary column — computed entirely
    JVM-side (octet_length + sha2), then flattened for the oracle compare."""
    df = M.attach_media_meta(_with_payload(spark, sf_dir), "payload", "image")
    return df.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.byte_size").alias("byte_size"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@register(
    "q_image_decode",
    """
    SELECT doc_id,
           16 + octet_length(encode(text)) % 64 AS width,
           16 + (octet_length(encode(text)) // 64) % 64 AS height,
           CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'RGB' ELSE 'L' END AS mode,
           octet_length(encode(text)) AS byte_size
    FROM documents
    """,
    "multimodal", "mapInPandas",
)
def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (multimodal/binary.py stub): the
    oracle replays the stub's byte-length math in SQL, pinning the full
    JVM->Python->JVM round trip — schema, batch shape, and values."""
    return M.decode_image_batch(_with_payload(spark, sf_dir), "doc_id", "payload")


@register(
    "q_frame_sample_stats",
    """
    SELECT doc_id,
           ((greatest(octet_length(encode(text)) // 1024, 1) + 3) // 4)::BIGINT AS frames_kept,
           list_sum(list_transform(
               generate_series(0, greatest(octet_length(encode(text)) // 1024, 1) - 1, 4),
               i -> least(1024, octet_length(encode(text)) - i * 1024)
           ))::BIGINT AS frame_bytes_total
    FROM documents
    """,
    "multimodal", "mapInPandas",
)
def q_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame_sample (video-ish keyframe stub: 1 KiB frames, stride 4) then a
    per-doc aggregate — blobs are reduced to ints before the only shuffle."""
    frames = M.frame_sample(
        _with_payload(spark, sf_dir), "doc_id", "payload", frame_size=1024, stride=4
    )
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("frames_kept"),
        F.sum(F.octet_length("frame_bytes")).alias("frame_bytes_total"),
    )


@register(
    "q_media_features",
    # The byte-histogram featurizer replayed in SQL (round 10, upgraded
    # from rows-only): payload bytes == ascii(char) because documents text
    # is pure ASCII (same precondition q_media_resize documents), each byte
    # lands in exactly one of the 16 dims so the normalizing total is just
    # length(text), and printf('%.6f') and Python's f'{v:.6f}' both emit
    # the correctly-rounded decimal of the SAME double n/len — identical
    # strings.  Missing dims densify through the range(0,16) cross join.
    """
    WITH pos AS (
      SELECT d.doc_id,
             unnest(list_transform(range(1, length(d.text) + 1),
                                   i -> ascii(substr(d.text, i::INT, 1)) % 16)) AS dim
      FROM documents d
    ),
    h AS (
      SELECT doc_id, dim, count(*) AS n FROM pos GROUP BY doc_id, dim
    )
    SELECT d.doc_id,
      string_agg(printf('%.6f', coalesce(h.n, 0) / greatest(length(d.text), 1)),
                 ',' ORDER BY g.dim) AS feature
    FROM documents d
    CROSS JOIN (SELECT unnest(range(0, 16)) AS dim) g
    LEFT JOIN h ON h.doc_id = d.doc_id AND h.dim = g.dim
    GROUP BY d.doc_id
    """,
    "multimodal", "mapInPandas",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stub (byte histogram standing in for a CNN/audio
    embedding forward pass): one FEATURE_DIM vector per blob via mapInPandas.
    Value-matched against a SQL replay of the histogram (the oracle string
    above); the Arrow twin's byte-exact parity stays pinned in
    tests/test_multimodal_streaming.py."""
    return M.extract_features(_with_payload(spark, sf_dir), "doc_id", "payload")


@register(
    "q_media_resize",
    """
    SELECT doc_id,
           8 AS out_width,
           6 AS out_height,
           CAST(48 AS BIGINT) AS byte_size,
           md5(array_to_string(
               list_transform(range(0, 48),
                   i -> substr(text, (i * length(text)) // 48 + 1, 1)),
               '')) AS resized_md5
    FROM documents
    """,
    "multimodal", "mapInPandas",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage (multimodal/binary.resize_images, 8x6 stub resample)
    through mapInPandas, digest-compared: the oracle replays the stub's
    evenly-spaced byte sample in SQL over the same payload (documents text
    is pure ASCII, so byte i == substr(text, i+1, 1)) and md5s the result —
    pinning the resized BYTES, not just the shape.  The pil codec swaps in
    for real media with the same plumbing."""
    resized = M.resize_images(
        _with_payload(spark, sf_dir), "doc_id", "payload", width=8, height=6
    )
    return resized.select(
        "doc_id",
        "out_width",
        "out_height",
        "byte_size",
        F.md5("resized").alias("resized_md5"),
    )
