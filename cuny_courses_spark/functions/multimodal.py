"""Multimodal-column operators (BASELINE.json extension).

Pattern: media (image/audio/video) ride Spark as opaque ``binary`` columns
with a typed metadata struct alongside; decode / feature-extract run as
Arrow-batched ``mapInPandas`` so each Python worker sees columnar batches
of blobs — the plumbing (schema, partitioning, UDF signature, batch shape)
is real and oracle-checked.

The actual image/audio codecs are NOT in this container: ``decode_image``
is an explicit stub (NotImplementedError, exercised by tests), and the
feature extractor below uses a deterministic text-derived fake so the
pipeline is verifiable end-to-end. Swapping the fake for a real decoder
changes one function body, not the plan.

Scale: blobs shouldn't ride shuffles — extract features first (project
early, keep the binary column out of wide transforms), and size partitions
by bytes (maxPartitionBytes), not rows, since blob rows are huge.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


def decode_image(data: bytes) -> "object":
    """Decode an image blob to an array. STUB: codec libraries (PIL/opencv)
    are not available in this environment; the Spark-side plumbing around
    this call is real and tested (tests assert this raises)."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this container"
    )


@register(
    "q_mm_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'utf-8' AS fmt,
       octet_length(encode(text)) = n_chars AS ascii_only
FROM documents
""",
)
def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata: documents.text encoded to a
    blob; metadata = (byte length, format tag, ascii check vs n_chars)."""
    d = load(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("long").alias("n_bytes"),
        F.lit("utf-8").alias("fmt"),
        (F.length(blob).cast("long") == F.col("n_chars")).alias("ascii_only"),
    )


@register(
    "q_mm_feature_extract",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_reduce(
           list_prepend(0::BIGINT,
               list_transform(range(1, len(text) + 1),
                              i -> ascii(text[i])::BIGINT)),
           (a, b) -> a + b) % 9973 AS BIGINT) AS checksum
FROM documents
""",
)
def q_mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary columns via mapInPandas: decode blob →
    emit (n_bytes, checksum) per row. The "decode" is the deterministic
    fake (codepoint sum mod 9973) standing in for an image/audio feature
    extractor; batches arrive as Arrow columns of bytes."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "checksum": blobs.map(
                        lambda b: sum(ord(c) for c in bytes(b).decode("utf-8"))
                        % 9973
                    ).astype("int64"),
                }
            )

    return d.mapInPandas(extract, "doc_id long, n_bytes long, checksum long")


@register(
    "q_mm_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       md5(substring(text, (i * 256 + 1)::BIGINT, 64)) AS frame_md5
FROM documents, LATERAL (
    SELECT unnest(range((n_chars - 1) // 256 + 1)) AS i
)
""",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a media column: every 256th offset yields a
    64-unit frame, fingerprinted per frame — the video/audio frame-sample
    pattern (decode stays stubbed; the slicing/fan-out plumbing is real).
    Rows multiply by ceil(len/256) per doc, so the explode is immediately
    followed by per-frame projection — nothing wide rides the fan-out.
    At scale frames inherit the document's partitioning (no shuffle)."""
    d = load(spark, sf_dir, "documents")
    exploded = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0L, (n_chars - 1) div 256), "
                "i -> md5(encode(substring(text, CAST(i * 256 + 1 AS INT), 64), 'utf-8')))"
            )
        ).alias("frame_idx", "frame_md5"),
    )
    return exploded.select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"), "frame_md5"
    )


@register(
    "q_mm_resize",
    oracle="""
SELECT doc_id,
       CAST(length(array_to_string(
           list_transform(range(1, length(text) + 1, 4), i -> text[i]), ''))
           AS BIGINT) AS out_len,
       md5(array_to_string(
           list_transform(range(1, length(text) + 1, 4), i -> text[i]), ''))
           AS out_md5
FROM documents
""",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize/downsample pattern: stride-4 subsampling of each blob
    (the 1-D analog of image downscaling — a real decoder+resampler slots
    into the same mapInPandas seam as q_mm_feature_extract; here the
    deterministic text-derived stand-in keeps it oracle-checkable). The
    output carries (new length, content digest) — the shape/fingerprint
    metadata a resize stage emits. Pure per-row narrow transform: no
    shuffle, rows in place, output strictly smaller — exactly how a
    resize stage behaves in a 100 TB media pipeline (bytes shrink early,
    before anything wide)."""
    d = load(spark, sf_dir, "documents")
    down = F.expr(
        "concat_ws('', transform(sequence(1, length(text), 4), "
        "i -> substring(text, i, 1)))"
    )
    return d.select(
        "doc_id",
        F.length(down).cast("long").alias("out_len"),
        F.md5(F.encode(down, "utf-8")).alias("out_md5"),
    )
