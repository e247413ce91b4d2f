"""Multimodal column plumbing — image/audio/video as opaque ``binary``.

Design: a multimodal table carries ``content: binary`` plus typed metadata
(``mime_type``, ``byte_len``, per-modality structs). Heavy per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` stages so the Python cost is amortized per batch, never per
row, and each partition streams — no driver materialization.

The actual codec step is STUBBED (no image/audio libs in this container):
``decode_image_meta`` is a deterministic fake deriving plausible metadata
from the bytes; ``decode_image_real`` raises NotImplementedError and marks
where Pillow/torchaudio/pyav would slot in. The Spark-side plumbing —
schema, batch iteration, partition flow — is real and tested.

Scale notes: binary columns make parquet row groups huge; keep
``spark.sql.files.maxPartitionBytes`` moderate and store blobs in their own
column chunk (parquet does). Repartition by a size-aware key before heavy
decode stages so one task doesn't get all the 4K videos.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sha256", StringType()),
    ]
)


def with_binary_content(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test adapter: treat a text column's UTF-8 bytes as the opaque blob
    (the container ships no real media). Real ingestion reads
    ``spark.read.format("binaryFile")`` → (path, modificationTime, length,
    content)."""
    return df.withColumn("content", F.col(text_col).cast("binary")).withColumn(
        "byte_len", F.octet_length(F.col(text_col)).cast("long")
    )


def decode_image_real(content: bytes) -> dict:
    """Where a real decoder goes (Pillow: ``Image.open(io.BytesIO(content))``).
    Not available in this container."""
    raise NotImplementedError("image codec libraries are not installed in this environment")


def fake_image_meta(doc_id: int, content: bytes) -> dict:
    """Deterministic fake decode: metadata derived purely from the bytes, so
    tests and oracles can reproduce it (width = len % 640 + 1, etc.)."""
    import hashlib

    n = len(content)
    return {
        "doc_id": doc_id,
        "byte_len": n,
        "format": "fake/raw",
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "sha256": hashlib.sha256(content).hexdigest(),
    }


def decode_images(df: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (id, content) →
    IMAGE_META_SCHEMA. Swap ``fake_image_meta`` for a real decoder when the
    codec libs exist; the plumbing (batch shape, schema, partition streaming)
    is the production path."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                fake_image_meta(int(i), bytes(c) if c is not None else b"")
                for i, c in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(out)

    narrow = df.select(id_col, content_col)
    # decode is CPU-bound per item: fan a small input out across cores
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(_decode, IMAGE_META_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling contract: one output row per sampled frame.
    Stubbed as a pure-metadata expansion (frame index sequence from
    byte_len) to exercise the explode-shaped plumbing."""
    n_frames = (F.col("byte_len") / F.lit(1000) + 1).cast("long")
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))),
    )
