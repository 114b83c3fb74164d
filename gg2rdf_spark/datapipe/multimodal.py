"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; the
Spark-side plumbing (schemas, Arrow batch shapes, partition-friendly
frame explosion) is real and tested; the actual codec work is stubbed
behind :func:`_decode_stub` because no media libraries ship in this
environment — swap in PIL/ffmpeg by replacing that one function.

* :func:`attach_fake_media` — deterministic synthetic media bytes per
  row (md5-chain), used by tests and the driver oracle (the byte
  derivation is mirrorable in SQL: md5 hex chains).
* :func:`media_metadata` — size/checksum/declared-kind metadata,
  pure built-in exprs.
* :func:`sample_frames` — ``mapInPandas`` frame sampler: explodes each
  video blob into every ``stride``-th fixed-size frame slice with a
  per-frame checksum; the real decode would replace the slicing, the
  batch shape (one input row → many output rows, Arrow-chunked) is the
  production shape.
* :func:`extract_features` — Pandas-UDF feature extractor returning a
  fixed-dim float vector per blob (deterministic stand-in for an
  image encoder; byte-histogram features, vectorized numpy).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

FRAME_BYTES = 16


def attach_fake_media(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", blocks: int = 8) -> DataFrame:
    """Deterministic pseudo-media: an md5 chain over the text, giving
    ``blocks``×16 bytes of 'video'.  unhex(md5 ∘ md5 ∘ …) — portable."""
    chain = F.md5(F.col(text_col))
    parts = [chain]
    for _ in range(blocks - 1):
        chain = F.md5(chain)
        parts.append(chain)
    return docs.select(
        F.col(id_col).alias("id"),
        F.unhex(F.concat(*parts)).alias("media"),
        F.lit("video/fake").alias("media_type"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    return media.select(
        "id", "media_type",
        F.length("media").alias("n_bytes"),
        F.md5(F.hex("media")).alias("checksum"),
        (F.length("media") / FRAME_BYTES).cast("int").alias("n_frames"),
    )


FRAME_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_checksum", StringType()),
])


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Every ``stride``-th FRAME_BYTES slice → one output row.
    Replace the slice+checksum with a real decoder for production."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for id_, blob in zip(pdf["id"], pdf["media"]):
                b = bytes(blob)
                for fi in range(0, len(b) // FRAME_BYTES, stride):
                    frame = b[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES]
                    rows.append(
                        (int(id_), fi,
                         hashlib.md5(frame.hex().encode()).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "frame_checksum"]
            )

    return media.select("id", "media").mapInPandas(gen, FRAME_SCHEMA)


FEAT_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Byte-histogram 'encoder' (vectorized numpy per Arrow batch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                v = hist.astype(np.float32)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).tolist())
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return media.select("id", "media").mapInPandas(gen, FEAT_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode is unavailable in this environment."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not shipped in this container; "
        "the Spark plumbing path is sample_frames/extract_features"
    )
