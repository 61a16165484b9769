"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The reference carries attachment payloads as base64 strings and decodes
them in bolts (src/modules/attachments/attachments.py:346-371 withhashes,
:277-344 metadata). Here the Spark-side plumbing — schema, batch shape,
partition-preserving mapInPandas, hashing, size/type metadata — is real
and tested; the codec step itself is STUBBED (image/audio libs are not
in this container) behind `decode_stub`, which raises
NotImplementedError unless `fake=True` produces a deterministic fake
feature vector (so the pipeline shape is testable end-to-end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("byte_size", LongType(), True),
        StructField("payload_md5", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload column + typed metadata (the
    container has no real media files; payload bytes are the utf-8 text,
    which exercises identical plumbing). base64/unbase64 mirror the
    reference's transfer encoding handling (attachments.py:353-364)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    return (
        df.withColumn("payload", payload)
        .withColumn("payload_b64", F.base64(payload))
        .withColumn("byte_size", F.length(payload).cast("long"))
        .withColumn(
            "media_type",
            F.element_at(
                F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"), F.lit("text/plain")),
                F.pmod(F.length(F.coalesce(F.col(text_col), F.lit(""))), F.lit(4)).cast("int") + 1,
            ),
        )
    )


def decode_stub(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Codec stub. Real deployments plug a decoder (PIL/librosa/ffmpeg)
    here; the container has none, so only the deterministic fake path
    is available."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test path"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(digest[:32], dtype=np.uint8).astype(np.float32) / 255.0)[:8]


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; each batch is decoded and reduced to a fixed-size
    float feature vector. Partition-preserving (no shuffle) — at 100 TB
    the cost is exactly one pass over the payload bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p if p is not None else b"", m, fake=True).tolist()
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "byte_size": pdf["byte_size"],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, schema=MEDIA_META_SCHEMA)
