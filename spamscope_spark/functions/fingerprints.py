"""Fingerprints: cryptographic hashes (JVM built-ins) + a deterministic
ssdeep-like fuzzy hash (the one genuinely-custom kernel, as an Arrow
pandas_udf).

Reference: md5/sha1/sha256/sha512/ssdeep at
src/modules/attachments/utils.py:44-86. Exact ssdeep parity needs
libfuzzy; we implement a deterministic content-defined-chunking shingle
signature with the same *role* (near-duplicate detection) — an
intentional, documented deviation (SURVEY.md §7 risk 4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_POLY = np.uint64(1000003)
_WINDOW = 7
_TARGET_CHUNKS = 48


def with_fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    """Add md5/sha1/sha256/sha512 columns — all JVM built-ins, zero Python."""
    c = F.coalesce(F.col(col), F.lit(""))
    return (
        df.withColumn("md5", F.md5(c))
        .withColumn("sha1", F.sha1(c))
        .withColumn("sha256", F.sha2(c, 256))
        .withColumn("sha512", F.sha2(c, 512))
    )


def shingle_signature_py(text: str) -> str:
    """Deterministic fuzzy-hash: content-defined chunking via a rolling
    polynomial hash; one base64 char per chunk (chunk-content hash).

    Properties: identical text → identical signature; a local edit
    changes O(1) chars of the signature (chunk boundaries are content
    defined, so unedited regions re-synchronize) — which is exactly the
    near-dup-detection contract of ssdeep."""
    if not text:
        return ""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    # Adaptive block modulus so signatures stay ~TARGET_CHUNKS chars.
    mod = 8
    while n // mod > _TARGET_CHUNKS and mod < (1 << 30):
        mod *= 2

    # Rolling hash over a WINDOW-byte window, vectorized.
    if n < _WINDOW:
        h = hashlib.md5(text.encode("utf-8")).digest()
        return _B64[h[0] % 64]
    weights = _POLY ** np.arange(_WINDOW, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, _WINDOW)
    roll = (windows * weights).sum(axis=1)  # uint64 wrap-around is fine
    anchors = np.nonzero((roll % np.uint64(mod)) == np.uint64(mod - 1))[0]

    sig = []
    prev = 0
    for a in anchors:
        end = int(a) + _WINDOW
        chunk = text.encode("utf-8")[prev:end]
        sig.append(_B64[hashlib.md5(chunk).digest()[0] % 64])
        prev = end
        if len(sig) >= 2 * _TARGET_CHUNKS:
            break
    tail = text.encode("utf-8")[prev:]
    if tail:
        sig.append(_B64[hashlib.md5(tail).digest()[0] % 64])
    return "".join(sig)


@pandas_udf(StringType())
def shingle_signature_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched fuzzy-hash udf (the only Python in the enrich path)."""
    return texts.fillna("").map(shingle_signature_py)


def shingle_similarity_py(a: str, b: str) -> float:
    """Jaccard over signature 2-grams in [0,1] — near-dup score."""
    if not a or not b:
        return 0.0
    ga = {a[i : i + 2] for i in range(max(1, len(a) - 1))}
    gb = {b[i : i + 2] for i in range(max(1, len(b) - 1))}
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


def shingle_similarity(a: Column, b: Column) -> Column:
    """Column form of signature similarity: Jaccard over 2-gram sets,
    computed JVM-side with higher-order functions (no Python)."""

    def grams(c: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(c) - 1, F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(2))))

    ga, gb = grams(a), grams(b)
    inter = F.size(F.array_intersect(ga, gb))
    union = F.size(F.array_union(ga, gb))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
