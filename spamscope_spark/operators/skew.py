"""Hot-key skew handling: salted two-stage aggregation.

The reference salts its partition key with 10 random digits
(sha256 + '_' + random, src/bolts/tokenizer.py:102,119) so identical
mails don't collide. At 10^12-turn scale a hot conversation would pin
one task; we salt deterministically (no RNG — resumability) and
re-aggregate: stage 1 groups by (key, salt) — hot keys fan out over
N_SALTS tasks with map-side partial aggregation — stage 2 merges the
per-salt partials by key. AQE skew-join splitting handles the join
case; this handles keyed aggregation/state.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class SaltedAgg:
    """One aggregate expressed as (partial stage, merge stage)."""

    partial: Column  # applied in groupBy(key, salt)
    merge: Column    # applied in groupBy(key) over the partial alias
    name: str


def salted(name: str, kind: str, col: str | Column | None = None) -> SaltedAgg:
    c = F.col(col) if isinstance(col, str) else col
    if kind == "count":
        return SaltedAgg(F.count(F.lit(1)).alias(name), F.sum(name).alias(name), name)
    if kind == "sum":
        return SaltedAgg(F.sum(c).alias(name), F.sum(name).alias(name), name)
    if kind == "min":
        return SaltedAgg(F.min(c).alias(name), F.min(name).alias(name), name)
    if kind == "max":
        return SaltedAgg(F.max(c).alias(name), F.max(name).alias(name), name)
    if kind == "count_distinct_approx":
        # mergeable distinct-count via HLL-free exact two-stage: stage 1
        # collects distinct within salt; stage 2 merges sets. Bounded by
        # per-key cardinality, not per-key row count.
        return SaltedAgg(
            F.collect_set(c).alias(name),
            F.size(F.array_distinct(F.flatten(F.collect_list(name)))).alias(name),
            name,
        )
    raise ValueError(f"unsupported salted agg kind: {kind}")


def salt_column(salt_source: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of a high-cardinality
    column (e.g. turn_idx), never RNG — reruns and checkpoint resumes
    must land rows on identical salts."""
    return F.pmod(F.hash(salt_source), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    key: list[str],
    aggs: list[SaltedAgg],
    salt_source: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation by `key`."""
    src = salt_source if salt_source is not None else F.spark_partition_id()
    stage1 = (
        df.withColumn("_salt", salt_column(src, n_salts))
        .groupBy(*key, "_salt")
        .agg(*[a.partial for a in aggs])
    )
    return stage1.groupBy(*key).agg(*[a.merge for a in aggs])
