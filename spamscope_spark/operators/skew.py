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

from . import guards


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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt skew join — the explicit form of what AQE's
    skew-join splitting does at runtime, for when the skew is KNOWN
    ahead of plan time (the reference knew: it salted its partition key
    at emit, src/bolts/tokenizer.py:102,119).

    The big side gains a deterministic salt in [0, n_salts) derived
    from `salt_source` (a data column, never RNG — replays must land
    rows identically); the small side is replicated n_salts times via
    one explode. The join then hashes on (keys..., _salt), so a hot key
    fans out over n_salts reducers instead of pinning one. Cost: the
    small side shuffles n_salts copies — use for medium dimension
    tables that are too big to broadcast but far smaller than the fact
    side; for broadcast-sized dims just broadcast (no salt needed).
    Both sides must share the join column names in `keys`.

    Only inner/left are accepted: replicate-and-salt emits each
    unmatched small-side row once per salt under right/full outer, and
    silently breaks semi/anti semantics (the small side is the
    replicated one, so existence tests see phantom copies)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replicate-and-salt cannot preserve right/full/semi/anti "
            "semantics (the replicated small side would emit each "
            "unmatched row n_salts times)"
        )
    # loud plan-time guard: n_salts copies of a NON-small side is a
    # silently amplified shuffle at scale (operators/guards.py)
    guards.check_replicated_size(small, n_salts, "salted_join small side")
    b = big.withColumn("_salt", salt_column(salt_source, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")
