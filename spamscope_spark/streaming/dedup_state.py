"""Streaming flag-dedup with bounded keyed state.

Reference semantics (src/bolts/tokenizer.py:81-97,176-196): a bounded
LRU of seen fingerprints; a repeated text is NOT dropped — it is
flagged `is_filtered=True` so downstream skips expensive work. State is
persisted (the reference pickles deques each tick; Spark's state store
checkpoints for free).

Implementation: groupBy(fingerprint) + applyInPandasWithState. Each
group holds the seen-count; an event-time TTL (timeout at
last_seen_event_time + ttl, fired when the watermark passes) evicts
idle fingerprints — the bounded-LRU analog (the reference caps at 1e6
entries; we cap by event-time idleness, which is what an LRU
approximates, and which keeps availableNow/batch-drain runs
terminating — processing-time timeouts would keep the query alive).

Skew note: keys are fingerprints (uniform by construction — crypto
hashes), so no salting is needed here; hot *conversations* don't
concentrate because the key is content, not conv_id.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
    ]
)


def _out_schema(input_schema: StructType) -> StructType:
    return StructType(list(input_schema.fields) + [StructField("is_filtered", BooleanType())])


def flag_duplicates(
    df: DataFrame,
    key: str = "sha1",
    state_timeout_ms: int = 6 * 3600 * 1000,
) -> DataFrame:
    """Streaming DataFrame → same rows + is_filtered flag. Requires an
    upstream watermark on ts (for the event-time TTL).

    Within a microbatch, rows for one fingerprint are ordered by
    (ts, conv_id, turn_idx) and all but the first (globally) flagged —
    matching the batch with_dedup_flag ordering."""
    if "is_filtered" in df.columns:  # replace a placeholder flag column
        df = df.drop("is_filtered")
    out_schema = _out_schema(df.schema)
    sort_cols = [c for c in ("ts", "conv_id", "turn_idx") if c in df.columns]

    def fn(
        key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_seen = state.get[0] if state.exists else 0
        max_ts_ms = 0
        for pdf in pdfs:
            if sort_cols:
                pdf = pdf.sort_values(sort_cols, kind="mergesort")
            if "ts" in pdf.columns and len(pdf):
                max_ts_ms = max(
                    max_ts_ms, int(pd.Timestamp(pdf["ts"].max()).value // 1_000_000)
                )
            flags = [True] * len(pdf)
            if n_seen == 0 and len(pdf) > 0:
                flags[0] = False
            pdf = pdf.assign(is_filtered=flags)
            n_seen += len(pdf)
            yield pdf
        state.update((n_seen,))
        # event-time TTL: evict once the watermark passes last-seen + ttl
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts_ms + state_timeout_ms, wm + 1000))

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
