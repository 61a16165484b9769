"""Sessionizer on the Spark 4 arbitrary-state API
(`transformWithStateInPandas` + RocksDB state store) — the same
session state machine as pipeline.stateful_sessionize (shared kernel,
session_kernel.py), re-plumbed onto the current API:

- typed ValueState (binary blob per bucket) instead of a GroupState
  tuple;
- explicit event-time timers (`handle.registerTimer`) instead of
  `setTimeoutTimestamp` — re-armed at min(open session end) + gap;
- RocksDB state store (required by transformWithState): changelog-
  checkpointed, spills to disk — at 10^12-turn scale the live-session
  state exceeds executor heap, which is exactly what RocksDB state
  solves and the HDFS-backed store does not.

Kept alongside (not replacing) the applyInPandasWithState path: the
parity test pins both to identical output, and the older API remains
the fallback where transformWithState / RocksDB is unavailable.
Gate with `tws_available(spark)`.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import session_kernel as sk
from .pipeline import _SESS_BUCKET_COL, SESSION_OUT_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available(spark: SparkSession) -> bool:
    """True iff this Spark build has transformWithStateInPandas, the
    RocksDB state store provider on the JVM classpath, AND a working
    google.protobuf (the Python↔JVM state-request protocol of
    transformWithState is protobuf-encoded; this sandbox ships pyspark
    without it, so here the applyInPandasWithState path runs instead —
    same kernel, parity-tested wherever TWS is available)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # noqa: SLF001
            ROCKSDB_PROVIDER
        )
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except Exception:
        return False


def tws_sessionize(
    df: DataFrame, gap_s: int = 30 * 60, n_buckets: int = 256
) -> DataFrame:
    """transformWithStateInPandas form of stateful_sessionize — same
    bucketed keying, same kernel, same SESSION_OUT_SCHEMA rows. The
    caller's session must set
    spark.sql.streaming.stateStore.providerClass = ROCKSDB_PROVIDER
    (transformWithState requires RocksDB)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    needed = [
        "conv_id", "turn_idx", "ts", "role", "tool",
        "phishing_score", "sha1", "shingle_sig",
    ]
    df = df.select(*[c for c in needed if c in df.columns])
    gap_us = gap_s * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.blob = handle.getValueState("sessions", "blob binary")

        def _load(self) -> dict:
            v = self.blob.get()
            return pickle.loads(v[0]) if v is not None else {}

        def _store(self, states: dict, timer_values) -> None:
            """Persist state + re-arm the bucket's single event-time
            timer at min(open session end) + gap (clamped above the
            watermark — timers at/below it would never fire)."""
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            if not states:
                self.blob.clear()
                return
            self.blob.update((pickle.dumps(states, protocol=4),))
            wm = timer_values.getCurrentWatermarkInMs()
            self.handle.registerTimer(
                max((sk.min_end_us(states) + gap_us) // 1000, wm + 1000)
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            states = self._load()
            chunks = [p for p in rows if len(p)]
            closed: list[dict] = []
            if chunks:
                pdf = (
                    chunks[0]
                    if len(chunks) == 1
                    else pd.concat(chunks, ignore_index=True)
                )
                closed = sk.apply_rows(states, pdf, gap_us)
            self._store(states, timer_values)
            if closed:
                yield pd.DataFrame(closed)

        def handleExpiredTimer(
            self, key, timer_values, expired_timer_info
        ) -> Iterator[pd.DataFrame]:
            states = self._load()
            if not states:
                return
            wm_us = timer_values.getCurrentWatermarkInMs() * 1000
            closed, remaining = sk.close_expired(states, wm_us, gap_us)
            self._store(remaining, timer_values)
            if closed:
                yield pd.DataFrame(closed)

        def close(self) -> None:
            pass

    bucketed = df.withColumn(
        _SESS_BUCKET_COL, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets))
    )
    return bucketed.groupBy(_SESS_BUCKET_COL).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
