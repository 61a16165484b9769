"""Flag-dedup on the Spark 4 arbitrary-state API — the
transformWithStateInPandas twin of dedup_state.flag_duplicates: same
bucketed keying, same vectorized kernel (dedup_kernel.py), with the
bounded per-bucket seen-list in typed ValueState and the event-time
TTL as an explicit timer (re-armed at last-seen + ttl, clamped above
the watermark) instead of setTimeoutTimestamp. Gate with
tws_sessionize.tws_available(spark); RocksDB provider required."""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import dedup_kernel as dk
from .dedup_state import _BUCKET_COL, _out_schema


def tws_flag_duplicates(
    df: DataFrame,
    key: str = "sha1",
    state_timeout_ms: int = 6 * 3600 * 1000,
    n_buckets: int = 256,
    max_per_bucket: int = 4096,
) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if "is_filtered" in df.columns:
        df = df.drop("is_filtered")
    out_schema = _out_schema(df.schema)
    sort_cols = [c for c in ("ts", "conv_id", "turn_idx") if c in df.columns]

    class DedupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.blob = handle.getValueState("seen", "blob binary")

        def handleInputRows(
            self, k, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            v = self.blob.get()
            seen: list[str] = pickle.loads(v[0]) if v is not None else []
            out, seen, max_ts_ms = dk.process_bucket(
                seen, list(rows), key, sort_cols, drop_col=_BUCKET_COL
            )
            seen = dk.evict(seen, max_per_bucket)
            self.blob.update((pickle.dumps(seen, protocol=4),))
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            wm = timer_values.getCurrentWatermarkInMs()
            self.handle.registerTimer(
                max(max_ts_ms + state_timeout_ms, wm + 1000)
            )
            if out is not None:
                yield out

        def handleExpiredTimer(self, k, timer_values, expired_timer_info):
            self.blob.clear()
            return iter(())

        def close(self) -> None:
            pass

    bucketed = df.withColumn(
        _BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
    )
    return bucketed.groupBy(_BUCKET_COL).transformWithStateInPandas(
        statefulProcessor=DedupProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="eventTime",
    )
