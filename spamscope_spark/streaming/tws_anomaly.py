"""Burst (rate z-score) monitor on the Spark 4 arbitrary-state API —
the transformWithStateInPandas twin of pipeline.start_anomaly_query.
Per-key state is the trailing `lookback` observed (window, count)
pairs plus the last scored window — bounded and O(arrived) per batch,
where the foreachBatch fold re-reads the full count history each epoch
(fine at count-table scale, but it grows with stream lifetime; this
form does not). Scoring math shared via anomaly_kernel (mirrors
operators/cep.py::score_rate_windows — parity pinned in
TestTwsAnomaly).

No timers: emission is driven by upstream-closed count rows arriving
(the silence monitor owns the no-rows case). Gate with
tws_sessionize.tws_available(spark).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField,
    StructType, TimestampType,
)

from . import anomaly_kernel as ank

ANOMALY_OUT_SCHEMA = StructType([
    StructField("window_start", TimestampType()),
    StructField("key", StringType()),
    StructField("n", LongType()),
    StructField("n_prev", LongType()),
    StructField("mean_prev", DoubleType()),
    StructField("z_e4", LongType()),
    StructField("is_anomaly", BooleanType()),
])


def tws_anomaly(
    cnt: DataFrame,
    key: str = "role",
    lookback: int = 6,
    min_history: int = 4,
    z_threshold: float = 2.0,
) -> DataFrame:
    """``cnt`` is the watermarked append-mode tumbling count stream
    (window_start, key, n). Output follows ANOMALY_OUT_SCHEMA (key
    column named 'key'; callers rename)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AnomalyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.blob = handle.getValueState("burst", "blob binary")

        def handleInputRows(
            self, k, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            v = self.blob.get()
            st = pickle.loads(v[0]) if v is not None else ank.new_state()
            arrived: dict[int, int] = {}
            for pdf in rows:
                for w, n in zip(pdf["window_start"], pdf["n"]):
                    arrived[int(pd.Timestamp(w).value // 1000)] = int(n)
            out, st = ank.score_and_push(
                st, arrived, lookback, min_history, z_threshold
            )
            self.blob.update((pickle.dumps(st, protocol=4),))
            if out:
                yield pd.DataFrame(
                    {
                        "window_start": [
                            pd.Timestamp(w, unit="us") for w, *_ in out
                        ],
                        "key": k[0],
                        "n": [r[1] for r in out],
                        "n_prev": [r[2] for r in out],
                        "mean_prev": [r[3] for r in out],
                        "z_e4": [r[4] for r in out],
                        "is_anomaly": [r[5] for r in out],
                    }
                )

        def handleExpiredTimer(self, k, timer_values, expired_timer_info):
            return iter(())

        def close(self) -> None:
            pass

    keyed = cnt.select(
        "window_start", F.col(key).alias("key"), "n"
    ).groupBy("key")
    return keyed.transformWithStateInPandas(
        statefulProcessor=AnomalyProcessor(),
        outputStructType=ANOMALY_OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
