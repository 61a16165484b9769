"""The streaming CEP pipeline — the reference topology recast
(SURVEY.md §7 target pipeline):

  turns parquet/Iceberg stream
    → per-turn enrichment (URLs, keywords, bitmap score, fingerprints,
      shingle signature) — all vectorized, no per-row Python
    → watermark(ts)
    → stateful flag-dedup on content fingerprint (bounded keyed state)
    → session windows per conv_id (built-in session_window aggregate
      AND a custom applyInPandasWithState sessionizer with event-time
      timeout — the reference's greedy buffers, bounded properly)
    → stream-stream join: tool-invocation ⋈ tool-response under
      watermark + time band (dialect analog)
    → foreachBatch exactly-once sink (epoch-atomic parquet MERGE on
      (conv_id, turn_idx)), JSON-per-turn rows, per-partition lineage

Every query checkpoints; a restart resumes from offsets + state.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..datagen import SUBJECT_KEYS, TARGET_KEYS, WHITELIST_DOMAINS
from ..operators.enrich import enrich_turns
from ..schema import TURNS_SCHEMA
from .dedup_state import flag_duplicates
from .sink import IdempotentSink


@dataclass
class PipelineConfig:
    input_path: str
    work_dir: str
    gap_s: int = 30 * 60
    watermark: str = "4 hours"
    band_s: int = 600
    window_s: int = 600
    dedup_state_timeout_ms: int = 6 * 3600 * 1000
    max_files_per_trigger: int | None = None
    target_keys: dict = field(default_factory=lambda: dict(TARGET_KEYS))
    subject_keys: list = field(default_factory=lambda: list(SUBJECT_KEYS))
    whitelist: list = field(default_factory=lambda: list(WHITELIST_DOMAINS))

    def checkpoint(self, name: str) -> str:
        return os.path.join(self.work_dir, "checkpoints", name)

    def output(self, name: str) -> str:
        return os.path.join(self.work_dir, "out", name)


def read_turns_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """File-source stream over the turns table. Source offset tracking +
    checkpoint subsume the reference's `.processing` rename/lease claim
    protocol (files_mails.py:109-145); maxFilesPerTrigger is the
    backpressure knob (max.spout.pending analog)."""
    from ..config import ensure_py_files

    ensure_py_files(spark)
    reader = spark.readStream.schema(TURNS_SCHEMA)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    return reader.parquet(cfg.input_path)


def enriched_stream(
    spark: SparkSession, cfg: PipelineConfig, dedup_flag: bool = True
) -> DataFrame:
    """Enrichment + watermark (+ stateful dedup flag) + lineage columns.

    dedup_flag=False for consumers that add their own stateful operator
    (Structured Streaming does not support chaining two
    applyInPandasWithState ops in one query)."""
    turns = read_turns_stream(spark, cfg)
    enriched = enrich_turns(
        turns,
        target_keys=cfg.target_keys,
        subject_keys=cfg.subject_keys,
        whitelist=cfg.whitelist,
        dedup_flag=False,  # batch window-rank is illegal on streams
    )
    enriched = enriched.withWatermark("ts", cfg.watermark)
    if dedup_flag:
        enriched = flag_duplicates(
            enriched, key="sha1", state_timeout_ms=cfg.dedup_state_timeout_ms
        )
    return enriched.withColumn("_lineage_partition", F.spark_partition_id())


def with_json_row(df: DataFrame) -> DataFrame:
    """Canonical JSON-per-turn serialization (json_maker analog,
    src/bolts/json_maker.py:33-75): deterministic column order, so the
    golden-output comparison is plain text equality."""
    cols = [c for c in df.columns if not c.startswith("_")]
    return df.withColumn("json", F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])))


# ---------------------------------------------------------------------------
# custom stateful sessionizer (applyInPandasWithState, event-time timeout)
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_seq", LongType()),
        StructField("session_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_turns", LongType()),
        StructField("n_user", LongType()),
        StructField("n_assistant", LongType()),
        StructField("n_tool", LongType()),
        StructField("n_system", LongType()),
        StructField("n_tool_calls", LongType()),
        StructField("max_phishing_score", IntegerType()),
        StructField("n_duplicate_turns", LongType()),
        StructField("n_neardup_turns", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_turns", LongType()),
        StructField("n_user", LongType()),
        StructField("n_assistant", LongType()),
        StructField("n_tool", LongType()),
        StructField("n_system", LongType()),
        StructField("n_tool_calls", LongType()),
        StructField("max_phishing_score", LongType()),
        StructField("n_duplicate_turns", LongType()),
        StructField("n_neardup_turns", LongType()),
        StructField("seen_hashes", ArrayType(StringType())),
        StructField("recent_sigs", ArrayType(StringType())),
    ]
)

_MAX_SEEN = 512      # bounded dedup state per session (LRU analog of the
_MAX_SIGS = 8        # reference's maxlen deques, spamscope.example.yml:119-135)
_NEARDUP_SIM = 0.8


def stateful_sessionize(df: DataFrame, gap_s: int = 30 * 60) -> DataFrame:
    """Per-conv_id session windows with a gap timeout, held in keyed
    state and closed by event-time timeout when the watermark passes
    session_end + gap — the bounded version of the reference's
    wait-forever greedy buffers (json_maker.py:82-88).

    Per-session state also carries a bounded seen-fingerprint set
    (exact within-conversation dup count — the dedup-filter analog,
    tokenizer.py:176-186) and the last few shingle signatures for
    near-dup turn detection.

    Emits one SESSION_OUT_SCHEMA row per *closed* session."""
    # Project to the 8 columns the state function reads BEFORE the
    # keyed shuffle: the enriched row is wide (text, 4 hashes, URL
    # structs, json) and every byte of it would otherwise be shuffled
    # AND Arrow-serialized into Python per batch. Column pruning does
    # not cross applyInPandasWithState on its own.
    needed = [
        "conv_id", "turn_idx", "ts", "role", "tool",
        "phishing_score", "sha1", "shingle_sig",
    ]
    df = df.select(*[c for c in needed if c in df.columns])
    gap_us = gap_s * 1_000_000
    COUNTERS = 12  # numeric slots in the state tuple

    def _row(key: str, s: list) -> dict:
        return {
            "conv_id": key,
            "session_seq": s[0],
            "session_id": f"{key}#{s[0]}",
            "session_start": pd.Timestamp(s[1], unit="us"),
            "session_end": pd.Timestamp(s[2], unit="us"),
            "n_turns": s[3],
            "n_user": s[4],
            "n_assistant": s[5],
            "n_tool": s[6],
            "n_system": s[7],
            "n_tool_calls": s[8],
            "max_phishing_score": int(s[9]),
            "n_duplicate_turns": s[10],
            "n_neardup_turns": s[11],
        }

    import numpy as np

    def _grams(sig: str, cache: dict) -> frozenset:
        g = cache.get(sig)
        if g is None:
            g = frozenset(sig[i : i + 2] for i in range(max(1, len(sig) - 1)))
            cache[sig] = g
        return g

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            s = list(state.get)
            state.remove()
            yield pd.DataFrame([_row(conv_id, s)])
            return

        if state.exists:
            raw = state.get
            s = list(raw[:COUNTERS])
            seen = list(raw[COUNTERS] or [])
            sigs = list(raw[COUNTERS + 1] or [])
        else:
            s, seen, sigs = None, [], []
        gram_cache: dict = {}
        closed: list[dict] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            n = len(pdf)
            ts_us = (
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
            )
            # gap segmentation (rows are ts-sorted): row i opens a new
            # session iff its gap to the previous event (or the open
            # session's end, for row 0) exceeds gap_us
            prev_end = np.empty(n, dtype=np.int64)
            prev_end[1:] = ts_us[:-1]
            prev_end[0] = s[2] if s is not None else ts_us[0]
            new_sess = (ts_us - prev_end) > gap_us
            if s is None:
                new_sess[0] = True
            seg = np.cumsum(new_sess)  # 0 = continuation of the open session

            roles = pdf["role"].to_numpy()
            has_tool = pdf["tool"].notna().to_numpy()
            scores = pdf["phishing_score"].fillna(0).to_numpy()
            shas = pdf["sha1"].fillna("").to_numpy()
            sig_arr = pdf["shingle_sig"].fillna("").to_numpy()

            for seg_id in range(int(seg[0]), int(seg[-1]) + 1):
                idx = np.nonzero(seg == seg_id)[0]
                if seg_id > 0 or s is None:
                    if s is not None:
                        closed.append(_row(conv_id, s))
                    next_seq = s[0] + 1 if s is not None else 0
                    t0 = int(ts_us[idx[0]])
                    s = [next_seq, t0, t0] + [0] * (COUNTERS - 3)
                    seen, sigs = [], []
                # vectorized per-session counters
                s[2] = max(s[2], int(ts_us[idx[-1]]))
                s[3] += len(idx)
                r_seg = roles[idx]
                s[4] += int(np.sum(r_seg == "user"))
                s[5] += int(np.sum(r_seg == "assistant"))
                s[6] += int(np.sum(r_seg == "tool"))
                s[7] += int(np.sum(r_seg == "system"))
                s[8] += int(np.sum(has_tool[idx]))
                s[9] = max(s[9], int(np.max(scores[idx])))
                # within-session exact-dup counting against the carried
                # seen-set (bounded at save time — the LRU analog)
                seen_set = set(seen)
                seg_shas = shas[idx]
                seg_sigs = sig_arr[idx]
                for j in range(len(idx)):
                    sha = seg_shas[j]
                    is_dup = bool(sha) and sha in seen_set
                    if bool(sha) and not is_dup:
                        seen.append(sha)
                        seen_set.add(sha)
                    elif is_dup:
                        s[10] += 1
                    sig = seg_sigs[j]
                    if sig:
                        if not is_dup and sigs:
                            g = _grams(sig, gram_cache)
                            for p in sigs:
                                gp = _grams(p, gram_cache)
                                u = len(g | gp)
                                if u and len(g & gp) / u >= _NEARDUP_SIM:
                                    s[11] += 1
                                    break
                        sigs.append(sig)
                        if len(sigs) > _MAX_SIGS:
                            sigs.pop(0)
                if len(seen) > _MAX_SEEN:
                    seen = seen[-_MAX_SEEN:]
        if s is not None:
            state.update(tuple(int(x) for x in s) + (seen, sigs))
            # close when the watermark passes session_end + gap (clamped:
            # Spark rejects timeout timestamps at/below the watermark)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((s[2] + gap_us) // 1000, wm + 1000))
        if closed:
            yield pd.DataFrame(closed)

    return df.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_window_agg(df: DataFrame, gap_s: int = 30 * 60) -> DataFrame:
    """Built-in session_window aggregate — the declarative twin of
    stateful_sessionize (no custom state; Catalyst merges windows)."""
    return (
        df.groupBy(
            F.col("conv_id"),
            F.session_window("ts", f"{gap_s} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant"),
            F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
            F.max("phishing_score").alias("max_phishing_score"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns", "n_user", "n_assistant", "n_tool",
            "n_tool_calls", "max_phishing_score",
        )
    )


# ---------------------------------------------------------------------------
# stream-stream join (dialect analog) under watermark
# ---------------------------------------------------------------------------


def tool_response_stream_join(
    spark: SparkSession, cfg: PipelineConfig
) -> DataFrame:
    """Tool-invocation ⋈ tool-response as a watermarked stream-stream
    inner join: equality on (conv_id, tool) + response within
    (ts, ts + band]. Both sides carry watermarks, so join state is
    bounded — the fix for the reference's unbounded JsonMaker buffers."""
    turns = read_turns_stream(spark, cfg)
    inv = (
        turns.where((F.col("role") == "assistant") & F.col("tool").isNotNull())
        .select(
            F.col("conv_id").alias("i_conv_id"),
            F.col("tool").alias("i_tool"),
            F.col("turn_idx").alias("i_turn_idx"),
            F.col("ts").alias("i_ts"),
            F.col("text").alias("i_text"),
        )
        .withWatermark("i_ts", cfg.watermark)
    )
    resp = (
        turns.where((F.col("role") == "tool") & F.col("tool").isNotNull())
        .select(
            F.col("conv_id").alias("r_conv_id"),
            F.col("tool").alias("r_tool"),
            F.col("turn_idx").alias("r_turn_idx"),
            F.col("ts").alias("r_ts"),
            F.col("text").alias("r_text"),
        )
        .withWatermark("r_ts", cfg.watermark)
    )
    cond = (
        (F.col("i_conv_id") == F.col("r_conv_id"))
        & (F.col("i_tool") == F.col("r_tool"))
        & (F.col("r_ts") > F.col("i_ts"))
        & (F.col("r_ts") <= F.col("i_ts") + F.expr(f"INTERVAL {cfg.band_s} SECONDS"))
        & (F.col("r_turn_idx") > F.col("i_turn_idx"))
    )
    return inv.join(resp, on=cond, how="inner").select(
        F.col("i_conv_id").alias("conv_id"),
        F.col("i_tool").alias("tool"),
        F.col("i_turn_idx").alias("turn_idx"),
        F.col("i_ts").alias("ts"),
        F.col("r_turn_idx").alias("resp_turn_idx"),
        F.col("r_ts").alias("resp_ts"),
        F.col("r_text").alias("resp_text"),
    )


# ---------------------------------------------------------------------------
# windowed rates (tumbling event-time aggregate under the watermark)
# ---------------------------------------------------------------------------


def windowed_rates(df: DataFrame, window_s: int = 600) -> DataFrame:
    """Per-(conv_id, tumbling window) turn/tool/score rates — the
    SURVEY §7 'tumbling window aggregates (per-conversation rates)'
    stage. Partial aggregation is map-side; the window column is a
    pure function of ts so no extra shuffle beyond the groupBy. On a
    stream the upstream watermark bounds state: a window's row is
    emitted (append mode) once the watermark passes window.end."""
    return (
        df.groupBy(F.window("ts", f"{window_s} seconds").alias("w"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
            F.max("phishing_score").alias("max_phishing_score"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id", "n_turns", "n_tool_calls", "n_user", "max_phishing_score",
        )
    )


# ---------------------------------------------------------------------------
# query assembly
# ---------------------------------------------------------------------------


def start_enriched_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Primary output: enriched JSON-per-turn rows, exactly-once."""
    sink = IdempotentSink(cfg.output("enriched"), keys=["conv_id", "turn_idx"])
    df = with_json_row(enriched_stream(spark, cfg))
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("enriched"))
        .outputMode("append")
        .queryName("enriched_turns")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_session_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Per-session feature vectors from the custom stateful sessionizer."""
    sink = IdempotentSink(cfg.output("sessions"), keys=["conv_id", "session_id"])
    df = stateful_sessionize(
        enriched_stream(spark, cfg, dedup_flag=False), gap_s=cfg.gap_s
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("sessions"))
        .outputMode("append")
        .queryName("sessions")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_window_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Tumbling-window per-conversation rates, exactly-once (append
    mode: a window row is final once the watermark passes its end)."""
    sink = IdempotentSink(
        cfg.output("window_rates"), keys=["window_start", "conv_id"]
    )
    df = windowed_rates(
        enriched_stream(spark, cfg, dedup_flag=False), window_s=cfg.window_s
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("window_rates"))
        .outputMode("append")
        .queryName("window_rates")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_join_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Tool-call correlation pairs, exactly-once."""
    sink = IdempotentSink(cfg.output("tool_pairs"), keys=["conv_id", "turn_idx"])
    df = tool_response_stream_join(spark, cfg)
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("tool_pairs"))
        .outputMode("append")
        .queryName("tool_pairs")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
