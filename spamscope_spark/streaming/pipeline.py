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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
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
    # "parquet" (sandbox default) or "iceberg" (real-cluster path:
    # input_path is a catalog table name; requires the iceberg-spark
    # runtime on the classpath — see iceberg_sink.iceberg_available).
    input_format: str = "parquet"
    gap_s: int = 30 * 60
    watermark: str = "4 hours"
    band_s: int = 600
    window_s: int = 600
    slide_s: int | None = None  # sliding windows when set (else tumbling)
    dedup_state_timeout_ms: int = 6 * 3600 * 1000
    max_files_per_trigger: int | None = None
    # Cascade mode: when set, session/window queries stream from this
    # enriched-sink path instead of re-deriving enrichment from raw
    # turns — the Storm-topology dataflow (tokenizer bolt feeds the
    # downstream bolts exactly once, topologies/spamscope_debug.py:39-73).
    enriched_source: str | None = None
    # Keyed-state backend: "hdfs" (default heap-HashMap provider — fine
    # while per-executor state fits the JVM heap) or "rocksdb"
    # (RocksDBStateStoreProvider + changelog checkpointing). At the
    # 10^12-turn design point the dedup/session/join state exceeds
    # executor heap by orders of magnitude; RocksDB keeps it on local
    # SSD with bounded memory and checkpoints incrementally (changelog,
    # not full-snapshot — the knob that keeps commit time flat as state
    # grows). Recorded per-query at start; a checkpoint resumes with
    # the provider it was created under.
    state_store: str = "hdfs"
    # Priority-ingestion approximation (SURVEY §7 risk 6): order each
    # microbatch's sink output by (priority if present, ts, conv_id,
    # turn_idx) — the reference spout's (priority, ctime) queue holds
    # only within a microbatch here, never across batches.
    priority_order: bool = False
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
    if cfg.input_format == "iceberg":
        # Real-cluster path: stream the Iceberg table's snapshot log
        # (input_path = catalog table name). Offsets are snapshot ids —
        # same resume semantics as file offsets, and the scan prunes on
        # the table's partition spec (days(ts) at 10^12-turn scale).
        reader = spark.readStream.format("iceberg")
        if cfg.max_files_per_trigger:
            reader = reader.option(
                "streaming-max-files-per-micro-batch", cfg.max_files_per_trigger
            )
        return reader.load(cfg.input_path)
    reader = spark.readStream.schema(TURNS_SCHEMA)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    return reader.parquet(cfg.input_path)


# Column-pruned view of the enriched sink the downstream stateful
# stages actually read — a parquet stream with a subset schema scans
# ONLY these columns (footer projection), not the wide enriched row.
_ENRICHED_MIN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
        StructField("phishing_score", IntegerType(), True),
        StructField("sha1", StringType(), True),
        StructField("shingle_sig", StringType(), True),
    ]
)


def read_enriched_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Cascade source: stream the enriched sink's epoch directories.
    One enrichment pass feeds every downstream stage (the reference
    computes tokenizer features once and fans out; re-deriving
    enrichment per consumer would multiply the heaviest stage)."""
    from ..config import ensure_py_files

    ensure_py_files(spark)
    path = os.path.join(cfg.enriched_source, "data", "epoch=*")
    return (
        spark.readStream.schema(_ENRICHED_MIN_SCHEMA)
        .parquet(path)
        .withWatermark("ts", cfg.watermark)
    )


def _session_input(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Input for the stateful session/window stages: the enriched sink
    stream in cascade mode, else enrichment derived from raw turns."""
    if cfg.enriched_source:
        return read_enriched_stream(spark, cfg)
    return enriched_stream(spark, cfg, dedup_flag=False)


def enriched_stream(
    spark: SparkSession, cfg: PipelineConfig, dedup_flag: bool = True
) -> DataFrame:
    """Stateful dedup flag FIRST (on the narrow raw turn), then
    enrichment + lineage columns.

    Flag-before-enrich is both the reference's dataflow (the tokenizer
    flags duplicates so downstream bolts skip work, tokenizer.py:
    176-196) and the scale-critical ordering: applyInPandasWithState
    Arrow-serializes every byte of its input JVM→Python→JVM, so the
    state op must see the ~200-byte raw turn + sha1, not the ~1.5 KB
    enriched row (hashes, URL structs, json) — r2 profiling showed the
    wide-row round-trip dominating the enriched stage's memory traffic.
    The narrow map enrichment then runs downstream of the state op.

    dedup_flag=False for consumers that add their own stateful operator
    (Structured Streaming does not support chaining two
    applyInPandasWithState ops in one query)."""
    turns = read_turns_stream(spark, cfg)
    turns = turns.withColumn(
        "sha1", F.sha1(F.coalesce(F.col("text"), F.lit("")))
    ).withWatermark("ts", cfg.watermark)
    if dedup_flag:
        turns = flag_duplicates(
            turns, key="sha1", state_timeout_ms=cfg.dedup_state_timeout_ms
        )
    enriched = enrich_turns(
        turns,
        target_keys=cfg.target_keys,
        subject_keys=cfg.subject_keys,
        whitelist=cfg.whitelist,
        dedup_flag=False,  # batch window-rank is illegal on streams
    )
    return enriched.withColumn("_lineage_partition", F.spark_partition_id())


def deduped_stream_builtin(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Alternative exact-dedup path: Spark's built-in
    `dropDuplicatesWithinWatermark` on the content sha1 — all-JVM keyed
    state (RocksDB-spillable, watermark-evicted), no Python round-trip.

    Semantics deviate from the reference's flag filter deliberately:
    duplicates are DROPPED (first arrival wins), not flagged — the
    right choice when downstream never wants duplicates at all (e.g. a
    training-corpus sink), and the cheaper one: the flag path
    (dedup_state.py) Arrow-ships every row through Python to preserve
    the reference's flag-not-drop contract; this path keeps the whole
    plan in whole-stage codegen. State eviction: a key older than the
    watermark is dropped from state, so re-arrivals beyond the
    watermark horizon are NOT deduped — same horizon contract as the
    stream-stream join."""
    turns = read_turns_stream(spark, cfg)
    turns = turns.withColumn(
        "sha1", F.sha1(F.coalesce(F.col("text"), F.lit("")))
    ).withWatermark("ts", cfg.watermark)
    deduped = turns.dropDuplicatesWithinWatermark(["sha1"])
    enriched = enrich_turns(
        deduped,
        target_keys=cfg.target_keys,
        subject_keys=cfg.subject_keys,
        whitelist=cfg.whitelist,
        dedup_flag=False,
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

# Per-BUCKET state: a pickled dict {conv_id: [12 counters, seen, sigs]}.
# Keying state on a hash bucket of conv_id instead of conv_id itself is
# the same scale move as dedup_state.py: one Python invocation + one
# pandas column extraction per BUCKET per batch (amortized over its
# conversations) instead of per conversation — measured ~12 ms of
# applyInPandasWithState machinery per GROUP per batch regardless of
# group size, which at 10^6+ live conversations would dominate the
# stage. Buckets are uniform (hash of a high-cardinality key);
# per-bucket state stays bounded by convs/bucket. Default 256 buckets
# (see dedup_state.py for the measurement); like there, n_buckets is
# part of the checkpoint contract — don't change it on a live
# checkpoint.
_SESSION_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])

_SESS_BUCKET_COL = "_sess_bucket"

# Session state-machine bounds live in session_kernel (MAX_SEEN /
# MAX_SIGS / NEARDUP_SIM) — shared with the transformWithState path.


def stateful_sessionize(
    df: DataFrame, gap_s: int = 30 * 60, n_buckets: int = 256
) -> DataFrame:
    """Per-conv_id session windows with a gap timeout, held in keyed
    state and closed by event-time timeout when the watermark passes
    session_end + gap — the bounded version of the reference's
    wait-forever greedy buffers (json_maker.py:82-88).

    Per-session state also carries a bounded seen-fingerprint set
    (exact within-conversation dup count — the dedup-filter analog,
    tokenizer.py:176-186) and the last few shingle signatures for
    near-dup turn detection.

    State is keyed on pmod(xxhash64(conv_id), n_buckets); each bucket
    carries a dict of its conversations' open sessions and a single
    event-time timer at min(session_end)+gap (expired conversations are
    closed whenever the timer fires, the timer re-arms for the rest) —
    per-conversation semantics are unchanged.

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

    import pickle

    from . import session_kernel as sk

    def _rearm(state: GroupState, states: dict) -> None:
        """One event-time timer per bucket at min(session_end)+gap,
        clamped above the watermark (Spark rejects timestamps <= wm)."""
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max((sk.min_end_us(states) + gap_us) // 1000, wm + 1000)
        )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # The session state machine itself lives in session_kernel
        # (shared, byte-identical, with the transformWithStateInPandas
        # path) — this wrapper is only GroupState plumbing + timers.
        if state.hasTimedOut:
            states: dict = pickle.loads(state.get[0])
            wm_us = state.getCurrentWatermarkMs() * 1000
            closed, remaining = sk.close_expired(states, wm_us, gap_us)
            if remaining:
                state.update((pickle.dumps(remaining, protocol=4),))
                _rearm(state, remaining)
            else:
                state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return

        states = pickle.loads(state.get[0]) if state.exists else {}
        closed = []
        # Concat Arrow chunks before the lexsort: a bucket bigger than
        # maxRecordsPerBatch arrives as several chunks, and per-chunk
        # sorting would mis-order turns across the chunk boundary
        # (gap/session logic depends on global (conv, ts, turn) order).
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            closed = sk.apply_rows(states, pdf, gap_us)
        if states:
            state.update((pickle.dumps(states, protocol=4),))
            _rearm(state, states)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(closed)

    bucketed = df.withColumn(
        _SESS_BUCKET_COL, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets))
    )
    return bucketed.groupBy(_SESS_BUCKET_COL).applyInPandasWithState(
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
    spark: SparkSession, cfg: PipelineConfig, how: str = "inner"
) -> DataFrame:
    """Tool-invocation ⋈ tool-response as a watermarked stream-stream
    join: equality on (conv_id, tool) + response within (ts, ts + band].
    Both sides carry watermarks, so join state is bounded — the fix for
    the reference's unbounded JsonMaker buffers.

    `how="leftOuter"` additionally emits each UNMATCHED invocation once
    the watermark passes ts + band (null resp_* columns) — outer-join
    state eviction is the emission trigger, so 'no response arrived' is
    itself an event. The reference has no analog: a JsonMaker branch
    that never arrives buffers forever (json_maker.py:82-88) and is
    never reported."""
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
    return inv.join(resp, on=cond, how=how).select(
        F.col("i_conv_id").alias("conv_id"),
        F.col("i_tool").alias("tool"),
        F.col("i_turn_idx").alias("turn_idx"),
        F.col("i_ts").alias("ts"),
        F.col("r_turn_idx").alias("resp_turn_idx"),
        F.col("r_ts").alias("resp_ts"),
        F.col("r_text").alias("resp_text"),
    )


def unanswered_tool_calls(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Tool invocations with NO response inside (ts, ts + band] — the
    timeout/dead-letter stream. A row is emitted exactly once, when the
    watermark passes ts + band and the outer join evicts the unmatched
    invocation from state; until then Spark cannot know a response
    won't still arrive. Late responses beyond the watermark are dropped
    by the join, so a timeout verdict is final."""
    j = tool_response_stream_join(spark, cfg, how="leftOuter")
    return j.where(F.col("resp_turn_idx").isNull()).select(
        "conv_id", "tool", "turn_idx", "ts"
    )


# ---------------------------------------------------------------------------
# windowed rates (tumbling event-time aggregate under the watermark)
# ---------------------------------------------------------------------------


def windowed_rates(
    df: DataFrame, window_s: int = 600, slide_s: int | None = None
) -> DataFrame:
    """Per-(conv_id, tumbling-or-sliding window) turn/tool/score rates —
    the SURVEY §7 'tumbling/sliding window aggregates (per-conversation
    rates)' stage. Partial aggregation is map-side; the window column is
    a pure function of ts so no extra shuffle beyond the groupBy (a
    sliding window fans each row out to window/slide windows before the
    same shuffle). On a stream the upstream watermark bounds state: a
    window's row is emitted (append mode) once the watermark passes
    window.end."""
    w = (
        F.window("ts", f"{window_s} seconds", f"{slide_s} seconds")
        if slide_s
        else F.window("ts", f"{window_s} seconds")
    )
    return (
        df.groupBy(w.alias("w"), "conv_id")
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


def windowed_linreg(
    df: DataFrame, window_s: int = 600, y_col: str = "phishing_score"
) -> DataFrame:
    """Per-tumbling-window OLS trend of a metric over time (drift
    monitor): slope of y ~ seconds-into-window across all turns in the
    window. Sufficient statistics are plain associative sums, so the
    regression streams under the same partial-agg + watermark contract
    as any windowed count — the streaming face of
    operators/regress.grouped_linreg (same closed form, same nulls)."""
    from ..operators.regress import grouped_linreg

    w = F.window("ts", f"{window_s} seconds").alias("w")
    base = df.select(
        w,
        (F.unix_timestamp("ts") % window_s).cast("double").alias("x"),
        F.coalesce(F.col(y_col), F.lit(0)).cast("double").alias("y"),
    )
    out = grouped_linreg(base, "w", F.col("x"), F.col("y"))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n",
        "slope_e6",
        "intercept_e6",
        "r2_e6",
        "corr_e6",
    )


def windowed_cm_sketch(
    df: DataFrame,
    window_s: int = 600,
    value_col: str = "tool",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Per-tumbling-window count-min sketch of a value stream (tool
    usage by default): one (window, row_j, cell, cnt) row per non-empty
    sketch cell. The per-window state the stream carries is bounded at
    depth*width counters regardless of how many distinct values the
    window sees — the streaming analog of q_cm_sketch's batch shape,
    and the mergeability law (cell-wise sum) is exactly what lets a
    downstream consumer combine windows/epochs into coarser sketches
    without replaying the stream. Append mode emits a window's cells
    once the watermark passes window.end."""
    from ..operators.sketch import _h48

    v = F.col(value_col).cast("string")
    cells = F.array(
        *[
            (_h48(F.concat(F.lit(f"{j}|"), v)) % width).cast("int")
            for j in range(depth)
        ]
    )
    return (
        df.where(v.isNotNull())
        .select(
            F.window("ts", f"{window_s} seconds").alias("w"),
            F.posexplode(cells).alias("row_j", "cell"),
        )
        .groupBy("w", "row_j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "row_j",
            "cell",
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# query assembly
# ---------------------------------------------------------------------------

_STATE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}


def _apply_state_store(spark: SparkSession, cfg: PipelineConfig) -> None:
    """Select the keyed-state backend for queries started after this
    call (the provider is captured from the session conf at query
    start). rocksdb + changelog checkpointing is the 10^12-turn
    configuration; hdfs is the small-state default."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        _STATE_PROVIDERS[cfg.state_store],
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        str(cfg.state_store == "rocksdb").lower(),
    )


def start_enriched_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Primary output: enriched JSON-per-turn rows, exactly-once."""
    _apply_state_store(spark, cfg)
    df = with_json_row(enriched_stream(spark, cfg))
    order = None
    if cfg.priority_order:
        pri = ["priority"] if "priority" in df.columns else []
        order = pri + ["ts", "conv_id", "turn_idx"]
    sink = IdempotentSink(
        cfg.output("enriched"), keys=["conv_id", "turn_idx"], order_by=order
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("enriched"))
        .outputMode("append")
        .queryName("enriched_turns")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_dedup_builtin_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Drop-duplicates variant of the enriched output: built-in
    watermark-scoped dedup state (see deduped_stream_builtin), same
    exactly-once sink contract."""
    _apply_state_store(spark, cfg)
    df = with_json_row(deduped_stream_builtin(spark, cfg))
    sink = IdempotentSink(
        cfg.output("enriched_dd"), keys=["conv_id", "turn_idx"]
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("enriched_dd"))
        .outputMode("append")
        .queryName("enriched_dedup_builtin")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_queue_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """OutputRedis-analog sink: enriched rows RPUSH'd (epoch-atomic
    JSONL segments) to the turns queue, tool invocations promoted to
    the tool_calls queue (streaming/queue_sink.py)."""
    from .queue_sink import QueueSink

    _apply_state_store(spark, cfg)
    sink = QueueSink(cfg.output("queues"))
    df = enriched_stream(spark, cfg, dedup_flag=False)
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("queues"))
        .outputMode("append")
        .queryName("queue_sink")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_hot_enriched_query(
    spark: SparkSession,
    cfg: PipelineConfig,
    config_source,
    available_now: bool = True,
):
    """Enriched query with PER-MICROBATCH config hot-reload — the
    reference reloads keyword/whitelist YAML on every tick tuple
    (abstracts.py:83-85, phishing.py:77-80); here `config_source
    .current()` (configload.HotReloadConfig) is re-evaluated inside
    foreachBatch, so an edited keyword file or an expired whitelist
    changes the scoring of the NEXT microbatch without restarting the
    stream. Config-independent columns would stay in the streaming
    plan; the keyword/whitelist-dependent enrichment is built fresh
    per batch (plan construction per batch is driver-cheap; execution
    is identical to the static query)."""
    sink = IdempotentSink(cfg.output("enriched_hot"), keys=["conv_id", "turn_idx"])
    turns = read_turns_stream(spark, cfg).withWatermark("ts", cfg.watermark)

    def process(batch_df: DataFrame, epoch: int) -> None:
        target_keys, subject_keys, whitelist = config_source.current()
        enriched = enrich_turns(
            batch_df,
            target_keys=target_keys,
            subject_keys=subject_keys,
            whitelist=whitelist,
            dedup_flag=False,  # keyed dedup state lives in the static query
        )
        sink.process_batch(with_json_row(enriched), epoch)

    writer = (
        turns.writeStream.foreachBatch(process)
        .option("checkpointLocation", cfg.checkpoint("enriched_hot"))
        .outputMode("append")
        .queryName("enriched_hot")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_session_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Per-session feature vectors from the custom stateful sessionizer."""
    _apply_state_store(spark, cfg)
    sink = IdempotentSink(cfg.output("sessions"), keys=["conv_id", "session_id"])
    df = stateful_sessionize(_session_input(spark, cfg), gap_s=cfg.gap_s)
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
    _apply_state_store(spark, cfg)
    df = windowed_rates(
        _session_input(spark, cfg), window_s=cfg.window_s, slide_s=cfg.slide_s
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
    _apply_state_store(spark, cfg)
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


def start_timeout_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Unanswered-tool-call timeouts (outer-join eviction), exactly-once."""
    _apply_state_store(spark, cfg)
    sink = IdempotentSink(cfg.output("tool_timeouts"), keys=["conv_id", "turn_idx"])
    df = unanswered_tool_calls(spark, cfg)
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("tool_timeouts"))
        .outputMode("append")
        .queryName("tool_timeouts")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_cm_sketch_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True,
    depth: int = 4, width: int = 64,
):
    """Per-window count-min sketches of tool usage, exactly-once:
    bounded depth*width state per window, cells mergeable across
    windows/epochs by cell-wise sum."""
    _apply_state_store(spark, cfg)
    sink = IdempotentSink(
        cfg.output("cm_sketch"), keys=["window_start", "row_j", "cell"]
    )
    df = windowed_cm_sketch(
        _session_input(spark, cfg), window_s=cfg.window_s, depth=depth, width=width
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("cm_sketch"))
        .outputMode("append")
        .queryName("cm_sketch")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_linreg_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Per-window score-drift regression, exactly-once (append mode:
    a window's fit is final once the watermark passes its end)."""
    _apply_state_store(spark, cfg)
    sink = IdempotentSink(cfg.output("window_linreg"), keys=["window_start"])
    df = windowed_linreg(_session_input(spark, cfg), window_s=cfg.window_s)
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("window_linreg"))
        .outputMode("append")
        .queryName("window_linreg")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_scd2_query(
    spark: SparkSession, cfg: PipelineConfig, available_now: bool = True
):
    """Streaming SCD2 dimension of per-conversation risk tier: each
    microbatch folds into the versioned dimension via scd2_apply
    (incremental MERGE), exactly-once via per-epoch snapshots. Late
    rows are handled structurally: the fold replays the touched
    entity's full (small) history, so an out-of-order change lands in
    its correct interval position rather than being dropped."""
    from .scd2_sink import Scd2DimSink, risk_tier

    _apply_state_store(spark, cfg)
    sink = Scd2DimSink(cfg.output("scd2_dim"))
    df = enriched_stream(spark, cfg, dedup_flag=False).select(
        "conv_id",
        risk_tier().alias("risk_tier"),
        "ts",
        F.col("turn_idx").cast("long").alias("seq"),
    )
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.checkpoint("scd2_dim"))
        .outputMode("append")
        .queryName("scd2_dim")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_anomaly_query(
    spark: SparkSession,
    cfg: PipelineConfig,
    key: str = "role",
    bucket_s: int = 3600,
    lookback: int = 6,
    min_history: int = 4,
    z_threshold: float = 2.0,
    available_now: bool = True,
):
    """Streaming twin of operators/cep.py::rate_anomaly — the always-on
    campaign/surge monitor over the turn stream.

    Shape: a watermarked tumbling-window count (append mode: a
    (window, key) count row is FINAL once the watermark passes the
    window end — exactly-once, replay-safe), then the z-score against
    the trailing ``lookback`` windows is computed in foreachBatch over
    [sink history ∪ this batch] with the SAME score_rate_windows
    kernel the batch operator uses. History completeness holds by
    watermark monotonicity: any window earlier than one finalizing now
    has an earlier end, hence finalized in this or a previous batch —
    so trailing-observed-window semantics match the batch operator
    exactly, and the emitted rows are a watermark-closed prefix of the
    batch result on the same input.

    Scale: the windowed count is the only wide stage over raw turns
    (map-side partial aggs, watermark-bounded state). The foreachBatch
    z-score reads back only the count table — |keys| × |windows| rows,
    orders of magnitude smaller than the stream — and the per-key
    window pass parallelizes across keys."""
    from ..operators import cep

    _apply_state_store(spark, cfg)
    sink = IdempotentSink(
        cfg.output("rate_anomaly"), keys=["window_start", key]
    )
    src = read_turns_stream(spark, cfg)
    cnt = (
        src.withWatermark("ts", cfg.watermark)
        .groupBy(
            F.window("ts", f"{bucket_s} seconds").alias("w"), F.col(key)
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )

    def process(batch_df: DataFrame, epoch: int) -> None:
        fresh = batch_df.select("window_start", key, "n")
        if sink.committed_epochs():
            hist = sink.read_merged(spark).select("window_start", key, "n")
            allc = hist.unionByName(fresh).dropDuplicates(
                ["window_start", key]
            )
        else:
            allc = fresh
        scored = cep.score_rate_windows(allc, key, lookback).withColumn(
            # NULL z (insufficient/zero-variance history) is "not an
            # anomaly", not three-valued unknown, in the stored column
            "is_anomaly",
            F.coalesce(
                cep.anomaly_predicate(min_history, z_threshold), F.lit(False)
            ),
        )
        new = scored.join(
            fresh.select("window_start", key), ["window_start", key],
            "left_semi",
        )
        sink.process_batch(
            new.select(
                "window_start", key, "n", "n_prev", "mean_prev", "z_e4",
                "is_anomaly",
            ),
            epoch,
        )

    writer = (
        cnt.writeStream.foreachBatch(process)
        .option("checkpointLocation", cfg.checkpoint("rate_anomaly"))
        .outputMode("append")
        .queryName("rate_anomaly")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def start_silence_query(
    spark: SparkSession,
    cfg: PipelineConfig,
    key: str = "role",
    bucket_s: int = 3600,
    available_now: bool = True,
):
    """Streaming heartbeat monitor — the CEP "missing event" pattern,
    dual of start_anomaly_query: maintain the dense per-key activity
    timeline and emit rows for windows where a previously-seen key
    went SILENT (plus its active windows), with windows_since_seen.

    Same architecture as the anomaly query: a watermarked tumbling
    count in append mode is the only wide stage over raw turns; the
    foreachBatch pass extends each key's dense timeline and emits the
    newly-closed windows. Finality: a (window, key) row depends only on
    that key's activity at windows <= it, all of which are
    watermark-closed by the time the window itself closes — so rows
    never change after emission and MERGE idempotence absorbs replays.
    A key silent FOREVER keeps accruing rows as later windows close
    (the global max observed window advances), which is exactly what a
    heartbeat monitor must do — the reference's analog is the spout
    failing stuck `.processing` files after fail.after.seconds
    (src/spouts/files_mails.py:72-79), a per-item timeout this
    operator generalizes to per-key timeline gaps.

    BOUNDED STATE (r4): extending a key's timeline needs only
    (last_active, last_emitted) per key — not the sink's full history.
    Each epoch persists one |keys|-row state snapshot beside the
    output; per-batch cost is O(|keys| + new windows), constant in
    stream lifetime (the r3 form re-read the whole sink and
    re-densified every key's full timeline each epoch — O(T^2)
    cumulative over a long-lived monitor)."""
    _apply_state_store(spark, cfg)
    sink = IdempotentSink(cfg.output("silence"), keys=["window_start", key])
    state_sink = IdempotentSink(cfg.output("silence_state"), keys=[key])
    src = read_turns_stream(spark, cfg)
    cnt = (
        src.withWatermark("ts", cfg.watermark)
        .groupBy(
            F.window("ts", f"{bucket_s} seconds").alias("w"), F.col(key)
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )
    ival = F.expr(f"interval {bucket_s} seconds")

    def process(batch_df: DataFrame, epoch: int) -> None:
        fresh = batch_df.select("window_start", key, "n")
        # State comes from epochs STRICTLY BEFORE this one (read_asof):
        # on a crash-replay of epoch E the state sink may already hold
        # E's own snapshot, and resuming from it would start the
        # timeline after the replayed windows. Excluding E makes the
        # replay recompute the identical rows (the extension is
        # deterministic over closed windows) and overwrite E with the
        # same content — exactly-once by convergence, the same property
        # process_batch's always-overwrite contract assumes.
        prior = sorted(e for e in state_sink.committed_epochs() if e < epoch)
        if prior:
            st = state_sink.read_asof(spark, prior[-1]).select(
                key, "last_active", "last_emitted"
            )
        else:
            schema = f"{key} string, last_active timestamp, last_emitted timestamp"
            st = spark.createDataFrame([], schema)
        # Per-key summary of the newly closed windows. Append mode
        # delivers a (window, key) row exactly once, when the watermark
        # passes the window end; window closure is GLOBAL (one
        # watermark), so every arriving window is > every previously
        # emitted window — the timeline only ever extends forward.
        fkeys = fresh.groupBy(key).agg(
            F.min("window_start").alias("_f_first")
        )
        merged = st.join(fkeys, key, "full_outer").select(
            key,
            F.col("last_active").alias("_base_lastact"),
            # first window this epoch must emit for the key: one past
            # its last emission, or its first-seen window if new
            F.coalesce(
                F.col("last_emitted") + ival, F.col("_f_first")
            ).alias("_start_w"),
        )
        # Global emission bound: the max closed window observed so far.
        # One broadcast 1-row aggregate — never a driver action.
        gmax = F.broadcast(
            fresh.select(F.col("window_start").alias("_b"))
            .unionByName(st.select(F.col("last_emitted").alias("_b")))
            .agg(F.max("_b").alias("_gmax"))
        )
        grid = (
            merged.crossJoin(gmax)
            .where(F.col("_start_w") <= F.col("_gmax"))
            .select(
                key,
                "_base_lastact",
                F.explode(
                    F.sequence("_start_w", "_gmax", ival)
                ).alias("window_start"),
            )
        )
        dense = grid.join(fresh, [key, "window_start"], "left").withColumn(
            "n", F.coalesce("n", F.lit(0))
        )
        w = (
            Window.partitionBy(key)
            .orderBy("window_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        lact = F.coalesce(
            F.last(
                F.when(F.col("n") > 0, F.col("window_start")),
                ignorenulls=True,
            ).over(w),
            F.col("_base_lastact"),
        )
        emitted = dense.select(
            "window_start",
            key,
            "n",
            (
                (F.unix_timestamp("window_start") - F.unix_timestamp(lact))
                / bucket_s
            )
            .cast("long")
            .alias("windows_since_seen"),
            (F.col("n") == 0).alias("is_silent"),
        )
        sink.process_batch(emitted, epoch)
        # New state snapshot: |keys| rows. Keys with nothing to emit
        # this epoch pass through unchanged (anti-join side).
        extended = (
            dense.groupBy(key)
            .agg(
                F.max(
                    F.when(F.col("n") > 0, F.col("window_start"))
                ).alias("_new_act"),
                F.max("window_start").alias("last_emitted"),
                F.first("_base_lastact").alias("_base_lastact"),
            )
            .select(
                key,
                F.coalesce(
                    F.greatest("_new_act", "_base_lastact"),
                    "_new_act",
                    "_base_lastact",
                ).alias("last_active"),
                "last_emitted",
            )
        )
        untouched = st.join(extended.select(key), key, "left_anti")
        state_sink.process_batch(extended.unionByName(untouched), epoch)

    writer = (
        cnt.writeStream.foreachBatch(process)
        .option("checkpointLocation", cfg.checkpoint("silence"))
        .outputMode("append")
        .queryName("silence")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
