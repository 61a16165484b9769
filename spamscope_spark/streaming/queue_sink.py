"""Queue sink — the OutputRedis analog.

The reference's Redis sink RPUSHes JSON strings onto two queues (mails
+ flattened attachments) after `reformat_output` splits each document
(src/bolts/output_redis.py:31-126; split semantics
src/modules/utils.py:269-372: attachment records are promoted to their
own queue entries carrying the parent mail's ids), flushing every
`flush_size` docs or tick.

Engine recast: a foreachBatch sink appending epoch-atomic JSONL
segments to named queue directories — the microbatch IS the flush
batch; a consumer drains committed epochs in order (the queue
contract); a replayed epoch overwrites its own segment (exactly-once,
same protocol as IdempotentSink). The split: every enriched turn goes
to the `turns` queue; tool-invocation rows are PROMOTED to a
`tool_calls` queue entry keyed by the parent (conv_id, turn_idx) — the
mail/attachment split. No driver-side collect: segments are written by
executors (`df.write.text`), only the rename + manifest append run on
the driver.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class QueueSink:
    """foreachBatch target: JSON-lines queues with epoch-atomic segments."""

    def __init__(self, path: str, queues: tuple[str, ...] = ("turns", "tool_calls")):
        self.path = path
        self.queues = queues
        for q in queues:
            os.makedirs(os.path.join(path, q), exist_ok=True)
        self.manifest = os.path.join(path, "_manifest.jsonl")

    def committed_epochs(self) -> set[int]:
        if not os.path.exists(self.manifest):
            return set()
        with open(self.manifest) as f:
            return {json.loads(line)["epoch"] for line in f if line.strip()}

    def _split(self, batch_df: DataFrame) -> dict[str, DataFrame]:
        """reformat_output analog: full rows → turns queue; tool
        invocations promoted with parent keys → tool_calls queue."""
        cols = [c for c in batch_df.columns if not c.startswith("_")]
        turns = batch_df.select(
            F.to_json(F.struct(*[F.col(c) for c in sorted(cols)])).alias("value")
        )
        promoted = batch_df.where(F.col("tool").isNotNull()).select(
            F.to_json(
                F.struct(
                    F.col("conv_id").alias("parent_conv_id"),
                    F.col("turn_idx").alias("parent_turn_idx"),
                    F.col("tool").alias("tool"),
                    F.col("ts").alias("ts"),
                    F.col("role").alias("role"),
                )
            ).alias("value")
        )
        return {"turns": turns, "tool_calls": promoted}

    def process_batch(self, batch_df: DataFrame, epoch: int) -> None:
        parts = self._split(batch_df)
        n_rows: dict[str, int] = {}
        for q in self.queues:
            df = parts[q]
            seg = os.path.join(self.path, q, f"epoch={epoch}")
            staging = os.path.join(self.path, q, f"_staging_{epoch}")
            if os.path.exists(staging):
                shutil.rmtree(staging)
            df.write.mode("overwrite").text(staging)
            n_rows[q] = df.sparkSession.read.text(staging).count()
            if os.path.exists(seg):  # replay: swap atomically
                trash = os.path.join(self.path, q, f"_trash_{epoch}")
                if os.path.exists(trash):
                    shutil.rmtree(trash)
                os.rename(seg, trash)
                os.rename(staging, seg)
                shutil.rmtree(trash)
            else:
                os.rename(staging, seg)
        with open(self.manifest, "a") as f:
            f.write(json.dumps({"epoch": epoch, "rows": n_rows}) + "\n")

    def __call__(self, batch_df: DataFrame, epoch: int) -> None:
        self.process_batch(batch_df, epoch)

    def read_queue(self, spark: SparkSession, queue: str) -> DataFrame:
        """Committed entries, one JSON string per row (the consumer's
        LRANGE view); epoch column for drain ordering."""
        return (
            spark.read.option("basePath", os.path.join(self.path, queue))
            .text(os.path.join(self.path, queue, "epoch=*"))
        )


TOOL_CALLS_SCHEMA = (
    "parent_conv_id string, parent_turn_idx int, tool string, "
    "ts timestamp, role string"
)


def read_queue_stream(
    spark: SparkSession,
    path: str,
    queue: str,
    schema: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Queue CONSUMER — the RabbitMQ client analog
    (src/modules/rabbitmq_client.py:44-160: connect, basic_qos prefetch,
    consume JSON messages, ack).

    Engine recast: a file-source stream over the queue's committed
    epoch segments. The broker handshake is subsumed by the directory
    protocol — segments become visible ONLY via QueueSink's atomic
    rename, so discovery never sees a half-written epoch; offsets in
    the consumer's checkpoint are the acks (a restart resumes exactly
    after the last committed batch, replacing channel redelivery);
    `max_files_per_trigger` is the basic_qos prefetch bound. With a
    `schema`, messages are parsed from JSON into columns (the client's
    json.loads); corrupt records become null columns rather than
    killing the consumer, matching the client's log-and-continue."""
    raw = spark.readStream
    if max_files_per_trigger is not None:
        raw = raw.option("maxFilesPerTrigger", max_files_per_trigger)
    out = raw.text(os.path.join(path, queue, "epoch=*"))
    if schema is None:
        return out
    return out.select(
        F.from_json(F.col("value"), schema).alias("msg")
    ).select("msg.*")
