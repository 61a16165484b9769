"""Exactly-once idempotent sink (foreachBatch MERGE semantics).

The reference's sinks are at-least-once with non-idempotent bulk writes
(output_elasticsearch.py:96-106) — replays duplicate documents. Here:
Iceberg `MERGE INTO` on (conv_id, turn_idx) is the production path; the
sandbox has no Iceberg runtime jar, so this is the documented fallback
(SURVEY.md §7 risk 5): one parquet directory per epoch, atomically
committed via a manifest — a replayed epoch overwrites its own
directory and re-commits the same manifest entry, so output is
byte-identical under replay (exactly-once), and keyed MERGE semantics
come from last-writer-wins dedup at read (`read_merged`).

Scale: the manifest holds one line per epoch (not per row); data files
are partitioned however the batch is partitioned; nothing here is
driver-bound except the manifest append.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def _parquet_num_rows(directory: str) -> int:
    """Sum of num_rows from the parquet footers in a directory —
    exact, metadata-only, no Spark job."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(directory):
        if name.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(directory, name)).num_rows
    return total


class IdempotentSink:
    """foreachBatch target writing epoch-atomic parquet with MERGE keys.

    `order_by` sorts each epoch's rows before writing — the
    PRIORITY-ORDERED INGESTION approximation (the reference spout's
    (priority, ctime) queue, src/spouts/files_mails.py:96-104).
    Structured Streaming has no priority queue across batches
    (documented gap, SURVEY §7 risk 6): ordering holds WITHIN each
    microbatch (range-partitioned sort → part files in ascending
    lexical order), not across batches."""

    def __init__(
        self, path: str, keys: list[str], order_by: list[str] | None = None
    ):
        self.path = path
        self.keys = keys
        self.order_by = order_by
        self.data_dir = os.path.join(path, "data")
        self.manifest = os.path.join(path, "_manifest.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)
        self._recover_interrupted_compaction()

    def _recover_interrupted_compaction(self) -> None:
        """Finish or roll back a compaction that crashed mid-swap.

        Unlike a crashed `process_batch` epoch (which Spark replays from
        its own commit log), a compaction swap covers long-committed
        epochs Spark will never re-deliver — a crash between the two
        renames in `compact()` would leave epoch k's data only in
        underscore-prefixed dirs invisible to parquet reads, while the
        manifest still lists it. So on init / compact / read we detect
        leftovers and converge:

        - staging has a `_SUCCESS` marker and the epoch dir is gone →
          roll FORWARD (the merged data is complete; rename into place).
        - epoch dir gone, trash present → roll BACK (restore original).
        - epoch dir present → the swap never started or already finished;
          leftovers are garbage → delete them.
        """
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if not name.startswith(("_staging_compact_", "_trash_compact_")):
                continue
            k = name.rsplit("_", 1)[-1]
            staging = os.path.join(self.path, f"_staging_compact_{k}")
            trash = os.path.join(self.path, f"_trash_compact_{k}")
            epoch_dir = os.path.join(self.data_dir, f"epoch={k}")
            if not os.path.exists(epoch_dir):
                if os.path.exists(os.path.join(staging, "_SUCCESS")):
                    os.rename(staging, epoch_dir)
                elif os.path.exists(trash):
                    os.rename(trash, epoch_dir)
            shutil.rmtree(staging, ignore_errors=True)
            shutil.rmtree(trash, ignore_errors=True)

    # -- commit log --------------------------------------------------------

    def committed_epochs(self) -> set[int]:
        if not os.path.exists(self.manifest):
            return set()
        with open(self.manifest) as f:
            return {json.loads(line)["epoch"] for line in f if line.strip()}

    def _commit(self, epoch: int, n_rows: int) -> None:
        entry = json.dumps({"epoch": epoch, "rows": n_rows})
        with open(self.manifest, "a") as f:
            f.write(entry + "\n")

    # -- foreachBatch ------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, epoch: int) -> None:
        """Idempotent epoch write: ALWAYS overwrite the epoch directory,
        then commit (manifest is last-wins per epoch).

        Overwrite — not skip — is the correct exactly-once move: Spark
        re-delivers a batchId only when its own commit log lacks it, and
        a re-delivered batch may carry *different* data than a crashed
        first attempt (e.g. FileStreamSource reconstructs an unpersisted
        file-list offset by re-listing, picking up files that arrived in
        between). Skipping on "already committed" would silently drop
        those rows; overwriting converges to the re-delivered batch.

        The epoch directory appears ATOMICALLY: the batch is written to
        a staging dir (leading "_", so parquet listings ignore it) and
        renamed into place — a concurrent reader (the cascade stream
        tails epoch=* dirs) never lists a half-written epoch, and on a
        replay the old dir is swapped out in two renames (µs window)
        instead of an rmtree + full rewrite with new part names under
        the reader's feet."""
        epoch_dir = os.path.join(self.data_dir, f"epoch={epoch}")
        staging = os.path.join(self.path, f"_staging_epoch_{epoch}")
        trash = os.path.join(self.path, f"_trash_epoch_{epoch}")
        for d in (staging, trash):
            if os.path.exists(d):
                shutil.rmtree(d)
        if self.order_by:
            batch_df = batch_df.orderBy(*[F.col(c) for c in self.order_by])
        batch_df.write.mode("overwrite").parquet(staging)
        # row count for the manifest comes from the WRITTEN files'
        # parquet FOOTERS, read driver-side via pyarrow (~ms) — counting
        # batch_df first would compute the whole upstream plan twice,
        # and a Spark read-back count() costs a full job's scheduling
        # per epoch per query (a fixed, non-scaling term measured at
        # 1-2s/stage in BENCH r2 profiling).
        n = _parquet_num_rows(staging)
        if os.path.exists(epoch_dir):  # crashed/previous attempt
            os.rename(epoch_dir, trash)
        os.rename(staging, epoch_dir)
        if os.path.exists(trash):
            shutil.rmtree(trash)
        self._commit(epoch, n)

    def __call__(self, batch_df: DataFrame, epoch: int) -> None:
        self.process_batch(batch_df, epoch)

    # -- read side (MERGE semantics) ----------------------------------------

    def read_raw(self, spark: SparkSession) -> DataFrame:
        self._recover_interrupted_compaction()
        return spark.read.option("basePath", self.data_dir).parquet(
            os.path.join(self.data_dir, "epoch=*")
        )

    def read_merged(self, spark: SparkSession) -> DataFrame:
        """Last-writer-wins by key across epochs — MERGE INTO semantics.
        (With upstream exactly-once a key appears in one epoch only;
        this also absorbs intentional key-level upserts.)"""
        df = self.read_raw(spark)
        w = Window.partitionBy(*self.keys).orderBy(F.col("epoch").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "epoch")
        )

    def read_asof(self, spark: SparkSession, epoch: int) -> DataFrame:
        """Time-travel read: the merged (last-writer-wins) view exactly
        as it stood after `epoch` committed — the parquet-fallback
        analog of an Iceberg snapshot read, and the reproducibility
        primitive a training pipeline needs ("rebuild the corpus the
        run was trained on"). Partition pruning keeps it cheap: only
        epoch dirs <= `epoch` are listed/scanned.

        Compaction trades history for file count (like Iceberg snapshot
        expiry): if a later compacted epoch folded epochs <= `epoch`
        into itself, that point in time is no longer reconstructable
        and this raises ValueError rather than silently returning a
        partial view."""
        self._recover_interrupted_compaction()
        entries: dict[int, dict] = {}
        if os.path.exists(self.manifest):
            with open(self.manifest) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        entries[e["epoch"]] = e
        for e in entries.values():
            if e["epoch"] > epoch and e.get("compacted_min", e["epoch"]) <= epoch:
                raise ValueError(
                    f"epoch {epoch} expired: compaction folded epochs "
                    f">= {e['compacted_min']} into epoch {e['epoch']}"
                )
        eps = sorted(k for k in entries if k <= epoch)
        if not eps:
            return self.read_raw(spark).drop("epoch").limit(0)
        df = spark.read.option("basePath", self.data_dir).parquet(
            *[os.path.join(self.data_dir, f"epoch={e}") for e in eps]
        )
        w = Window.partitionBy(*self.keys).orderBy(F.col("epoch").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "epoch")
        )

    def read_since(self, spark: SparkSession, after_epoch: int) -> DataFrame:
        """Incremental (CDC-style) consumer: rows committed in epochs
        strictly AFTER `after_epoch`. A downstream batch job polls the
        manifest, processes the delta, and records the max epoch it saw
        as its own cursor — the parquet-fallback analog of Iceberg
        incremental reads (snapshot-id ranges). Partition pruning does
        the work: epoch is the directory key, so only the delta
        directories are listed/scanned. Run compaction with
        `keep_last` covering every live consumer's cursor, or a slow
        consumer's delta epochs get folded away under it."""
        new = sorted(e for e in self.committed_epochs() if e > after_epoch)
        if not new:
            return spark.read.option("basePath", self.data_dir).parquet(
                self.data_dir
            ).limit(0)
        return spark.read.option("basePath", self.data_dir).parquet(
            *[os.path.join(self.data_dir, f"epoch={e}") for e in new]
        )

    # -- maintenance ---------------------------------------------------------

    def compact(self, spark: SparkSession, keep_last: int = 0) -> dict:
        """Offline small-file compaction — the parquet-fallback analog of
        Iceberg's `rewrite_data_files`. A long-running availableNow /
        microbatch stream accumulates one directory per epoch; at the
        10^12-turn design point that is millions of small files, and
        every read pays the listing + footer cost. Compaction merges
        the oldest committed epochs (all but `keep_last`) into the
        highest epoch of the merged range, applying the same
        last-writer-wins key merge `read_merged` applies at read time.

        Consistency: `read_merged` output is IDENTICAL before, during,
        and after — the compacted directory keeps the range's max epoch
        number, so last-wins ordering against the untouched tail is
        unchanged, and mid-swap a key is at worst present in both an
        old epoch dir and the compacted dir with the same winning row.
        (`read_raw` may transiently double-count mid-swap; run
        compaction when no cascade STREAMING consumer is tailing the
        epoch dirs — like Iceberg maintenance, it is an offline op.)
        The manifest is rewritten atomically (tmp + rename): one entry
        for the compacted epoch recording `compacted_from`, tail
        entries preserved."""
        self._recover_interrupted_compaction()
        entries: dict[int, dict] = {}
        if os.path.exists(self.manifest):
            with open(self.manifest) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        entries[e["epoch"]] = e  # last-wins per epoch
        committed = sorted(entries)
        # keep_last >= len(committed) keeps everything (a negative slice
        # index would wrap around and compact epochs it was told to keep)
        target = (
            committed[: max(len(committed) - keep_last, 0)]
            if keep_last
            else committed
        )
        if len(target) < 2:
            return {"compacted_epochs": 0}
        k = target[-1]
        merged_src = spark.read.option("basePath", self.data_dir).parquet(
            *[os.path.join(self.data_dir, f"epoch={e}") for e in target]
        )
        w = Window.partitionBy(*self.keys).orderBy(F.col("epoch").desc())
        merged = (
            merged_src.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "epoch")
        )
        staging = os.path.join(self.path, f"_staging_compact_{k}")
        trash = os.path.join(self.path, f"_trash_compact_{k}")
        for d in (staging, trash):
            if os.path.exists(d):
                shutil.rmtree(d)
        merged.write.mode("overwrite").parquet(staging)
        n = _parquet_num_rows(staging)
        epoch_dir = os.path.join(self.data_dir, f"epoch={k}")
        if os.path.exists(epoch_dir):
            os.rename(epoch_dir, trash)
        os.rename(staging, epoch_dir)
        shutil.rmtree(trash, ignore_errors=True)
        for e in target[:-1]:
            shutil.rmtree(
                os.path.join(self.data_dir, f"epoch={e}"), ignore_errors=True
            )
        new_entries = [
            {
                "epoch": k,
                "rows": n,
                "compacted_from": len(target),
                # min of the folded range — lets read_asof detect that
                # time-travel to an epoch inside the range has expired
                "compacted_min": target[0],
            }
        ] + [entries[e] for e in committed if e not in set(target)]
        tmp = self.manifest + ".tmp"
        with open(tmp, "w") as f:
            for e in sorted(new_entries, key=lambda x: x["epoch"]):
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, self.manifest)
        return {"compacted_epochs": len(target), "epoch": k, "rows": n}
