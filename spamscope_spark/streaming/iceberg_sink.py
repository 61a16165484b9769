"""Iceberg MERGE sink — the production exactly-once path of the north
rule ("idempotent foreachBatch exactly-once sink writes enriched
JSON-per-turn rows to Iceberg").

This sandbox has no Iceberg runtime jar, so the shipped default is the
epoch-atomic parquet+manifest sink (sink.py — same MERGE-on-key
semantics, SURVEY.md §7 risk 5). This module is the real-cluster path:
`foreachBatch` → `MERGE INTO` keyed on (conv_id, turn_idx), which is
idempotent under Spark's batch replay because a re-delivered epoch
MERGEs to the same final rows. `make_sink` picks whichever the session
supports, so app code is identical in both environments.

Reference analog: the Elasticsearch bulk sink's daily-index upserts
(src/bolts/output_elasticsearch.py:30-107) — at-least-once there,
exactly-once here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark extension classes are on the JVM
    classpath (i.e. spark-submit shipped the iceberg-spark-runtime)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        )
        return True
    except Exception:
        return False


def merge_sql(table: str, keys: list[str], view: str = "_batch_src") -> str:
    """The MERGE statement run per epoch (pure string — unit-testable
    without an Iceberg runtime)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {table} t USING {view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


class IcebergMergeSink:
    """foreachBatch target: MERGE the micro-batch into an Iceberg table.

    Exactly-once: Iceberg commits are atomic snapshots; replaying an
    epoch re-MERGEs the same rows onto the same keys → identical table
    state. Partition the table by a time bucket of `ts` (days) so the
    MERGE prunes to touched partitions at 10^12-turn scale."""

    def __init__(self, table: str, keys: list[str]):
        self.table = table
        self.keys = keys

    def process_batch(self, batch_df: DataFrame, epoch: int) -> None:
        spark = batch_df.sparkSession
        if not spark.catalog.tableExists(self.table):
            batch_df.writeTo(self.table).using("iceberg").createOrReplace()
            return
        view = f"_batch_src_{epoch}"
        batch_df.createOrReplaceTempView(view)
        spark.sql(merge_sql(self.table, self.keys, view))
        spark.catalog.dropTempView(view)

    def __call__(self, batch_df: DataFrame, epoch: int) -> None:
        self.process_batch(batch_df, epoch)

    def read_merged(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table)


def make_sink(spark: SparkSession, path_or_table: str, keys: list[str]):
    """Factory: IcebergMergeSink when the runtime is present, else the
    parquet+manifest IdempotentSink — identical foreachBatch interface."""
    if iceberg_available(spark):
        return IcebergMergeSink(path_or_table, keys)
    from .sink import IdempotentSink

    return IdempotentSink(path_or_table, keys)
