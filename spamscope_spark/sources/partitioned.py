"""Hive-partitioned table layout for partition-pruned scans.

The reference prunes work at the SOURCE: its spout walks only the
mailbox subdirectories named in the config (`src/spouts/files_mails.py`
glob per `mailboxes` section) — mail that isn't under a configured path
is never read at all. The warehouse analog is hive-style partitioning:
the table is laid out as `event_type=<v>/event_date=<d>/` directories,
and a filter on those columns prunes entire directories from the scan
(`PartitionFilters` in the plan) — zero I/O for excluded partitions,
which at 100 TB is the difference between scanning a day and scanning
three years.

Partition columns must be low-cardinality (here: 5 types × days);
high-cardinality keys belong in bucketing (sources/bucketed.py) or
plain sorting, never in the directory layout (a 10^6-dir listing stalls
the driver before the first task launches).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

PARTITION_ROOT = os.environ.get(
    "SPARK_GRAFT_PARTITION_DIR", "/tmp/spamscope_partitioned"
)


def events_partitioned_path(sf_dir: str) -> str:
    sf_key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return os.path.join(PARTITION_ROOT, f"events_{sf_key}")


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events laid out as event_type=/event_date=/ parquet, written once
    per sf (the ingest-time layout a 100 TB event store would use).
    Repartitioned on the partition keys first so each directory holds
    ONE file instead of one per write task."""
    path = events_partitioned_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        (
            ev.withColumn("event_date", F.to_date("ts"))
            .repartition("event_type", "event_date")
            .write.mode("overwrite")
            .partitionBy("event_type", "event_date")
            .parquet(path)
        )
    return spark.read.parquet(path)
