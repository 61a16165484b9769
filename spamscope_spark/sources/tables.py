"""Batch table loading from the driver's parquet star schema.

The reference's spout scans mailbox dirs with a priority queue + file
lease protocol (src/spouts/files_mails.py:39-145); for batch analytics
the equivalent is a plain parquet scan — predicate pushdown and column
pruning reach the scan automatically because every query here is
declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
