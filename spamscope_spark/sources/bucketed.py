"""Bucketed (pre-hash-partitioned) table layout for co-located joins.

The reference co-locates work by hash-grouping tuples on a key for the
life of the topology (``Grouping.fields('sha256_random')``,
topologies/spamscope_elasticsearch.py:40-47) — every tuple with the
same fingerprint always lands on the same bolt instance, so no
downstream re-distribution is ever needed. The storage-layout analog in
Spark is a *bucketed table*: rows are hash-clustered into a fixed
number of buckets on the join/agg key at WRITE time, the bucket spec is
recorded in the catalog, and every later join or aggregation on that
key skips its shuffle entirely (and, with ``sortBy``, the sort too).

At 100 TB this is the difference between re-shuffling the fact table on
every query and shuffling it ONCE at ingest: a corpus that is joined
against per-document metadata (or self-joined via dedup-pair tables) on
every pipeline run should be written bucketed by doc id. Bucket count
is a layout constant chosen for the TABLE's final size (buckets ≈
table_bytes / target_task_bytes), not for any one cluster size — the
same files serve a 10-executor and a 1000-executor cluster.

Sandbox note: bucketing metadata lives in the session catalog
(``saveAsTable``); the data itself is plain parquet under an explicit
``path`` so nothing is written into the repo working directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

BUCKET_ROOT = os.environ.get(
    "SPARK_GRAFT_BUCKET_DIR", "/tmp/spamscope_bucketed"
)


def bucketed_name(table: str, keys: list[str], n_buckets: int, sf_dir: str) -> str:
    sf_key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    return f"{table}_by_{'_'.join(keys)}_{n_buckets}b_{sf_key}"


def write_bucketed(
    df: DataFrame, name: str, keys: list[str], n_buckets: int
) -> None:
    """Write ``df`` as a bucketed, bucket-sorted external parquet table.

    ``sortBy(keys)`` makes each bucket file key-sorted, so a
    bucket-aligned sort-merge join needs neither exchange NOR sort on
    this side — the scan feeds the join directly.
    """
    (
        # repartition on the bucket key first so each task holds exactly
        # one bucket's rows → ONE file per bucket (repartition and
        # bucketBy share Murmur3 `pmod` placement). Without it every
        # write task emits a file per bucket (tasks × buckets small
        # files), and Spark only trusts per-bucket sortedness — the
        # thing that lets the merge join skip its sort — when a bucket
        # is a single file.
        df.repartition(n_buckets, *keys)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .option("path", os.path.join(BUCKET_ROOT, name))
        .format("parquet")
        .saveAsTable(name)
    )


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    keys: list[str],
    n_buckets: int,
) -> DataFrame:
    """Return ``table`` from ``sf_dir`` as a catalog-registered bucketed
    table, writing it on first use in this session (the one-time ingest
    shuffle that every later join on ``keys`` amortizes away)."""
    name = bucketed_name(table, keys, n_buckets, sf_dir)
    if not spark.catalog.tableExists(name):
        raw = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        write_bucketed(raw, name, keys, n_buckets)
    return spark.table(name)
