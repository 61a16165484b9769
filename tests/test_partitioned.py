"""Hive-partitioned layout + partition pruning (sources/partitioned.py).

The physical claim: filters on partition columns prune whole
directories from the scan (PartitionFilters), and the data files are
read only for the columns the query actually needs.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from spamscope_spark.plans import explain
from spamscope_spark.plans.queries import q_partition_pruned
from spamscope_spark.sources import partitioned

SF = "/root/testdata/sf0.001"


def test_partition_filters_in_plan(spark):
    df = q_partition_pruned(spark, SF)
    txt = explain.plan_text(df)
    pf_lines = [l for l in txt.splitlines() if "PartitionFilters" in l]
    assert pf_lines, txt
    assert any("event_type" in l and "event_date" in l for l in pf_lines)
    # the pruned predicates are partition-side: no row-level filter on
    # event_type/event_date should remain against the data files
    assert explain.read_schema_columns(df) == ["value"]


def test_layout_one_file_per_partition_dir(spark):
    partitioned.ensure_partitioned_events(spark, SF)
    root = partitioned.events_partitioned_path(SF)
    type_dirs = [d for d in os.listdir(root) if d.startswith("event_type=")]
    assert sorted(type_dirs) == [
        f"event_type={t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    ]
    date_dir = os.path.join(root, type_dirs[0])
    some_day = os.path.join(date_dir, sorted(os.listdir(date_dir))[0])
    files = [f for f in os.listdir(some_day) if f.endswith(".parquet")]
    assert len(files) == 1


def test_pruned_result_matches_raw(spark):
    got = {
        (r["event_type"], str(r["event_date"])): (r["n"], r["total_value"])
        for r in q_partition_pruned(spark, SF).collect()
    }
    raw = spark.read.parquet(os.path.join(SF, "events.parquet"))
    want = {
        (r["event_type"], str(r["event_date"])): (r["n"], r["total_value"])
        for r in (
            raw.where(
                F.col("event_type").isin("click", "purchase")
                & (F.to_date("ts") >= F.lit("2024-01-15").cast("date"))
            )
            .groupBy("event_type", F.to_date("ts").alias("event_date"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        )
    }
    assert got == want and got
