"""Bucketed-table co-located joins (sources/bucketed.py).

The claim under test is physical, not just semantic: a join between two
tables bucketed on the join key with the same bucket count must run
with NO shuffle exchange on either side — the one-time ingest shuffle
replaces the per-query one.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from spamscope_spark.plans import explain
from spamscope_spark.plans.queries import q_bucketed_join
from spamscope_spark.sources import bucketed

SF = "/root/testdata/sf0.001"


def _bucketed_pair(spark, n_buckets=4):
    o = bucketed.ensure_bucketed(spark, SF, "orders", ["o_custkey"], n_buckets)
    c = bucketed.ensure_bucketed(
        spark, SF, "customer", ["c_custkey"], n_buckets
    )
    return o, c


def test_bucketed_join_is_exchange_free(spark):
    o, c = _bucketed_pair(spark)
    j = (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "c_mktsegment")
    )
    txt = explain.plan_text(j)
    assert "SortMergeJoin" in txt
    assert "Exchange" not in txt


def test_plain_join_shuffles_both_sides_control(spark):
    """Control: the same merge join over the raw parquet DOES exchange."""
    o = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    c = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    j = (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "c_mktsegment")
    )
    assert "Exchange" in explain.plan_text(j)


def test_one_file_per_bucket(spark):
    """write_bucketed repartitions on the bucket key first, so each
    bucket is exactly one file — the layout that (a) avoids tasks ×
    buckets small files at ingest and (b) preserves usable per-bucket
    sortedness."""
    name = bucketed.bucketed_name("customer", ["c_custkey"], 4, SF)
    _bucketed_pair(spark)
    path = os.path.join(bucketed.BUCKET_ROOT, name)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4


def test_bucketed_join_matches_plain_join(spark):
    o, c = _bucketed_pair(spark)
    got = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ro = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    rc = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    want = (
        ro.join(rc, ro["o_custkey"] == rc["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_query_entry_runs(spark):
    rows = q_bucketed_join(spark, SF).collect()
    assert len(rows) == 5  # one per market segment
    assert {r["segment"] for r in rows} == {
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
    }
