"""Build a deterministic 10x replica of the sf0.1 tables needed by the
five most expensive batch queries, for the scale-growth experiment
(VERDICT r4 item 4). Replication preserves each query's computational
SHAPE at exactly 10x:

- documents: each copy i rewrites every word w -> w + "x{i}" — a
  bijection on the vocabulary, so all WITHIN-copy relations (shingle
  overlaps, planted duplicates, bigram structure) are preserved
  verbatim while ACROSS copies no shingle/word is ever shared. Pair
  counts and model sizes therefore scale linearly (a naive text copy
  would create cross-copy near-duplicates and blow pair generation up
  quadratically — measuring that would test the data, not the engine).
- lineitem/orders: join keys shift by copy * KEY_STRIDE, preserving
  the join fanout and group cardinalities per copy.

Usage: python tools/make_scale10.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spamscope_spark.config import build_session

SRC = "/root/testdata/sf0.1"
COPIES = 10
KEY_STRIDE = 100_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data", "sf1",
    )
    spark = build_session()
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace(
                    F.coalesce(F.col("text"), F.lit("")),
                    r"(\S+)", r"$1x" + str(i),
                ).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    d10 = parts[0]
    for p in parts[1:]:
        d10 = d10.unionByName(p)
    d10.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    li10 = None
    for i in range(COPIES):
        p = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_STRIDE)
        )
        li10 = p if li10 is None else li10.unionByName(p)
    li10.repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    o = spark.read.parquet(f"{SRC}/orders.parquet")
    o10 = None
    for i in range(COPIES):
        p = o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_STRIDE)
        )
        o10 = p if o10 is None else o10.unionByName(p)
    o10.repartition(32).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    for t in ("customer", "supplier", "part", "nation", "region",
              "events", "embeddings"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    print("wrote", out)


if __name__ == "__main__":
    main()
