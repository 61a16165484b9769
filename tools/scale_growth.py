"""Scale-growth experiment (VERDICT r4 item 4): wall-time of the five
most expensive batch workloads at sf0.1 vs a deterministic 10x replica
(tools/make_scale10.py), looking for superlinear growth that a single-
scale benchmark cannot expose (a missed cap, a quadratic candidate
generator, a skew collapse).

Methodology notes:
- The near-dup/LM operators run on the scaled documents' RAW text.
  The graded queries plant FIXED duplicate strings (dup_text()), so a
  10x corpus would merge planted groups ACROSS copies and grow pair
  output quadratically BY FIXTURE CONSTRUCTION — that would measure
  the fixture, not the engine. The 10x replica's word bijection keeps
  per-copy structure identical and copies disjoint, so all operator
  work scales linearly in theory; the experiment checks the engine
  delivers that.
- q_salted_join runs the registered query itself against both dirs
  (its inputs are key-shifted copies, join fanout preserved).
- the flagship pipeline scales by conversation count (400 -> 4000).
- each point: min of 2 runs, materialized via the noop sink.

Usage: python tools/scale_growth.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spamscope_spark.config import build_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale_data", "sf1")


def mat(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed(build, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        mat(build())
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = build_session()
    from spamscope_spark.operators import dedup, corpus, skew
    from spamscope_spark.operators.enrich import enrich_turns
    from spamscope_spark.operators import sessionize
    from spamscope_spark.datagen import generate_turns

    def docs(d):
        return spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )

    results = {}

    def point(name, small, big):
        t_small = timed(small)
        t_big = timed(big)
        results[name] = {
            "sf0.1_s": t_small,
            "sf1_s": t_big,
            "growth_x": round(t_big / t_small, 2) if t_small else None,
        }
        print(f"{name}: {t_small}s -> {t_big}s "
              f"({results[name]['growth_x']}x)", file=sys.stderr)

    point(
        "ngram_jaccard",
        lambda: dedup.ngram_jaccard_pairs(
            docs(SF01), "doc_id", "text", n=5, threshold=0.5
        ),
        lambda: dedup.ngram_jaccard_pairs(
            docs(SF1), "doc_id", "text", n=5, threshold=0.5
        ),
    )
    point(
        "minhash_lsh",
        lambda: dedup.minhash_lsh_pairs(
            docs(SF01), "doc_id", "text",
            k=8, rows_per_band=2, n=5, threshold=0.5,
        ),
        lambda: dedup.minhash_lsh_pairs(
            docs(SF1), "doc_id", "text",
            k=8, rows_per_band=2, n=5, threshold=0.5,
        ),
    )
    point(
        "bigram_logprob",
        lambda: corpus.bigram_logprob(docs(SF01)),
        lambda: corpus.bigram_logprob(docs(SF1)),
    )

    def salted(d):
        li = spark.read.parquet(f"{d}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        orders = spark.read.parquet(f"{d}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        from spamscope_spark.functions import exact
        joined = skew.salted_join(
            li, orders, ["l_orderkey"],
            salt_source=F.col("l_linenumber"), n_salts=8,
        )
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            exact.fixed_sum(F.col("l_extendedprice"), 2).alias("revenue"),
        )

    point("salted_join", lambda: salted(SF01), lambda: salted(SF1))

    def flagship(n_convs):
        turns = generate_turns(spark, n_convs=n_convs, turns_per_conv=24)
        sess = sessionize.session_features(
            enrich_turns(turns), gap_s=30 * 60
        )
        return sess.orderBy(
            F.col("max_phishing_score").desc(),
            F.col("n_turns").desc(),
            F.col("session_id").asc(),
        ).limit(50)

    point(
        "turns_flagship",
        lambda: flagship(400),
        lambda: flagship(4000),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
