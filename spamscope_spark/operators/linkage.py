"""Blocked fuzzy matching (entity resolution / record linkage).

Reference analog: SpamScope's nearest concept is the ssdeep fuzzy hash
it computes per mail/attachment precisely so an analyst can link
near-identical records whose exact hashes differ
(`src/modules/attachments/utils.py:44-86`). This operator is the
relational form of that linkage: match a dirty/corrupted name against
a clean reference table under an edit-distance bound.

Scale shape — the classic ER pipeline, never all-pairs:
1. BLOCK: both sides key on a cheap deterministic blocking key (name
   prefix); candidate generation is an equi-join on the block key, so
   the shuffle moves (block, name) pairs, not the cross product.
2. CAP: blocks bigger than `max_block_size` are excluded via a
   broadcast anti-join of the (tiny) hot-block set — same audited-cap
   pattern as the LSH/shingle candidate joins (operators/dedup.py). A
   100 TB run tunes the cap instead of letting one degenerate prefix
   ("the ", "http") quadratically blow up a single reducer.
3. FILTER: the length band |len(dirty) - len(clean)| <= max_dist is
   folded INTO the blocking key (the dirty side explodes to the
   2*max_dist+1 target lengths it can legally match), so candidates
   are an equi-join on (prefix, length) — both fewer pairs and a
   higher-cardinality, better-distributed join key than the prefix
   alone. JVM `levenshtein()` then scores the survivors — no Python.
4. RESOLVE: best match per dirty record via one row_number window on
   (distance, clean_id) — deterministic tie-break (compiles to
   WindowGroupLimit, rank-1 pushed below the window sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def blocked_fuzzy_match(
    clean: DataFrame,
    dirty: DataFrame,
    clean_id: str = "clean_id",
    clean_name: str = "clean_name",
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    block_len: int = 4,
    max_dist: int = 2,
    max_block_size: int = 100_000,
) -> DataFrame:
    """Best clean match per dirty row: (dirty_id, match_key, dist)."""
    c = clean.select(
        F.col(clean_id).alias("_cid"),
        F.col(clean_name).alias("_cname"),
        F.substring(clean_name, 1, block_len).alias("_blk"),
        F.length(clean_name).alias("_clen"),
    )
    d = dirty.select(
        F.col(dirty_id).alias("dirty_id"),
        F.col(dirty_name).alias("_dname"),
        F.substring(dirty_name, 1, block_len).alias("_blk"),
        F.length(dirty_name).alias("_dlen"),
    )
    # hot-block cap: the blocks whose CLEAN side exceeds the cap form a
    # tiny driver-free dimension, anti-joined broadcast on both sides
    hot = (
        c.groupBy("_blk")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_block_size)
        .select("_blk")
    )
    c = c.join(F.broadcast(hot), "_blk", "left_anti")
    d = d.join(F.broadcast(hot), "_blk", "left_anti")
    # length-band-as-key: each dirty row explodes to the target lengths
    # it can match (each clean candidate has ONE length, so no pair
    # appears twice), making candidate generation a pure equi-join on
    # (prefix, length) — the composite key also spreads the shuffle far
    # better than the prefix alone
    d = d.withColumn(
        "_tlen",
        F.explode(
            F.array(
                *[
                    F.col("_dlen") + F.lit(i)
                    for i in range(-max_dist, max_dist + 1)
                ]
            )
        ),
    )
    cand = d.join(c, (d["_blk"] == c["_blk"]) & (d["_tlen"] == c["_clen"]))
    scored = cand.withColumn(
        "dist", F.levenshtein("_dname", "_cname")
    ).where(F.col("dist") <= max_dist)
    w = Window.partitionBy("dirty_id").orderBy("dist", "_cid")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("dirty_id", F.col("_cid").alias("match_key"), "dist")
    )


def sql_blocked_fuzzy_match(
    clean_rel: str,
    dirty_rel: str,
    clean_id: str = "clean_id",
    clean_name: str = "clean_name",
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    block_len: int = 4,
    max_dist: int = 2,
    max_block_size: int = 100_000,
) -> str:
    """DuckDB twin — same blocking, cap, band, scoring, tie-break."""
    return f"""
    WITH c0 AS (
        SELECT {clean_id} AS cid, {clean_name} AS cname,
               substr({clean_name}, 1, {block_len}) AS blk,
               length({clean_name}) AS clen
        FROM {clean_rel}
    ), d0 AS (
        SELECT {dirty_id} AS dirty_id, {dirty_name} AS dname,
               substr({dirty_name}, 1, {block_len}) AS blk,
               length({dirty_name}) AS dlen
        FROM {dirty_rel}
    ), hot AS (
        SELECT blk FROM c0 GROUP BY blk HAVING count(*) > {max_block_size}
    ), scored AS (
        SELECT d.dirty_id, c.cid,
               levenshtein(d.dname, c.cname) AS dist
        FROM d0 d
        JOIN c0 c ON d.blk = c.blk
                 AND abs(d.dlen - c.clen) <= {max_dist}
        WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.blk = d.blk)
          AND levenshtein(d.dname, c.cname) <= {max_dist}
    )
    SELECT dirty_id, cid AS match_key, dist
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY dirty_id ORDER BY dist, cid
        ) AS rk
        FROM scored
    )
    WHERE rk = 1
    """
