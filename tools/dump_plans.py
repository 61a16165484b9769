"""Generate PLANS.md — the physical-plan dossier for the headline
queries at sf0.01, so the scale-shape claims (pushdown, broadcast,
exchange counts, codegen spans) are auditable without running Spark.

Usage: python tools/dump_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spamscope_spark.config import build_session  # noqa: E402
from spamscope_spark.plans import explain  # noqa: E402

# Queries whose plan shape carries a scale claim worth auditing; the
# one-line note states the property to look for.
AUDITED = {
    "q_pricing_summary": "filter + projection pushed to the scan; one partial-agg exchange",
    "q_part_revenue": "dimension filtered BEFORE broadcast; fact side never shuffles",
    "q_bucketed_join": "bucketed layout: SortMergeJoin with zero exchanges at the join (the only Exchange is the final per-segment agg)",
    "q_partition_pruned": "hive layout: type+date predicates land in PartitionFilters (whole dirs pruned); data files read for `value` only",
    "q_top_customers": "broadcast dim join + top-k via partial-aggregated sort",
    "q_asof_join": "sort-merge union+window as-of: one exchange, no pair expansion",
    "q_salted_agg": "two-stage skew agg: salted partial then final on the true key",
    "q_minhash_lsh": "banded bucket join, pair-dedup on short columns, capped buckets",
    "q_ngram_jaccard": "shingle equi-join: ONE exploded-shingle exchange reused by the cap window and both join sides",
    "q_incremental_neardup": "new-batch vs corpus-index join: corpus side bucket-capped on the join partitioning; corpus never self-joins",
    "q_hash_classifier": "hashed features: broadcast D-row weight join; only shuffle is the doc-id partial agg",
    "q_simhash": "single-pass vote vector: no explode, no shuffle before the final agg",
    "q_cosine_topk": "brute-force baseline: broadcast query vectors, one top-k agg",
    "q_embedding_neardup": "banded multi-table LSH candidates, bucket cap, short-key pair dedup",
    "q_phishing_score": "whole keyword/bitmap tree in codegen; zero exchanges per turn",
    "q_repetition_stats": "single narrow pass: all three signals as array exprs (top-word = sorted run-length) — 1 scan, 0 exchanges",
    "q_bigram_logprob": "tokenize+explode once: per-(doc,bigram) pre-agg exchange shared by model training and scoring (AQE ReusedExchange)",
    "q_paragraph_dedup": "span hashes: one groupBy df + equi-join flagging, shuffle-free segmentation",
    "q_bloom_decontaminate": "Bloom probes join the fixed-size position table via BroadcastHashJoin; corpus side shuffles only for its own aggs, never on raw shingle strings",
    "q_shard_packing": "per-(stratum, sub-bucket) windows — a dominant source splits across tasks",
    "q_doc_chunks": "sequence/explode/slice chunking: zero shuffle",
    "q_tfidf": "two partial aggs + word-key join; corpus N joins as broadcast 1-row agg",
    "q_cm_sketch": "sketch groupBy output bounded at depth*width rows (map-side partial agg); sketch joins candidates via BroadcastHashJoin — raw values never shuffle",
    "q_weighted_sample": "global weighted top-k compiles to TakeOrderedAndProject: per-partition top-k + k-row merge, no global sort",
    "q_scd2_history": "both windows + run filter share ONE (user_id) exchange",
    "q_substring_dedup": "window hashes + counts shuffle, never window text; the (doc,whash) pre-agg is persisted so the corpus is scanned+hashed ONCE (sharedness branch reads InMemoryTableScan)",
    "q_grouped_linreg": "OLS from ONE partial-aggregated pass: six sufficient sums map-side, closed-form arithmetic after the single exchange — no iterations, no driver state",
    "q_scd2_pit": "point-in-time as-of: union + ONE (user_id) window exchange — no interval pair expansion",
    "q_zorder_pruned": "Z-order layout: manifest stats drop most files before I/O; residual rectangle predicate lands in PushedFilters of the surviving files' scan",
    "q_fuzzy_match": "blocked ER join: candidates equi-join on the block key (hot blocks anti-joined broadcast), levenshtein+band ride the join condition, best-match via WindowGroupLimit (rank-1 pushdown)",
    "q_gap_fill": "resample: ONE partial-agg pass over raw events; grid = broadcast cross of two metadata-sized dims; ffill window reuses the grid's event_type partitioning (no extra exchange)",
    "q_salted_join": "replicate-and-salt skew join: a known-hot key fans out over n_salts reducers; semantically identical to the plain join (oracle is the plain join)",
    "q_approx_quantiles": "GK quantile sketch + exact twin share ONE groupBy exchange; at scale only the bounded-memory sketch branch runs",
    "q_silence_windows": "missing-event timeline: one partial-agg pass over raw events; densify/carry-forward run on count-table-sized rows (per-key sequence explode, broadcast 1-row global bound)",
    "q_triangle_count": "degree-oriented triangle join: wedge fanout bounded by orientation (hub edges point inward); close against the canonical edge set on both endpoints",
    "q_schema_evolution": "mergeSchema generations read: one unified scan over both file generations, null-fill for pre-evolution rows, single partial-agg exchange",
    "q_profile": "single-pass profile: one scan, one agg (exact multi-distinct = expand shape), per-column rows exploded from the 1-row wide result",
    "q_crosstab_chi2": "contingency: one groupBy to the cell table; margins window over cell-sized rows; grand total joins as broadcast 1-row agg",
    "q_event_paths": "ordered path agg: struct-sort after collection (deterministic), path counts over |keys| rows, top-k via TakeOrderedAndProject (no global sort)",
    "q_phrase_search": "match_phrase as codegen'd array scan: tokenize in the scan projection, BroadcastNestedLoopJoin against the tiny phrase dim, zero exchanges before the bounded per-query top-k window",
    "q_containment_decon": "containment decon: distinct-shingle explode joins the BROADCAST benchmark side map-side; pair agg bounded by matches; bench-size join is broadcast too — corpus never self-joins, never shuffles raw text",
    "q_pmi_pairs": "PMI collocations (r5 fix): vocab cut AND final rank are TakeOrderedAndProject — no unpartitioned Window, no Exchange SinglePartition; vocab filter broadcast ahead of the pair self-join",
    "q_random_projection": "JL sketch: one narrow codegen fold per coordinate against a plan-time constant matrix — zero exchanges, zero joins, no UDF",
    "q_ann_sketch": "composed scale path: projection adds no exchange; sketch-space LSH probe broadcasts the tiny query side",
    "q_inverted_index": "positional postings: per-(term,doc) position fold + per-term assembly — exactly two exchanges; array_sort assembly, no global sort",
    "q_phrase_postings": "phrase via postings: broadcast (term, offset) dim semi-filters the token stream map-side; ONE grouped alignment join — cost independent of phrase count",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(
        app_name="plan-dossier", master="local[4]", shuffle_partitions=8
    )
    qs = entrymod.queries()
    print("# PLANS — physical-plan dossier (generated by tools/dump_plans.py)")
    print()
    print(
        f"`df.explain('formatted')` for the scale-shape-bearing queries at\n"
        f"`{sf_dir}`, `local[4]`. Regenerate after plan-affecting changes:\n"
        f"`python tools/dump_plans.py > PLANS.md`."
    )
    for name, note in AUDITED.items():
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        txt = explain.plan_text(df)
        print(f"\n## {name}\n\n*Claim: {note}.*\n\n```\n{txt.rstrip()}\n```")
    spark.stop()


if __name__ == "__main__":
    main()
