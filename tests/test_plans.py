"""Plan-quality assertions: the physical plans must be the ones that
survive a 100x scale-up — pushdown at the scan, pruned read schemas,
broadcast dimension joins, whole-stage codegen in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from spamscope_spark.plans import explain
from spamscope_spark.plans.queries import (
    q_cosine_topk,
    q_phishing_score,
    q_pricing_summary,
    q_region_rollup,
    q_semi_join,
    q_top_customers,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = q_pricing_summary(spark, SF)
    txt = explain.plan_text(df)
    assert "PushedFilters" in txt
    assert "LessThanOrEqual(l_shipdate" in txt  # the predicate, at the scan


def test_column_pruning(spark):
    df = q_pricing_summary(spark, SF)
    cols = explain.read_schema_columns(df)
    # lineitem has 11 columns; the query needs 7
    assert set(cols) <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate", "l_tax",
    }
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_dimension_joins_are_broadcast(spark):
    assert explain.has_broadcast_join(q_region_rollup(spark, SF))
    assert explain.has_broadcast_join(q_top_customers(spark, SF))  # AQE/size-based
    assert explain.has_broadcast_join(q_semi_join(spark, SF))


def test_similarity_broadcasts_queries(spark):
    assert explain.has_broadcast_join(q_cosine_topk(spark, SF))


def test_enrichment_is_jvm_narrow(spark):
    # the scorer is pure column math: no Python UDF and — critically at
    # 100TB — no shuffle added BY the scoring (a narrow map over its
    # input). The registered query may carry one compensating
    # repartition when the scan under-splits (single small parquet
    # file), so the narrowness is pinned on the operator itself over an
    # already-wide input. Higher-order array functions fall back from
    # whole-stage codegen by design; they are still JVM expressions.
    from spamscope_spark.datagen import TARGET_KEYS, SUBJECT_KEYS
    from spamscope_spark.functions.phishing import with_phishing_columns

    base = spark.range(64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("check gmail payment "), F.col("id").cast("string")).alias("t2"),
    )
    df = with_phishing_columns(
        base, text=F.col("t2"), target_keys=TARGET_KEYS,
        subject_keys=SUBJECT_KEYS, whitelist=[],
    )
    txt = explain.plan_text(df)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
    assert "Exchange" not in txt  # per-turn scoring must not shuffle
    # and the registered query adds at most the one scan-width exchange
    qtxt = explain.plan_text(q_phishing_score(spark, SF))
    assert qtxt.count("Exchange") <= 2  # repartition (+AQE read) only
    assert "BatchEvalPython" not in qtxt and "ArrowEvalPython" not in qtxt


def test_no_python_udf_in_batch_enrich_hot_path(spark):
    from spamscope_spark.datagen import generate_turns
    from spamscope_spark.operators.enrich import enrich_turns

    turns = generate_turns(spark, n_convs=5, turns_per_conv=8)
    df = enrich_turns(turns, with_shingle=False)  # shingle is the one sanctioned udf
    txt = explain.plan_text(df)
    assert "BatchEvalPython" not in txt
    assert "ArrowEvalPython" not in txt


def test_salted_agg_two_stage(spark):
    from spamscope_spark.datagen import generate_turns
    from spamscope_spark.operators import skew

    turns = generate_turns(spark, n_convs=5, turns_per_conv=8)
    df = skew.salted_agg(
        turns, key=["conv_id"], aggs=[skew.salted("n", "count")],
        salt_source=F.col("turn_idx"), n_salts=4,
    )
    txt = explain.plan_text(df)
    # partial agg on (key, salt), final agg on key → two HashAggregate pairs
    assert txt.count("HashAggregate") >= 4


def test_doc_chunking_is_narrow(spark):
    # chunking must be a partition-local flat map: sequence/explode/
    # slice with NO Exchange added by the operator — at 100 TB a
    # shuffle here would move the whole corpus for no reason. (The
    # registered query may carry the scan-width repartition; the
    # operator itself is pinned narrow on an already-wide input.)
    from spamscope_spark.operators.corpus import chunk_documents

    base = spark.range(64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta "), F.col("id").cast("string")).alias("text"),
    )
    txt = explain.plan_text(chunk_documents(base, size=8, overlap=2))
    assert "Exchange" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_tfidf_broadcasts_corpus_size(spark):
    # the 1-row corpus-size aggregate must join in as a broadcast (a
    # shuffled cross join against a scalar would be absurd at scale)
    # and the whole query must stay JVM-side.
    from spamscope_spark.plans.queries import q_tfidf

    df = q_tfidf(spark, SF)
    txt = explain.plan_text(df)
    assert explain.has_broadcast_join(df)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_under_split_scan_widens_to_parallelism(spark):
    # the compute-heavy tables (documents/embeddings) ship as one small
    # parquet file → one scan partition; _t must compensate so shingle/
    # fingerprint/scoring map work doesn't serialize on one task. At
    # scale the guard makes this a no-op (scans already have splits).
    from spamscope_spark.plans import queries as Q

    df = Q._t(spark, SF, "documents")
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    # non-wide tables are left alone (no gratuitous exchange)
    li = Q._t(spark, SF, "lineitem")
    assert "Repartition" not in explain.plan_text(li)


def test_unpivot_single_expand_no_union(spark):
    # unpivot = one Expand over one scan; a UNION-of-scans shape would
    # read the table once per measure.
    from spamscope_spark.plans.queries import q_unpivot

    txt = explain.plan_text(q_unpivot(spark, SF))
    assert "Expand" in txt
    assert "Union" not in txt


def test_neardup_planted_pairs_found_in_fixture(spark):
    # the graded near-dup run must be non-vacuous: every planted
    # (source, source+OFFSET) scale-copy pair appears with cos == 1.0
    from spamscope_spark.plans import queries as Q

    rows = Q.q_embedding_neardup(spark, SF).collect()
    got = {(r["id_a"], r["id_b"]): r["cos_e6"] for r in rows}
    emb_ids = {
        r["vec_id"]
        for r in Q._t(spark, SF, "embeddings").select("vec_id").collect()
    }
    planted = {
        (i, i + Q.PLANT_OFFSET)
        for i in emb_ids
        if i % Q.PLANT_STEP == 0
    }
    assert planted, "fixture has no plantable ids"
    assert set(got) == planted  # nothing else reaches cos >= 0.9
    # planted copies have cos == 1.0 up to ulps; the half-up
    # quantizer (functions/exact.py) maps that to exactly 1e6
    assert all(c == 1_000_000 for c in got.values())


def test_ann_graded_recall_is_one_on_planted_copies(spark):
    # the provable-recall geometry behind the hash-exact ANN oracles:
    # an exact copy shares its source's LSH bucket and IVF list, so a
    # correct index returns the source (cos 1.0) at rank 1 — recall@1
    # must be exactly 1.0 for every planted query, both index families
    from spamscope_spark.plans import queries as Q

    for fn in (Q.q_ann_lsh, Q.q_ann_ivf, Q.q_ann_sketch):
        rows = fn(spark, SF).collect()
        assert len(rows) == len(Q.ANN_QUERY_IDS)
        assert all(r["recall_at_k"] == 1.0 for r in rows), fn.__name__


def test_repetition_stats_is_single_pass(spark):
    # all three Gopher-style signals are array expressions over ONE
    # scan: no explode, no shuffle, no join — at 100 TB the r2 shape
    # (explode -> two groupBys -> join back) re-tokenized the corpus
    # per branch and shuffled every word twice
    from spamscope_spark.operators.corpus import repetition_stats

    df = spark.read.parquet(f"{SF}/documents.parquet")
    txt = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert txt.count("Scan parquet") == 1
    assert "Exchange" not in txt
    assert "Generate" not in txt


def test_bigram_logprob_tokenizes_once(spark):
    # the per-(doc, bigram) pre-aggregate is the ONE exchange the
    # exploded bigram stream pays; model training and scoring both hang
    # off it via AQE ReusedExchange, so the scan + tokenize + explode
    # (the dominant cost) executes once, not three times as in the
    # naive two-branch form
    from spamscope_spark.operators.corpus import bigram_logprob

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = bigram_logprob(df)
    out.collect()  # reuse is decided at runtime (AQE stage cache)
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert txt.count("ReusedExchange") >= 2  # doc_bg + pair_counts


def test_pmi_vocab_is_takeordered_not_global_window(spark):
    # round-5 fix of the one r4 scale-killer: the top-V vocabulary cut
    # (and the final top-k) must compile to TakeOrderedAndProject —
    # per-partition top-V, driver merges V rows — never a row_number
    # over an unpartitioned Window, which forces the FULL distinct-
    # token table (~1e8-1e9 rows at 100 TB) through one task via an
    # Exchange SinglePartition + Sort + Window
    from spamscope_spark.plans.queries import q_pmi_pairs

    df = q_pmi_pairs(spark, SF)
    txt = explain.plan_text(df)
    assert "Window" not in txt
    assert "Exchange SinglePartition" not in txt
    assert "TakeOrderedAndProject" in txt
    # output is micro-unit BIGINT per the exact.py doctrine — no raw
    # rounded double remains in the schema
    assert dict(df.dtypes)["pmi_e6"] == "bigint"
    assert "pmi" not in dict(df.dtypes)


def _round_calls_with_scale(txt: str) -> list[str]:
    """All round(..., N) calls with N >= 1 in a plan string, scanned
    with balanced parens (regexes miss nested calls)."""
    out, i = [], 0
    while True:
        j = txt.find("round(", i)
        if j < 0:
            break
        depth, k = 0, j + 5
        while k < len(txt):
            if txt[k] == "(":
                depth += 1
            elif txt[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        call = txt[j : k + 1]
        i = k + 1
        tail = call.rsplit(",", 1)[-1].strip(" )")
        if tail.isdigit() and int(tail) > 0:
            out.append(call[:120])
    return out


def test_no_engine_ambiguous_round_in_any_query_output(spark):
    # round-5 doctrine gate (functions/exact.py): round(x, n) on DOUBLE
    # is engine-ambiguous at half boundaries (Spark rounds the
    # shortest-repr, DuckDB the exact binary), so NO registered query
    # may carry one anywhere in its plan. Exact-decimal sums use
    # round(x * 10^d) at scale 0 — integer recovery, never ambiguous —
    # which this scan deliberately permits.
    import __spark_entry__ as em

    offenders = {}
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        calls = _round_calls_with_scale(
            df._jdf.queryExecution().analyzed().toString()
        )
        if calls:
            offenders[name] = calls
    assert not offenders, offenders


def test_unpartitioned_windows_only_over_bounded_aggregates(spark):
    # regression guard for the PMI-class scale killer fixed in r5: an
    # UNPARTITIONED Window forces its whole input through one task, so
    # it is only acceptable over provably bounded tables. Exactly two
    # registered queries do that by design over bounded aggregate
    # tables — q_dsir_weights (model table, <= HASH_DIM rows) and
    # q_mixture_weights (per-language aggregate, <= |langs| rows) —
    # and q_event_paths ranks AFTER a TakeOrdered limit(k), so its
    # window input is <= k rows by construction (cep.py::top_paths).
    # Any new unpartitioned window must either be removed
    # (orderBy().limit() compiles to TakeOrdered) or justified here.
    import re

    import __spark_entry__ as em

    ALLOWED = {"q_dsir_weights", "q_mixture_weights", "q_event_paths"}
    unpartitioned = re.compile(
        r"windowspecdefinition\((?:[^,()]+ (?:ASC|DESC) [^,()]+, )*"
        r"specifiedwindowframe"
    )
    offenders = {}
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        txt = df._jdf.queryExecution().executedPlan().toString()
        for line in txt.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            # a partitioned spec lists partition columns BEFORE any
            # ordering/frame: windowspecdefinition(col#1, ... ASC ...,
            # frame). Unpartitioned specs begin with ordering or the
            # frame directly.
            for m in re.finditer(r"windowspecdefinition\(([^)]*?)specifiedwindowframe", line):
                head = m.group(1)
                first = head.split(",")[0].strip() if head.strip() else ""
                has_partition_col = bool(first) and not (
                    " ASC" in first or " DESC" in first
                )
                if not has_partition_col and name not in ALLOWED:
                    offenders.setdefault(name, line.strip()[:140])
    assert not offenders, offenders


def test_ann_sketch_composes_narrow_projection_with_broadcast_index(spark):
    # the composed scale path (q_ann_sketch) must keep its two halves'
    # plan contracts: the projection adds NO exchange of its own, and
    # the sketch-space index probe broadcasts the tiny query side
    from spamscope_spark.plans.queries import q_ann_sketch

    df = q_ann_sketch(spark, SF)
    txt = explain.plan_text(df)
    assert explain.has_broadcast_join(df)
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
