"""Driver-session emulation: hash parity under a DEFAULT SparkSession.

The driver's correctness gate runs queries() with ITS OWN SparkSession,
not build_session() — so any hidden dependence on repo-side session
config (timezone, ANSI mode, arrow settings) would pass every local
mirror and still fail the driver. `spark.newSession()` shares the JVM
but resets every runtime SQL conf to its default, which is exactly the
exposure the driver has.

Normalization is the STRICT form (pandas fetch both sides + str()):
DuckDB HUGEINT -> float64 and Spark DATE -> datetime.date asymmetries
— the reproduced mechanism behind the five r3 driver hash-fails — are
visible under it (tools/check_dtypes.py documents the mechanism).
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# Float-heavy / previously-red / temporally-typed queries: the surface
# where session config or fetch-path asymmetry could bite.
PARITY_QUERIES = [
    "q_mixture_weights",   # r3 driver-red: HUGEINT lang_tokens
    "q_repetition_stats",  # r3 driver-red: HUGEINT n_words + rounded ratios
    "q_pagerank",          # r3 driver-red: HUGEINT rank (all-integer plan)
    "q_dsir_weights",      # r3 driver-red: HUGEINT n_tok + float log-sums
    "q_seq_packing",       # r3 driver-red: HUGEINT tok_start
    "q_date_funcs",        # DATE output (now ISO strings) + float sums
    "q_cohort_retention",  # DATE output (now ISO strings) + ratios
    "q_stats_agg",         # avg/stddev float aggregates
    # half-boundary rounding fixes (functions/exact.py): each of these
    # rounds an integer ratio / centi-exact mean that round(double, 6)
    # made engine-ambiguous
    "q_hash_classifier",   # the sf0.001 divergence that exposed it
    "q_gap_fill",          # the sf0.1 divergence (summation order)
    "q_pricing_summary",   # avg_qty / avg_price, centi-exact means
    "q_markov_transitions",
    "q_funnel",
    "q_ngram_jaccard",     # rounded value gates row membership
    "q_dataset_split",     # new r4: salted split audit
    "q_phrase_search",     # new r4: all-integer phrase counts
    "q_containment_decon",  # new r4: containment ratio
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "␀"
    if isinstance(v, float) and math.isnan(v):
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash(df):
    cols = sorted(df.columns)
    lines = sorted(
        "|".join(_norm(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def default_session(spark):
    # newSession(): same JVM, every runtime SQL conf back to default —
    # the closest in-process emulation of the driver's session.
    return spark.newSession()


@pytest.fixture(scope="module")
def duck_views():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_default_session_hash_parity(default_session, duck_views, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](default_session, SF_DIR).toPandas()
    odf = duck_views.execute(oracles[name]).df()
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf), f"{name}: value hash mismatch"
