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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _shipped(fn) for name, fn in q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for every SQL-expressible query. Keys missing here
    (q_ann_lsh, q_ann_ivf, q_embedding_neardup, q_shingle_signatures,
    q_approx_distinct) are approximate operators → rows-only check;
    their exactness/tolerance is covered by tests/."""
    return dict(q.ORACLE_SQL)
