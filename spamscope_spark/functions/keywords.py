"""Keyword / target matching as pure Catalyst column expressions.

Semantics (reference src/modules/utils.py:175-210): a keyword *line*
"w1 w2" matches iff ALL words are lowercase substrings of the text; a
keyword *list* matches iff ANY line matches; targets map names to lists.

The reference benchmarked substring containment as 5-1000x faster than
regex/pyparsing (tests/timing_test_search_keywords.py:222-229); we keep
substring semantics but push it into the JVM via `instr` — fully inside
whole-stage codegen, no Python at all. `sql_*` twins emit the equivalent
ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def line_matches(text: Column, line: str) -> Column:
    """(w1 AND w2 AND ...) for one keyword line."""
    words = str(line).lower().split()
    pred = F.lit(True)
    for w in words:
        pred = pred & (F.instr(F.lower(text), w) > 0)
    return pred


def search_words(text: Column, keywords: list) -> Column:
    """OR over keyword lines (search_words_in_text, utils.py:191-210)."""
    pred = F.lit(False)
    for line in keywords:
        pred = pred | line_matches(text, str(line))
    return pred


def matched_targets(text: Column, target_keys: dict[str, list]) -> Column:
    """array<string> of matching target names, sorted (utils.py:175-188)."""
    entries = [
        F.when(search_words(text, kws), F.lit(name))
        for name, kws in sorted(target_keys.items())
    ]
    if not entries:
        return F.array().cast("array<string>")
    return F.filter(F.array(*entries), lambda x: x.isNotNull())


# ---- SQL twins (DuckDB + Spark SQL compatible) ----------------------------


def sql_line_matches(text_expr: str, line: str) -> str:
    words = str(line).lower().split()
    return "(" + " AND ".join(
        f"instr(lower({text_expr}), {_sql_quote(w)}) > 0" for w in words
    ) + ")"


def sql_search_words(text_expr: str, keywords: list) -> str:
    if not keywords:
        return "FALSE"
    return "(" + " OR ".join(sql_line_matches(text_expr, str(l)) for l in keywords) + ")"
