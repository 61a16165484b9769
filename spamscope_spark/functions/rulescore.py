"""Rule-table scorer — the spamassassin-report analog.

The reference shells out to `spamassassin -t` and parses the epilogue
ASCII table into `{score: float, details: [{pts, rule name,
description}]}` (src/modules/mails/spamassassin_analysis.py:34-150,
report shape asserted at tests/test_spamassassin.py:52-67). An external
scorer binary has no place in a 100 TB scan; the faithful recast is a
DETERMINISTIC named-rule table — rule name → predicate → points —
evaluated as pure column expressions (JVM codegen, zero Python), which
is also how spamassassin itself works (a rules file of named regex
tests with per-rule scores).

Every predicate has a DuckDB twin so the whole scorer is
oracle-checkable; `report_py` mirrors the reference's report object
shape for the golden pytest.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Rule:
    name: str
    description: str
    pts: float
    spark_pred: Callable[[Column], Column]  # lowered text col -> bool col
    sql_pred: Callable[[str], str]  # lowered text expr -> bool SQL
    py_pred: Callable[[str], bool]  # lowered text -> bool (oracle/golden)


def _kw_any(words: list[str]) -> tuple:
    """ANY-of-substrings predicate in all three engines."""

    def spark(c: Column) -> Column:
        out = F.lit(False)
        for w in words:
            out = out | (F.instr(c, w) > 0)
        return out

    def sql(e: str) -> str:
        return "(" + " OR ".join(f"contains({e}, '{w}')" for w in words) + ")"

    def py(t: str) -> bool:
        return any(w in t for w in words)

    return spark, sql, py


def _regex(pattern: str) -> tuple:
    """Regex predicate (pattern must be RE2/Java/Python portable)."""

    def spark(c: Column) -> Column:
        return c.rlike(pattern)

    def sql(e: str) -> str:
        return f"regexp_matches({e}, '{pattern}')"

    def py(t: str) -> bool:
        return re.search(pattern, t) is not None

    return spark, sql, py


def _rule(name: str, description: str, pts: float, preds: tuple) -> Rule:
    return Rule(name, description, pts, *preds)


# Mirrors the reference's spamassassin surface: URI tests, HTML tests,
# body keyword tests, obfuscation tests. Points are fixed per rule
# (the reference reads them from spamassassin's rules files).
DEFAULT_RULES: list[Rule] = [
    _rule("URI_PRESENT", "Contains a URL", 0.5,
          _regex(r"\b(https?|ftps?)://")),
    _rule("HTML_FORM", "HTML form in body", 2.0,
          _regex(r"<form[\s>]")),
    _rule("PAY_KEYWORDS", "Payment-luring keywords", 2.5,
          _kw_any(["payment", "bonifico", "credit card", "wire transfer"])),
    _rule("URGENCY", "Urgency pressure words", 1.2,
          _kw_any(["urgent", "immediately", "act now", "verify your account"])),
    _rule("EXCESS_PUNCT", "Repeated !/? punctuation", 0.8,
          _regex(r"(!!|\?\?)")),
    _rule("B64_BLOB", "Long base64-looking run", 1.0,
          _regex(r"[a-z0-9+/]{48,}={0,2}")),
    _rule("TINY_BODY", "Suspiciously short body", 0.5,
          _regex(r"^.{0,19}$")),
]


def with_rule_score(
    df: DataFrame,
    text_col: str = "text",
    rules: list[Rule] | None = None,
    prefix: str = "sa",
) -> DataFrame:
    """Adds `{prefix}_details` (array<struct<pts,rule,description>> of
    matched rules, rule-table order — the reference report's `details`)
    and `{prefix}_score` (sum of points, 1 decimal — its `score`).
    Pure column expressions: one narrow projection, no shuffle."""
    rules = DEFAULT_RULES if rules is None else rules
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    entries = [
        F.when(
            r.spark_pred(lowered),
            F.struct(
                F.lit(r.pts).alias("pts"),
                F.lit(r.name).alias("rule"),
                F.lit(r.description).alias("description"),
            ),
        )
        for r in rules
    ]
    details = F.array_compact(F.array(*entries))
    # exact deci-point integer sum / 10.0: rule points are 1-decimal,
    # so the integer sum recovers the exact score (same value the old
    # round(fold, 1) produced) without the engine-ambiguous round()
    # (functions/exact.py doctrine)
    score = (
        sum(
            (
                F.when(r.spark_pred(lowered), F.lit(int(round(r.pts * 10))))
                .otherwise(F.lit(0))
                for r in rules
            ),
            F.lit(0),
        ).cast("bigint")
        / F.lit(10.0)
    )
    return df.withColumn(f"{prefix}_details", details).withColumn(
        f"{prefix}_score", score
    )


def sql_rule_score_columns(
    text_expr: str, rules: list[Rule] | None = None
) -> dict[str, str]:
    """DuckDB twins of the flattened scorer columns (structs flattened
    to name-list/count because the oracle hash compares stringified
    cells): sa_score, n_rules, rules."""
    rules = DEFAULT_RULES if rules is None else rules
    low = f"lower(coalesce({text_expr}, ''))"
    preds = [r.sql_pred(low) for r in rules]
    score = " + ".join(
        f"(CASE WHEN {p} THEN {int(round(r.pts * 10))} ELSE 0 END)"
        for p, r in zip(preds, rules)
    )
    n = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    names = ", ".join(
        f"(CASE WHEN {p} THEN '{r.name}' END)" for p, r in zip(preds, rules)
    )
    return {
        # integer deci-point sum, one exact division — mirrors the
        # Spark side bit-for-bit
        "sa_score": f"(CAST(({score}) AS BIGINT) / 10.0)",
        "n_rules": f"CAST({n} AS INT)",
        "rules": f"concat_ws(',', {names})",
    }


def report_py(text: str, rules: list[Rule] | None = None) -> dict:
    """Reference-shaped report object (obj_report analog,
    spamassassin_analysis.py:66-73): {score: float, details: [{pts,
    "rule name", description}]} — the golden-test oracle twin of
    with_rule_score."""
    rules = DEFAULT_RULES if rules is None else rules
    low = (text or "").lower()
    details = [
        {"pts": r.pts, "rule name": r.name, "description": r.description}
        for r in rules
        if r.py_pred(low)
    ]
    return {
        "score": round(sum(d["pts"] for d in details), 1),
        "details": details,
    }
