"""Dialect classification + fingerprinting — the second half of the
reference's dialect module.

The reference reconstructs a mail's correlated SMTP command sequence
(the time-band join, operators/joins.py), then: ① regex-classifies
each client command against a PRIORITY-ORDERED rule list, capturing the
client's exact PHRASING of the command (`(?:ehlo|helo)\\s*` matches
"EHLO " vs "helo" — that phrasing variance IS the dialect), ② keeps the
distinct (phrasing, priority) pairs sorted by priority, ③ joins them to
the canonical dialect string and ④ fingerprints it
(src/modules/mails/dialects.py:249-324; golden expectations at
tests/test_dialect.py:54-111).

Spark recast: classification is a priority-ordered `regexp_extract`
chain (pure column expr), the per-key sequence is a `collect_set` of
(priority, form) structs sorted JVM-side, fingerprints are md5/sha
built-ins — one shuffle per keyed dialect, no Python.

Deviation (documented): the reference sorts ties (two phrasings at one
priority) by Python set iteration order — nondeterministic; we sort by
(priority, form), which is deterministic and testable.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# The reference's exact client-command rules (dialects.py:47-53),
# reimplemented for the golden tests. Priorities define the canonical
# command order HELO < MAIL FROM < RCPT TO < DATA < QUIT.
SMTP_DIALECT_RULES: list[tuple[str, int]] = [
    (r"(?:ehlo|helo)\s*", 0),
    (r"mail\s+from\s*:?\s*", 1),
    (r"rcpt\s+to\s*:?\s*", 2),
    (r"^[\b\s]*data[\b\s]*$", 3),
    (r"^[\b\s]*quit[\b\s]*$", 4),
]

# The graft's agent-command rules: classify tool-invocation commands /
# event kinds into a canonical interaction order (browse < act <
# enroll < fail). Patterns are RE2/Java/Python-portable.
AGENT_DIALECT_RULES: list[tuple[str, int]] = [
    (r"(?:view|click|scroll)\w*", 0),
    (r"(?:purchase|checkout|pay)\w*", 1),
    (r"(?:signup|register|login)\w*", 2),
    (r"(?:error|fail|abort)\w*", 3),
]


def get_dialect(
    messages: list[tuple[str, str]],
    rules: list[tuple[str, int]] | None = None,
    speaker: str = "client",
) -> list[str]:
    """Pure-Python reference twin (get_dialect, dialects.py:249-270):
    list of (speaker, text) → distinct matched phrasings sorted by rule
    priority (ties by phrasing — see module docstring)."""
    rules = SMTP_DIALECT_RULES if rules is None else rules
    found: set[tuple[str, int]] = set()
    for pat, pri in rules:
        rx = re.compile(pat, re.I)
        for who, text in messages:
            if who == speaker:
                m = rx.findall(text)
                if m:
                    found.add((m[0], pri))
    return [form for form, _ in sorted(found, key=lambda t: (t[1], t[0]))]


def get_dialect_str(dialect: list[str]) -> str:
    """dialects.py:283-294: canonical space-joined dialect string."""
    return " ".join(dialect)


def classify_command(
    cmd: Column, rules: list[tuple[str, int]]
) -> Column:
    """Column form of one command's classification: struct(priority,
    form) of the FIRST matching rule in priority order, null if none.
    regexp_extract('', …) = '' marks no-match (both engines agree)."""
    out = F.lit(None).cast("struct<pri:int,form:string>")
    for pat, pri in reversed(rules):
        form = F.regexp_extract(cmd, f"(?i){pat}", 0)
        out = F.when(
            form != "",
            F.struct(F.lit(pri).alias("pri"), form.alias("form")),
        ).otherwise(out)
    return out


def dialect_fingerprints(
    df: DataFrame,
    key: str,
    cmd_col: str,
    rules: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Per-key dialect report: the distinct matched phrasings sorted by
    (priority, form), joined to `dialect`, plus md5/sha1/sha256
    fingerprints (get_dialect_fingerprints, dialects.py:287-301).
    One groupBy shuffle; arrays sorted JVM-side."""
    rules = AGENT_DIALECT_RULES if rules is None else rules
    cls = df.select(
        F.col(key), classify_command(F.col(cmd_col), rules).alias("c")
    ).where(F.col("c").isNotNull())
    # struct sort order = field order (pri, form) — exactly our tie rule
    dialect = (
        cls.groupBy(key)
        .agg(F.array_sort(F.collect_set("c")).alias("cs"))
        .select(
            F.col(key),
            F.array_join(
                F.transform("cs", lambda x: x["form"]), " "
            ).alias("dialect"),
        )
    )
    return dialect.select(
        key,
        "dialect",
        F.md5("dialect").alias("dialect_md5"),
        F.sha1("dialect").alias("dialect_sha1"),
        F.sha2("dialect", 256).alias("dialect_sha256"),
    )


def sql_dialect_fingerprints(
    table: str,
    key: str,
    cmd_expr: str,
    rules: list[tuple[str, int]] | None = None,
) -> str:
    """DuckDB twin of dialect_fingerprints."""
    rules = AGENT_DIALECT_RULES if rules is None else rules
    whens = " ".join(
        f"WHEN regexp_extract({cmd_expr}, '(?i){pat}') <> '' THEN {pri}"
        for pat, pri in rules
    )
    forms = " ".join(
        f"WHEN regexp_extract({cmd_expr}, '(?i){pat}') <> '' "
        f"THEN regexp_extract({cmd_expr}, '(?i){pat}')"
        for pat, pri in rules
    )
    return f"""
    WITH cls AS (
        SELECT {key},
               CASE {whens} END AS pri,
               CASE {forms} END AS form
        FROM {table}
    ), dial AS (
        SELECT {key}, string_agg(form, ' ' ORDER BY pri, form) AS dialect
        FROM (SELECT DISTINCT {key}, pri, form FROM cls WHERE pri IS NOT NULL)
        GROUP BY {key}
    )
    SELECT {key}, dialect,
           md5(dialect) AS dialect_md5,
           sha256(dialect) AS dialect_sha256
    FROM dial
    """
