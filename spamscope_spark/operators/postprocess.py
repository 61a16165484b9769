"""Post-processor plugin chain — the reference's priority registry.

The reference wires optional analyses (spamassassin, dialect, external
intel like virustotal/shodan) as a set of `(function, priority)` tuples
built by an `@register(processors, priority, active)` decorator
(src/modules/utils.py:375-397); each bolt sorts its registry by
priority and runs every stage whose config section says `enabled`
(src/modules/mails/post_processing.py:41-96,
src/modules/networks/post_processing.py:50-98,
src/modules/attachments/post_processing.py:51-66), with each stage
adding one named sub-report to the record.

Spark recast: a stage is `(DataFrame, conf_section) -> DataFrame` that
ADDS COLUMNS (the sub-report) and never drops rows. `apply_postprocessors`
sorts the registry by (priority, name) and composes the enabled stages
into ONE logical plan — because every built-in stage is pure column
expressions (or a broadcast left join for the intel feed), Catalyst
fuses the whole chain into a single codegen projection; per-stage cost
is an expression, not a pass over the data. External-service lookups
(virustotal/shodan/zemana — per-record HTTP in the reference) are
recast as a broadcast-joined intel DIMENSION: at 100 TB you pre-fetch
the feed once and join, never call out per row.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Registry of (stage function, priority). Stage name = function name =
# its config-section key, exactly the reference's convention.
processors: set[tuple[Callable, int]] = set()


def register(registry: set, priority: int = 0, active: bool = True):
    """Stage decorator (utils.py:375-397 shape): active=True adds the
    (func, priority) pair to the registry, active=False removes it —
    flipping `active` in source is how the reference disables a
    processor without deleting it."""

    def decorate(func: Callable) -> Callable:
        if active:
            registry.add((func, priority))
        else:
            registry.discard((func, priority))
        return func

    return decorate


def apply_postprocessors(
    df: DataFrame,
    conf: dict,
    registry: set | None = None,
) -> DataFrame:
    """Applies every registered stage whose conf section is enabled, in
    (priority, name) order — deterministic where the reference's set
    iteration tie-break is not. `conf` maps stage name → that stage's
    config dict (must contain `enabled`, reference convention)."""
    reg = processors if registry is None else registry
    for func, _pri in sorted(reg, key=lambda t: (t[1], t[0].__name__)):
        section = conf.get(func.__name__) or {}
        if section.get("enabled"):
            df = func(df, section)
    return df


# ---------------------------------------------------------------------------
# Built-in stages — the reference's three post-processor families.
# ---------------------------------------------------------------------------


@register(processors, priority=10)
def spamassassin(df: DataFrame, conf: dict) -> DataFrame:
    """Rule-table scorer sub-report (mails/post_processing.py:71-92):
    adds sa_details / sa_score from the named-rule table."""
    from ..functions.rulescore import with_rule_score

    return with_rule_score(
        df,
        text_col=conf.get("text_col", "text"),
        rules=conf.get("rules"),
        prefix=conf.get("prefix", "sa"),
    )


@register(processors, priority=20)
def dialect(df: DataFrame, conf: dict) -> DataFrame:
    """Per-row dialect classification sub-report
    (mails/post_processing.py:96-126): classifies the row's text against
    the priority-ordered rule list, adding `dialect_pri` and
    `dialect_form` (null when no rule matches). The per-KEY sequence
    fingerprint is the separate `dialect_fingerprints` operator."""
    from ..functions.dialects import AGENT_DIALECT_RULES, classify_command

    rules = conf.get("rules", AGENT_DIALECT_RULES)
    text = F.lower(F.coalesce(F.col(conf.get("text_col", "text")), F.lit("")))
    c = classify_command(text, rules)
    return df.withColumn("dialect_pri", c["pri"]).withColumn(
        "dialect_form", F.trim(c["form"])
    )


@register(processors, priority=30)
def intel(df: DataFrame, conf: dict) -> DataFrame:
    """External-intel enrichment (networks/post_processing.py:67-98,
    attachments virustotal/thug/zemana): LEFT broadcast join against a
    pre-fetched feed dimension on `key` — rows absent from the feed keep
    null intel columns, exactly 'the service had no report'. conf:
    {feed: DataFrame, key: str}."""
    feed: DataFrame = conf["feed"]
    key = conf.get("key", "source")
    return df.join(F.broadcast(feed), on=key, how="left")


# ---------------------------------------------------------------------------
# Deterministic intel feed (the pre-fetched threat-feed dimension used by
# tests/queries; production passes its own feed DataFrame).
# ---------------------------------------------------------------------------

INTEL_FEED: list[tuple[str, int, str]] = [
    ("src1", 95, "malicious"),
    ("src3", 70, "suspicious"),
    ("src5", 15, "benign"),
    ("src7", 60, "suspicious"),
    ("src11", 90, "malicious"),
    ("src13", 5, "benign"),
]


def intel_feed_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        INTEL_FEED, "source string, reputation int, intel_category string"
    )


def sql_intel_feed() -> str:
    """DuckDB twin: the same feed as a VALUES relation."""
    rows = ", ".join(f"('{s}', {r}, '{c}')" for s, r, c in INTEL_FEED)
    return f"(VALUES {rows}) AS intel(source, reputation, intel_category)"


def sql_dialect_row(text_expr: str, rules: list[tuple[str, int]]) -> dict:
    """DuckDB twin of the per-row dialect stage columns."""
    low = f"lower(coalesce({text_expr}, ''))"
    pri = " ".join(
        f"WHEN regexp_extract({low}, '(?i){pat}') <> '' THEN {p}"
        for pat, p in rules
    )
    form = " ".join(
        f"WHEN regexp_extract({low}, '(?i){pat}') <> '' "
        f"THEN trim(regexp_extract({low}, '(?i){pat}'))"
        for pat, p in rules
    )
    return {
        "dialect_pri": f"CAST((CASE {pri} END) AS INT)",
        "dialect_form": f"(CASE {form} END)",
    }
