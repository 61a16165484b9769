"""Config-driven custom column projection — the custom-header analog.

The reference lets each mailbox configure extra headers to project into
`custom_<name>` columns on the mail record (src/bolts/tokenizer.py:
142-144, driven by the per-mailbox YAML `custom_headers` list). The
engine recast: a config map of name → SQL expression, applied as a
narrow projection (`custom_<name>` columns) — the user-facing extension
point for per-source extra columns, no code change required.

Expressions are Catalyst SQL (`F.expr`), so they stay JVM-side and
prune/pushdown like hand-written columns; a mis-typed expression fails
at plan time, not mid-job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_custom_columns(
    df: DataFrame, spec: dict[str, str], prefix: str = "custom_"
) -> DataFrame:
    """Adds one `{prefix}{name}` column per spec entry (sorted by name
    for deterministic column order), each a SQL expression over the
    input row — the reference's custom_* header projection."""
    for name in sorted(spec):
        df = df.withColumn(f"{prefix}{name}", F.expr(spec[name]))
    return df


def sql_custom_columns(spec: dict[str, str], prefix: str = "custom_") -> str:
    """SELECT-list fragment for the DuckDB twin (expressions must be
    engine-portable, which config-authored projections should be)."""
    return ", ".join(f"{spec[n]} AS {prefix}{n}" for n in sorted(spec))
