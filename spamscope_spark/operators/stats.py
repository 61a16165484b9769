"""Dataset statistics: distributed column profiling + chi-square
contingency (independence) testing.

Reference analog: the operational summaries SpamScope pushes to
Elasticsearch exist so an analyst can profile the mail corpus (field
cardinalities, value ranges, campaign/time associations) in Kibana.
Here those reads are native operators over the warehouse table.

Scale shapes:
- `profile_columns` is ONE aggregation pass: every per-column metric
  (row/null counts as exact integer sums, exact distinct counts, typed
  min/max) is computed in a single `agg` over one scan — the exact
  multi-column distinct uses Catalyst's expand (k copies of each row
  keyed by column ordinal, one shuffle), which is the standard exact
  shape; swap `countDistinct` for `approx_count_distinct` at 100 TB to
  drop the expand entirely (same plan otherwise). The wide 1-row
  result is exploded driver-free into one row per column.
- `chi2_independence` is one groupBy to the contingency table
  (|rows|x|cols| cells, partial-aggregated), margins as window sums
  over cell-sized data, expected counts and the statistic as exact
  integer products divided at the end — no second pass over raw data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import exact
from pyspark.sql import Column, DataFrame, Window


def profile_columns(
    df: DataFrame, cols: list[tuple[str, Column | None]]
) -> DataFrame:
    """One-pass profile. `cols` is a list of (name, numeric_expr) where
    numeric_expr (nullable) is the column's numeric view for min/max —
    None for columns profiled on counts/cardinality only (strings).
    Output: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for name, num in cols:
        aggs.append(
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nulls_{name}")
        )
        aggs.append(F.countDistinct(F.col(name)).alias(f"_nd_{name}"))
        # no rounding: min/max of a column IS one of its values (the
        # profiled numeric views are integers, epoch seconds, or
        # exactly-2-decimal doubles — a round(x, 6) was a no-op, and
        # round() is the engine-ambiguous primitive the exact.py
        # doctrine bans from output schemas)
        mn = F.min(num) if num is not None else F.lit(None)
        mx = F.max(num) if num is not None else F.lit(None)
        aggs.append(mn.cast("double").alias(f"_mn_{name}"))
        aggs.append(mx.cast("double").alias(f"_mx_{name}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_nulls_{name}").alias("n_nulls"),
                F.col(f"_nd_{name}").alias("n_distinct"),
                F.col(f"_mn_{name}").alias("min_num"),
                F.col(f"_mx_{name}").alias("max_num"),
            )
            for name, _ in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def sql_profile_columns(
    table: str, cols: list[tuple[str, str | None]]
) -> str:
    """DuckDB twin: one branch per column over the same base relation
    (DuckDB fuses them; the Spark side is the single-pass form)."""
    branches = []
    for name, num in cols:
        mn = f"min({num})" if num is not None else "NULL"
        mx = f"max({num})" if num is not None else "NULL"
        branches.append(
            f"""SELECT '{name}' AS col_name,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_nulls,
                CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
                CAST({mn} AS DOUBLE) AS min_num,
                CAST({mx} AS DOUBLE) AS max_num
            FROM {table}"""
        )
    return " UNION ALL ".join(branches)


def chi2_independence(
    df: DataFrame, row_col: Column, col_col: Column
) -> DataFrame:
    """Per-cell contingency with expected counts and chi-square
    contributions: (r, c, n, expected, contrib). Margins are window
    sums over the aggregated cell table; expected = row_tot*col_tot/N
    from exact integer totals, rounded at 6dp for the cross-engine
    hash."""
    cells = df.groupBy(
        row_col.alias("r"), col_col.alias("c")
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    # grand total as a broadcast 1-row aggregate, not a global window
    # (an empty partitionBy funnels the cell table through one task)
    tot = cells.agg(F.sum("n").alias("_tot"))
    withm = cells.select(
        "r",
        "c",
        "n",
        F.sum("n").over(wr).alias("_rt"),
        F.sum("n").over(wc).alias("_ct"),
    ).crossJoin(F.broadcast(tot))
    expected = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_tot").cast("double")
    )
    contrib = (F.col("n") - expected) * (F.col("n") - expected) / expected
    return withm.select(
        "r",
        "c",
        "n",
        # expected is an exact integer ratio rt*ct/tot — round the
        # rational (functions/exact.py). contrib is a float chain, but
        # one mirrored op-for-op in the oracle, so both engines hold
        # the bit-identical double — floor-quantization to micro-units
        # is then fully deterministic, where round(x, 6) splits at half
        # boundaries (exact-integer rationals like contrib CAN land on
        # them; the integer-arithmetic form would overflow BIGINT)
        exact.round6_ratio(
            F.col("_rt") * F.col("_ct"), F.col("_tot")
        ).alias("expected"),
        exact.floor_units(contrib, 6).alias("contrib_e6"),
    )


def sql_chi2_independence(
    table: str, row_expr: str, col_expr: str
) -> str:
    """DuckDB twin — same margins-by-window construction."""
    return f"""
    WITH cells AS (
        SELECT {row_expr} AS r, {col_expr} AS c,
               CAST(count(*) AS BIGINT) AS n
        FROM {table} GROUP BY 1, 2
    ), m AS (
        SELECT r, c, n,
               SUM(n) OVER (PARTITION BY r) AS rt,
               SUM(n) OVER (PARTITION BY c) AS ct,
               SUM(n) OVER () AS tot
        FROM cells
    )
    SELECT r, c, n,
        {exact.sql_round6_ratio("rt * ct", "tot")}
            AS expected,
        {exact.sql_floor_units(
            "(n - CAST(rt AS DOUBLE) * ct / tot)"
            " * (n - CAST(rt AS DOUBLE) * ct / tot)"
            " / (CAST(rt AS DOUBLE) * ct / tot)", 6)} AS contrib_e6
    FROM m
    """
