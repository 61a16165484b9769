"""Distributed linear regression via sufficient statistics.

The scale-correct way to fit (streaming-friendly, one pass, no
iterations): aggregate the five sufficient sums (n, Σx, Σy, Σxy, Σx²
— plus Σy² for R²) with map-side partial aggregation, then compute
slope/intercept/r² in closed form as column arithmetic. No driver
state, no gradient loop, no shuffle beyond the one groupBy — the same
shape as any other partial-aggregated metric, so it runs identically
over a 10^12-row table or inside a windowed stream.

The estimates are the exact OLS solution, so the DuckDB twin can use
its built-in regr_slope/regr_intercept/regr_r2/corr and hash-match —
an *analytic* oracle rather than a reimplementation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import exact


def grouped_linreg(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
    min_n: int = 2,
) -> DataFrame:
    """Per-group OLS fit y ~ a + b·x from one aggregation pass.

    Returns (group, n, slope, intercept, r2, corr), rounded to 6
    decimals for cross-engine float stability. Groups with fewer than
    `min_n` points or zero x-variance yield null slope/r² (matching
    SQL regr_* semantics of undefined fits). Rows where either x or y
    is null are excluded (regr_* pair semantics)."""
    both = x.isNotNull() & y.isNotNull()
    g = (
        df.where(both)
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    # centered second moments (n·Cov, n·Var): numerically identical to
    # the textbook Σ(x-x̄)(y-ȳ) form up to fp rounding, one pass
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cxy / cxx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cxy * cxy) / (cxx * cyy)
    corr = cxy / F.sqrt(cxx * cyy)
    ok = (F.col("n") >= min_n) & (cxx > 0)
    oky = ok & (cyy > 0)
    # half-up micro-unit BIGINT (functions/exact.py): the oracle twin
    # deliberately uses DuckDB's independent regr_* aggregates, so the
    # two engines' doubles differ in ulps; exact-line fixtures put the
    # true value ON the grid (slope == 2.0), where round(x, 6) was
    # engine-ambiguous and plain floor would flip on that ulp noise —
    # the half-up form sits a full half-unit from its boundary there
    return g.select(
        F.col("grp").alias(group_col),
        "n",
        F.when(ok, exact.half_up_units(slope, 6)).alias("slope_e6"),
        F.when(ok, exact.half_up_units(intercept, 6)).alias("intercept_e6"),
        F.when(oky, exact.half_up_units(r2, 6)).alias("r2_e6"),
        F.when(oky, exact.half_up_units(corr, 6)).alias("corr_e6"),
    )


def sql_grouped_linreg(
    table: str, group_col: str, x_expr: str, y_expr: str, min_n: int = 2
) -> str:
    """DuckDB twin using the engine's own analytic regression
    aggregates — an independent implementation, not a port of ours."""
    return f"""
    SELECT {group_col},
        CAST(COUNT(*) AS BIGINT) AS n,
        CASE WHEN COUNT(*) >= {min_n} AND var_pop({x_expr}) > 0
             THEN {exact.sql_half_up_units(f"regr_slope({y_expr}, {x_expr})", 6)}
             END AS slope_e6,
        CASE WHEN COUNT(*) >= {min_n} AND var_pop({x_expr}) > 0
             THEN {exact.sql_half_up_units(
                 f"regr_intercept({y_expr}, {x_expr})", 6)}
             END AS intercept_e6,
        CASE WHEN COUNT(*) >= {min_n} AND var_pop({x_expr}) > 0
                  AND var_pop({y_expr}) > 0
             THEN {exact.sql_half_up_units(f"regr_r2({y_expr}, {x_expr})", 6)}
             END AS r2_e6,
        CASE WHEN COUNT(*) >= {min_n} AND var_pop({x_expr}) > 0
                  AND var_pop({y_expr}) > 0
             THEN {exact.sql_half_up_units(f"corr({y_expr}, {x_expr})", 6)}
             END AS corr_e6
    FROM {table}
    WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL
    GROUP BY {group_col}
    """
