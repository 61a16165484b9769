"""Time-grid resampling: gap filling + forward fill over event streams.

Reference analog: the dialect correlator reconstructs a continuous
per-client SMTP command timeline from sparse, irregular log events
(`src/modules/dialects.py:166-228`, sorted-ascending time-range query)
— turning an irregular event stream into an ordered, dense timeline is
the same operation a monitoring rollup needs. The graft form: resample
the events stream onto a dense hourly grid per event_type, zero-fill
missing activity counts, and carry the last observed value metric
forward (the standard "no reading = previous reading" telemetry rule).

Scale shape: one partial-aggregated groupBy collapses the raw stream
to (type, hour) — at 100 TB that is the only pass over the data, and
it reduces ~10^12 rows to |types| x |hours| BEFORE anything else
happens. The dense grid is built from a 1-row bounds aggregate
`sequence()`-exploded against the distinct-type dimension (two
metadata-sized inputs, broadcast cross join — never a driver loop),
and the forward fill is a per-type running `last(ignorenulls)` window
over grid-sized (not data-sized) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import exact
from pyspark.sql import DataFrame, Window


def gap_fill_hourly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense (event_type, hour) grid over the observed time span with
    n_events zero-filled and avg_value_ffill carried forward."""
    hourly = events.groupBy(
        type_col, F.date_trunc("hour", ts_col).alias("hour")
    ).agg(
        F.count("*").alias("_n"),
        # mean from exact centi-unit integers: avg() of doubles is
        # summation-order-dependent, and round() turns that 1-ulp drift
        # into a hash mismatch at half boundaries (functions/exact.py;
        # first seen on this query at sf0.1)
        exact.round6_ratio(
            exact.centi_sum(F.col(value_col)), F.count("*") * 100
        ).alias("_avg"),
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("h1"),
    )
    grid_hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = events.select(type_col).distinct()
    grid = types.crossJoin(F.broadcast(grid_hours))
    filled = grid.join(hourly, [type_col, "hour"], "left")
    w = (
        Window.partitionBy(type_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        type_col,
        "hour",
        F.coalesce("_n", F.lit(0)).alias("n_events"),
        F.last("_avg", ignorenulls=True).over(w).alias("avg_value_ffill"),
    )


def sql_gap_fill_hourly(
    table: str = "events",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin: generate_series grid + IGNORE NULLS carry-forward."""
    return f"""
    WITH hourly AS (
        SELECT {type_col}, date_trunc('hour', {ts_col}) AS hour,
               count(*) AS n,
               {exact.sql_round6_ratio(exact.sql_centi_sum(value_col),
                                       "100 * COUNT(*)")} AS avg_v
        FROM {table} GROUP BY 1, 2
    ), b AS (
        SELECT date_trunc('hour', min({ts_col})) AS h0,
               date_trunc('hour', max({ts_col})) AS h1
        FROM {table}
    ), grid_hours AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM b
    ), grid AS (
        SELECT t.{type_col}, g.hour
        FROM (SELECT DISTINCT {type_col} FROM {table}) t
        CROSS JOIN grid_hours g
    )
    SELECT g.{type_col}, g.hour,
           coalesce(h.n, 0) AS n_events,
           last_value(h.avg_v IGNORE NULLS) OVER (
               PARTITION BY g.{type_col} ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ffill
    FROM grid g
    LEFT JOIN hourly h
      ON h.{type_col} = g.{type_col} AND h.hour = g.hour
    """
