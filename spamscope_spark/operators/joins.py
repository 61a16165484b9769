"""Temporal joins: time-band (interval) join and as-of join.

The reference's dialect correlation queries Postfix logs in a time band
`@timestamp ∈ [t-30s, t+10s]` around the mail event, with equality on
client ip/name (src/modules/dialects.py:57-139) — an interval join
between two event streams. In the graft this correlates tool-invocation
turns with their tool-response turns.

Batch forms below are plain declarative joins (Catalyst chooses
broadcast/shuffle; the equality keys make them hash joins with the
time band as a post-join filter). The streaming form — the same join
under a watermark — lives in streaming/pipeline.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def time_band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -30,
    upper_s: int = 10,
    how: str = "inner",
) -> DataFrame:
    """left ⋈ right on equality keys + right.ts ∈ [left.ts+lower, left.ts+upper].

    Dialect-analog defaults (±30s/+10s, dialects.py:94-139). All right
    columns get a `r_` prefix. The band is part of the join condition,
    so outer joins keep unmatched left rows."""
    rhs = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = F.lit(True)
    for c in on:
        cond = cond & (left[c] == F.col(f"r_{c}"))
    band = (
        F.col(f"r_{right_ts}")
        >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS")
    ) & (
        F.col(f"r_{right_ts}")
        <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS")
    )
    return left.join(rhs, on=cond & band, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    horizon_s: int | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (backward) / at or after (forward) its timestamp, per key.
    Left-join semantics: a left row with no match keeps null r_* columns.

    Implemented in the sort-merge form: both sides are tagged and
    UNIONed, one window per equality key ordered by timestamp carries
    the running `last(right_row, ignorenulls)` — ONE shuffle on the
    keys, O(L+R) per key, with NO intermediate pair expansion. (The
    naive equality-join + row_number form materializes every
    (left, earlier-right) pair per key before pruning — O(L×R) on a hot
    key, quadratic at scale.)

    Ties: among right rows sharing the winning timestamp, the highest
    `tiebreak` tuple wins (they sort ascending, so the running `last`
    lands on the max). `horizon_s` bounds how stale a match may be —
    matches outside the horizon are nulled (same rows as a bounded
    join + prune would yield)."""
    ts_c, side_c, match_c = "_asof_ts", "_asof_side", "_asof_match"
    l_struct = F.struct(*[left[c].alias(c) for c in left.columns])
    r_struct = F.struct(*[right[c].alias(c) for c in right.columns])
    lhs = left.select(
        *[left[c].alias(c) for c in on],
        F.col(left_ts).alias(ts_c),
        F.lit(1).alias(side_c),
        l_struct.alias("_l"),
        F.lit(None).cast(right.schema).alias("_r"),
    )
    rhs = right.select(
        *[right[c].alias(c) for c in on],
        F.col(right_ts).alias(ts_c),
        F.lit(0).alias(side_c),
        F.lit(None).cast(left.schema).alias("_l"),
        r_struct.alias("_r"),
    )
    u = lhs.unionByName(rhs)
    # Scan order: right rows sort before left rows at equal ts (the
    # comparison is inclusive), so a left row's frame already contains
    # same-timestamp right rows; tiebreak ascending makes the running
    # `last` pick the max tiebreak among equal-ts candidates.
    if direction == "backward":
        order = [F.col(ts_c).asc(), F.col(side_c).asc()]
    else:
        order = [F.col(ts_c).desc(), F.col(side_c).asc()]
    order += [F.col(f"_r.{c}").asc() for c in (tiebreak or [])]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(match_c, F.last("_r", ignorenulls=True).over(w)).where(
        F.col(side_c) == 1
    )
    if horizon_s is not None:
        m_ts = F.col(f"{match_c}.{right_ts}")
        if direction == "backward":
            in_horizon = m_ts >= F.col(ts_c) - F.expr(f"INTERVAL {horizon_s} SECONDS")
        else:
            in_horizon = m_ts <= F.col(ts_c) + F.expr(f"INTERVAL {horizon_s} SECONDS")
        out = out.withColumn(
            match_c, F.when(in_horizon, F.col(match_c))  # else null (no match)
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"{match_c}.{c}").alias(f"r_{c}") for c in right.columns],
    )


def tool_response_join(
    turns: DataFrame,
    band_s: int = 600,
) -> DataFrame:
    """Correlate tool-invocation turns (role='assistant', tool set) with
    their tool-response turns (role='tool', same conv + tool), response
    within (invocation_ts, invocation_ts + band_s], earliest response
    wins — the dialect message-correlation recast (dialects.py:166-228).

    Returns one row per invocation with resp_* columns (left join: an
    unanswered invocation survives with nulls — unlike the reference's
    JsonMaker, which would buffer forever, json_maker.py:82-88)."""
    inv = turns.where((F.col("role") == "assistant") & F.col("tool").isNotNull())
    resp = turns.where((F.col("role") == "tool") & F.col("tool").isNotNull()).select(
        F.col("conv_id").alias("resp_conv_id"),
        F.col("tool").alias("resp_tool"),
        F.col("turn_idx").alias("resp_turn_idx"),
        F.col("ts").alias("resp_ts"),
        F.col("text").alias("resp_text"),
    )
    cond = (
        (F.col("resp_conv_id") == inv["conv_id"])
        & (F.col("resp_tool") == inv["tool"])
        & (F.col("resp_ts") > inv["ts"])
        & (F.col("resp_ts") <= inv["ts"] + F.expr(f"INTERVAL {band_s} SECONDS"))
        & (F.col("resp_turn_idx") > inv["turn_idx"])
    )
    joined = inv.join(resp, on=cond, how="left").drop("resp_conv_id", "resp_tool")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("resp_ts").asc_nulls_last(), F.col("resp_turn_idx").asc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
