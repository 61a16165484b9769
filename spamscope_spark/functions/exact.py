"""Cross-engine-exact rounding of integer ratios.

`round(p / q, 6)` on a DOUBLE is AMBIGUOUS at half boundaries: Spark
rounds the shortest decimal repr (Double.toString + BigDecimal HALF_UP)
while DuckDB rounds the exact binary value, so a ratio like
2094/32000 — shortest repr 0.0654375, true binary 0.06543749999... —
rounds to 0.065438 on Spark and 0.065437 on DuckDB. Any output column
that rounds a ratio of integers with a small denominator can hit this
(first seen: q_hash_classifier at sf0.001).

The fix: round the RATIONAL, not the double. For non-negative integer
p and positive integer q,

    round_half_up(p/q, 6) = floor((2*p*10^6 + q) / (2*q)) / 10^6

is exact integer arithmetic on both engines; the final /10^6 is one
IEEE division of the same exact integer on both sides, hence
bit-identical. Non-boundary rows keep the exact same value the old
round() produced (the two differ only within ~1e-16 of a boundary),
so already-green hashes are unchanged.

Spark-side floor(double-division) is safe here: the quotient's
fractional part is a multiple of 1/(2q), so it can only approach 1 to
within 1/(2q) — a misrounding across the floor needs q >= ~5e9, far
beyond any ratio this engine rounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_M = 1_000_000


def round6_ratio(p: Column, q: Column) -> Column:
    """round(p/q, 6) as DOUBLE, computed exactly from the rational.
    p >= 0, q > 0 integers (cast happens here); NULL in, NULL out."""
    p64 = p.cast("bigint")
    q64 = q.cast("bigint")
    scaled = F.floor((2 * p64 * _M + q64) / (2 * q64)).cast("bigint")
    return scaled.cast("double") / F.lit(float(_M))


def sql_round6_ratio(p: str, q: str) -> str:
    """DuckDB twin — integer // is an exact floor."""
    return (
        f"(CAST((2 * CAST({p} AS BIGINT) * {_M} + CAST({q} AS BIGINT))"
        f" // (2 * CAST({q} AS BIGINT)) AS DOUBLE) / {_M})"
    )
