"""Shared per-key burst (rate z-score) kernel.

The same pure-Python core drives BOTH forms of the streaming burst
monitor: the foreachBatch fold (pipeline.start_anomaly_query, which
re-reads the count-table-sized sink history each epoch — correct, but
O(|keys| x |windows|) per epoch over the stream's lifetime) and the
Spark-4 `transformWithStateInPandas` twin (tws_anomaly — a bounded
per-key deque of the trailing `lookback` observed windows, O(arrived)
per batch regardless of lifetime).

The scoring math mirrors operators/cep.py::score_rate_windows
EXPRESSION-FOR-EXPRESSION: exact integer sums s1/s2 over the trailing
observed windows, the zero-variance guard as the exact integer
predicate m*s2 - s1*s1 > 0, mean as the exact rational
round_ratio(s1, m, 4), and z quantized half-up to 1e-4-unit ints —
CPython float arithmetic is the same IEEE-754 the JVM executes, so for
identical operand order the kernel's doubles are bit-identical to the
column expression's (pinned by TestTwsAnomaly kernel-vs-batch parity).
"""

from __future__ import annotations

import math


def new_state() -> tuple[int, list[tuple[int, int]]]:
    """(last_scored_window_us, trailing deque of (window_us, n))."""
    return (-1, [])


def _mean_ratio(s1: int, m: int) -> float:
    # exact.round_ratio(s1, m, 4) in integer arithmetic
    return float((2 * s1 * 10_000 + m) // (2 * m)) / 10_000.0


def score_and_push(
    state: tuple[int, list[tuple[int, int]]],
    arrived: dict[int, int],
    lookback: int,
    min_history: int,
    z_threshold: float,
) -> tuple[list[tuple[int, int, int, float | None, int | None, bool]],
           tuple[int, list[tuple[int, int]]]]:
    """Score each newly-closed window against the key's trailing
    observed windows, then push it into the deque. Windows at or
    before the last scored one are replay deliveries and are skipped
    (the upstream append-mode agg emits each window exactly once).

    Returns (rows, new_state); each row is
    (window_us, n, n_prev, mean_prev, z_e4, is_anomaly)."""
    last_w, hist = state
    thr_e4 = int(round(z_threshold * 10_000))
    rows = []
    for w in sorted(arrived):
        if w <= last_w:
            continue
        n = arrived[w]
        m = len(hist)
        s1 = sum(x for _, x in hist)
        s2 = sum(x * x for _, x in hist)
        var_num = m * s2 - s1 * s1
        mean_prev = _mean_ratio(s1, m) if m > 0 else None
        z_e4 = None
        if m > 1 and var_num > 0:
            z = (n - s1 / m) / math.sqrt((s2 - s1 * s1 / m) / (m - 1))
            z_e4 = math.floor(z * 10_000.0 + 0.5)
        is_anomaly = bool(
            m >= min_history and var_num > 0
            and z_e4 is not None and z_e4 >= thr_e4
        )
        rows.append((w, n, m, mean_prev, z_e4, is_anomaly))
        hist = (hist + [(w, n)])[-lookback:]
        last_w = w
    return rows, (last_w, hist)
