"""Shared per-key silence (heartbeat) kernel.

The same pure-Python core drives BOTH forms of the streaming
missing-event monitor: the foreachBatch fold (pipeline.
start_silence_query — global-max-window emission bound, r4's bounded
(last_active, last_emitted) state) and the Spark-4
`transformWithStateInPandas` twin (tws_silence — per-key timers, the
watermark as the emission bound). Keeping the timeline-extension math
in one place makes the two provably consistent: given the same
emission bound both extend a key's dense timeline identically.

State per key is the pair (last_active_us, last_emitted_us) — both
microsecond epoch ints, -1 when unset. Extension emits one row per
window in (last_emitted, bound], n filled from the arrived windows
(0 = silent), windows_since_seen counted from last_active. Cost per
call is O(new windows + arrived rows): constant in stream lifetime,
the property that fixed r3's O(T^2) monitor.
"""

from __future__ import annotations

UNSET = -1


def new_state() -> tuple[int, int]:
    return (UNSET, UNSET)


def extend(
    state: tuple[int, int],
    arrived: dict[int, int],
    bound_us: int,
    bucket_us: int,
) -> tuple[list[tuple[int, int, int, bool]], tuple[int, int]]:
    """Extend a key's dense timeline up to ``bound_us`` (inclusive,
    bucket-aligned). ``arrived`` maps window_start_us -> n for windows
    newly closed upstream. Returns (rows, new_state) where each row is
    (window_start_us, n, windows_since_seen, is_silent).

    First contact: a key's timeline starts at its first observed
    window (there is no "before the key existed"). After that the
    timeline is gap-free: every bucket up to the bound emits exactly
    once, silent or not."""
    last_active, last_emitted = state
    if last_emitted == UNSET:
        if not arrived:
            return [], state
        start = min(arrived)
    else:
        start = last_emitted + bucket_us
    rows: list[tuple[int, int, int, bool]] = []
    w = start
    while w <= bound_us:
        n = arrived.get(w, 0)
        if n > 0:
            last_active = w
        since = 0 if last_active == UNSET else (w - last_active) // bucket_us
        rows.append((w, n, since, n == 0))
        last_emitted = w
        w += bucket_us
    # windows that arrived beyond the bound stay pending: the caller
    # re-delivers them (foreachBatch) or the timer path picks them up
    # once the watermark passes (tws keeps them in state).
    return rows, (last_active, last_emitted)
