"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming analog of the
batch ``operators/sessions.py`` window pass.

State per user: (session_start_epoch, last_event_epoch, n_events).
Each micro-batch merges its (sorted) events into the open session; a
gap > ``gap_minutes`` CLOSES the running session — the closed session
row is emitted and a new session opens. Output mode is ``update``
(closed sessions only; the open tail stays in state until a later
batch closes it).

At scale: state is one tiny fixed-width row per active user, sharded
by the stream's groupBy(user) exchange; the state store (RocksDB on a
real cluster) bounds memory, and the per-batch work is one Arrow
round-trip per user group — the pandas function touches only that
user's new events, never history (history is the 3-tuple state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, duration_sec long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def _epochs(pdfs: Iterator[pd.DataFrame], ts_col: str) -> list[int]:
    parts = [pdf[ts_col] for pdf in pdfs]
    if not parts:
        return []
    ts = pd.concat(parts).sort_values()
    return (ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000).tolist()


def make_sessionizer(gap_minutes: int = 30, ts_col: str = "ts",
                     idle_timeout: bool = False):
    """Returns the (key, batches, state) function for
    applyInPandasWithState — split out so the pure-Python session
    merge is unit-testable without a streaming query.

    ``idle_timeout=True`` arms an event-time timeout at last+gap: when
    the watermark passes it with no new events for the user, the open
    session is emitted as closed and the state removed — without this,
    a departed user's session stays open forever (NoTimeout only closes
    on a LATER event for the same user)."""
    gap = gap_minutes * 60

    _COLS = ["user_id", "session_start", "session_end", "n_events",
             "duration_sec"]

    def _close(key0, s, e, cnt):
        return (key0, pd.Timestamp(s, unit="s"), pd.Timestamp(e, unit="s"),
                cnt, e - s)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if getattr(state, "hasTimedOut", False):
            # watermark passed last+gap with no new events → the open
            # session is definitively closed; emit it and drop state.
            start, last, n = state.get if state.exists else (None, None, 0)
            state.remove()
            if start is not None and n:
                yield pd.DataFrame([_close(key[0], start, last, n)],
                                   columns=_COLS)
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        # Out-of-order arrivals: `last` must stay monotone or gap
        # detection corrupts (a late event would rewind it and the next
        # on-time event would spuriously close a live session). Late
        # events within gap of the open session are absorbed (start
        # extends backwards); genuinely-late ones are gap-chained among
        # THEMSELVES and each chain emits as one closed session —
        # matching what the batch sessionizer produces for those
        # events, not N singletons.
        late_chain: list[int] = []  # (start, last, n) of the late chain

        def flush_late():
            if late_chain:
                closed.append(_close(key[0], late_chain[0], late_chain[1],
                                     late_chain[2]))
                late_chain.clear()

        for e in _epochs(pdfs, ts_col):
            if last is not None and e <= last:
                if e + gap >= start:
                    n += 1
                    start = min(start, e)
                    # absorbing a late event can extend start backwards
                    # to within gap of a pending late chain's tail — the
                    # batch sessionizer would see one contiguous session,
                    # so fold the chain in instead of flushing it as a
                    # separate closed session later.
                    if late_chain and late_chain[1] + gap >= start:
                        start = min(start, late_chain[0])
                        n += late_chain[2]
                        late_chain.clear()
                elif late_chain and e - late_chain[1] <= gap:
                    late_chain[1] = e
                    late_chain[2] += 1
                else:
                    flush_late()
                    late_chain[:] = [e, e, 1]
                continue
            if last is not None and e - last > gap:
                closed.append(_close(key[0], start, last, n))
                start, n = None, 0
            if start is None:
                start = e
            last = e
            n += 1
        flush_late()
        state.update((start, last, n))
        if idle_timeout and last is not None:
            # arm the idle flush at last+gap; clamp above the current
            # watermark (a purely-late batch can leave last+gap behind
            # it, and Spark rejects a timeout at/before the watermark —
            # the session then times out on the very next batch, which
            # is the correct semantics: it is already closed).
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((last + gap) * 1000, wm + 1))
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    return fn


def sessionize_stream(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_minutes: int = 30,
                      idle_timeout: bool = False,
                      watermark_delay: str = "1 hour") -> DataFrame:
    """events: streaming DataFrame with (user_id, ts). Emits one row
    per CLOSED session.

    ``idle_timeout=True`` adds a watermark (``watermark_delay`` bounds
    how late events may arrive) and an event-time timeout so sessions
    of DEPARTED users flush once the watermark passes last+gap —
    otherwise their state rows live forever and closed sessions are
    withheld indefinitely. Kept opt-in: the timeout needs a watermark,
    which changes late-event semantics (events later than the delay are
    dropped by Spark before reaching the sessionizer)."""
    timeout = GroupStateTimeout.NoTimeout
    if idle_timeout:
        events = events.withWatermark(ts_col, watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return events.groupBy(user_col).applyInPandasWithState(
        make_sessionizer(gap_minutes, ts_col, idle_timeout=idle_timeout),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
