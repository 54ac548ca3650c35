"""Event sessionization — gap-based session assignment with window
functions (SURVEY §2.8: the engine's window-function surface beyond
sampling ranks and ECDF cumsums).

sessionize: a session breaks when the gap to the previous event of the
same user exceeds ``gap``. Classic lag + cumulative-sum-of-breaks
pattern: one shuffle on user_id, two window passes over the same
partitioning (Catalyst reuses the sort), no Python.

At scale: the window is keyed by user_id — high cardinality, so skew is
bounded by the hottest single user; AQE cannot split a window partition,
so a pathological power-user key would need a two-level session pass
(sessionize per (user, day) then merge boundary sessions) — noted, not
needed at this data's skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    def _epoch(c):
        # TIMESTAMP_NTZ has no direct long cast in Spark 4; route via
        # TIMESTAMP (session tz is pinned to UTC in session.py, so this
        # equals DuckDB's epoch(naive_ts))
        return c.cast("timestamp").cast("long")

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    is_break = (
        prev_ts.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev_ts) > gap_minutes * 60)
    )
    session_seq = F.sum(is_break.cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_seq", session_seq).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
    )


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-session event counts and duration."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("long"))
            - F.min(F.col(ts_col).cast("timestamp").cast("long"))
        ).alias("duration_sec"),
    )
