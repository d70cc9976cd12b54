"""Event-stream analytics over the events table (event_id, ts, user_id,
event_type, value, props)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: consecutive events of a user belong to
    one session while inter-event gaps stay under `gap_minutes`.

    Uses Spark's native `session_window` aggregate — state is
    per-(user, open-window), merged by the aggregation itself, so the
    plan is ONE hash shuffle on user_id (and the identical code runs
    under Structured Streaming with a watermark for the unbounded case).
    The SQL twin is the classic gaps-and-islands form (lag → new-session
    flag → running sum → group), proving the window semantics: a new
    session starts when ts - prev_ts >= gap.

    Returns (user_id, session_start, session_end, n_events,
    total_value)."""
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy("user_id", w.alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
