"""Event-stream analytics over the events table (event_id, ts, user_id,
event_type, value, props) — batch sessionization plus the two streaming
stateful shapes: native session windows (watermark-bounded) and a custom
applyInPandasWithState operator."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


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


def stream_sessionize(
    spark,
    input_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
    query_name: str = "sessions",
):
    """Streaming twin of sessionize: the SAME session_window aggregate
    over an unbounded JSON event stream. The watermark both bounds state
    (open sessions older than the watermark are finalized and evicted)
    and defines completeness — append mode emits a session only once it
    can no longer grow. Returns the StreamingQuery (in-memory sink)."""
    stream = spark.readStream.schema(_EVENT_SCHEMA).json(input_path)
    agg = (
        stream.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )


_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("flushed_by_timeout", T.BooleanType()),
    ]
)

_ACTIVITY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def stream_user_activity(
    spark,
    input_path: str,
    checkpoint_dir: str,
    quiet_seconds: int = 60,
    watermark_minutes: int = 10,
    query_name: str = "user_activity",
):
    """CUSTOM stateful streaming operator via applyInPandasWithState —
    the escape hatch for semantics the built-in aggregates can't express
    (here: per-user running totals that FLUSH once the user has been
    quiet for `quiet_seconds` of EVENT time, which no watermark
    aggregate emits). State is one (n, total, last_ms) row per user —
    keyed, sharded across executors by the state store, evicted on
    flush. Arrow-batched: the callback sees pandas frames per key, never
    per-row Python dispatch.

    Timeouts are EVENT-time (fire when the watermark passes
    last-event + quiet period): deterministic under replay and testable
    without wall-clock sleeps — a processing-time timeout would also
    keep the query perpetually busy (every trigger schedules another
    batch), livelocking drain-style consumers like
    ``processAllAvailable``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield _activity_pdf(user_id, n, total, True)
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            # pandas max() of an all-null ts column is NaT, not None —
            # .timestamp() on NaT raises and would kill the whole query
            if pd.notna(batch_max):
                last_ms = max(last_ms, int(batch_max.timestamp() * 1000))
        total = round(total, 2)
        state.update((n, total, last_ms))
        # only arm the timeout once we have a real event time: with
        # last_ms=0 (all-null ts so far) the deadline would sit BELOW the
        # current watermark, which setTimeoutTimestamp rejects — killing
        # the query, the very failure the NaT guard above prevents
        if last_ms:
            state.setTimeoutTimestamp(last_ms + quiet_seconds * 1000)
        yield _activity_pdf(user_id, n, total, False)

    def _activity_pdf(user_id, n, total, by_timeout):
        import pandas as pd

        return pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total,
              "flushed_by_timeout": by_timeout}]
        )

    stream = spark.readStream.schema(_EVENT_SCHEMA).json(input_path)
    out = (
        stream.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_ACTIVITY_SCHEMA,
            stateStructType=_ACTIVITY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
