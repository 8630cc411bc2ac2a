"""Event-stream operators (batch form; streaming twins in
``pipelines.events_stream``).

Sessionization and windowed aggregation over the events table — the
batch expressions of what Structured Streaming runs incrementally with
watermarks. All are single-shuffle window/groupBy plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, n_sessions, n_events): sessions split on inactivity gaps.

    Classic gaps-and-islands: a new session starts when the time since
    the previous event of the same user exceeds the gap.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP_NTZ (no direct cast to long): go via timestamp
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    return (
        events.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_s").cast("bigint").alias("n_sessions"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


def session_spans(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_start, session_end, n_events): one row per session.

    Per-session form of :func:`sessionize` (which aggregates to per-user
    counts) — the batch twin of the streaming session operators in
    ``pipelines.events_stream``. Session boundaries depend only on each
    user's sorted event times, so the output is deterministic even when
    a user has tied timestamps (equal timestamps always land in the
    same session for any positive gap).
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    sid = F.sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("new_s", new_session)
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.col("ts").cast("timestamp")).alias("session_start"),
            F.max(F.col("ts").cast("timestamp")).alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .drop("sid")
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """(hour, event_type, n, total_value): tumbling 1-hour windows."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
