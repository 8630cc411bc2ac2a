"""Structured Streaming twins of the batch event operators (events.py).

Three operators over an event readStream (schema: the testdata
``events`` table — ``event_id bigint, ts timestamp, user_id bigint,
event_type string, value double, props string``):

- :func:`stream_tumbling_counts` — watermarked tumbling-window
  aggregation (``withWatermark`` + ``window`` groupBy). In append mode
  a window is emitted exactly once, when the watermark passes its end;
  rows later than the watermark are dropped by Spark's state eviction.
- :func:`stream_session_spans` — session windows via the built-in
  ``session_window`` aggregation: merge-correct (late-but-in-watermark
  rows can bridge two open sessions and Spark merges their state),
  emitted when the watermark passes ``last_event + gap``. The batch twin
  is :func:`~.events.session_spans`.
- :func:`stream_sessionize` — the same sessionization as a CUSTOM
  stateful operator via ``applyInPandasWithState`` with an event-time
  timeout: per-user open-session state ``(start_us, last_us, n)``,
  closed sessions emitted eagerly inside a batch, and the final open
  session flushed by the timeout when the watermark passes
  ``last_event + gap``. This is the template for stateful operators the
  built-ins can't express (the session payload here could carry any
  per-session accumulator).

Scale notes. All three are single-shuffle plans: one hash exchange on
the group key, per-key state in the executor state store, no driver
involvement per row. State size is bounded by watermark eviction
(tumbling windows), session merge + emission (session_window), and the
event-time timeout (the custom operator removes state when it emits),
so a 1000-executor deployment holds state proportional to OPEN
windows/sessions, not to history. The custom operator's per-batch work
is one Arrow exchange and a sorted merge per active user — vectorized
pandas, no per-row Python at the Spark level.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SPAN_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def _with_event_time(events: DataFrame, watermark: str) -> DataFrame:
    # testdata parquet carries TIMESTAMP_NTZ; watermarks and window
    # functions want TimestampType (UTC session tz keeps values intact)
    return events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)


def stream_tumbling_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """(hour, event_type, n, total_value) per tumbling 1-hour window.

    Streaming twin of :func:`~.events.tumbling_counts`:
    ``window(ts, '1 hour').start`` equals ``date_trunc('hour', ts)``,
    so in complete output mode over a finite stream the result is
    row-identical to the batch operator. In append mode each window row
    is emitted once, when the watermark (max event time seen minus
    ``watermark``) passes the window end — rows arriving later than the
    watermark are dropped, which is the late-data contract. (Spark
    applies the late-event filter with the previous batch's watermark —
    the SPARK-40925 late/eviction split — so "later than the watermark"
    is judged one batch behind eviction.)
    """
    return (
        _with_event_time(events, watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "total_value"
        )
    )


def stream_session_spans(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) per closed session.

    Built-in ``session_window`` aggregation: Spark keeps one state entry
    per open (user, session), MERGES sessions when a late-but-within-
    watermark row bridges two of them, and emits a session exactly once,
    when the watermark passes ``session_end + gap``. The batch twin is
    :func:`~.events.session_spans`; over a finite stream whose watermark
    ends up past every ``last_event + gap`` the emitted rows equal the
    batch rows exactly.
    """
    return (
        _with_event_time(events, watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            "user_id",
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            # session_window spans [first_event, last_event + gap); the
            # batch twin reports observed event extents, so trim the gap
            F.col("sw.start").alias("session_start"),
            (
                F.col("sw.end")
                - F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")
            ).alias("session_end"),
            "n_events",
        )
    )


def _make_session_fn(gap_us: int):
    # session arithmetic runs in MICROSECONDS (event timestamps carry
    # µs precision and the emitted spans must preserve it exactly);
    # only the GroupState timeout API speaks milliseconds
    def close_sessions(
        key: Tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(
                        [key[0]] * len(rows), dtype="int64"
                    ),
                    "session_start": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "n_events": pd.Series(
                        [r[2] for r in rows], dtype="int64"
                    ),
                }
            )

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new rows: the
            # open session can never be extended — flush and drop state
            start_us, last_us, n = state.get
            state.remove()
            yield emit([(start_us, last_us, n)])
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        # event-time order within the batch; cross-batch stragglers are
        # handled below (anything older than the watermark never reaches
        # this function)
        epochs = (
            batch["ts"].sort_values().astype("int64") // 1_000
        ).tolist()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for e in epochs:
            if start_us is None:
                start_us, last_us, n = e, e, 1
            elif e > last_us + gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = e, e, 1
            else:
                # e may precede the open session's last (late row within
                # the watermark): it still belongs to this session
                start_us = min(start_us, e)
                last_us = max(last_us, e)
                n += 1
        state.update((start_us, last_us, n))
        # flush the open session once the watermark passes last + gap;
        # the timeout timestamp (ms) must exceed the current watermark
        state.setTimeoutTimestamp(
            max(
                (last_us + gap_us) // 1_000 + 1,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if closed:
            yield emit(closed)

    return close_sessions


def stream_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Emits (user_id, session_start, session_end, n_events) for each
    CLOSED session: eagerly when a later in-batch event proves the gap,
    or via event-time timeout when the watermark passes
    ``last_event + gap``. Per-user state is the single open session
    ``(start_us, last_us, n)`` — constant per active user, removed on
    flush, so total state is O(active users) regardless of history.

    Semantics vs the batch twin: any prefix of the stream whose
    sessions' ``last_event + gap`` precede the final watermark is
    emitted exactly as :func:`~.events.session_spans` computes it; rows
    later than the watermark are dropped by Spark before reaching the
    operator (the documented late-data contract). A late-but-in-
    watermark row that would BRIDGE two already-distinct open sessions
    is folded into the current open session rather than re-splitting it
    (one open session per key); ``stream_session_spans`` — the built-in
    session_window form — merges that case exactly, at the cost of the
    fixed output schema.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        _with_event_time(events, watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_us),
            SESSION_SPAN_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
