"""Structured Streaming event operators: watermarked tumbling windows,
built-in session windows, and the applyInPandasWithState custom
stateful sessionizer — each checked against its batch twin
(pipelines.events) and for the late-data (watermark-drop) contract."""

import datetime as dt
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from inverted_index_spark.pipelines.events import session_spans, tumbling_counts
from inverted_index_spark.pipelines.events_stream import (
    stream_session_spans,
    stream_sessionize,
    stream_tumbling_counts,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
BASE = dt.datetime(2024, 3, 1, 0, 0, 0, tzinfo=dt.timezone.utc)


def _rows(specs):
    """specs: (event_id, minutes_from_base, user_id, event_type, value)."""
    return [
        {
            "event_id": eid,
            "ts": BASE + dt.timedelta(minutes=m),
            "user_id": uid,
            "event_type": et,
            "value": v,
            "props": "",
        }
        for (eid, m, uid, et, v) in specs
    ]


def _write_file(src_dir, name, rows, mtime):
    """One parquet file per micro-batch; mtime fixes source ordering."""
    os.makedirs(src_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    path = os.path.join(src_dir, name)
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), schema=schema), path
    )
    os.utime(path, (mtime, mtime))


def _run_stream(spark, src_dir, op, mode, ckpt):
    name = f"evs_{uuid.uuid4().hex[:10]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


# three sessions for user 1 (gap 30m), two single-event sessions for
# user 2; the sentinel user 999 lands 30 days later in its own file to
# push the final watermark past every real session's last+gap
SESSION_SPECS = [
    (1, 0, 1, "click", 1.0),
    (2, 10, 1, "click", 1.0),
    (3, 20, 1, "view", 2.0),
    (4, 120, 1, "click", 1.0),
    (5, 125, 1, "click", 1.0),
    (6, 5, 2, "view", 3.0),
    (7, 300, 2, "click", 1.0),
    (8, 200, 1, "click", 1.0),
]
SENTINEL = [(999, 60 * 24 * 30, 999, "click", 0.0)]


def _spans_key(df):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    )


def _session_source(spark, tmp_path, tag):
    src = str(tmp_path / f"src_{tag}")
    _write_file(src, "f1.parquet", _rows(SESSION_SPECS), 1_000_000)
    _write_file(src, "f2.parquet", _rows(SENTINEL), 1_000_010)
    batch = spark.createDataFrame(_rows(SESSION_SPECS))
    return src, batch


def test_stream_session_spans_matches_batch(spark, tmp_path):
    src, batch = _session_source(spark, tmp_path, "sw")
    got = _run_stream(
        spark,
        src,
        lambda s: stream_session_spans(s, gap_minutes=30),
        "append",
        str(tmp_path / "ck_sw"),
    ).filter("user_id != 999")
    want = session_spans(batch, gap_minutes=30)
    assert _spans_key(got) == _spans_key(want)


def test_stream_sessionize_custom_stateful_matches_batch(spark, tmp_path):
    src, batch = _session_source(spark, tmp_path, "st")
    got = _run_stream(
        spark,
        src,
        lambda s: stream_sessionize(s, gap_minutes=30),
        "append",
        str(tmp_path / "ck_st"),
    ).filter("user_id != 999")
    want = session_spans(batch, gap_minutes=30)
    # every real session's last+gap precedes the sentinel watermark, so
    # the timeout flush must have emitted ALL of them — including the
    # open tail sessions that no in-batch successor ever closed
    assert _spans_key(got) == _spans_key(want)


def test_stream_tumbling_counts_complete_equals_batch(spark, tmp_path):
    src, batch = _session_source(spark, tmp_path, "tc")
    got = _run_stream(
        spark,
        src,
        stream_tumbling_counts,
        "complete",
        str(tmp_path / "ck_tc"),
    )
    want = tumbling_counts(batch.unionByName(spark.createDataFrame(_rows(SENTINEL))))
    key = lambda df: sorted(  # noqa: E731
        (r["hour"], r["event_type"], r["n"], r["total_value"])
        for r in df.collect()
    )
    assert key(got) == key(want)


def test_stream_tumbling_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src_late")
    # batch 0: one event in hour 00 plus a watermark pusher at 12:00
    # (watermark after the batch = 12:00 - 2h = 10:00). Spark's
    # late-event filter uses the PREVIOUS batch's watermark (the
    # eviction watermark runs one batch ahead of the late-data
    # watermark — SPARK-40925 split), so the late row must arrive two
    # batches after the pusher: batch 1 is a neutral row under whose
    # eviction the hour-00 window is emitted and its state dropped;
    # batch 2 is the LATE row back in hour 00 — older than the
    # late-event watermark, must be dropped, not counted and not
    # re-emitted as a second hour-00 row
    _write_file(
        src,
        "f1.parquet",
        _rows([(1, 10, 1, "click", 1.0), (2, 720, 1, "click", 1.0)]),
        1_000_000,
    )
    _write_file(
        src, "f2.parquet", _rows([(4, 721, 1, "click", 1.0)]), 1_000_010
    )
    _write_file(
        src, "f3.parquet", _rows([(3, 20, 1, "click", 1.0)]), 1_000_020
    )
    got = _run_stream(
        spark,
        src,
        lambda s: stream_tumbling_counts(s, watermark="2 hours"),
        "append",
        str(tmp_path / "ck_late"),
    )
    collected = got.collect()
    h0 = BASE.replace(tzinfo=None)
    h0_rows = [r for r in collected if r["hour"] == h0]
    assert len(h0_rows) == 1, f"hour-00 window emitted twice: {collected}"
    assert h0_rows[0]["n"] == 1, f"late row was counted: {collected}"
