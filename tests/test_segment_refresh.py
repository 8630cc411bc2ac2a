"""Incremental segment refresh: delta-sized maintenance, sound bounds.

After an upsert or stream compaction, refresh_segments re-encodes ONLY
the doc-range shards the mutation touched (segments_pending.json),
merges the term->shard map incrementally, and re-stamps the manifest.
Kept shards' block-max bounds stay sound under corpus-avgdl drift via
the per-shard max(1, avgdl_live/avgdl_built) rescale in wand.py — the
adversarial test below fails without it (a stale bound makes WAND skip
the block holding the true winner).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark import commitio
from inverted_index_spark.build import build_and_save
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.segments import (
    PENDING_NAME,
    build_segments,
    load_manifest,
    refresh_segments,
    segments_fresh,
)
from inverted_index_spark.upsert import compact_index, load_index_merged, upsert_saved
from inverted_index_spark.wand import wand_topk


def _seg_state(path):
    seg = os.path.join(path, "segments")
    return {
        f: (os.path.getmtime(os.path.join(seg, f)), os.path.getsize(os.path.join(seg, f)))
        for f in os.listdir(seg)
        if f.endswith(".parquet")
    }


def _bm25_df(spark, path, text, k):
    eng = FtsEngine(load_index_merged(spark, path), use_segments=False)
    return [(r["doc_id"], r["score"]) for r in eng.bm25(text, k=k).collect()]


def _assert_same_ranking(got, want):
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])


def test_refresh_rebuilds_only_touched_shards(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} w{i % 7}") for i in range(200)],
        ["doc_id", "text"],
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)
    before = _seg_state(path)
    before_files = {
        r["shard_id"]: r["file"] for r in load_manifest(path)["shards"]
    }
    assert len(before) >= 6

    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(5, "gamma epsilon rewritten")], ["doc_id", "text"]),
    )
    # mutation recorded the touched doc range, segments went stale
    assert json.load(open(os.path.join(path, PENDING_NAME))) == [5 // 32]
    assert not segments_fresh(path)

    m = refresh_segments(spark, load_index_merged(spark, path), path)
    assert m["built_shards"] == 1
    assert m["resumed_shards"] == len(before) - 1
    after = _seg_state(path)
    # write-once: untouched shard files are bit-identical AND same-name;
    # the touched shard got a NEW file (never an in-place rewrite) and
    # its superseded generation was garbage-collected post-commit
    after_files = {r["shard_id"]: r["file"] for r in m["shards"]}
    changed_ids = {
        sid for sid in before_files
        if after_files.get(sid) != before_files[sid]
    }
    assert changed_ids == {0}
    assert before_files[0] not in after  # superseded generation GC'd
    for sid, f in after_files.items():
        if sid != 0:
            assert after[f] == before[f]  # untouched, not rewritten
    assert segments_fresh(path)
    assert not os.path.exists(os.path.join(path, PENDING_NAME))

    # WAND serves the new content and matches the DataFrame plan exactly
    assert [r["doc_id"] for r in wand_topk(spark, path, "gamma", k=5).collect()] == [5]
    assert wand_topk(spark, path, "doc5", k=5).count() == 0
    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, "alpha w3", k=10).collect()]
    _assert_same_ranking(got, _bm25_df(spark, path, "alpha w3", 10))

    # term->shard map merged incrementally: new term maps to the rebuilt
    # shard, the replaced doc's unique term is gone
    ts = spark.read.parquet(commitio.table_path(path, "term_shards"))
    assert [r["shard_id"] for r in ts.filter(F.col("term") == "gamma").collect()] == [0]
    assert ts.filter(F.col("term") == "doc5").count() == 0


def test_refresh_new_doc_range_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"common base{i % 3} text") for i in range(64)], ["doc_id", "text"]
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)
    n0 = len(load_manifest(path)["shards"])

    # brand-new doc id far outside any existing shard range
    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(1000, "zznewrange unique")], ["doc_id", "text"]),
    )
    m = refresh_segments(spark, load_index_merged(spark, path), path)
    assert len(m["shards"]) == n0 + 1
    assert [r["doc_id"] for r in wand_topk(spark, path, "zznewrange", k=5).collect()] == [1000]
    # refresh with nothing pending is a no-op returning the manifest
    m2 = refresh_segments(spark, load_index_merged(spark, path), path)
    assert m2["shards"] == m["shards"]


def test_refresh_avgdl_drift_keeps_wand_exact(spark, tmp_path):
    """Adversarial soundness check for stored block-max bounds.

    Shard 0 holds a decoy (block 0: tf=3, dl=25) and the true winner
    (block 1: tf=3, dl=5). An upsert then adds very long documents in a
    DIFFERENT shard, raising corpus avgdl ~10x; u = tf(k1+1)/(tf +
    k1(1-b+b*dl/avgdl)) grows for every doc, so the winner's true score
    under the new avgdl exceeds shard 0's stored (stale) block-1 bound,
    while the decoy's score sits between the two. Without the
    max(1, avgdl_live/avgdl_built) rescale, WAND scores block 0 first
    (heap threshold = decoy), then skips block 1 on the stale bound and
    returns the decoy — silently wrong. With it, results match the
    DataFrame plan bit-for-bit.
    """
    path = str(tmp_path / "idx")
    filler = " ".join(f"f{i}" for i in range(22))
    base = [
        (0, "target target target " + filler),  # dl=25, shard 0 block 0
        (16, "target target target aa bb"),  # dl=5, shard 0 block 1
        (40, "unrelated other words here"),  # shard 1, keeps idf sane
    ]
    docs = spark.createDataFrame(base, ["doc_id", "text"])
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=16)

    long_text = " ".join(f"pad{i}" for i in range(500))
    upsert_saved(
        spark,
        path,
        spark.createDataFrame(
            [(64 + j, long_text) for j in range(4)], ["doc_id", "text"]
        ),
    )
    m = refresh_segments(spark, load_index_merged(spark, path), path)
    # the drift is real: kept shard 0 was encoded under a much smaller
    # avgdl than the manifest now carries
    s0 = next(s for s in m["shards"] if s["shard_id"] == 0)
    assert s0["avgdl_built"] * 5 < m["avgdl"]

    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, "target", k=1).collect()]
    assert [d for d, _ in got] == [16]  # the short doc wins under live avgdl
    _assert_same_ranking(got, _bm25_df(spark, path, "target", 1))
    # and the full ranking agrees too
    got3 = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, "target", k=3).collect()]
    _assert_same_ranking(got3, _bm25_df(spark, path, "target", 3))


def test_compact_index_preserves_segment_freshness(spark, tmp_path):
    """compact_index rewrites postings files but preserves the merged
    view — fresh segments must stay fresh (re-stamped source token), so
    no rebuild is triggered by pure compaction."""
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}") for i in range(100)], ["doc_id", "text"]
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)

    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(3, "rewritten delta text")], ["doc_id", "text"]),
    )
    refresh_segments(spark, load_index_merged(spark, path), path)
    assert segments_fresh(path)
    want = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, "alpha", k=5).collect()]

    state = _seg_state(path)
    compact_index(spark, path)
    assert segments_fresh(path)  # re-stamped, not rebuilt
    assert _seg_state(path) == state  # no shard file touched
    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, "alpha", k=5).collect()]
    _assert_same_ranking(got, want)


def test_stream_compact_then_refresh(spark, tmp_path):
    """Streamed appends flow onto the segment path via compact_stream ->
    refresh_segments: only the new doc ranges are encoded."""
    from inverted_index_spark.segquery import segment_search
    from inverted_index_spark.streaming import (
        append_batch,
        compact_stream,
        refresh_index,
        streaming_doc_id,
    )
    from inverted_index_spark.transcripts import synthetic_transcripts

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=30, turns_per_conv=3)
    boot = tr.filter(F.col("conv_id") < "conv-00000020")
    build_and_save(
        spark,
        boot.withColumn("doc_id", streaming_doc_id()).select("doc_id", "text"),
        idx_path,
        ngrams=False,
    )
    idx0 = refresh_index(spark, idx_path)
    m0 = build_segments(spark, idx0, idx_path, shard_docs=64, positions=True)
    before = _seg_state(idx_path)

    rest = tr.filter(F.col("conv_id") >= "conv-00000020").withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzstreamedterm"))
    )
    append_batch(idx_path, ngrams=False)(rest, 0)
    compact_stream(spark, idx_path)

    from inverted_index_spark.build import load_index

    m1 = refresh_segments(spark, load_index(spark, idx_path), idx_path)
    assert m1["resumed_shards"] == len(m0["shards"])
    assert m1["built_shards"] >= 1
    after = _seg_state(idx_path)
    assert all(after[f] == before[f] for f in before)  # base shards untouched
    assert segments_fresh(idx_path, positional=True)

    streamed_ids = {
        r["doc_id"]
        for r in rest.withColumn("doc_id", streaming_doc_id())
        .select("doc_id")
        .collect()
    }
    got = {
        r["doc_id"]
        for r in wand_topk(spark, idx_path, "zzstreamedterm", k=50).collect()
    }
    assert got == streamed_ids
    got2 = {
        r["doc_id"]
        for r in segment_search(spark, idx_path, "zzstreamedterm").collect()
    }
    assert got2 == streamed_ids


def test_write_once_snapshot_isolation(spark, tmp_path, monkeypatch):
    """Refresh must never mutate a shard file a concurrent reader may
    hold: every (re)encode writes a NEW name (the manifest is the
    commit point), so with retention on, every file the OLD manifest
    references stays byte-identical after a refresh — an old-manifest
    reader sees exactly its snapshot. Without retention, the
    superseded generation is GC'd (loud FileNotFoundError for a
    too-slow reader, never torn rows)."""
    import hashlib

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} w{i % 7}") for i in range(200)],
        ["doc_id", "text"],
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)
    m0 = load_manifest(path)

    def digests(manifest):
        out = {}
        for r in manifest["shards"]:
            f = os.path.join(path, "segments", r["file"])
            with open(f, "rb") as fh:
                out[r["file"]] = hashlib.sha1(fh.read()).hexdigest()
        return out

    d0 = digests(m0)
    upsert_saved(
        spark, path,
        spark.createDataFrame([(5, "gamma rewritten alpha")],
                              ["doc_id", "text"]),
    )
    m1 = refresh_segments(spark, load_index_merged(spark, path), path)
    changed = {
        r["shard_id"] for r in m1["shards"]
    } & {r["shard_id"] for r in m0["shards"]}
    assert {r["file"] for r in m1["shards"]} != {
        r["file"] for r in m0["shards"]
    }
    # retention: every old-manifest file still exists, byte-identical
    assert digests(m0) == d0
    assert changed  # sanity: shard ids overlap, files differ for 0

    # without retention the next refresh GC's what it supersedes
    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "0")
    upsert_saved(
        spark, path,
        spark.createDataFrame([(6, "delta rewritten beta")],
                              ["doc_id", "text"]),
    )
    m2 = refresh_segments(spark, load_index_merged(spark, path), path)
    live = {r["file"] for r in m2["shards"]}
    on_disk = {
        f for f in os.listdir(os.path.join(path, "segments"))
        if f.startswith("shard-") and f.endswith(".parquet")
    }
    assert on_disk == live  # superseded generations collected


def test_concurrent_serving_during_refresh(spark, tmp_path, monkeypatch):
    """Coordinator serves racing refreshes must always return ONE
    consistent snapshot's answer — never a torn mix of pre- and
    post-refresh shard content. Write-once files + retained
    generations give old-manifest readers full snapshot isolation."""
    import threading

    from inverted_index_spark.wand import wand_topk_pandas

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "0")
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} w{i % 7}") for i in range(200)],
        ["doc_id", "text"],
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)

    def answer():
        pdf = wand_topk_pandas(path, "alpha beta", k=5)
        return tuple(
            (int(d), round(float(s), 6))
            for d, s in zip(pdf["doc_id"], pdf["score"])
        )

    valid = {answer()}
    seen = []
    stop = threading.Event()
    errors = []

    def serve_loop():
        try:
            while not stop.is_set():
                seen.append(answer())
        except Exception as exc:  # pragma: no cover - failure surface
            errors.append(exc)

    threads = [threading.Thread(target=serve_loop) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for round_i in range(3):
            upsert_saved(
                spark, path,
                spark.createDataFrame(
                    [(round_i, f"alpha alpha alpha beta round{round_i}")],
                    ["doc_id", "text"],
                ),
            )
            refresh_segments(spark, load_index_merged(spark, path), path)
            valid.add(answer())
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errors, errors
    assert len(valid) > 1  # the mutations really changed the answer
    torn = [a for a in seen if a not in valid]
    assert not torn, f"{len(torn)} torn answers, e.g. {torn[0]}"
    assert len(seen) > 20
