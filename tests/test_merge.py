"""Index merging: time-partitioned ingest -> O(metadata) merge.

Doc-sliced layout: merging disjoint-doc-range indexes is a file-level
union (hard links) for postings/docstats/docs AND for segment shards —
only boundary shards whose doc range spans two inputs are re-encoded,
via the same incremental refresh machinery as every other mutation.
Answers must equal a from-scratch build over the concatenated corpus.
"""

import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.build import build_and_save, load_index
from inverted_index_spark.merge import merge_indexes
from inverted_index_spark.qast import And, Match
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.segments import build_segments, segments_fresh
from inverted_index_spark.segquery import segment_query
from inverted_index_spark.wand import wand_topk


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} tok{i}") for i in range(lo, hi)],
        "doc_id long, text string",
    )


def _build(spark, path, lo, hi, shard_docs=32, segs=True, ngrams=False):
    idx = build_and_save(spark, _docs(spark, lo, hi), path, ngrams=ngrams)
    if segs:
        build_segments(spark, idx, path, shard_docs=shard_docs,
                       block_docs=8, positions=True)
    return idx


def _wand_rank(spark, path, text, k=300):
    return [
        (r["doc_id"], round(r["score"], 5))
        for r in wand_topk(spark, path, text, k=k, mode="spark").collect()
    ]


def test_aligned_merge_reuses_every_shard(spark, tmp_path):
    p1, p2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    _build(spark, p1, 0, 64)
    _build(spark, p2, 64, 128)
    summary = merge_indexes(spark, [p1, p2], out)
    assert summary["segments"] == "reused"
    assert summary["n_docs"] == 128
    assert segments_fresh(out)

    # shard files are the INPUTS' files (hard links, not rewrites)
    def _file_of(path, sid):
        from inverted_index_spark.segments import load_manifest

        return {
            r["shard_id"]: r["file"] for r in load_manifest(path)["shards"]
        }[sid]

    for src, sid in [(p1, 0), (p2, 2)]:
        assert os.path.samefile(
            os.path.join(out, "segments", _file_of(out, sid)),
            os.path.join(src, "segments", _file_of(src, sid)),
        )

    # answers equal a from-scratch build over the concatenated corpus
    ref = str(tmp_path / "ref")
    _build(spark, ref, 0, 128)
    for text in ["alpha", "w3", "tok100 alpha"]:
        assert _wand_rank(spark, out, text) == _wand_rank(spark, ref, text)
    q = And(Match("alpha"), Match("w2"))
    got = segment_query(spark, out, q, k=20, mode="spark").collect()
    want = segment_query(spark, ref, q, k=20, mode="spark").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]

    # relational engine over the merged tables agrees too
    eng = FtsEngine(load_index(spark, out), use_segments=False)
    ref_eng = FtsEngine(load_index(spark, ref), use_segments=False)
    assert [
        (r["doc_id"], round(r["score"], 5))
        for r in eng.bm25("alpha w1", k=20).collect()
    ] == [
        (r["doc_id"], round(r["score"], 5))
        for r in ref_eng.bm25("alpha w1", k=20).collect()
    ]


def test_boundary_collision_is_reencoded_incrementally(spark, tmp_path):
    p1, p2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    # shard_docs=64: input1 covers shards {0, 1(64-99)}, input2
    # {1(100-127), 2, 3} -> shard 1 spans both inputs
    _build(spark, p1, 0, 100, shard_docs=64)
    _build(spark, p2, 100, 200, shard_docs=64)
    summary = merge_indexes(spark, [p1, p2], out)
    assert summary["segments"] == "reused+reencoded:1"
    assert segments_fresh(out)
    # non-colliding shards stayed links; the boundary shard was rebuilt
    from inverted_index_spark.segments import load_manifest

    def _files_of(path):
        return {
            r["shard_id"]: r["file"] for r in load_manifest(path)["shards"]
        }

    out_f, p1_f = _files_of(out), _files_of(p1)
    assert os.path.samefile(
        os.path.join(out, "segments", out_f[0]),
        os.path.join(p1, "segments", p1_f[0]),
    )
    assert 1 not in p1_f or not os.path.samefile(
        os.path.join(out, "segments", out_f[1]),
        os.path.join(p1, "segments", p1_f[1]),
    )

    ref = str(tmp_path / "ref")
    _build(spark, ref, 0, 200, shard_docs=64)
    for text in ["alpha", "tok99 tok100"]:
        assert _wand_rank(spark, out, text) == _wand_rank(spark, ref, text)
    # the boundary docs themselves are served
    got = segment_query(spark, out, Match("tok99"), k=5, mode="spark").collect()
    assert [r["doc_id"] for r in got] == [99]
    got = segment_query(spark, out, Match("tok100"), k=5, mode="spark").collect()
    assert [r["doc_id"] for r in got] == [100]


def test_merge_without_segments_serves_relationally(spark, tmp_path):
    p1, p2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    _build(spark, p1, 0, 40, segs=False)
    _build(spark, p2, 40, 80)  # one input has segments, one doesn't
    summary = merge_indexes(spark, [p1, p2], out)
    assert summary["segments"] == "skipped:no-segments"
    eng = FtsEngine(load_index(spark, out))
    got = sorted(r["doc_id"] for r in eng.search("alpha", k=None).collect())
    assert got == list(range(80))
    # highlight works: doc stores were linked over
    # Match prefix-expands over full tokens: tok7 also matches tok7X
    res = eng.results(Match("tok7"), k=1)
    h = eng.highlight(res, "<b>", "</b>").collect()
    assert h and "<b>tok7" in h[0]["highlighted"]


def test_merge_precondition_errors(spark, tmp_path):
    from inverted_index_spark.upsert import upsert_saved

    p1, p2, p3, p4 = (str(tmp_path / x) for x in ("a", "b", "c", "d"))
    _build(spark, p1, 0, 30, segs=False)
    _build(spark, p2, 20, 50, segs=False)  # overlaps p1
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, [p1, p2], str(tmp_path / "m1"))

    _build(spark, p3, 50, 80, segs=False, ngrams=True)
    with pytest.raises(ValueError, match="analyzers"):
        merge_indexes(spark, [p1, p3], str(tmp_path / "m2"))

    _build(spark, p4, 100, 130, segs=False)
    upsert_saved(
        spark, p4,
        spark.createDataFrame([(100, "changed")], "doc_id long, text string"),
    )
    with pytest.raises(ValueError, match="compact_index"):
        merge_indexes(spark, [p1, p4], str(tmp_path / "m3"))

    with pytest.raises(ValueError, match="two inputs"):
        merge_indexes(spark, [p1], str(tmp_path / "m4"))


def test_merged_index_keeps_mutating(spark, tmp_path):
    """A merged index is a first-class index: upsert, delete and refresh
    keep working on it."""
    from inverted_index_spark.segments import refresh_segments
    from inverted_index_spark.upsert import delete_saved, upsert_saved

    p1, p2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    _build(spark, p1, 0, 64)
    _build(spark, p2, 64, 128)
    merge_indexes(spark, [p1, p2], out)

    upsert_saved(
        spark, out,
        spark.createDataFrame([(5, "alpha fresh5")],
                              "doc_id long, text string"),
    )
    delete_saved(spark, out, spark.createDataFrame([(70,)], "doc_id long"))
    refresh_segments(spark, load_index(spark, out), out)
    assert segments_fresh(out)
    ranks = dict(_wand_rank(spark, out, "alpha"))
    assert 70 not in ranks and 5 in ranks
    got = segment_query(spark, out, Match("fresh5"), k=5, mode="spark").collect()
    assert [r["doc_id"] for r in got] == [5]


def test_federated_equals_merged(spark, tmp_path):
    """Cross-index serving with global idf/avgdl must equal querying
    the physically merged index — same statistics, same kernel."""
    from inverted_index_spark.wand import wand_topk_federated

    p1, p2, out = (str(tmp_path / x) for x in ("a", "b", "m"))
    _build(spark, p1, 0, 64)
    _build(spark, p2, 64, 128)
    merge_indexes(spark, [p1, p2], out)

    for text in ["alpha", "w3 alpha", "tok100"]:
        fed = [
            (r["doc_id"], round(r["score"], 5))
            for r in wand_topk_federated(
                spark, [p1, p2], text, k=25, mode="spark"
            ).collect()
        ]
        mer = _wand_rank(spark, out, text, k=25)
        assert fed == mer, text
        loc = [
            (r["doc_id"], round(r["score"], 5))
            for r in wand_topk_federated(
                spark, [p1, p2], text, k=25, mode="local"
            ).collect()
        ]
        assert loc == mer, text

    # index tag identifies the source window
    rows = wand_topk_federated(spark, [p1, p2], "tok100", k=3).collect()
    assert rows and all(r["index_id"] == 1 for r in rows if r["doc_id"] >= 64)
    # no-hit query -> empty frame with the federated schema
    empty = wand_topk_federated(spark, [p1, p2], "zzznothere", k=3)
    assert empty.count() == 0
    assert empty.columns == ["index_id", "doc_id", "score"]
    with pytest.raises(ValueError, match="at least one"):
        wand_topk_federated(spark, [], "alpha")


def test_pending_sidecar_blocks_serving(spark, tmp_path):
    """Crash-window soundness: a recorded-but-unrefreshed pending set
    must make segments_fresh False (a manifest with a live source token
    but missing doc ranges must never be served)."""
    from inverted_index_spark.segments import (
        record_pending_shards,
        refresh_segments,
    )

    path = str(tmp_path / "idx")
    _build(spark, path, 0, 64)
    assert segments_fresh(path)
    record_pending_shards(path, {0})
    assert not segments_fresh(path)
    refresh_segments(spark, load_index(spark, path), path)
    assert segments_fresh(path)


def test_merge_reports_docs_status(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    _build(spark, p1, 0, 32, segs=False)
    # p2 without a doc store
    build_and_save(spark, _docs(spark, 32, 64), str(tmp_path / "b"),
                   ngrams=False, store_docs=False)
    s = merge_indexes(spark, [p1, p2], str(tmp_path / "m"))
    assert s["docs"] == "skipped:missing-in-some-inputs"
    # schema mismatch: p3 docs carry a rider column
    p3 = str(tmp_path / "c")
    docs3 = _docs(spark, 64, 96).withColumn("rider", F.lit("x"))
    build_and_save(spark, docs3, p3, ngrams=False)
    s2 = merge_indexes(spark, [p1, p3], str(tmp_path / "m2"))
    assert s2["docs"] == "skipped:schema-mismatch"
    assert not os.path.isdir(os.path.join(str(tmp_path / "m2"), "docs"))
