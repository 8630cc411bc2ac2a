"""Segment build + block-max WAND: rank-identity vs the DataFrame BM25
path, manifest metrics, and checkpoint/resume (SURVEY §7 step 7)."""

import json
import os

import pytest

from inverted_index_spark.build import build_and_save, load_index
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.segments import build_segments, load_manifest
from inverted_index_spark.wand import wand_topk


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segidx"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(spark, idx, path, shard_docs=64, block_docs=16)
    return path, idx, manifest


QUERIES = [
    "scan merge join",
    "window stream batch group",
    "the a of",
    "merge",
    "nonexistentterm scan",
]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_matches_dataframe_bm25(spark, indexed, q):
    path, idx, _ = indexed
    eng = FtsEngine(idx)
    expect = [(r["doc_id"], r["score"]) for r in eng.bm25(q, k=10).collect()]
    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, q, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b))


def test_wand_batch_matches_single(spark, indexed):
    from inverted_index_spark.wand import wand_topk_batch

    path, idx, _ = indexed
    texts = QUERIES[:4]
    batch = wand_topk_batch(spark, path, texts, k=10).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text in enumerate(texts):
        single = wand_topk(spark, path, text, k=10).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], text
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9


def test_wand_empty_query(spark, indexed):
    path, _, _ = indexed
    assert wand_topk(spark, path, "zzzznotaterm", k=5).count() == 0


def test_manifest_metrics(indexed):
    path, idx, manifest = indexed
    shards = manifest["shards"]
    assert len(shards) >= 2  # 500 docs / 64-doc shards
    assert sum(s["n_postings"] for s in shards) > 0
    for s in shards:
        assert s["postings_per_sec"] > 0
        assert s["skew_ratio"] >= 1.0
        assert s["enc_bytes"] < s["raw_bytes"]  # compression works
        assert len(s["fingerprint"]) == 40
        assert os.path.exists(os.path.join(path, "segments", s["file"]))


def test_resume_skips_done_shards(spark, indexed):
    path, idx, manifest = indexed
    victim = manifest["shards"][0]["file"]
    os.remove(os.path.join(path, "segments", victim))
    m2 = build_segments(spark, idx, path, shard_docs=64, block_docs=16)
    # only the missing shard was rebuilt; the rest resumed from manifest
    assert m2["built_shards"] == 1
    assert m2["resumed_shards"] == len(manifest["shards"]) - 1
    assert os.path.exists(os.path.join(path, "segments", victim))
    assert {s["file"] for s in m2["shards"]} == {
        s["file"] for s in manifest["shards"]
    }


def test_wand_after_resume_still_correct(spark, indexed):
    path, idx, _ = indexed
    eng = FtsEngine(idx)
    q = "scan merge join"
    expect = [r["doc_id"] for r in eng.bm25(q, k=10).collect()]
    got = [r["doc_id"] for r in wand_topk(spark, path, q, k=10).collect()]
    assert got == expect
