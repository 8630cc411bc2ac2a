"""Batched BM25: one job for many queries == N single-query jobs."""

import pytest

from inverted_index_spark.build import build_and_save
from inverted_index_spark.query import FtsEngine

QUERIES = ["scan merge join", "window stream", "the a", "merge", "zzz missing"]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("batchidx"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    return FtsEngine(build_and_save(spark, docs, path, ngrams=False))


def test_batch_matches_single(engine):
    batch = engine.bm25_batch(QUERIES, k=7).collect()
    by_query: dict = {}
    for r in batch:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, text in enumerate(QUERIES):
        single = engine.bm25(text, k=7).collect()
        got = sorted(by_query.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], text
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9
    assert [r["rank"] for r in sorted(by_query[0], key=lambda r: r["rank"])] == list(
        range(1, 8)
    )


def test_batch_empty_queries(engine):
    assert engine.bm25_batch([], k=5).count() == 0
    assert engine.bm25_batch(["", "   "], k=5).count() == 0
