"""Pluggable similarity (FtsEngine.score_topk): LM Dirichlet and
classic TF-IDF ranked retrieval — engine extension (the reference
scores only its parity width/sqrt-bytes, search_result.rs:21-24).

Each similarity is checked against an independent pure-Python
recomputation of its documented formula over a small corpus.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import build_engine

DOCS = [
    (0, "apple banana cherry apple"),
    (1, "apple apple apple pie"),
    (2, "banana split"),
    (3, "cherry tart cherry"),
    (4, "apple banana banana"),
    (5, "grape jelly toast grape grape"),
]


@pytest.fixture(scope="module")
def eng(spark):
    return build_engine(spark, DOCS, ngrams=False)


def _toks():
    return {d: t.split() for d, t in DOCS}


def _lmd_expected(query_terms, mu=2000.0):
    toks = _toks()
    total = sum(len(t) for t in toks.values())
    cf = {
        q: sum(t.count(q) for t in toks.values()) for q in query_terms
    }
    out = {}
    for d, t in toks.items():
        dl = len(t)
        s = 0.0
        hit = False
        for q in query_terms:
            tf = t.count(q)
            if tf == 0 or cf[q] == 0:
                continue
            hit = True
            s += math.log(1.0 + tf / (mu * (cf[q] / total))) + math.log(
                mu / (dl + mu)
            )
        if hit:
            out[d] = s
    return out


def _tfidf_expected(query_terms):
    toks = _toks()
    n = len(toks)
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in query_terms
    }
    out = {}
    for d, t in toks.items():
        dl = len(t)
        s = 0.0
        hit = False
        for q in query_terms:
            tf = t.count(q)
            if tf == 0:
                continue
            hit = True
            idf = 1.0 + math.log(n / (df[q] + 1.0))
            s += math.sqrt(tf) * idf * idf / math.sqrt(dl)
        if hit:
            out[d] = s
    return out


def test_lmd_matches_formula(eng):
    got = {
        r["doc_id"]: r["score"]
        for r in eng.score_topk(
            "apple banana", k=None, similarity="lmd"
        ).collect()
    }
    want = _lmd_expected(["apple", "banana"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_tfidf_matches_formula(eng):
    got = {
        r["doc_id"]: r["score"]
        for r in eng.score_topk(
            "apple banana", k=None, similarity="tfidf"
        ).collect()
    }
    want = _tfidf_expected(["apple", "banana"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_bm25_delegation(eng):
    a = eng.score_topk("apple", k=3, similarity="bm25").collect()
    b = eng.bm25("apple", k=3).collect()
    assert a == b


def test_topk_and_ordering(eng):
    rows = eng.score_topk("apple banana", k=2, similarity="lmd").collect()
    assert len(rows) == 2
    full = eng.score_topk("apple banana", k=None, similarity="lmd").collect()
    keys = [(-r["score"], r["doc_id"]) for r in full]
    assert keys == sorted(keys)
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in full[:2]]


def test_doc_range_and_filter(eng, spark):
    ranged = eng.score_topk(
        "apple", k=None, similarity="tfidf", doc_range=(0, 2)
    ).collect()
    assert {r["doc_id"] for r in ranged} <= {0, 1}
    flt = spark.createDataFrame([(1,), (4,)], "doc_id long")
    kept = eng.score_topk(
        "apple", k=None, similarity="lmd", filter_docs=flt
    ).collect()
    assert {r["doc_id"] for r in kept} == {1, 4}
    # scores are corpus-global: filtering must not change a kept score
    full = {
        r["doc_id"]: r["score"]
        for r in eng.score_topk("apple", k=None, similarity="lmd").collect()
    }
    for r in kept:
        assert r["score"] == pytest.approx(full[r["doc_id"]])


def test_validation(eng):
    with pytest.raises(ValueError):
        eng.score_topk("apple", similarity="dfr")
    with pytest.raises(ValueError):
        eng.score_topk("apple", similarity="lmd", mu=0)
    assert eng.score_topk("", similarity="lmd").count() == 0


@pytest.fixture(scope="module")
def sim_segs(spark, tmp_path_factory):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.query import FtsEngine

    path = str(tmp_path_factory.mktemp("simseg"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=64, block_docs=16)
    return path, FtsEngine(idx, use_segments=False)


@pytest.mark.parametrize("sim", ["lmd", "tfidf"])
@pytest.mark.parametrize(
    "q", ["scan merge join", "merge", "nonexistentterm scan", "zzznothing"]
)
def test_segment_score_matches_relational(spark, sim_segs, sim, q):
    """score_topk_pandas (exhaustive segment kernel, per-shard top-k
    pushdown, driver merge) is rank-identical to the relational
    FtsEngine.score_topk, scores equal to float ulps — the two paths
    sum per-term contributions in different orders."""
    from inverted_index_spark.wand import score_topk_pandas

    path, eng = sim_segs
    rel = [
        (r["doc_id"], r["score"])
        for r in eng.score_topk(q, k=10, similarity=sim).collect()
    ]
    seg = score_topk_pandas(path, q, k=10, similarity=sim)
    assert [int(d) for d in seg["doc_id"]] == [d for d, _ in rel], (sim, q)
    for (_, a), b in zip(rel, seg["score"]):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(a))


def test_segment_score_validates(sim_segs):
    from inverted_index_spark.wand import score_topk_pandas

    path, _ = sim_segs
    with pytest.raises(ValueError, match="unknown similarity"):
        score_topk_pandas(path, "scan", similarity="bm25")
    with pytest.raises(ValueError, match="mu must be positive"):
        score_topk_pandas(path, "scan", similarity="lmd", mu=0)
    assert len(score_topk_pandas(path, "", similarity="lmd")) == 0
