"""FtsEngine.count (membership-only counting) and
FtsEngine.more_like_this (similar-document retrieval, Lucene
MoreLikeThis shape: top source-doc tokens by tf x BM25-idf -> BM25
query -> source excluded)."""

import math
from collections import Counter

import pytest

from inverted_index_spark.analysis import analyze_index
from inverted_index_spark.qast import And, Match, Near
from tests.conftest import build_engine

CORPUS = [
    (1, "scan the merge queue today"),
    (2, "merge scan now"),
    (3, "scan scan merge"),
    (4, "scans marge tonight merge"),
    (5, "a scan far from the eventual merge point"),
    (6, "nothing relevant"),
    (7, "scan alpha beta merge"),
]


def test_count_matches_membership(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    assert eng.count(Match("scan")) == 6  # incl. 'scans' by prefix
    assert eng.count(And(Match("scan"), Match("alpha"))) == 1
    assert eng.count(Near("scan merge", 1)) == 1
    assert eng.count(Match("absent")) == 0


def test_more_like_this_matches_hand_computation(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    src = 3  # "scan scan merge"
    n = len(CORPUS)

    # hand-pick the top-2 terms by tf x idf (ties term asc)
    full_tokens = {
        d: [t.term for t in analyze_index(txt, ngrams=False)]
        for d, txt in CORPUS
    }
    tf = Counter(full_tokens[src])
    dfs = {
        t: sum(1 for ts in full_tokens.values() if t in ts) for t in tf
    }
    def idf(t):
        return math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
    sel = sorted(tf, key=lambda t: (-tf[t] * idf(t), t))[:2]

    got = eng.more_like_this(src, k=3, max_query_terms=2).collect()
    want = {
        r["doc_id"]: r["score"]
        for r in eng.bm25(" ".join(sel), k=None).collect()
        if r["doc_id"] != src
    }
    assert [r["doc_id"] for r in got] == sorted(
        want, key=lambda d: (-want[d], d)
    )[:3]
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]])
    # source doc never in its own neighbors
    assert src not in {r["doc_id"] for r in got}


def test_more_like_this_errors(spark):
    from inverted_index_spark.build import build_index
    from inverted_index_spark.query import FtsEngine

    eng = build_engine(spark, CORPUS, ngrams=False)
    with pytest.raises(ValueError, match="not in the doc store"):
        eng.more_like_this(999)

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_index(spark, df, ngrams=False)
    idx.docs = None
    with pytest.raises(ValueError, match="doc store"):
        FtsEngine(idx).more_like_this(1)
