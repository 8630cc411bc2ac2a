"""Multi-field ranking: BM25F, dis_max, most_fields.

Independent in-test pure-Python oracle for BM25F, single-field
reduction pinned against FtsEngine.bm25, and algebraic identities
between the three combiners.
"""

import math

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.build import build_index
from inverted_index_spark.multifield import (
    MultiFieldIndex,
    bm25f_topk,
    build_multifield_index,
    dismax_topk,
    most_fields_topk,
)
from inverted_index_spark.query import FtsEngine

DOCS = [
    # (doc_id, title, body)
    (0, "scan merge", "join table value part hash scan"),
    (1, "merge join plan", "scan scan merge window agg sort"),
    (2, "window sort", "merge join join join hash part"),
    (3, "scan", "value value value part part hash"),
    (4, "table plan", "plan plan window sort agg value"),
    (5, "join scan merge", "merge merge scan join table"),
]


def _mf(spark, field_b=None):
    df = spark.createDataFrame(DOCS, ["doc_id", "title", "body"])
    return build_multifield_index(spark, df, ["title", "body"])


def _py_bm25f(query_terms, weights, field_b, k1=1.2):
    """Pure-Python BM25F over DOCS — the independent oracle."""
    fields = {"title": 1, "body": 2}
    toks = {
        f: {d[0]: d[i].split() for d in DOCS} for f, i in fields.items()
    }
    n = len(DOCS)
    avgdl = {
        f: sum(len(v) for v in toks[f].values()) / n for f in fields
    }
    scores = {}
    for t in query_terms:
        # combined df: term in ANY field
        df = sum(
            1
            for d, _, _ in DOCS
            if any(t in toks[f][d] for f in fields)
        )
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, _, _ in DOCS:
            wtf = 0.0
            for f in fields:
                tf = toks[f][d].count(t)
                if tf == 0:
                    continue
                b = field_b.get(f, 0.75)
                dl = len(toks[f][d])
                wtf += weights.get(f, 1.0) * tf / (1 - b + b * dl / avgdl[f])
            if wtf > 0:
                scores[d] = scores.get(d, 0.0) + idf * wtf * (k1 + 1) / (
                    k1 + wtf
                )
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


class TestBM25F:
    def test_matches_python_oracle(self, spark):
        mf = _mf(spark)
        weights = {"title": 2.0, "body": 1.0}
        field_b = {"title": 0.5, "body": 0.75}
        got = _rows(bm25f_topk(mf, "scan merge join", k=None,
                               weights=weights, field_b=field_b))
        want = _py_bm25f(["scan", "merge", "join"], weights, field_b)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    def test_single_field_reduces_to_bm25(self, spark):
        """BM25F over ONE field at weight 1, b=0.75 == FtsEngine.bm25."""
        df = spark.createDataFrame(
            [(d, body) for d, _, body in DOCS], ["doc_id", "text"]
        )
        idx = build_index(spark, df, ngrams=False, term_buckets=4)
        eng = FtsEngine(idx)
        mf = MultiFieldIndex({"text": idx})
        got = _rows(bm25f_topk(mf, "scan merge join", k=None))
        want = [
            (r["doc_id"], r["score"])
            for r in eng.bm25("scan merge join", k=None).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    def test_title_boost_promotes_title_hits(self, spark):
        mf = _mf(spark)
        # 'plan' appears in doc 1 + 4 title and doc 4 body; heavy title
        # weight must rank a title hit first
        top = bm25f_topk(mf, "plan", k=1, weights={"title": 5.0, "body": 0.5})
        assert top.collect()[0]["doc_id"] in (1, 4)
        # zero body weight: docs with the term ONLY in body (1, 4)
        # score 0 / disappear — 'window' is in the title of doc 2 only
        got = {r["doc_id"] for r in
               bm25f_topk(mf, "window", k=None,
                          weights={"title": 1.0, "body": 0.0}).collect()}
        assert got == {2}

    def test_zero_weight_field_still_counts_df(self, spark):
        """w=0 drops score mass but keeps the field's docs in df —
        idf must differ from a title-only index's idf."""
        mf = _mf(spark)
        only_title = MultiFieldIndex({"title": mf.fields["title"]})
        a = dict(_rows(bm25f_topk(mf, "merge", k=None,
                                  weights={"title": 1.0, "body": 0.0})))
        b = dict(_rows(bm25f_topk(only_title, "merge", k=None)))
        # same membership (title matches), different idf: combined df
        # counts body-only docs (doc 2 has merge only in body)
        assert set(a) == set(b)
        assert all(a[d] < b[d] for d in a)  # bigger df -> smaller idf

    def test_empty_query_and_validation(self, spark):
        mf = _mf(spark)
        assert bm25f_topk(mf, "", k=5).count() == 0
        with pytest.raises(ValueError):
            bm25f_topk(mf, "scan", field_b={"title": 1.5})
        with pytest.raises(ValueError):
            bm25f_topk(mf, "scan", weights={"title": -1.0})
        with pytest.raises(ValueError):
            build_multifield_index(
                spark,
                spark.createDataFrame(DOCS, ["doc_id", "title", "body"]),
                ["title", "nope"],
            )

    def test_mismatched_doc_sets_rejected(self, spark):
        t = build_index(
            spark,
            spark.createDataFrame([(0, "a"), (1, "b")], ["doc_id", "text"]),
            ngrams=False, term_buckets=2,
        )
        b = build_index(
            spark,
            spark.createDataFrame([(0, "a")], ["doc_id", "text"]),
            ngrams=False, term_buckets=2,
        )
        with pytest.raises(ValueError, match="corpus size"):
            bm25f_topk(MultiFieldIndex({"t": t, "b": b}), "a")


class TestCombiners:
    def test_dismax_identities(self, spark):
        """tie_breaker=0 -> per-doc max of weighted field scores;
        tie_breaker=1 -> most_fields sum."""
        mf = _mf(spark)
        w = {"title": 2.0, "body": 1.0}
        q = "scan merge join window"
        field_scores = {}
        for name, idx in mf.fields.items():
            eng = FtsEngine(idx)
            for r in eng.bm25(q, k=None).collect():
                field_scores.setdefault(r["doc_id"], []).append(
                    w[name] * r["score"]
                )
        mx = {d: max(v) for d, v in field_scores.items()}
        sm = {d: sum(v) for d, v in field_scores.items()}
        got0 = dict(_rows(dismax_topk(mf, q, k=None, weights=w)))
        got1 = dict(_rows(dismax_topk(mf, q, k=None, weights=w,
                                      tie_breaker=1.0)))
        gotmf = dict(_rows(most_fields_topk(mf, q, k=None, weights=w)))
        assert set(got0) == set(mx)
        for d in mx:
            assert got0[d] == pytest.approx(mx[d], rel=1e-9)
            assert got1[d] == pytest.approx(sm[d], rel=1e-9)
            assert gotmf[d] == pytest.approx(sm[d], rel=1e-9)

    def test_tie_breaker_validated(self, spark):
        mf = _mf(spark)
        with pytest.raises(ValueError):
            dismax_topk(mf, "scan", tie_breaker=1.5)

    def test_topk_order_and_limit(self, spark):
        mf = _mf(spark)
        full = _rows(most_fields_topk(mf, "scan merge", k=None))
        top2 = _rows(most_fields_topk(mf, "scan merge", k=2))
        assert top2 == full[:2]
        # deterministic tiebreak: score desc, doc_id asc
        assert full == sorted(full, key=lambda kv: (-kv[1], kv[0]))
