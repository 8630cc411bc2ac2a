"""Round-4 serving surfaces: AtLeast (minimum-should-match), suggest
(did-you-mean), significant_terms, explain_bm25 and min_window
(unordered proximity) — goldens plus pure-Python oracles.

The randomized AtLeast parity (relational / segment / pandas-serving /
doc_range vs the byte-exact oracle) lives in
test_engine_vs_oracle_random.py; this file pins the documented
semantics and the new non-algebra surfaces.
"""

import itertools

import pytest

from inverted_index_spark.analysis import analyze_index, analyze_query
from inverted_index_spark.qast import (
    And,
    AtLeast,
    Match,
    Or,
    Phrase,
    Prefix,
)
from tests.conftest import build_engine

DOCS = [
    (0, "scan merge join window"),
    (1, "scan scan merge"),
    (2, "merge join stream"),
    (3, "window stream batch"),
    (4, "scan batch"),
    (5, "join scan merge scan join merge"),
    (6, "unrelated words only here"),
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# AtLeast


def test_atleast_membership_golden(spark):
    eng = build_engine(spark, DOCS)
    got = sorted(
        r["doc_id"]
        for r in eng.results(
            AtLeast(2, Match("scan"), Match("merge"), Match("join")),
            with_positions=False,
        ).collect()
    )
    # docs with >= 2 of {scan, merge, join}: 0,1,2,5
    assert got == [0, 1, 2, 5]


def test_atleast_ends_collapse_to_or_and(spark):
    eng = build_engine(spark, DOCS)
    children = (Match("scan"), Match("merge"), Match("join"))
    for q_at, q_eq in [
        (AtLeast(1, *children), Or(*children)),
        (AtLeast(3, *children), And(*children)),
    ]:
        a = _rows(eng.results(q_at).orderBy("doc_id"))
        b = _rows(eng.results(q_eq).orderBy("doc_id"))
        assert a == b


def test_atleast_m_bounds(spark):
    eng = build_engine(spark, DOCS)
    with pytest.raises(ValueError):
        AtLeast(0, Match("scan"))
    assert (
        eng.results(
            AtLeast(3, Match("scan"), Match("merge")), with_positions=False
        ).count()
        == 0
    )


def test_atleast_phrase_zero_hit_votes(spark):
    """A Phrase child's zero-adjacency membership (the reference quirk,
    postings.rs:101-112) must count as a vote: doc 2 has merge+join
    adjacent, doc 5 has merge..join both present with the pair
    ``join merge`` adjacent; doc 0 has merge join adjacent."""
    eng = build_engine(spark, DOCS)
    got = sorted(
        r["doc_id"]
        for r in eng.results(
            AtLeast(2, Phrase("merge join"), Match("scan"), Match("stream")),
            with_positions=False,
        ).collect()
    )
    # phrase membership (both terms present): 0, 2, 5; scan: 0,1,4,5;
    # stream: 2,3  ->  >=2 votes: 0, 2, 5
    assert got == [0, 2, 5]


def test_atleast_segment_parity(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import segment_query

    path = str(tmp_path / "alseg")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=True, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=4, block_docs=2,
                   positions=True)
    eng = build_engine(spark, DOCS)
    q = AtLeast(2, Match("scan"), Match("merge"), Prefix("jo"))
    rel = [
        (r["doc_id"],
         [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
         round(r["score"], 5))
        for r in eng.results(q).collect()
    ]
    seg = [
        (r["doc_id"],
         [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
         round(r["score"], 5))
        for r in segment_query(spark, path, q, with_positions=True).collect()
    ]
    assert seg == rel


def test_atleast_count_routes(spark):
    eng = build_engine(spark, DOCS)
    q = AtLeast(2, Match("scan"), Match("merge"), Match("join"))
    assert eng.count(q) == 4


# ---------------------------------------------------------------------------
# suggest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_suggest_matches_python_oracle(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    vocab = {}
    for _, text in DOCS:
        for t in {tok.term for tok in analyze_index(text, ngrams=False)}:
            vocab[t] = vocab.get(t, 0) + 1
    got = [tuple(r) for r in eng.suggest("scn mrege", max_edits=2, k=3).collect()]
    expect = []
    for q in ["scn", "mrege"]:
        cands = [
            (d, -df, t)
            for t, df in vocab.items()
            for d in [_lev(t, q)]
            if d <= 2
        ]
        cands.sort()
        expect.extend(
            (q, t, d, -negdf, rank)
            for rank, (d, negdf, t) in enumerate(cands[:3], 1)
        )
    expect.sort(key=lambda r: (r[0], r[4]))
    assert got == expect


def test_suggest_exact_term_is_dist0(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    rows = eng.suggest("merge", max_edits=1, k=2).collect()
    assert rows[0]["suggestion"] == "merge" and rows[0]["dist"] == 0


def test_suggest_requires_fulltoken(spark):
    eng = build_engine(spark, DOCS, ngrams=True)
    with pytest.raises(ValueError):
        eng.suggest("merge")


# ---------------------------------------------------------------------------
# significant_terms


def test_significant_terms_matches_python_oracle(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    fg_docs = {
        d for d, text in DOCS
        if "scan" in [t.term for t in analyze_index(text, ngrams=False)]
    }
    n, fg_n = len(DOCS), len(fg_docs)
    fg_df, bg_df = {}, {}
    for d, text in DOCS:
        for t in {tok.term for tok in analyze_index(text, ngrams=False)}:
            bg_df[t] = bg_df.get(t, 0) + 1
            if d in fg_docs:
                fg_df[t] = fg_df.get(t, 0) + 1
    expect = []
    for t, f in fg_df.items():
        if f < 2:
            continue
        fr, br = f / fg_n, bg_df[t] / n
        expect.append((t, f, bg_df[t], (fr - br) * (fr / br)))
    expect.sort(key=lambda r: (-r[3], r[0]))
    got = [
        (r["term"], r["fg_df"], r["bg_df"], round(r["score"], 10))
        for r in eng.significant_terms(Match("scan"), k=10, min_doc_count=2)
        .collect()
    ]
    assert got == [(t, f, b, round(s, 10)) for t, f, b, s in expect[:10]]
    # the query's own term is the most significant one here
    assert got[0][0] == "scan"


def test_significant_terms_empty_query(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    assert eng.significant_terms(Match("zzzzz"), k=5).count() == 0


# ---------------------------------------------------------------------------
# explain_bm25


def test_explain_contribs_sum_to_bm25(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    text = "scan merge join"
    top = [(r["doc_id"], r["score"]) for r in eng.bm25(text, k=4).collect()]
    rows = eng.explain_bm25(text, k=4).collect()
    assert sorted({r["doc_id"] for r in rows}) == sorted(d for d, _ in top)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, score in top:
        contribs = by_doc[doc_id]
        assert abs(sum(c["contrib"] for c in contribs) - score) < 1e-9
        for c in contribs:
            assert abs(c["score"] - score) < 1e-9
            assert c["tf"] >= 1 and c["df"] >= 1 and c["idf"] > 0


def test_explain_df_tf_match_corpus(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    rows = eng.explain_bm25("stream", k=10).collect()
    # 'stream' occurs once in docs 2 and 3
    assert {(r["doc_id"], r["tf"], r["df"]) for r in rows} == {
        (2, 1.0, 2.0),
        (3, 1.0, 2.0),
    }


# ---------------------------------------------------------------------------
# min_window


def _brute_min_window(text: str, terms):
    toks = analyze_index(text, ngrams=False)
    per_term = []
    for t in terms:
        ps = [tok.pos for tok in toks if tok.term.startswith(t)]
        if not ps:
            return None
        per_term.append(ps)
    return min(
        max(combo) - min(combo) + 1
        for combo in itertools.product(*per_term)
    )


@pytest.mark.parametrize("query", ["scan merge", "scan merge join", "join"])
def test_min_window_matches_brute_force(spark, query):
    eng = build_engine(spark, DOCS, ngrams=False)
    terms = []
    for tok in analyze_query(query):
        if tok.term not in terms:
            terms.append(tok.term)
    expect = sorted(
        (d, _brute_min_window(text, terms))
        for d, text in DOCS
        if _brute_min_window(text, terms) is not None
    )
    got = [(r["doc_id"], r["span"]) for r in eng.min_window(query).collect()]
    assert got == expect


def test_min_window_filter(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    spans = dict(
        (r["doc_id"], r["span"])
        for r in eng.min_window("scan join").collect()
    )
    tight = [
        r["doc_id"] for r in eng.min_window("scan join", window=2).collect()
    ]
    assert tight == sorted(d for d, s in spans.items() if s <= 2)
    assert 5 in tight  # "join scan" adjacent in doc 5


def test_suggest_pandas_matches_engine(spark, tmp_path):
    """Zero-job coordinator suggest over a saved index == the engine's
    Spark-side suggest, row for row."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.metacache import suggest_pandas
    from inverted_index_spark.query import FtsEngine

    path = str(tmp_path / "sugidx")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    eng = FtsEngine(build_and_save(spark, df, path, ngrams=False))
    want = [tuple(r) for r in eng.suggest("scn mrege", max_edits=2, k=3).collect()]
    got = [tuple(r) for r in suggest_pandas(path, "scn mrege", max_edits=2, k=3).itertuples(index=False)]
    assert got == want and got


def test_explain_previews_atleast_route(spark, tmp_path):
    """engine.explain handles AtLeast: segment route when fresh, with
    the rendered vote tree in the preview."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.query import FtsEngine

    path = str(tmp_path / "alx")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=4, positions=True)
    eng = FtsEngine(load_saved(spark, path))
    out = eng.explain(AtLeast(2, Match("scan"), Match("merge"), Match("join")))
    assert out["route"] == "segments"
    assert "AtLeast[m=2]" in out["tree"]


def load_saved(spark, path):
    from inverted_index_spark.build import load_index

    return load_index(spark, path)


def test_explain_topk_pandas_matches_engine(spark, tmp_path):
    """Zero-job explanation over a saved index == the engine's
    explain_bm25 (same rows; float64 values agree to 9 decimals)."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.wand import explain_topk_pandas

    path = str(tmp_path / "exidx")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=4, block_docs=2,
                   positions=False)
    eng = FtsEngine(idx)
    want = [
        (r["doc_id"], round(r["score"], 9), r["term"], r["tf"], r["df"],
         round(r["idf"], 9), round(r["contrib"], 9))
        for r in eng.explain_bm25("scan merge join", k=4).collect()
    ]
    pdf = explain_topk_pandas(path, "scan merge join", k=4)
    got = [
        (int(r.doc_id), round(r.score, 9), r.term, r.tf, r.df,
         round(r.idf, 9), round(r.contrib, 9))
        for r in pdf.itertuples(index=False)
    ]
    assert got == want and got
    # contribs sum to the WAND score per doc
    for d in set(pdf["doc_id"]):
        sub = pdf[pdf["doc_id"] == d]
        assert abs(sub["contrib"].sum() - sub["score"].iloc[0]) < 1e-9


def test_facet_stats_matches_recount(spark):
    from pyspark.sql import functions as F

    eng = build_engine(spark, DOCS, ngrams=False)
    meta = spark.createDataFrame(
        [(d, d % 2, float(len(t))) for d, t in DOCS],
        ["doc_id", "bucket", "chars"],
    )
    got = {
        (r["group"], r["n_docs"], r["min_v"], r["max_v"], r["sum_v"],
         round(r["avg_v"], 9))
        for r in eng.facet_stats(Match("scan"), meta, "bucket", "chars")
        .collect()
    }
    members = {
        r["doc_id"]
        for r in eng.results(Match("scan"), with_positions=False).collect()
    }
    import collections
    buckets = collections.defaultdict(list)
    for d, t in DOCS:
        if d in members:
            buckets[d % 2].append(float(len(t)))
    want = {
        (b, len(vs), min(vs), max(vs), sum(vs), round(sum(vs) / len(vs), 9))
        for b, vs in buckets.items()
    }
    assert got == want and got
    with pytest.raises(ValueError):
        eng.facet_stats(Match("scan"), meta, "missing", "chars")


def test_bm25_boosts_relational(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    text = "scan merge"
    per = eng.explain_bm25(text, k=100).collect()
    want = {}
    for r in per:
        w = 2.0 if r["term"] == "merge" else 1.0
        want[r["doc_id"]] = want.get(r["doc_id"], 0.0) + w * r["contrib"]
    got = {
        r["doc_id"]: r["score"]
        for r in eng.bm25(text, k=None, boosts={"merge": 2.0}).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9
    # neutral boosts are a no-op; zero boost drops the term entirely
    a = [tuple(r) for r in eng.bm25(text, k=None).collect()]
    b = [tuple(r) for r in eng.bm25(text, k=None, boosts={"x": 1.0}).collect()]
    assert a == b
    z = [tuple(r) for r in eng.bm25(text, k=None, boosts={"merge": 0.0}).collect()]
    assert z == [tuple(r) for r in eng.bm25("scan", k=None).collect()]
    with pytest.raises(ValueError):
        eng.bm25(text, boosts={"merge": -1.0}).collect()


def test_bm25_boosts_wand_parity(spark, tmp_path):
    """Boosted BM25 on the WAND route equals the boosted relational
    scorer (block bounds scale with the weights — skipping stays
    exact), in both spark and pandas serving."""
    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.wand import wand_topk_pandas

    path = str(tmp_path / "boostidx")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=4, block_docs=2,
                   positions=False)
    eng = FtsEngine(load_index(spark, path))
    # bm25 routes on the (non-positional) segment freshness check
    assert eng._segment_path() is not None
    boosts = {"merge": 3.0, "scan": 0.5}
    routed = [
        (r["doc_id"], round(r["score"], 9))
        for r in eng.bm25("scan merge", k=5, boosts=boosts).collect()
    ]
    rel_eng = build_engine(spark, DOCS, ngrams=False)
    rel = [
        (r["doc_id"], round(r["score"], 9))
        for r in rel_eng.bm25("scan merge", k=5, boosts=boosts).collect()
    ]
    assert routed == rel
    served = [
        (int(d), round(float(s), 9))
        for d, s in zip(*[
            wand_topk_pandas(path, "scan merge", k=5, boosts=boosts)[c]
            for c in ("doc_id", "score")
        ])
    ]
    assert served == rel


def test_atleast_topk_pushdown_identity(spark, tmp_path):
    """AtLeast under per-shard top-k pushdown (k set): segment and
    pandas serving stay bit-identical to the relational two-pass."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    path = str(tmp_path / "alk")
    df = spark.createDataFrame(DOCS * 1, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=3, block_docs=2,
                   positions=True)
    eng = FtsEngine(idx)
    q = AtLeast(2, Match("scan"), Match("merge"), Phrase("join scan"))
    rel = [
        (r["doc_id"], round(r["score"], 5))
        for r in eng.results(q, k=3, with_positions=False).collect()
    ]
    seg = [
        (r["doc_id"], round(r["score"], 5))
        for r in segment_query(
            spark, path, q, k=3, with_positions=False
        ).collect()
    ]
    pdf = segment_query_pandas(path, q, k=3, with_positions=False)
    srv = [
        (int(d), round(float(s), 5))
        for d, s in zip(pdf["doc_id"], pdf["score"])
    ]
    assert rel == seg == srv and rel


@pytest.mark.parametrize("query", ["scan merge join", "join", "scan merge"])
def test_min_window_pandas_matches_engine(spark, tmp_path, query):
    """Zero-job unordered proximity over positional segments == the
    engine's min_window, row for row (incl. the window filter)."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import min_window_pandas

    path = str(tmp_path / "mwidx")
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=3, block_docs=2,
                   positions=True)
    eng = FtsEngine(idx)
    for window in (None, 4):
        want = [
            (r["doc_id"], r["span"])
            for r in eng.min_window(query, window=window).collect()
        ]
        pdf = min_window_pandas(path, query, window=window)
        got = list(zip(pdf["doc_id"].tolist(), pdf["span"].tolist()))
        assert got == want


# ---------------------------------------------------------------------------
# term_vector (per-doc term/tf/df/positions accessor)


def test_term_vector_matches_reanalysis(spark):
    """Full-token engine: the vector must list exactly the doc's
    distinct analyzed terms, term-sorted, with tf = occurrence count,
    positions = the analyzer's byte offsets, df = docs containing the
    term."""
    eng = build_engine(spark, DOCS, ngrams=False)
    text = dict(DOCS)[5]
    toks = list(analyze_index(text, ngrams=False))
    want = {}
    for t in toks:
        want.setdefault(t.term, []).append((t.begin, t.end, t.pos))
    got = eng.term_vector(5).collect()
    assert [r["term"] for r in got] == sorted(want)
    for r in got:
        assert r["tf"] == len(want[r["term"]])
        assert [(p["begin"], p["end"], p["pos"]) for p in r["positions"]] \
            == want[r["term"]]
        hand_df = sum(
            1 for _, txt in DOCS
            if any(tok.term == r["term"]
                   for tok in analyze_index(txt, ngrams=False))
        )
        assert r["df"] == hand_df, r["term"]


def test_term_vector_ngram_index_lists_stored_prefixes(spark):
    """Parity (edge-ngram) engine: the vector lists the stored
    dictionary entries (every token prefix), with df counted per
    ENTRY — 's' covers scan AND stream docs."""
    eng = build_engine(spark, DOCS, ngrams=True)
    rows = {r["term"]: r for r in eng.term_vector(4).collect()}
    assert "scan" in rows and "s" in rows and "sc" in rows
    assert rows["scan"]["df"] == 4   # docs 0, 1, 4, 5
    assert rows["s"]["df"] == 6      # + stream docs 2, 3
    assert rows["batch"]["tf"] == 1


def test_term_vector_saved_index_identical(spark, tmp_path):
    """Saved index (metacache df read, zero Spark jobs) returns the
    same rows as the in-memory build."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    path = str(tmp_path / "tv_idx")
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    eng_saved = FtsEngine(idx)
    eng_mem = build_engine(spark, DOCS, ngrams=False)
    a = [tuple(r) for r in eng_saved.term_vector(2).collect()]
    b = [tuple(r) for r in eng_mem.term_vector(2).collect()]
    assert a == b and a


def test_term_vector_errors(spark):
    eng = build_engine(spark, DOCS, ngrams=False)
    with pytest.raises(ValueError, match="not in the doc store"):
        eng.term_vector(999)


class TestRescore:
    DOCS = [
        (0, "scan merge far apart scan word word word word merge"),
        (1, "scan merge adjacent here"),
        (2, "scan only document scan scan"),
        (3, "merge only document merge merge"),
        (4, "scan word merge two apart"),
        (5, "scan scan scan merge merge merge"),
    ]

    def test_rescore_matches_hand_combine(self, spark):
        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        window, weight = 6, 2.0
        prim = {r["doc_id"]: r["score"]
                for r in eng.bm25("scan merge", k=window).collect()}
        spans = {r["doc_id"]: r["span"]
                 for r in eng.min_window("scan merge").collect()}
        want = sorted(
            (
                (d, s + (weight / spans[d] if d in spans else 0.0))
                for d, s in prim.items()
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:4]
        got = [(r["doc_id"], r["score"])
               for r in eng.rescore("scan merge", k=4, window=window,
                                    weight=weight).collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9

    def test_window_restricts_proximity_work(self, spark):
        """min_window(filter_docs=...) only returns docs in the filter."""
        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        keep = spark.createDataFrame([(1,), (4,)], ["doc_id"])
        got = {r["doc_id"] for r in
               eng.min_window("scan merge", filter_docs=keep).collect()}
        assert got == {1, 4}

    def test_zero_weight_is_pure_bm25(self, spark):
        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        a = [(r["doc_id"], r["score"])
             for r in eng.rescore("scan merge", k=3, window=6,
                                  weight=0.0).collect()]
        b = [(r["doc_id"], r["score"])
             for r in eng.bm25("scan merge", k=3).collect()]
        assert a == b

    def test_validation(self, spark):
        import pytest

        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        with pytest.raises(ValueError):
            eng.rescore("scan merge", k=10, window=5)
        with pytest.raises(ValueError):
            eng.rescore("scan merge", weight=-1.0)


class TestLtrFeatures:
    DOCS = [
        (0, "scan merge scan fast"),
        (1, "scan window slow table"),
        (2, "merge merge merge join"),
        (3, "scan merge adjacent"),
        (4, "value part hash"),
    ]

    def test_features_match_hand_compute(self, spark):
        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        texts = ["scan merge", "window"]
        got = [
            (
                r["query_id"], r["doc_id"], r["score"], r["n_matched"],
                r["tf_sum"], r["span"], r["dl_tokens"], r["dl_bytes"],
            )
            for r in eng.ltr_features(texts, k=3).collect()
        ]
        toks = {d: t.split() for d, t in self.DOCS}
        for qid, text in enumerate(texts):
            terms = text.split()
            rows = [g for g in got if g[0] == qid]
            # candidates == bm25 top-3, same order
            cand = [(r["doc_id"], r["score"])
                    for r in eng.bm25(text, k=3).collect()]
            assert [(g[1], g[2]) for g in rows] == cand
            for _, d, _, n_matched, tf_sum, span, dlt, dlb in rows:
                assert n_matched == sum(1 for t in terms if t in toks[d])
                assert tf_sum == sum(toks[d].count(t) for t in terms)
                assert dlt == len(toks[d])
                assert dlb == len(dict(self.DOCS)[d].encode())
                pos = {t: [i for i, x in enumerate(toks[d]) if x == t]
                       for t in terms}
                if all(pos[t] for t in terms):
                    best = min(
                        max(ps) - min(ps) + 1
                        for ps in __import__("itertools").product(
                            *[pos[t] for t in terms]
                        )
                    )
                    assert span == best, (d, span, best)
                else:
                    assert span is None

    def test_validation_and_order(self, spark):
        import pytest

        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        with pytest.raises(ValueError):
            eng.ltr_features([])
        rows = eng.ltr_features(["scan merge", "merge"], k=2).collect()
        keys = [(r["query_id"], -r["score"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
