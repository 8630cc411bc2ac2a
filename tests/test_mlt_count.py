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


def test_snippets_window_and_wrapping(spark):
    """snippet = frag_bytes window centered on the first hit; in-window
    hits wrapped, out-of-window hits untouched, edge tokens truncated;
    zero-position members (Phrase quirk) yield NULL."""
    from inverted_index_spark.qast import Match, Phrase

    docs = [
        (1, "aaa merge bbb ccc ddd eee merge fff"),
        (2, "merge at the very start of this document"),
        (3, "no hits here at all"),
        (4, "x" * 50 + " merge " + "y" * 50),
    ]
    eng = build_engine(spark, docs, ngrams=False)
    got = {
        r["doc_id"]: r["snippet"]
        for r in eng.snippets(Match("merge"), k=10, frag_bytes=20).collect()
    }
    assert 3 not in got

    def expect(text, frag=20):
        raw = text.encode()
        hits = []
        off = 0
        for t in text.split(" "):
            if t.startswith("merge"):
                hits.append((off, off + len(t)))
            off += len(t) + 1
        fb, fe = hits[0]
        s = max(0, fb - max(0, frag - (fe - fb)) // 2)
        e = min(len(raw), s + frag)
        parts, cur = bytearray(), s
        for b, pe in hits:
            if b < s or pe > e:
                continue
            parts += raw[cur:b] + b"<b>" + raw[b:pe] + b"</b>"
            cur = pe
        parts += raw[cur:e]
        return parts.decode()

    for d, text in docs:
        if d == 3:
            continue
        assert got[d] == expect(text), f"doc {d}"
    # doc 2: window clipped at the document start
    assert got[2].startswith("<b>merge</b>")
    # doc 4: long filler tokens truncated at the window edges
    assert "<b>merge</b>" in got[4] and len(got[4].encode()) <= 20 + 7

    # zero-position members -> NULL snippet (Phrase keeps both-term
    # docs with no adjacency)
    docs2 = [(1, "alpha beta"), (2, "beta alpha")]
    eng2 = build_engine(spark, docs2, ngrams=False)
    rows = {
        r["doc_id"]: r["snippet"]
        for r in eng2.snippets(Phrase("alpha beta"), k=10).collect()
    }
    assert rows[1].count("<b>") == 2
    assert rows[2] is None


def test_snippet_unicode_window_edges(spark):
    """A window edge inside a multibyte char drops only the partial
    sequence (deterministic errors='ignore'), never corrupts output."""
    from inverted_index_spark.qast import Match

    docs = [(1, "ééééé merge ééééé ooooo")]
    eng = build_engine(spark, docs, ngrams=False)
    row = eng.snippets(Match("merge"), k=1, frag_bytes=14).collect()[0]
    assert "<b>merge</b>" in row["snippet"]
    assert "�" not in row["snippet"]


def test_bm25_query_expansion_equals_term_bag(spark):
    """bm25_query on expansion nodes == bm25 over the expanded exact
    term bag; per-leaf df-desc cap; non-bag nodes rejected."""
    from inverted_index_spark.qast import Fuzzy, Near, Or, Prefix, Wildcard

    eng = build_engine(spark, CORPUS, ngrams=False)

    def rows(df):
        return [(r["doc_id"], round(r["score"], 5)) for r in df.collect()]

    # fuzzy: merge~1 expands to {merge, marge}
    assert rows(eng.bm25_query(Fuzzy("merge", 1), k=10)) == rows(
        eng.bm25("merge marge", k=10)
    )
    # wildcard: sc?n* -> {scan, scans}
    assert rows(eng.bm25_query(Wildcard("sc?n*"), k=10)) == rows(
        eng.bm25("scan scans", k=10)
    )
    # prefix: scan* -> {scan, scans}
    assert rows(eng.bm25_query(Prefix("scan"), k=10)) == rows(
        eng.bm25("scan scans", k=10)
    )
    # Or-bag composes and dedups
    assert rows(
        eng.bm25_query(Or(Fuzzy("marge", 1), Wildcard("m?rge")), k=10)
    ) == rows(eng.bm25("marge merge", k=10))
    # expansion cap keeps the highest-df candidate
    assert rows(eng.bm25_query(Fuzzy("scan", 1), k=10, max_expansions=1)) == rows(
        eng.bm25("scan", k=10)
    )
    with pytest.raises(ValueError, match="term-bag"):
        eng.bm25_query(Near("scan merge", 2))


def test_bm25_after_pagination_reconstructs_full_ranking(spark):
    """Concatenating cursor pages k=2 reproduces bm25(k=None)'s total
    order exactly — the strict-after predicate + doc_id tie-break never
    skip or duplicate a row."""
    eng = build_engine(spark, CORPUS, ngrams=False)
    full = eng.bm25("scan merge", k=None).collect()
    pages, cursor = [], None
    while True:
        rows = eng.bm25_after("scan merge", k=2, after=cursor).collect()
        if not rows:
            break
        pages += rows
        cursor = (rows[-1]["score"], rows[-1]["doc_id"])
    assert [(r["doc_id"], r["score"]) for r in pages] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_bm25_after_none_cursor_is_page_one(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    a = eng.bm25_after("scan merge", k=3, after=None).collect()
    b = eng.bm25("scan merge", k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_date_histogram_counts_and_validation(spark):
    from pyspark.sql import functions as F

    from inverted_index_spark.qast import Match

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    eng = build_engine(spark, CORPUS, ngrams=False)
    # 'scan' matches docs 1,2,3,4,5,7 ('scans' in doc 4 matches by
    # prefix — reference Match semantics, see test_count above)
    meta = spark.createDataFrame(
        [(d, f"2025-01-01 0{h}:30:00") for d, h in
         [(1, 0), (2, 0), (3, 1), (4, 1), (5, 2), (6, 3), (7, 2)]],
        ["doc_id", "s"],
    ).select("doc_id", F.to_timestamp("s").alias("ts"))
    got = {
        r["bucket_s"]: r["n_docs"]
        for r in eng.date_histogram(Match("scan"), meta, "ts", "hour")
        .select(F.date_format("bucket", "yyyy-MM-dd HH").alias("bucket_s"),
                "n_docs")
        .collect()
    }
    assert got == {"2025-01-01 00": 2, "2025-01-01 01": 2,
                   "2025-01-01 02": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.date_histogram(Match("scan"), meta, "ts", "fortnight")
    with _pytest.raises(ValueError):
        eng.date_histogram(Match("scan"), meta, "nope", "hour")


def test_results_by_field_order_and_plan(spark):
    from pyspark.sql import functions as F

    from inverted_index_spark.qast import Match

    eng = build_engine(spark, CORPUS, ngrams=False)
    # recency values with a tie (docs 2 and 3 share 50): tie -> doc_id asc
    meta = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 40), (5, 30), (6, 99), (7, 20)],
        ["doc_id", "recency"],
    )
    got = eng.results_by_field(Match("scan"), meta, "recency", k=4).collect()
    # 'scan' matches 1,2,3,4,5,7 (prefix incl. 'scans'); 6 never appears
    assert [(r["doc_id"], r["recency"]) for r in got] == [
        (2, 50), (3, 50), (4, 40), (5, 30)
    ]
    asc = eng.results_by_field(
        Match("scan"), meta, "recency", k=2, ascending=True
    ).collect()
    assert [r["doc_id"] for r in asc] == [1, 7]
    # sort+limit must be TakeOrderedAndProject (per-partition top-k),
    # never a global Sort/Exchange for the full set
    plan = eng.results_by_field(Match("scan"), meta, "recency", k=4)
    assert "TakeOrderedAndProject" in plan._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError):
        eng.results_by_field(Match("scan"), meta, "absent", k=4)


def test_collapse_one_per_group(spark):
    from pyspark.sql import functions as F

    eng = build_engine(spark, CORPUS, ngrams=False)
    meta = spark.createDataFrame(
        [(d, d % 3) for d, _ in CORPUS], ["doc_id", "grp"]
    )
    full = eng.bm25("scan merge", k=None).collect()
    got = eng.collapse("scan merge", meta, "grp", k=10).collect()
    # hand-collapse: best (score desc, doc_id asc) per grp
    best = {}
    for r in sorted(full, key=lambda r: (-r["score"], r["doc_id"])):
        best.setdefault(r["doc_id"] % 3, (r["doc_id"], r["score"]))
    want = sorted(best.values(), key=lambda t: (-t[1], t[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == want
    # every group appears at most hits_per_group times
    two = eng.collapse("scan merge", meta, "grp", k=10, hits_per_group=2)
    from collections import Counter

    counts = Counter(r["grp"] for r in two.collect())
    assert all(v <= 2 for v in counts.values())
    with pytest.raises(ValueError):
        eng.collapse("scan merge", meta, "grp", hits_per_group=0)
