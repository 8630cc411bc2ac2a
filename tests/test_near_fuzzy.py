"""Near (proximity) + Fuzzy (edit-distance) query nodes — engine
extensions over the reference algebra (/root/reference/src/query.rs:5-27
stops at exact-adjacency Phrase and has no fuzzy matching).

Covers: golden semantics on a fixed corpus, three-evaluator identity
(relational DataFrame plan == distributed segment kernels == in-process
pandas serving), randomized full-token fuzz of Fuzzy vs the pure-Python
oracle, the max_expansions df-cap contract, and the error surface
(fuzzy on an ngram index, multi-token fuzzy, slop < 1).
"""

import random

import pytest

from inverted_index_spark.oracle import OracleIndex, levenshtein, parity_score
from inverted_index_spark.qast import And, Fuzzy, Match, Near, Or, Phrase
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


def _docs(res):
    return sorted(r["doc_id"] for r in res.collect())


# ---------------------------------------------------------------------------
# Near golden semantics (full-token engine)


def test_near_is_ordered_and_windowed(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    # slop=1: only strict adjacency in order ("scan merge" not "merge scan")
    assert _docs(eng.results(Near("scan merge", 1))) == [3]
    # slop=2: doc 1 has one gap word
    assert _docs(eng.results(Near("scan merge", 2))) == [1, 3]
    # slop=3: doc 7 (two gaps) and doc 4 (scans~ prefix match, gap 3)
    assert _docs(eng.results(Near("scan merge", 3))) == [1, 3, 4, 7]
    # order matters: "merge scan" only in doc 2
    assert _docs(eng.results(Near("merge scan", 1))) == [2]


def test_near_no_zero_hit_membership_unlike_phrase(spark):
    """Phrase keeps docs containing both terms with zero adjacencies
    (reference postings.rs:101-112); Near requires a real hit."""
    eng = build_engine(spark, CORPUS, ngrams=False)
    phrase_docs = _docs(eng.results(Phrase("scan merge")))
    near_docs = _docs(eng.results(Near("scan merge", 1)))
    assert near_docs == [3]
    # every doc with both terms is a Phrase member (incl. score-0)
    assert set(near_docs) < set(phrase_docs)
    assert 5 in phrase_docs  # both terms, far apart -> Phrase member


def test_near_single_term_empty(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    assert _docs(eng.results(Near("scan", 3))) == []


def test_near_slop_validation(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    with pytest.raises(ValueError, match="slop"):
        eng.results(Near("scan merge", 0))


# ---------------------------------------------------------------------------
# Fuzzy golden semantics


def test_fuzzy_expands_one_edit(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    # merge~1 also matches "marge" (doc 4)
    assert _docs(eng.results(Fuzzy("merge", 1))) == [1, 2, 3, 4, 5, 7]
    # scan~1 also matches "scans" (doc 4)
    assert _docs(eng.results(Fuzzy("scan", 1))) == [1, 2, 3, 4, 5, 7]
    # exact-only corpus term far from everything
    assert _docs(eng.results(Fuzzy("nothing", 1))) == [6]


def test_fuzzy_composes_with_algebra(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    got = _docs(eng.results(And(Fuzzy("marge", 1), Match("tonight"))))
    assert got == [4]


def test_fuzzy_requires_full_token_index(spark):
    eng = build_engine(spark, CORPUS, ngrams=True)
    with pytest.raises(ValueError, match="full-token"):
        eng.results(Fuzzy("merge", 1))


def test_fuzzy_requires_single_term(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    with pytest.raises(ValueError, match="exactly one"):
        eng.results(Fuzzy("scan merge", 1))


def test_fuzzy_max_expansions_caps_by_df(spark):
    """With max_expansions=1 only the highest-df candidate survives:
    'scan' (df 5) beats 'scans' (df 1) for scan~1."""
    eng = build_engine(spark, CORPUS, ngrams=False)
    capped = _docs(eng.results(Fuzzy("scan", 1, max_expansions=1)))
    # exact-token "scan" docs only — doc 4 has just "scans"
    assert capped == [1, 2, 3, 5, 7]
    full = _docs(eng.results(Fuzzy("scan", 1, max_expansions=50)))
    assert full == [1, 2, 3, 4, 5, 7]
    assert set(capped) < set(full)


# ---------------------------------------------------------------------------
# three-evaluator identity on saved segments

QUERIES = [
    Near("scan merge", 1),
    Near("scan merge", 3),
    Near("merge scan", 2),
    Fuzzy("merge", 1),
    Fuzzy("scan", 2),
    And(Fuzzy("marge", 1), Near("scan merge", 4)),
    Or(Near("scan merge", 2), Fuzzy("tonight", 1)),
]


def test_three_evaluators_identical(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    path = str(tmp_path / "nearfuzz")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)
    eng = FtsEngine(idx, use_segments=False)

    for q in QUERIES:
        rel = [
            (r["doc_id"], round(r["score"], 5),
             [(p["begin"], p["end"], p["pos"]) for p in r["positions"]])
            for r in eng.results(q, with_positions=True).collect()
        ]
        seg = [
            (r["doc_id"], round(r["score"], 5),
             [(p["begin"], p["end"], p["pos"]) for p in r["positions"]])
            for r in segment_query(
                spark, path, q, with_positions=True, mode="spark"
            ).collect()
        ]
        pdf = segment_query_pandas(path, q, with_positions=True)
        loc = [
            (int(d), round(float(s), 5),
             [(p["begin"], p["end"], p["pos"]) for p in poss])
            for d, s, poss in zip(pdf["doc_id"], pdf["score"], pdf["positions"])
        ]
        assert rel == seg == loc, f"evaluators diverged on {q}"


def test_explain_previews_near_and_fuzzy(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import explain_segment_query

    path = str(tmp_path / "nf_explain")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)

    ex = explain_segment_query(path, Fuzzy("merge", 1))
    # fuzzy leaves render as the EXPANDED exact terms
    assert "merge" in ex["tree"] and "marge" in ex["tree"]
    assert all(r["hi"] == r["lo"] + "\x00" for r in ex["ranges"])
    ex2 = explain_segment_query(path, Near("scan merge", 3))
    assert "slop=3" in ex2["tree"]


# ---------------------------------------------------------------------------
# randomized full-token fuzz: Fuzzy vs the pure-Python oracle

FUZZ_WORDS = [
    "scan", "scans", "scam", "span", "merge", "marge", "merges", "forge",
    "join", "joins", "coin", "alpha", "beta", "a", "ab", "abc",
    # non-ASCII (ADVICE r3): BMP accents/dotted-İ and astral-plane
    # chars — Spark's F.levenshtein counts CODE POINTS (one per astral
    # char), matching the Python oracle; these words make the
    # engine-vs-oracle fuzz catch any code-unit regression
    "naïve", "naive", "café", "cafe", "İstanbul", "istanbul",
    "𝒜b", "xb", "a😀", "😀😀",
]

# words usable as a Fuzzy QUERY: must analyze to exactly one term
# ("a😀" analyzes to "a" alone; "😀😀" to nothing — still valid as doc
# content, exercising the tokenizer, but not as a single-term query)
from inverted_index_spark.analysis import analyze_query as _aq  # noqa: E402

FUZZ_QUERY_WORDS = [w for w in FUZZ_WORDS if len(_aq(w)) == 1]


@pytest.mark.parametrize("seed", [11, 42])
def test_fuzzy_random_parity(spark, seed):
    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice(FUZZ_WORDS) for _ in range(rng.randint(0, 9))))
        for i in range(20)
    ]
    eng = build_engine(spark, docs, ngrams=False)
    oracle = OracleIndex()
    for doc_id, text in docs:
        oracle.add(doc_id, text)

    for _ in range(6):
        q = Fuzzy(rng.choice(FUZZ_QUERY_WORDS), rng.choice([1, 2]))
        postings = oracle.postings_for(q)
        expect = sorted(
            (
                d,
                [tuple(p) for p in ps],
                round(parity_score(ps, len(oracle.docs[d].encode())), 5),
            )
            for d, ps in postings.items()
        )
        got = sorted(
            (
                r["doc_id"],
                [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                round(r["score"], 5),
            )
            for r in eng.results(q, with_positions=True).collect()
        )
        assert got == expect, f"fuzzy fuzz diverged on {q} seed {seed}"


def test_levenshtein_matches_duckdb():
    """DuckDB's levenshtein is BYTE-based, so the dialect-identity
    claim (and every DuckDB-oracled Fuzzy contract) holds on ASCII
    vocabularies only — non-ASCII parity is pinned against Spark in
    test_levenshtein_matches_spark instead."""
    import duckdb

    ascii_words = [w for w in FUZZ_WORDS if w.isascii()]
    rng = random.Random(3)
    pairs = [
        (rng.choice(ascii_words), rng.choice(ascii_words)) for _ in range(40)
    ]
    for a, b in pairs:
        want = duckdb.sql(
            "select levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert levenshtein(a, b) == want
    # the documented divergence, pinned so a DuckDB behavior change
    # (to code points) gets noticed and the oracle note updated
    assert duckdb.sql(
        "select levenshtein(?, ?)", params=["𝒜", "x"]
    ).fetchone()[0] == 4  # bytes, not code points
    assert levenshtein("𝒜", "x") == 1


def test_levenshtein_matches_spark(spark):
    """Spark F.levenshtein == the Python oracle on code points,
    INCLUDING astral-plane chars (Java counts code points since
    SPARK-36073-era; a code-unit implementation would return 2 for
    ('𝒜','x'))."""
    from pyspark.sql import functions as F

    rng = random.Random(7)
    pairs = [
        (rng.choice(FUZZ_WORDS), rng.choice(FUZZ_WORDS)) for _ in range(60)
    ]
    pairs += [("𝒜", "x"), ("𝒜b", "xb"), ("a😀", "a"), ("𝒜𝒝", "xy")]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", F.levenshtein("a", "b").alias("lev")
    )
    for r in df.collect():
        assert r["lev"] == levenshtein(r["a"], r["b"]), (r["a"], r["b"])


# ---------------------------------------------------------------------------
# Wildcard (raw dictionary pattern match; Lucene WildcardQuery analog)


def test_wildcard_semantics(spark):
    from inverted_index_spark.qast import Wildcard

    eng = build_engine(spark, CORPUS, ngrams=False)
    # ? is exactly one char, * any run, whole-term anchored
    assert _docs(eng.results(Wildcard("sc?n"))) == [1, 2, 3, 5, 7]
    assert _docs(eng.results(Wildcard("scan?"))) == [4]   # 'scans' only
    assert _docs(eng.results(Wildcard("m?rge"))) == [1, 2, 3, 4, 5, 7]
    assert _docs(eng.results(Wildcard("*erge"))) == [1, 2, 3, 4, 5, 7]
    assert _docs(eng.results(Wildcard("x*"))) == []
    assert _docs(eng.results(Wildcard(""))) == []
    # no wildcard chars -> exact dictionary term (not prefix-expanded)
    assert _docs(eng.results(Wildcard("scan"))) == [1, 2, 3, 5, 7]


def test_wildcard_three_evaluators(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.qast import And, Match, Wildcard
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    path = str(tmp_path / "wcidx")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)
    eng = FtsEngine(idx, use_segments=False)

    for q in [
        Wildcard("sc?n*"),
        Wildcard("*o*"),
        And(Wildcard("m?rge"), Match("tonight")),
    ]:
        rel = [
            (r["doc_id"], round(r["score"], 5))
            for r in eng.results(q, with_positions=False).collect()
        ]
        seg = [
            (r["doc_id"], round(r["score"], 5))
            for r in segment_query(
                spark, path, q, with_positions=False, mode="spark"
            ).collect()
        ]
        pdf = segment_query_pandas(path, q, with_positions=False)
        loc = [
            (int(d), round(float(s), 5))
            for d, s in zip(pdf["doc_id"], pdf["score"])
        ]
        assert rel == seg == loc, f"wildcard evaluators diverged on {q}"


def test_topk_two_pass_matches_full_for_near_fuzzy(spark):
    """results(k) on complete plans takes the two-pass route (score ->
    limit -> fetch winners' positions); for Near/Fuzzy it must equal
    the k-truncation of the unlimited result exactly."""
    from inverted_index_spark.qast import Wildcard

    eng = build_engine(spark, CORPUS, ngrams=False)
    for q in [Near("scan merge", 3), Fuzzy("merge", 1), Wildcard("m?rge")]:
        full = [
            (r["doc_id"], round(r["score"], 5),
             [(p["begin"], p["end"], p["pos"]) for p in r["positions"]])
            for r in eng.results(q, with_positions=True).collect()
        ]
        topk = [
            (r["doc_id"], round(r["score"], 5),
             [(p["begin"], p["end"], p["pos"]) for p in r["positions"]])
            for r in eng.results(q, k=3, with_positions=True).collect()
        ]
        assert topk == full[:3], f"two-pass diverged on {q}"


def test_broad_wildcard_falls_back_to_relational(spark, tmp_path, monkeypatch):
    """A Wildcard matching more dictionary terms than the segment
    planner's expansion guard must fall back to the relational plan
    (identical rows), and explain() must report the fallback."""
    import inverted_index_spark.segquery as sq
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.qast import Wildcard
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments

    path = str(tmp_path / "wc_broad")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)
    monkeypatch.setattr(sq, "MAX_WILDCARD_EXPANSIONS", 2)

    eng_seg = FtsEngine(idx)                       # segment-routing engine
    eng_rel = FtsEngine(idx, use_segments=False)
    q = Wildcard("*e*")  # matches many terms -> exceeds the patched cap
    got = sorted(
        (r["doc_id"], round(r["score"], 5))
        for r in eng_seg.results(q, with_positions=False).collect()
    )
    want = sorted(
        (r["doc_id"], round(r["score"], 5))
        for r in eng_rel.results(q, with_positions=False).collect()
    )
    assert got == want and got
    ex = eng_seg.explain(q)
    assert ex["route"] == "relational" and "Wildcard" in ex["reason"]

    # direct segment_query callers get the explicit error
    with pytest.raises(sq.WildcardTooBroad):
        sq.segment_query(spark, path, q)


def test_near_huge_slop_is_cheap_and_correct(spark, tmp_path):
    """slop far beyond any document length must not cost more than a
    small slop (searchsorted window, not a per-offset loop) and equals
    'both terms in order anywhere'."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import segment_query_pandas

    path = str(tmp_path / "bigslop")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)

    pdf = segment_query_pandas(
        path, Near("scan merge", 10**9), with_positions=False
    )
    # docs with scan-before-merge at any distance: 1, 3, 4, 5, 7
    assert sorted(int(d) for d in pdf["doc_id"]) == [1, 3, 4, 5, 7]


def test_facets_rejects_duplicates_and_doc_id(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="duplicate"):
        eng.facets(Match("merge"), docs, ["text", "text"])
    with pytest.raises(ValueError, match="join key"):
        eng.facets(Match("merge"), docs, ["doc_id"])
