"""Regex query node — engine extension over the reference algebra
(/root/reference/src/query.rs:5-27 has only the Prefix dictionary
operator; Regex is the Lucene RegexpQuery analog completing the
multi-term family Prefix ⊂ Wildcard ⊂ Regex).

Covers: the dialect-stable-subset validator (accept + reject tables),
golden semantics on a fixed full-token corpus, four-evaluator identity
(relational anchored-rlike plan == distributed segment kernels ==
in-process pandas serving == routed engine), randomized fuzz vs direct
Python ``re.fullmatch`` over the analyzed vocabulary (including
non-ASCII terms), BM25-over-regex expansion scoring, the too-broad
expansion fallback, and the error/rendering surface.
"""

import random
import re

import pytest

from inverted_index_spark.qast import (
    And,
    Match,
    Or,
    Regex,
    regex_parse,
)
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
# validator: the dialect-stable subset


def test_regex_parse_accepts_subset():
    # (pattern, literal_prefix, full_literal)
    table = [
        ("abc", "abc", "abc"),
        ("ab\\.c", "ab.c", "ab.c"),  # escaped metachar is a literal
        ("a\\-b", "a-b", "a-b"),
        ("me?rge", "m", None),  # quantified atom ends the prefix BEFORE it
        ("s[cp]a(n|rk)", "s", None),
        ("a{2,3}b", "", None),
        ("[a-z0-9]+", "", None),
        ("x(y|z)*", "x", None),
        (".", "", None),
        ("a|b|c", "", None),  # top-level alternation: no common prefix
        ("[-a]z", "", None),  # leading '-' is a literal in a class
        ("[a-]", "", None),  # trailing '-' too
        ("(ab)cd", "", None),  # group atom: conservative empty prefix
        ("a{2}", "", None),
        ("a{2,}", "", None),
        ("(ab)*", "", None),      # deterministic group under star
        ("(y|z)*", "", None),     # distinct single-char alternation
        ("(a|aa){0,3}", "", None),  # ambiguity capped by a small bound
        ("a{1000}", "", None),    # exactly the RE2 bound limit
    ]
    for pattern, want_pre, want_lit in table:
        pre, lit = regex_parse(pattern)
        assert (pre, lit) == (want_pre, want_lit), pattern


def test_regex_parse_rejects_divergent_constructs():
    bad = [
        "a**",      # stacked quantifiers
        "a*?",      # lazy (capture-only today, possessive-adjacent)
        "a++",      # possessive (Java-only)
        "(?:ab)",   # every (?... construct
        "(?i)x",
        "^ab",      # anchors: matching is whole-term already
        "ab$",
        "\\d+",     # per-engine Unicode class semantics
        "\\w",
        "[a&&b]",   # Java class intersection
        "[z-a]",    # reversed range
        "[]",       # empty class
        "[^]",
        "a{",       # malformed bound ('{x' is literal in Python, error in Java)
        "a{x}",
        "a{2,1}",   # reversed bound
        "(ab",      # unbalanced
        "ab)",
        "a]b",      # bare ] (literal in some engines)
        "a}b",
        "*a",       # quantifier with nothing to repeat
        "{2}a",
        "a[\\]]",   # backslash inside a class
        "[[ab]",    # [ inside a class
        "a{1001}",  # above the RE2 repetition limit (error on one engine)
        "a{5,2000}",
        # exponential-backtracking shapes on the Java/Python evaluators
        # (RE2 is linear — a hang on one engine is a divergence too)
        "(a*)*",
        "(a+)+",
        "(a|aa)*",
        "(a|.)*",
        "(a?b)*",
        "(a|aa){0,100}",  # big bounded ambiguity is still exponential
        "((ab)c)*",       # nested group under star: conservative reject
    ]
    for pattern in bad:
        with pytest.raises(ValueError):
            regex_parse(pattern)
        with pytest.raises(ValueError):
            Regex(pattern)  # the node validates at construction


# ---------------------------------------------------------------------------
# golden semantics (full-token engine)


def test_regex_golden_membership(spark):
    eng = build_engine(spark, CORPUS, ngrams=False)
    # alternation of exact terms == Or of Matches
    assert _docs(eng.results(Regex("merge|marge"))) == [1, 2, 3, 4, 5, 7]
    # class + optional quantifier
    assert _docs(eng.results(Regex("m[ae]rge"))) == [1, 2, 3, 4, 5, 7]
    assert _docs(eng.results(Regex("scans?"))) == [1, 2, 3, 4, 5, 7]
    # whole-term anchoring: 'scan' pattern must NOT match 'scans'
    assert _docs(eng.results(Regex("scan"))) == [1, 2, 3, 5, 7]
    assert _docs(eng.results(Regex("scans"))) == [4]
    # dot + star tail
    assert _docs(eng.results(Regex("to.*"))) == [1, 4]  # today, tonight
    # bounded repetition over a class
    assert _docs(eng.results(Regex("[a-z]{8}"))) == [5, 6]  # eventual, relevant
    # no match / empty pattern
    assert _docs(eng.results(Regex("zz.*"))) == []
    assert _docs(eng.results(Regex(""))) == []


def test_regex_matches_or_of_exact_terms(spark):
    """Regex alternation of literal terms must be row-identical (docs,
    scores, positions) to the Or of their exact dictionary Matches —
    the regex is just a different route to the same postings."""
    eng = build_engine(spark, CORPUS, ngrams=False)
    via_regex = {
        (r["doc_id"], round(r["score"], 5),
         tuple((p["begin"], p["end"], p["pos"]) for p in r["positions"]))
        for r in eng.results(Regex("today|tonight")).collect()
    }
    via_or = {
        (r["doc_id"], round(r["score"], 5),
         tuple((p["begin"], p["end"], p["pos"]) for p in r["positions"]))
        for r in eng.results(Or(Match("today"), Match("tonight"))).collect()
    }
    assert via_regex == via_or and via_regex


# ---------------------------------------------------------------------------
# four-evaluator identity (relational / segment spark / pandas / routed)


def test_regex_four_evaluator_identity(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    path = str(tmp_path / "rx_idx")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)
    eng_routed = FtsEngine(idx)
    eng_rel = FtsEngine(idx, use_segments=False)

    for pattern in [
        "m[ae]rge", "scans?", "s.*n", "to(day|night)", "[a-z]{4}",
        "merge", "x.*",
    ]:
        q = Regex(pattern)
        rel = sorted(
            (r["doc_id"], round(r["score"], 5))
            for r in eng_rel.results(q, with_positions=False).collect()
        )
        seg = sorted(
            (r["doc_id"], round(r["score"], 5))
            for r in segment_query(
                spark, path, q, with_positions=False
            ).collect()
        )
        loc = sorted(
            (int(t.doc_id), round(float(t.score), 5))
            for t in segment_query_pandas(
                path, q, with_positions=False
            ).itertuples()
        )
        routed = sorted(
            (r["doc_id"], round(r["score"], 5))
            for r in eng_routed.results(q, with_positions=False).collect()
        )
        assert rel == seg == loc == routed, pattern
        # membership count agrees on both routes too
        assert eng_routed.count(q) == eng_rel.count(q) == len(rel)


# ---------------------------------------------------------------------------
# fuzz vs direct Python fullmatch over the analyzed vocabulary


FUZZ_WORDS = [
    "scan", "scans", "merge", "marge", "mixé", "İstanbul", "嗨", "您好",
    "alpha", "beta", "a", "bb", "data2", "x9", "today", "tonight",
]


def _fuzz_patterns(rng):
    w1, w2 = rng.choice(FUZZ_WORDS).lower(), rng.choice(FUZZ_WORDS).lower()
    c1 = w1[0]
    return [
        f"{re.escape(w1)}|{re.escape(w2)}",
        f"{re.escape(c1)}.*",
        f"[{c1}{w2[0]}].*" if c1 != "-" and w2[0] != "-" else f"{c1}.*",
        f"{re.escape(w1[:2])}[a-z]*",
        f"({re.escape(w1)}|{re.escape(w2)})s?",
        f".{{{len(w1)}}}",
        f"{re.escape(c1)}.+{re.escape(w1[-1])}" if len(w1) > 2 else f"{c1}.*",
    ]


@pytest.mark.parametrize("seed", [11, 42])
def test_regex_fuzz_vs_python_fullmatch(spark, seed):
    from inverted_index_spark.analysis import analyze_index

    rng = random.Random(seed)
    docs = []
    for i in range(16):
        words = [rng.choice(FUZZ_WORDS) for _ in range(rng.randint(0, 8))]
        docs.append((i, " ".join(words)))
    eng = build_engine(spark, docs, ngrams=False)

    vocab = {
        doc_id: {t.term for t in analyze_index(text, ngrams=False)}
        for doc_id, text in docs
    }
    for _ in range(4):
        for pattern in _fuzz_patterns(rng):
            rx = re.compile(pattern)
            expect = sorted(
                d for d, terms in vocab.items()
                if any(rx.fullmatch(t) for t in terms)
            )
            got = _docs(eng.results(Regex(pattern), with_positions=False))
            assert got == expect, pattern


# ---------------------------------------------------------------------------
# BM25 over regex expansion (multi-term rewrite)


def test_regex_bm25_query_scores_each_expansion_term(spark):
    """bm25_query(Regex) must equal bm25 over the flat expanded term
    bag — every matched dictionary term keeps its own idf."""
    eng = build_engine(spark, CORPUS, ngrams=False)
    got = [
        (r["doc_id"], round(r["score"], 5))
        for r in eng.bm25_query(Regex("m[ae]rge"), k=10).collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 5))
        for r in eng.bm25("marge merge", k=10).collect()
    ]
    assert got == want and got


# ---------------------------------------------------------------------------
# too-broad expansion falls back to the relational plan


def test_broad_regex_falls_back_to_relational(spark, tmp_path, monkeypatch):
    import inverted_index_spark.segquery as sq
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments

    path = str(tmp_path / "rx_broad")
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, term_buckets=4)
    build_segments(spark, idx, path, shard_docs=3, positions=True)
    monkeypatch.setattr(sq, "MAX_WILDCARD_EXPANSIONS", 2)

    eng_seg = FtsEngine(idx)
    eng_rel = FtsEngine(idx, use_segments=False)
    q = Regex(".*e.*")  # matches many terms -> exceeds the patched cap
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
    assert ex["route"] == "relational" and "Regex" in ex["reason"]

    with pytest.raises(sq.WildcardTooBroad):
        sq.segment_query(spark, path, q)


# ---------------------------------------------------------------------------
# surfaces: percolation, synonyms, rendering, ngram mode


def test_regex_percolate_membership_matches_engine(spark):
    from inverted_index_spark.percolate import percolate

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    eng = build_engine(spark, CORPUS, ngrams=False)
    q = Regex("m[ae]rge")
    perc = sorted(
        r["doc_id"]
        for r in percolate(df, {"rx": q}).collect()
    )
    assert perc == _docs(eng.results(q, with_positions=False))


def test_regex_passes_through_synonym_expansion():
    from inverted_index_spark.qparse import expand_synonyms

    q = And(Regex("sc.n"), Match("merge"))
    out = expand_synonyms(q, {"merge": ["unify"]})
    assert out.children[0] is q.children[0]  # Regex leaf untouched
    assert isinstance(out.children[1], Or)


def test_regex_has_no_string_form():
    from inverted_index_spark.qparse import render_query

    with pytest.raises(ValueError, match="no string form"):
        render_query(Regex("ab.*"))


def test_regex_on_ngram_index_matches_stored_prefixes(spark):
    """On a parity (edge-ngram) index the dictionary stores every token
    prefix, so a Regex matches docs whose stored ngrams fullmatch — the
    same dictionary-operator semantics Wildcard/Prefix have there."""
    eng = build_engine(spark, CORPUS, ngrams=True)
    # 'scan' is a stored prefix of 'scans' too -> doc 4 matches
    assert _docs(eng.results(Regex("scan"), with_positions=False)) == [
        1, 2, 3, 4, 5, 7,
    ]


# ---------------------------------------------------------------------------
# grammar-wide dialect parity: random patterns from the validated
# subset, Java (relational rlike) vs Python (re.fullmatch expectation
# + the segment planner's driver-side expansion)


def _gen_pattern(rng, alphabet):
    """Random pattern from the dialect-stable grammar subset."""
    def atom():
        # returns (fragment, is_group)
        r = rng.random()
        if r < 0.45:
            ch = rng.choice(alphabet)
            # escape it if it's a metacharacter we allow as a literal
            frag = re.escape(ch) if ch in ".[](){}*+?|^$-/\\" else ch
            return frag, False
        if r < 0.60:
            return ".", False
        if r < 0.80:
            lo, hi = sorted(rng.sample("abcdefgmnstz", 2))
            neg = "^" if rng.random() < 0.2 else ""
            extra = rng.choice(alphabet + ["0", "9"])
            if extra in "\\[&]^-":
                extra = "q"
            return f"[{neg}{lo}-{hi}{extra}]", False
        return "(" + concat(rng.randint(1, 2)) + "|" + concat(1) + ")", True

    def atomq():
        a, is_group = atom()
        r = rng.random()
        # unbounded quantifiers only on non-group atoms: the validator
        # rejects them on non-deterministic groups (backtracking guard)
        if r < 0.15 and not is_group:
            return a + "*"
        if r < 0.25:
            return a + "?"
        if r < 0.30 and not is_group:
            return a + "+"
        if r < 0.35:
            m = rng.randint(0, 2)
            return a + "{%d,%d}" % (m, m + rng.randint(0, 2))
        return a

    def concat(n):
        return "".join(atomq() for _ in range(n))

    pat = concat(rng.randint(1, 4))
    if rng.random() < 0.25:
        pat = pat + "|" + concat(rng.randint(1, 2))
    return pat


@pytest.mark.parametrize("seed", [3, 17])
def test_regex_grammar_fuzz_java_vs_python(spark, seed):
    """Random patterns over the whole validated grammar: the relational
    plan (Java regex via rlike) and the segment planner's in-process
    expansion (Python re.fullmatch) must both equal the direct Python
    fullmatch expectation over the analyzed vocabulary — the
    dialect-stability claim, exercised across the grammar rather than
    hand-picked shapes."""
    import tempfile

    from inverted_index_spark.analysis import analyze_index
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import segment_query_pandas

    rng = random.Random(seed)
    words = [
        "scan", "scans", "merge", "marge", "mixé", "añejo", "abc",
        "a.b", "x9", "a-b", "span", "spin", "s", "tz", "gnat", "teem",
    ]
    docs = []
    for i in range(14):
        docs.append(
            (i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(1, 6))))
        )
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        idx = build_and_save(
            spark, df, d + "/idx", ngrams=False, term_buckets=4
        )
        build_segments(spark, idx, d + "/idx", shard_docs=4, positions=True)
        eng_rel = FtsEngine(idx, use_segments=False)

        vocab = {
            doc_id: {t.term for t in analyze_index(text, ngrams=False)}
            for doc_id, text in docs
        }
        alphabet = list("amsx") + ["é", "."]
        n_nonempty = 0
        for _ in range(30):
            pat = _gen_pattern(rng, alphabet)
            pre, lit = regex_parse(pat)  # must be inside the subset
            rx = re.compile(pat)
            expect = sorted(
                i for i, terms in vocab.items()
                if any(rx.fullmatch(t) for t in terms)
            )
            n_nonempty += bool(expect)
            got_java = _docs(
                eng_rel.results(Regex(pat), with_positions=False)
            )
            assert got_java == expect, f"Java rlike diverged on {pat!r}"
            got_py = sorted(
                set(
                    segment_query_pandas(
                        d + "/idx", Regex(pat), with_positions=False
                    )["doc_id"].tolist()
                )
            )
            assert got_py == expect, f"segment expansion diverged on {pat!r}"
        assert n_nonempty >= 5  # the generator isn't vacuously empty
