"""Query-string parser: string surface -> the reference Query AST.

Pure-Python (no Spark): parses must produce exactly the AST a user
would build by hand, and the parsed queries must answer identically to
the hand-built ones on the pure-Python reference oracle."""

import pytest

from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.qast import And, Match, Or, Phrase, Prefix
from inverted_index_spark.qparse import QueryParseError, parse_query


@pytest.mark.parametrize(
    "s,expect",
    [
        ("scan", Match("scan")),
        ("scan merge join", Match("scan merge join")),
        ("scan AND merge", And(Match("scan"), Match("merge"))),
        ("scan OR merge", Or(Match("scan"), Match("merge"))),
        # AND binds tighter than OR
        (
            "a OR b AND c",
            Or(Match("a"), And(Match("b"), Match("c"))),
        ),
        ('"merge join"', Phrase("merge join")),
        ("mer*", Prefix("mer")),
        # juxtaposed atoms join the AND bag
        (
            'scan ("merge join" OR pre*)',
            And(Match("scan"), Or(Phrase("merge join"), Prefix("pre"))),
        ),
        (
            "(a OR b) AND (c OR d)",
            And(Or(Match("a"), Match("b")), Or(Match("c"), Match("d"))),
        ),
        # lowercase and/or are ordinary searchable terms
        ("a and b", Match("a and b")),
        ("a or b", Match("a or b")),
        ("", Match("")),
        ("   ", Match("")),
        ("((x))", Match("x")),
    ],
)
def test_parse_shapes(s, expect):
    assert parse_query(s) == expect


@pytest.mark.parametrize(
    "bad",
    ["(a", "a )", '"unclosed', "*", "a AND", "a OR", "AND a", "()"],
)
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


def test_parsed_queries_answer_like_hand_built_asts():
    idx = OracleIndex()
    docs = [
        (0, "scan merge join"),
        (1, "merge join filter"),
        (2, "scan window stream"),
        (3, "prefix prefetch preamble"),
        (4, "join scan merge scan"),
    ]
    for doc_id, text in docs:
        idx.add(doc_id, text)

    cases = [
        ("scan merge", Match("scan merge")),
        ("scan AND merge", And(Match("scan"), Match("merge"))),
        (
            'scan AND ("merge join" OR pre*)',
            And(Match("scan"), Or(Phrase("merge join"), Prefix("pre"))),
        ),
        ("pre* OR filter", Or(Prefix("pre"), Match("filter"))),
    ]
    for s, ast in cases:
        assert parse_query(s) == ast
        got = [(r.doc_id, r.score) for r in idx.query(parse_query(s))]
        expect = [(r.doc_id, r.score) for r in idx.query(ast)]
        assert got == expect and got, s


def test_render_round_trips_hand_built_shapes():
    from inverted_index_spark.qparse import render_query

    cases = [
        Match("scan merge"),
        And(Match("a"), Match("b c")),
        Or(And(Match("a"), Match("b")), Phrase("c d"), Prefix("pre")),
        And(And(Match("a"), Match("b")), Match("c")),  # shape preserved
        Or(Or(Match("a"), Match("b")), Match("c")),
        And(Or(Match("a"), Match("b")), Match("c")),   # precedence parens
        Phrase(""),
        Match(""),
    ]
    for q in cases:
        assert parse_query(render_query(q)) == q, q


def test_render_rejects_unrenderable():
    from inverted_index_spark.qast import Wildcard
    from inverted_index_spark.qparse import render_query

    for q in [
        Prefix(""),
        And(),
        And(Match(""), Match("a")),
        Phrase('a"b'),                # no escape inside phrase bodies
        Wildcard("a b*"),             # interior whitespace (ADVICE r3)
        Wildcard(" ab*c"),            # leading whitespace
        Wildcard("a\\b*"),            # backslash: inexpressible literal
        Wildcard('a"b?'),             # specials stay out of wildcards
    ]:
        with pytest.raises((ValueError, TypeError)):
            render_query(q)


def test_escape_syntax_round_trips():
    """Backslash escapes make punct-inside-token terms (which the
    analyzer DOES index) reachable from the string language, and render
    the AND/OR/NOT keywords as ordinary terms (ADVICE r3)."""
    from inverted_index_spark.qast import Fuzzy, Wildcard
    from inverted_index_spark.qparse import render_query

    # parse side: escaped metacharacters are literal term characters
    assert parse_query(r"a\*b") == Match("a*b")
    assert parse_query(r"a\?b c\~d") == Match("a?b c~d")
    assert parse_query(r"don\"t") == Match('don"t')
    assert parse_query(r"\AND \OR \NOT") == Match("AND OR NOT")
    assert parse_query(r"a\\b") == Match("a\\b")
    assert parse_query(r"f\(x\)") == Match("f(x)")
    # escaped star + trailing wildcard star still collapses to Prefix
    assert parse_query(r"foo\**") == Prefix("foo*")
    assert parse_query(r"we\"ird~2") == Fuzzy('we"ird', 2)
    # render side: exact inverses
    for q in [
        Match("a*b"),
        Match('we"ird'),
        Match("AND"),
        Match("NOT a?c"),
        Match("back\\slash"),
        Prefix("foo*"),
        Prefix("f(x"),
        Fuzzy("a~b", 1),
        And(Match("AND"), Match("OR or")),
    ]:
        assert parse_query(render_query(q)) == q, q
    # mixing a literal (escaped) * / ? with live wildcards has no AST
    # form -> explicit parse error, not a silent reinterpretation
    with pytest.raises(QueryParseError):
        parse_query(r"a\*b?c")
    # a lone trailing backslash cannot escape anything
    with pytest.raises(QueryParseError):
        parse_query("oops\\")
    with pytest.raises(QueryParseError):
        parse_query("oops\\ word")


def test_parse_render_round_trip_property():
    """Hypothesis: any AST from the safe alphabet survives
    parse(render(q)) == q exactly (tree shape included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inverted_index_spark.qparse import render_query

    # lowercase "and"/"or" are deliberately in range: they are ordinary
    # searchable terms (only uppercase AND/OR are keywords)
    word = st.from_regex(r"[a-z][a-z0-9]{0,4}", fullmatch=True)
    # hard words exercise the escape syntax: specials, backslashes and
    # the uppercase keywords are all renderable via \-escapes
    hard_word = st.one_of(
        word,
        st.text(alphabet='az*?~()"\\ANDORT', min_size=1, max_size=5),
        st.sampled_from(["AND", "OR", "NOT"]),
    )
    words = st.lists(word, min_size=1, max_size=3).map(" ".join)
    hard_words = st.lists(hard_word, min_size=1, max_size=3).map(" ".join)
    from inverted_index_spark.qast import Fuzzy, Near, Wildcard

    # renderable wildcard: an interior wildcard char guarantees it
    # never collapses to the Prefix or bare-word forms
    wild = st.tuples(word, st.sampled_from("*?"), word).map(
        lambda t: Wildcard("".join(t))
    )
    leaf = st.one_of(
        words.map(Match),
        hard_words.map(Match),
        words.map(Phrase),
        word.map(Prefix),
        hard_word.map(Prefix),
        st.tuples(words, st.integers(1, 9)).map(lambda wn: Near(*wn)),
        st.tuples(word, st.integers(1, 2)).map(lambda we: Fuzzy(*we)),
        st.tuples(hard_word, st.integers(1, 2)).map(lambda we: Fuzzy(*we)),
        wild,
    )

    from inverted_index_spark.qast import AndNot

    def compound(children):
        two = st.lists(children, min_size=2, max_size=3)
        return st.one_of(
            two.map(lambda c: And(*c)),
            two.map(lambda c: Or(*c)),
            st.tuples(children, children).map(lambda pn: AndNot(*pn)),
        )

    ast = st.recursive(leaf, compound, max_leaves=8)

    @settings(max_examples=200, deadline=None)
    @given(ast)
    def check(q):
        assert parse_query(render_query(q)) == q

    check()


def test_parse_not():
    from inverted_index_spark.qast import AndNot
    from inverted_index_spark.qparse import render_query

    assert parse_query("a AND NOT b") == AndNot(Match("a"), Match("b"))
    assert parse_query("a NOT b") == AndNot(Match("a"), Match("b"))
    assert parse_query("a NOT b NOT c") == AndNot(
        Match("a"), Or(Match("b"), Match("c"))
    )
    assert parse_query('a AND NOT ("b c" OR d*)') == AndNot(
        Match("a"), Or(Phrase("b c"), Prefix("d"))
    )
    assert parse_query("a AND b NOT c AND d") == AndNot(
        And(Match("a"), Match("b"), Match("d")), Match("c")
    )
    # lowercase 'not' stays a searchable term
    assert parse_query("not a") == Match("not a")
    # pure negation is unbounded -> error
    for bad in ["NOT a", "NOT", "a AND NOT", "a OR NOT b"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)
    # round-trips incl. shape/precedence parens
    for q in [
        AndNot(Match("a"), Match("b c")),
        AndNot(And(Match("a"), Match("b")), Or(Match("c"), Prefix("d"))),
        AndNot(AndNot(Match("a"), Match("b")), Match("c")),
        And(AndNot(Match("a"), Match("b")), Match("c")),
        Or(AndNot(Match("a"), Match("b")), Match("c")),
    ]:
        assert parse_query(render_query(q)) == q


def test_wildcard_regex_dialect_stability():
    """The Wildcard translation must mean the same thing in Python re
    (segment-path expansion), RE2 (DuckDB oracle) — and by the same
    subset argument, Java regex (relational rlike; pinned separately by
    the three-evaluator identity tests). Property-check Python vs RE2
    on random patterns and terms, unicode included."""
    import random
    import re

    import duckdb

    from inverted_index_spark.qast import wildcard_regex

    rng = random.Random(5)
    # 嗨/é pin BMP unicode; 𝒜/😀 pin astral-plane chars ('.' must match
    # ONE code point, not one UTF-16 unit, in every dialect)
    alphabet = "abz09._-+^$()[]{}|\\嗨é𝒜😀"
    con = duckdb.connect()
    for _ in range(300):
        pattern = "".join(
            rng.choice(alphabet + "*?**??")
            for _ in range(rng.randint(0, 6))
        )
        term = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 6))
        )
        rx = wildcard_regex(pattern)
        want = re.fullmatch(rx, term) is not None
        got = con.execute(
            "select regexp_full_match(?, ?)", [term, rx]
        ).fetchone()[0]
        assert got == want, (pattern, term, rx)
