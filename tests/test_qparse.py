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
