"""All 15 reference unit tests (/root/reference/src/index.rs:159-407)
ported against the pure-Python oracle, plus the coalesce / intersection
edge-case tests from util/coalesce.rs:147-219 and postings.rs:114-133.

The oracle, once green here, is the ground truth the Spark engine is
cross-checked against on random corpora.
"""

import pytest

from inverted_index_spark.oracle import (
    And,
    Match,
    Or,
    OracleIndex,
    Phrase,
    Prefix,
    coalesce_sorted,
    intersect_positionally,
    union_postings,
)


@pytest.fixture
def rust_docs_index():
    idx = OracleIndex()
    idx.add(1, "learn to program in rust today")
    idx.add(2, "what did you today do")
    idx.add(3, "what did you do yesterday")
    return idx


def positions_by_doc(results):
    return {r.doc_id: r.positions for r in results}


def test_ngrams(rust_docs_index):
    # index.rs:168-194 (docs 1 and 2 only)
    idx = OracleIndex()
    idx.add(1, "learn to program in rust today")
    idx.add(2, "what did you today do")
    results = idx.search("to")
    expected = {
        1: [(6, 8, 1), (25, 27, 5)],
        2: [(13, 15, 3)],
    }
    assert positions_by_doc(results) == expected
    doc1 = next(r for r in results if r.doc_id == 1)
    assert idx.highlight(doc1, "<span class=highlight>", "</span>") == (
        "learn <span class=highlight>to</span> program in rust "
        "<span class=highlight>to</span>day"
    )


def test_highlight():
    # index.rs:196-206
    idx = OracleIndex()
    idx.add(2, "Won’t this split the ecosystem? Will everyone use?")
    results = idx.search("e")
    assert len(results) == 1
    assert idx.highlight(results[0], "*", "*") == (
        "Won’t this split the *e*cosystem? Will *e*veryone use?"
    )


def test_unicode():
    # index.rs:208-218
    idx = OracleIndex()
    idx.add(0, "嗨, 您好")
    results = idx.search("您")
    begin, end, _ = results[0].positions[0]
    assert "嗨, 您好".encode("utf-8")[begin:end].decode("utf-8") == "您"


def test_update_doc():
    # index.rs:220-230
    idx = OracleIndex()
    idx.add(0, "abc åäö")
    idx.add(0, "different")
    assert idx.search("å") == []
    assert len(idx.docs) == 1


def test_ranking():
    # index.rs:232-243: "beat" (4 bytes) beats "beast" (5 bytes) for "be"
    idx = OracleIndex()
    idx.add(0, "beat")
    idx.add(1, "beast")
    results = idx.search("be")
    assert results[0].doc_id == 0


def test_duplicate_term():
    # index.rs:245-252
    idx = OracleIndex()
    idx.add(0, "beat")
    assert len(idx.search("be be")) == 1


def test_duplicate_term2():
    # index.rs:254-262: "be b" coalesces to one position (0, 2)
    idx = OracleIndex()
    idx.add(0, "beat")
    results = idx.search("be b")
    assert len(results) == 1
    assert results[0].positions == [(0, 2, 0)]


def test_lowercase_search():
    # index.rs:264-272
    idx = OracleIndex()
    idx.add(0, "BeAt")
    results = idx.search("bE")
    assert len(results) == 1
    assert results[0].positions == [(0, 2, 0)]


def test_lowercase_index():
    # index.rs:274-282
    idx = OracleIndex()
    idx.add(0, "BeAt")
    results = idx.search("be")
    assert len(results) == 1
    assert results[0].positions == [(0, 2, 0)]


def test_and(rust_docs_index):
    # index.rs:284-304
    results = rust_docs_index.query(And(Match("today"), Match("you")))
    assert positions_by_doc(results) == {2: [(9, 12, 2), (13, 18, 3)]}


def test_and_or(rust_docs_index):
    # index.rs:306-328
    results = rust_docs_index.query(
        Or(Match("you"), And(Match("today"), Match("you")))
    )
    assert positions_by_doc(results) == {
        2: [(9, 12, 2), (13, 18, 3)],
        3: [(9, 12, 2)],
    }


def test_phrase():
    # index.rs:330-359 incl. prefix-tolerant phrase
    idx = OracleIndex()
    idx.add(1, "learn to program in rust today")
    results = idx.query(Phrase("learn to program"))
    assert positions_by_doc(results) == {1: [(0, 5, 0), (6, 8, 1), (9, 16, 2)]}
    results = idx.query(Phrase("lear t pro"))
    assert positions_by_doc(results) == {1: [(0, 4, 0), (6, 7, 1), (9, 12, 2)]}


def test_phrase2():
    # index.rs:361-378: overlapping adjacency over "is is is"
    idx = OracleIndex()
    idx.add(1, "is is is")
    results = idx.query(Phrase("i i"))
    assert positions_by_doc(results) == {1: [(0, 1, 0), (3, 4, 1), (6, 7, 2)]}


def test_prefix():
    # index.rs:380-397: union of ngram postings widens each position
    idx = OracleIndex()
    idx.add(1, "is is is")
    results = idx.query(Prefix("i"))
    assert positions_by_doc(results) == {1: [(0, 2, 0), (3, 5, 1), (6, 8, 2)]}


def test_char_len_change():
    # index.rs:399-406
    idx = OracleIndex()
    idx.add(1, "İİ")
    assert idx.index["i̇i̇"][1][0][1] == 4


# -- semantics edge cases pinned by the survey (SURVEY.md §2.5) --


def test_single_token_phrase_empty():
    idx = OracleIndex()
    idx.add(1, "hello world")
    assert idx.query(Phrase("hello")) == []


def test_empty_prefix_empty():
    idx = OracleIndex()
    idx.add(1, "hello")
    assert idx.query(Prefix("")) == []


def test_prefix_not_analyzed():
    # Prefix is not lowercased: "He" matches no lowercase-indexed term
    idx = OracleIndex()
    idx.add(1, "Hello")
    assert idx.query(Prefix("He")) == []
    assert len(idx.query(Prefix("he"))) == 1


def test_and_empty_and_singleton(rust_docs_index):
    assert rust_docs_index.query(And()) == []
    a = rust_docs_index.query(And(Match("you")))
    b = rust_docs_index.query(Match("you"))
    assert positions_by_doc(a) == positions_by_doc(b)


def test_phrase_keeps_doc_with_empty_positions():
    # postings.rs:101-112: docs containing both pair terms stay in the
    # result even when no adjacency holds (score 0, no positions)
    idx = OracleIndex()
    idx.add(1, "learn to program in rust today")
    results = idx.query(Phrase("to learn"))
    assert positions_by_doc(results) == {1: []}
    assert results[0].score == 0.0


def test_phrase_pairwise_false_positive():
    # query.rs:18-19 documented false positive: pairs match independently
    idx = OracleIndex()
    idx.add(1, "a b x x x b c")
    results = idx.query(Phrase("a b c"))
    assert 1 in positions_by_doc(results)


def test_coalesce_edge_cases():
    # util/coalesce.rs:147-219 translated to position triples (pos=0)
    assert coalesce_sorted([(0, 1, 0)]) == [(0, 1, 0)]
    assert coalesce_sorted([(1, 1, 0), (0, 1, 0)]) == [(0, 1, 0)]
    assert coalesce_sorted([(1, 1, 0), (1, 2, 0)]) == [(1, 2, 0)]
    assert coalesce_sorted([(1, 1, 0), (2, 2, 0), (1, 2, 0)]) == [(1, 2, 0)]
    assert coalesce_sorted([(1, 1, 0), (3, 3, 0), (2, 2, 0)]) == [
        (1, 1, 0),
        (2, 2, 0),
        (3, 3, 0),
    ]
    assert coalesce_sorted([(0, 3, 0), (1, 2, 0)]) == [(0, 3, 0)]
    # different ordinals never merge
    assert coalesce_sorted([(0, 2, 0), (1, 3, 1)]) == [(0, 2, 0), (1, 3, 1)]


def test_merge_postings():
    # postings.rs:119-132
    merged = union_postings(
        [
            {1: [(0, 1, 0), (2, 3, 1)]},
            {1: [(4, 5, 2), (6, 7, 3)]},
        ]
    )
    assert merged == {1: [(0, 1, 0), (2, 3, 1), (4, 5, 2), (6, 7, 3)]}


def test_intersect_positionally_dedup():
    # postings.rs:66-99: left deduped against last pushed only
    left = [(0, 1, 0), (3, 4, 1)]
    right = [(3, 4, 1), (6, 7, 2)]
    assert intersect_positionally(left, right) == [(0, 1, 0), (3, 4, 1), (6, 7, 2)]
