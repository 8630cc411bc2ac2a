"""The reference test-suite (/root/reference/src/index.rs:159-407) run
end-to-end against the distributed Spark engine: build index -> compile
query -> execute -> compare docs, byte positions, highlights, ranking.
"""

import pytest

from inverted_index_spark.qast import And, Match, Or, Phrase, Prefix
from pyspark.sql import functions as F

from conftest import build_engine


def rows_by_doc(results_df):
    return {
        r["doc_id"]: [(p["begin"], p["end"], p["pos"]) for p in r["positions"]]
        for r in results_df.collect()
    }


@pytest.fixture(scope="module")
def rust_engine(spark):
    return build_engine(
        spark,
        [
            (1, "learn to program in rust today"),
            (2, "what did you today do"),
            (3, "what did you do yesterday"),
        ],
    )


def test_ngrams_match_and_highlight(spark):
    # index.rs:168-194
    eng = build_engine(
        spark,
        [(1, "learn to program in rust today"), (2, "what did you today do")],
    )
    res = eng.search("to")
    assert rows_by_doc(res) == {
        1: [(6, 8, 1), (25, 27, 5)],
        2: [(13, 15, 3)],
    }
    hl = {
        r["doc_id"]: r["highlighted"]
        for r in eng.highlight(res, "<span class=highlight>", "</span>").collect()
    }
    assert hl[1] == (
        "learn <span class=highlight>to</span> program in rust "
        "<span class=highlight>to</span>day"
    )


def test_search_is_prefix_search(spark):
    # lib.rs:27-32: search("prog") matches "program"
    eng = build_engine(spark, [(1, "learn to program in rust today")])
    assert [r["doc_id"] for r in eng.search("prog").collect()] == [1]


def test_highlight_unicode_punct(spark):
    # index.rs:196-206
    eng = build_engine(
        spark, [(2, "Won’t this split the ecosystem? Will everyone use?")]
    )
    res = eng.search("e")
    out = eng.highlight(res, "*", "*").collect()
    assert len(out) == 1
    assert out[0]["highlighted"] == (
        "Won’t this split the *e*cosystem? Will *e*veryone use?"
    )


def test_unicode_byte_offsets(spark):
    # index.rs:208-218
    eng = build_engine(spark, [(0, "嗨, 您好")])
    res = eng.search("您").collect()
    b, e = res[0]["positions"][0]["begin"], res[0]["positions"][0]["end"]
    assert "嗨, 您好".encode("utf-8")[b:e].decode("utf-8") == "您"


def test_update_doc(spark):
    # index.rs:220-230 — upsert removes stale postings
    from inverted_index_spark.build import upsert_docs
    from inverted_index_spark.query import FtsEngine

    eng = build_engine(spark, [(0, "abc åäö")])
    new = spark.createDataFrame([(0, "different")], ["doc_id", "text"])
    idx2 = upsert_docs(spark, eng.index, new)
    eng2 = FtsEngine(idx2)
    assert eng2.search("å").count() == 0
    assert idx2.docs.count() == 1
    assert eng2.search("diff").count() == 1


def test_ranking(spark):
    # index.rs:232-243
    eng = build_engine(spark, [(0, "beat"), (1, "beast")])
    res = eng.search("be").collect()
    assert res[0]["doc_id"] == 0


def test_duplicate_term(spark):
    # index.rs:245-252
    eng = build_engine(spark, [(0, "beat")])
    assert eng.search("be be").count() == 1


def test_duplicate_term2(spark):
    # index.rs:254-262
    eng = build_engine(spark, [(0, "beat")])
    res = eng.search("be b")
    assert rows_by_doc(res) == {0: [(0, 2, 0)]}


def test_lowercase_both_sides(spark):
    # index.rs:264-282
    eng = build_engine(spark, [(0, "BeAt")])
    assert rows_by_doc(eng.search("bE")) == {0: [(0, 2, 0)]}
    assert rows_by_doc(eng.search("be")) == {0: [(0, 2, 0)]}


def test_and(rust_engine):
    # index.rs:284-304
    res = rust_engine.results(And(Match("today"), Match("you")))
    assert rows_by_doc(res) == {2: [(9, 12, 2), (13, 18, 3)]}


def test_and_or(rust_engine):
    # index.rs:306-328
    res = rust_engine.results(Or(Match("you"), And(Match("today"), Match("you"))))
    assert rows_by_doc(res) == {
        2: [(9, 12, 2), (13, 18, 3)],
        3: [(9, 12, 2)],
    }


def test_phrase(spark):
    # index.rs:330-359 incl. prefix-tolerant phrase
    eng = build_engine(spark, [(1, "learn to program in rust today")])
    res = eng.results(Phrase("learn to program"))
    assert rows_by_doc(res) == {1: [(0, 5, 0), (6, 8, 1), (9, 16, 2)]}
    res = eng.results(Phrase("lear t pro"))
    assert rows_by_doc(res) == {1: [(0, 4, 0), (6, 7, 1), (9, 12, 2)]}


def test_phrase2(spark):
    # index.rs:361-378
    eng = build_engine(spark, [(1, "is is is")])
    res = eng.results(Phrase("i i"))
    assert rows_by_doc(res) == {1: [(0, 1, 0), (3, 4, 1), (6, 7, 2)]}


def test_prefix(spark):
    # index.rs:380-397 — union of ngram postings widens positions
    eng = build_engine(spark, [(1, "is is is")])
    res = eng.results(Prefix("i"))
    assert rows_by_doc(res) == {1: [(0, 2, 0), (3, 5, 1), (6, 8, 2)]}


def test_char_len_change(spark):
    # index.rs:399-406
    eng = build_engine(spark, [(1, "İİ")])
    row = (
        eng.index.postings.filter(F.col("term") == "i̇i̇")
        .select("positions")
        .collect()
    )
    assert row and row[0]["positions"][0]["end"] == 4


# -- semantics edge cases (SURVEY.md §2.5) --


def test_single_token_phrase_empty(spark):
    eng = build_engine(spark, [(1, "hello world")])
    assert eng.results(Phrase("hello")).count() == 0


def test_empty_prefix_empty(spark):
    eng = build_engine(spark, [(1, "hello")])
    assert eng.results(Prefix("")).count() == 0


def test_prefix_not_analyzed(spark):
    eng = build_engine(spark, [(1, "Hello")])
    assert eng.results(Prefix("He")).count() == 0
    assert eng.results(Prefix("he")).count() == 1


def test_and_empty_and_singleton(rust_engine):
    assert rust_engine.results(And()).count() == 0
    a = rows_by_doc(rust_engine.results(And(Match("you"))))
    b = rows_by_doc(rust_engine.results(Match("you")))
    assert a == b


def test_phrase_keeps_doc_with_empty_positions(spark):
    # postings.rs:101-112
    eng = build_engine(spark, [(1, "learn to program in rust today")])
    res = eng.results(Phrase("to learn")).collect()
    assert len(res) == 1
    assert res[0]["positions"] == []
    assert res[0]["score"] == 0.0


def test_topk_limit(rust_engine):
    res = rust_engine.search("you today", k=1).collect()
    assert len(res) == 1
