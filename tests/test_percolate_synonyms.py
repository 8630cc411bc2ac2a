"""Percolation (reverse search) and query-time synonym expansion.

Percolate membership must equal forward-engine membership per registered
query (the matcher IS the reference oracle, the engine is fuzz-pinned
against it — this test closes the triangle on a shared corpus).
"""

import pytest

from inverted_index_spark.percolate import percolate
from inverted_index_spark.qast import (
    And,
    AndNot,
    AtLeast,
    Fuzzy,
    Match,
    Near,
    Or,
    Phrase,
    Prefix,
    Wildcard,
)
from inverted_index_spark.qparse import expand_synonyms, parse_query
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

REGISTRY = {
    "q_scan": Match("scan"),
    "q_phrase": Phrase("merge join"),
    "q_and": And(Match("scan"), Match("merge")),
    "q_andnot": AndNot(Match("stream"), Match("batch")),
    "q_near": Near("scan merge", 2),
    "q_atleast": AtLeast(2, Match("scan"), Match("merge"), Match("join")),
    "q_prefix": Prefix("wind"),
    "q_wild": Wildcard("b?tch"),
    "q_fuzzy": Fuzzy("mege", 2),
}


def test_percolate_matches_forward_engine(spark):
    docs_df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs_df, REGISTRY).collect()
    }
    eng = build_engine(spark, DOCS)
    expect = set()
    for qid, ast in REGISTRY.items():
        if qid == "q_fuzzy":
            continue  # corpus-vs-single-doc expansion differs; below
        for r in eng.results(ast, with_positions=False).collect():
            expect.add((r["doc_id"], qid))
    got_nofuzzy = {(d, q) for d, q in got if q != "q_fuzzy"}
    assert got_nofuzzy == expect


def test_percolate_fuzzy_single_doc_vocab(spark):
    """Fuzzy percolation expands against the SINGLE doc's vocabulary:
    'mege'~2 hits docs containing a token within 2 edits of 'mege'."""
    docs_df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        r["doc_id"]
        for r in percolate(docs_df, {"f": Fuzzy("mege", 2)}).collect()
    )
    # merge (1 edit) in 0,1,2,5; here (2 substitutions) in 6
    assert got == [0, 1, 2, 5, 6]


def test_percolate_phonetic_single_doc_vocab(spark):
    """Phonetic percolation, same one-doc expansion model as Fuzzy:
    'mirge' soundexes to M620 == 'merge'."""
    from inverted_index_spark.qast import Phonetic

    docs_df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        r["doc_id"]
        for r in percolate(docs_df, {"p": Phonetic("mirge")}).collect()
    )
    assert got == [0, 1, 2, 5]


def test_percolate_empty_registry_and_null_text(spark):
    docs_df = spark.createDataFrame(
        [(0, "scan"), (1, None)], "doc_id long, text string"
    )
    assert percolate(docs_df, {}).count() == 0
    got = [tuple(r) for r in percolate(docs_df, {"s": Match("scan")}).collect()]
    assert got == [(0, "s")]


def test_percolate_pair_list_registry(spark):
    docs_df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            docs_df, [("a", Match("batch")), ("b", Match("stream"))]
        ).collect()
    }
    assert got == {(3, "a"), (4, "a"), (2, "b"), (3, "b")}


# ---------------------------------------------------------------------------
# expand_synonyms


def test_expand_synonyms_rewrites_match_leaves():
    q = And(Match("scan"), Match("merge"))
    out = expand_synonyms(q, {"merge": ["join", "union"]})
    assert out == And(
        Match("scan"), Or(Match("merge"), Match("join"), Match("union"))
    )


def test_expand_synonyms_identity_without_hits():
    q = And(Match("scan"), Phrase("merge join"))
    out = expand_synonyms(q, {"absent": ["x"]})
    assert out is q or out == q
    # Match leaf without a hit keeps object identity
    assert expand_synonyms(Match("scan"), {"other": ["y"]}) is not None


def test_expand_synonyms_multiword_match_splits():
    out = expand_synonyms(Match("scan merge"), {"scan": ["probe"]})
    assert out == Or(Or(Match("scan"), Match("probe")), Match("merge"))


def test_expand_synonyms_positional_nodes_untouched():
    q = AndNot(Phrase("scan merge"), Near("merge join", 2))
    assert expand_synonyms(q, {"scan": ["probe"]}) == q


def test_expand_synonyms_results_equal_union(spark):
    """Engine membership of the expanded query == union of per-variant
    memberships (the synonym IS an Or)."""
    eng = build_engine(spark, DOCS)
    base = And(Match("scan"), Match("merge"))
    expanded = expand_synonyms(base, {"merge": ["stream"]})
    got = sorted(
        r["doc_id"]
        for r in eng.results(expanded, with_positions=False).collect()
    )
    want = sorted(
        {
            r["doc_id"]
            for v in [
                And(Match("scan"), Match("merge")),
                And(Match("scan"), Match("stream")),
            ]
            for r in eng.results(v, with_positions=False).collect()
        }
    )
    assert got == want


def test_expand_synonyms_composes_with_parser():
    q = expand_synonyms(
        parse_query("scan AND NOT batch"), {"scan": ["probe"]}
    )
    assert q == AndNot(Or(Match("scan"), Match("probe")), Match("batch"))


def test_percolate_in_streaming_foreach_batch(spark, tmp_path):
    """The alerting shape: percolate drops into a Structured Streaming
    foreachBatch unchanged — matches streamed out equal the batch
    percolation of the same corpus."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs_df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    docs_df.write.parquet(src)
    registry = {"scan": Match("scan"), "phr": Phrase("merge join")}

    def sink(batch_df, batch_id):
        percolate(batch_df, registry).write.mode("append").parquet(out)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs_df, registry).collect()
    }
    assert got == want and got
