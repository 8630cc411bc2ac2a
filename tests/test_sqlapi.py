"""spark.sql surface: registered index views + generated BM25 SQL must
match the DataFrame engine's ranking exactly."""

from inverted_index_spark.build import build_index
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.sqlapi import bm25_sql, register_index_views


def test_sql_bm25_matches_engine(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_index(spark, docs, ngrams=False)
    register_index_views(spark, idx)
    eng = FtsEngine(idx)
    for q in ["scan merge join", "merge", "nonexistentterm"]:
        sql = bm25_sql(idx, q, k=10)
        got = [
            (r["doc_id"], round(r["score"], 6)) for r in spark.sql(sql).collect()
        ]
        expect = [
            (r["doc_id"], round(r["score"], 6)) for r in eng.bm25(q, k=10).collect()
        ]
        assert got == expect, q
    assert bm25_sql(idx, "...") is None  # analyzer yields no terms


def test_views_expose_doc_store(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
    )
    idx = build_index(spark, docs, ngrams=False)
    register_index_views(spark, idx, prefix="ix")
    assert spark.sql("select count(*) n from ix_docs").first()["n"] == 2
    assert (
        spark.sql(
            "select doc_id from ix_postings where term = 'gamma'"
        ).first()["doc_id"]
        == 2
    )


def test_sql_suggest_matches_engine(spark):
    from inverted_index_spark.sqlapi import suggest_sql

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_index(spark, docs, ngrams=False)
    register_index_views(spark, idx)
    eng = FtsEngine(idx)
    sql = suggest_sql("mereg scann", max_edits=2, k=3)
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [
        tuple(r) for r in eng.suggest("mereg scann", max_edits=2, k=3).collect()
    ]
    assert got == want and got
    assert suggest_sql("...") is None


def test_sql_significant_terms_matches_engine(spark):
    from inverted_index_spark.qast import Match
    from inverted_index_spark.sqlapi import significant_terms_sql

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_index(spark, docs, ngrams=False)
    register_index_views(spark, idx)
    eng = FtsEngine(idx)
    sql = significant_terms_sql(idx, "merge", k=10, min_doc_count=3)
    got = [
        (r["term"], r["fg_df"], r["bg_df"], round(r["score"], 9))
        for r in spark.sql(sql).collect()
    ]
    want = [
        (r["term"], r["fg_df"], r["bg_df"], round(r["score"], 9))
        for r in eng.significant_terms(
            Match("merge"), k=10, min_doc_count=3
        ).collect()
    ]
    assert got == want and got
    assert significant_terms_sql(idx, "") is None
