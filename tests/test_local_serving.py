"""Coordinator (query-node) serving: the mode="local" short-circuit and
the no-Spark pandas APIs must be row-identical to the distributed
mapInPandas paths — same kernels, same merge — and mode="auto" must
respect the size thresholds (metacache.serve_locally)."""

import pandas as pd
import pytest

from inverted_index_spark import metacache
from inverted_index_spark.build import build_and_save
from inverted_index_spark.qast import And, AndNot, Match, Or, Phrase, Prefix
from inverted_index_spark.segments import build_segments
from inverted_index_spark.segquery import (
    segment_query,
    segment_query_batch,
    segment_query_batch_pandas,
    segment_query_pandas,
)
from inverted_index_spark.wand import (
    wand_topk,
    wand_topk_batch,
    wand_topk_batch_pandas,
    wand_topk_pandas,
)


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("localserve"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=64, block_docs=16,
                   positions=True)
    return path


ASTS = [
    Match("scan merge"),
    And(Match("scan"), Match("merge")),
    Or(Match("window"), Match("stream")),
    Phrase("batch batch"),
    Prefix("mer"),
    And(Or(Match("scan"), Phrase("batch batch")), Prefix("mer")),
    AndNot(Match("scan"), Match("merge")),
    AndNot(Or(Match("scan"), Match("merge")), Phrase("batch batch")),
]


def _pos_tuples(cell):
    # positions arrive as list[dict] (pandas API / arrow toPandas) or
    # list[Row] (non-arrow); normalize to (begin, end, pos) tuples
    out = []
    for r in cell:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        out.append((d["begin"], d["end"], d["pos"]))
    return out


@pytest.mark.parametrize("ast", ASTS, ids=[type(a).__name__ + str(i) for i, a in enumerate(ASTS)])
def test_pandas_api_identical_to_spark_path(spark, indexed, ast):
    p = segment_query_pandas(indexed, ast, k=10, with_positions=True)
    s = segment_query(
        spark, indexed, ast, k=10, with_positions=True, mode="spark"
    ).toPandas()
    assert [int(x) for x in p["doc_id"]] == [int(x) for x in s["doc_id"]]
    assert [float(x) for x in p["score"]] == [float(x) for x in s["score"]]
    assert [_pos_tuples(c) for c in p["positions"]] == [
        _pos_tuples(c) for c in s["positions"]
    ]


@pytest.mark.parametrize("ast", ASTS[:3], ids=["m", "a", "o"])
def test_local_mode_identical_to_spark_mode(spark, indexed, ast):
    loc = segment_query(spark, indexed, ast, k=10, mode="local").collect()
    spk = segment_query(spark, indexed, ast, k=10, mode="spark").collect()
    assert [(r["doc_id"], r["score"]) for r in loc] == [
        (r["doc_id"], r["score"]) for r in spk
    ]


def test_wand_pandas_identical(spark, indexed):
    for text in ["scan merge join", "merge", "nonexistentterm scan"]:
        p = wand_topk_pandas(indexed, text, k=10)
        s = wand_topk(spark, indexed, text, k=10, mode="spark").toPandas()
        assert [int(x) for x in p["doc_id"]] == [int(x) for x in s["doc_id"]]
        assert [float(x) for x in p["score"]] == [float(x) for x in s["score"]]


def test_wand_batch_pandas_identical(spark, indexed):
    texts = ["scan merge", "window stream", "zzznotaterm", "batch"]
    p = wand_topk_batch_pandas(indexed, texts, k=5)
    s = wand_topk_batch(
        spark, indexed, texts, k=5, mode="spark"
    ).toPandas()
    cols = ["query_id", "doc_id", "score", "rank"]
    assert p[cols].values.tolist() == s[cols].values.tolist()


def test_segment_batch_pandas_identical(spark, indexed):
    p = segment_query_batch_pandas(indexed, ASTS, k=5)
    s = segment_query_batch(
        spark, indexed, ASTS, k=5, mode="spark"
    ).toPandas()
    cols = ["query_id", "doc_id", "score", "rank"]
    assert p[cols].values.tolist() == s[cols].values.tolist()


def test_no_hit_and_empty_queries(indexed):
    assert len(wand_topk_pandas(indexed, "zzzznotaterm", k=5)) == 0
    assert len(segment_query_pandas(indexed, Match(""), k=5)) == 0
    # 1-term phrase -> empty (reference src/index.rs:94-106)
    assert len(segment_query_pandas(indexed, Phrase("single"), k=5)) == 0
    empty = wand_topk_batch_pandas(indexed, ["zzz1", ""], k=5)
    assert list(empty.columns) == ["query_id", "doc_id", "score", "rank"]
    assert len(empty) == 0


def test_pandas_api_needs_no_spark_session(indexed):
    """The serving call graph must not touch a SparkSession object —
    the query-node half runs where no JVM exists."""
    pdf = wand_topk_pandas(indexed, "scan merge", k=5)
    assert isinstance(pdf, pd.DataFrame) and len(pdf) > 0
    pdf2 = segment_query_pandas(indexed, Match("scan"), k=5)
    assert isinstance(pdf2, pd.DataFrame) and len(pdf2) > 0


def test_highlight_pandas_identical_to_spark_join(spark, indexed):
    from inverted_index_spark import commitio
    from inverted_index_spark.segquery import (
        segment_highlight,
        segment_highlight_pandas,
    )

    q = Phrase("batch batch")
    res = segment_query(
        spark, indexed, q, k=5, with_positions=True, mode="spark"
    )
    docs = spark.read.parquet(commitio.table_path(indexed, "docs"))
    want = [
        (r["doc_id"], r["highlighted"])
        for r in segment_highlight(res, docs, "<b>", "</b>")
        .select("doc_id", "highlighted")
        .collect()
    ]
    got = segment_highlight_pandas(indexed, q, "<b>", "</b>", k=5)
    assert [(int(d), h) for d, h in zip(got["doc_id"], got["highlighted"])] == want
    assert all("<b>" in h for h in got["highlighted"])


def test_highlight_pandas_requires_doc_store(spark, tmp_path):
    from inverted_index_spark.segquery import segment_highlight_pandas

    path = str(tmp_path / "nodocs")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(40)], "doc_id long, text string"
    )
    idx = build_and_save(spark, docs, path, ngrams=False, store_docs=False)
    build_segments(spark, idx, path, shard_docs=16, block_docs=8,
                   positions=True)
    with pytest.raises(FileNotFoundError):
        segment_highlight_pandas(path, Match("alpha"), "<b>", "</b>", k=3)


def test_auto_mode_thresholds(spark, indexed, monkeypatch):
    shards = [{"enc_bytes": 1 << 20} for _ in range(4)]
    assert metacache.serve_locally(shards, "auto")
    assert not metacache.serve_locally(shards, "spark")
    assert metacache.serve_locally(shards, "local")
    # too many files
    many = [{"enc_bytes": 1} for _ in range(100)]
    assert not metacache.serve_locally(many, "auto")
    # too many bytes
    big = [{"enc_bytes": metacache.LOCAL_MAX_BYTES}] * 2
    assert not metacache.serve_locally(big, "auto")
    # unknown size (pre-v3 manifest) -> distribute
    assert not metacache.serve_locally([{"file": "x"}], "auto")
    # env kill-switch
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_QUERY", "0")
    assert not metacache.serve_locally(shards, "auto")
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_QUERY")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_QUERY_MAX_FILES", "2")
    assert not metacache.serve_locally(shards, "auto")
    with pytest.raises(ValueError):
        metacache.serve_locally(shards, "bogus")


# -- cost model: per-(term, shard) statistics ---------------------------


def test_term_shard_stats_match_postings(spark, indexed):
    """The map's n_postings/n_positions are exact per-term counts —
    verified against the raw postings table."""
    from inverted_index_spark import commitio
    from pyspark.sql import functions as F

    posts = spark.read.parquet(commitio.table_path(indexed, "postings"))
    want = (
        posts.filter(F.col("term") == "merge")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(
                F.when(F.col("positions").isNull(), F.lit(0)).otherwise(
                    F.size("positions")
                )
            ).alias("npos"),
        )
        .collect()[0]
    )
    assert want["np"] > 0
    stats = metacache.range_stats_for_ranges(indexed, [("merge", "merge\x00")])
    assert stats is not None and stats[0] is not None
    assert stats[0]["n_postings"] == want["np"]
    assert stats[0]["n_positions"] == want["npos"]
    est = metacache.estimate_read_bytes(stats, with_positions=True)
    assert est == (
        want["np"] * metacache.BYTES_PER_POSTING
        + want["npos"] * metacache.BYTES_PER_POSITION
    )
    # WAND never reads positions: cheaper bound
    assert metacache.estimate_read_bytes(stats, with_positions=False) == (
        want["np"] * metacache.BYTES_PER_POSTING
    )


def test_est_bytes_overrides_whole_shard_size():
    # rare term inside a huge shard: stats say the filtered read is tiny
    huge = [{"enc_bytes": metacache.LOCAL_MAX_BYTES * 4}]
    assert metacache.serve_locally(huge, "auto", est_bytes=1024)
    # hot term in a small file count: stats say the read is big -> spark
    small = [{"enc_bytes": 1024}]
    assert not metacache.serve_locally(
        small, "auto", est_bytes=metacache.LOCAL_MAX_BYTES + 1
    )
    # no stats -> conservative whole-shard fallback
    assert metacache.serve_locally(small, "auto", est_bytes=None)
    assert not metacache.serve_locally(huge, "auto", est_bytes=None)


def test_explain_reports_cost(indexed):
    from inverted_index_spark.segquery import explain_segment_query

    out = explain_segment_query(indexed, And(Match("scan"), Match("merge")))
    assert out["est_read_bytes"] is not None and out["est_read_bytes"] > 0
    assert out["serving"] in ("local", "spark")
    for r in out["ranges"]:
        assert r["n_postings"] is not None and r["n_postings"] > 0
        assert r["n_positions"] is not None


def test_pre_stats_map_and_refresh_merge(spark, tmp_path):
    """A map that predates the stats columns still plans correctly
    (unknown cost -> conservative fallback), and an incremental refresh
    over it merges via allowMissingColumns: surviving old rows keep
    null counts, refreshed shards gain exact ones."""
    from inverted_index_spark import commitio
    from inverted_index_spark.segments import (
        _publish_term_shards,
        refresh_segments,
    )
    from inverted_index_spark.upsert import load_index_merged, upsert_saved

    path = str(tmp_path / "prestats")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}") for i in range(96)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)
    # simulate a pre-stats layout: republish the map without counts
    ts = spark.read.parquet(commitio.table_path(path, "term_shards"))
    _publish_term_shards(spark, path, ts.select("term", "shard_id"))
    metacache.invalidate()

    stats = metacache.range_stats_for_ranges(path, [("alpha", "alpha\x00")])
    assert stats[0]["shards"] and stats[0]["n_postings"] is None
    assert metacache.estimate_read_bytes(stats, True) is None
    # queries still serve correctly without cost statistics
    assert len(segment_query_pandas(path, Match("alpha"), k=5)) == 5

    # upsert docs into the LAST doc-range shard only, then refresh
    upd = spark.createDataFrame(
        [(95, "alpha zulu refreshed")], "doc_id long, text string"
    )
    upsert_saved(spark, path, upd)
    refresh_segments(spark, load_index_merged(spark, path), path)
    metacache.invalidate()

    # term only in the refreshed shard: exact stats present
    znew = metacache.range_stats_for_ranges(path, [("zulu", "zulu\x00")])
    assert znew[0]["n_postings"] == 1
    # term spanning untouched (null-stat) shards: cost unknown
    mixed = metacache.range_stats_for_ranges(path, [("alpha", "alpha\x00")])
    assert mixed[0]["n_postings"] is None
    assert metacache.estimate_read_bytes(mixed, True) is None
    # and the merged map still prunes/serves correctly
    pdf = segment_query_pandas(path, Match("zulu"), k=5)
    assert [int(d) for d in pdf["doc_id"]] == [95]


@pytest.mark.parametrize(
    "ast", ASTS, ids=[type(a).__name__ + str(i) for i, a in enumerate(ASTS)]
)
def test_segment_count_matches_relational(spark, indexed, ast):
    """segment_count == the relational docs-branch count in both serving
    modes, and FtsEngine.count auto-routes to it (same answer)."""
    from inverted_index_spark.build import load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segquery import segment_count

    idx = load_index(spark, indexed)
    want = FtsEngine(idx, use_segments=False).count(ast)
    assert segment_count(spark, indexed, ast, mode="local") == want
    assert segment_count(spark, indexed, ast, mode="spark") == want
    assert FtsEngine(idx).count(ast) == want


def test_segment_count_empty_and_range(spark, indexed):
    from inverted_index_spark.build import load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segquery import segment_count

    assert segment_count(spark, indexed, Match("zzzzabsent")) == 0
    # doc_range restricts the count to ids in [lo, hi)
    idx = load_index(spark, indexed)
    eng_df = FtsEngine(idx, use_segments=False)
    full = eng_df.results(Match("scan"), with_positions=False).toPandas()
    in_range = int((full["doc_id"] < 200).sum())
    assert (
        segment_count(spark, indexed, Match("scan"), doc_range=(0, 200))
        == in_range
    )
