"""Metadata-filtered scoring + conversation-level ranking.

The filter-query contract: ``filter_docs`` restricts CANDIDATES while
idf/avgdl/N stay corpus-global (Lucene filter semantics — a filter must
not re-weight the corpus). conversation_topk aggregates turn-level BM25
to conversations (payload: multi-turn transcripts)."""

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.build import build_and_save
from inverted_index_spark.qast import And, Match
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.transcripts import conversation_topk


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("filteridx"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = build_and_save(spark, docs, path, ngrams=False)
    # segments deliberately NOT built: the relational plan is the object
    # under test (filtered queries pin it anyway)
    return FtsEngine(idx, use_segments=False)


def _allowed(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("lang") == "en").select("doc_id")


def test_filtered_bm25_is_global_stats_restriction(spark, eng):
    """Filtered top-k == unfiltered full ranking restricted to allowed
    ids, then cut at k — scores IDENTICAL (global idf/avgdl), no
    re-ranking within the filtered set."""
    allowed = {r["doc_id"] for r in _allowed(spark).collect()}
    full = [
        (r["doc_id"], r["score"])
        for r in eng.bm25("scan merge join", k=None).collect()
    ]
    expect = [(d, s) for d, s in full if d in allowed][:10]
    got = [
        (r["doc_id"], r["score"])
        for r in eng.bm25(
            "scan merge join", k=10, filter_docs=_allowed(spark)
        ).collect()
    ]
    assert got == expect and len(got) == 10


def test_filtered_results_and_search(spark, eng):
    allowed = {r["doc_id"] for r in _allowed(spark).collect()}
    q = And(Match("scan"), Match("merge"))
    full = eng.results(q, with_positions=True).collect()
    expect = [
        (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
        for r in full
        if r["doc_id"] in allowed
    ]
    got = [
        (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
        for r in eng.results(
            q, with_positions=True, filter_docs=_allowed(spark)
        ).collect()
    ]
    assert got == expect and got
    # two-pass positional top-k composes with the filter
    got_k = [
        (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
        for r in eng.results(
            q, k=3, with_positions=True, filter_docs=_allowed(spark)
        ).collect()
    ]
    assert got_k == expect[:3]


def test_filtered_bm25_batch(spark, eng):
    allowed = {r["doc_id"] for r in _allowed(spark).collect()}
    got = eng.bm25_batch(
        ["scan merge", "window stream"], k=5, filter_docs=_allowed(spark)
    ).collect()
    assert got and all(r["doc_id"] in allowed for r in got)
    # per query: equals the unfiltered ranking restricted then cut
    for qid, text in [(0, "scan merge"), (1, "window stream")]:
        full = [
            (r["doc_id"], round(r["score"], 6))
            for r in eng.bm25(text, k=None).collect()
            if r["doc_id"] in allowed
        ][:5]
        batch = [
            (r["doc_id"], round(r["score"], 6))
            for r in got
            if r["query_id"] == qid
        ]
        assert batch == full


def test_filter_pins_relational_path_on_segmented_index(spark, tmp_path):
    """A fresh-segments index must still answer filtered queries
    correctly (routing falls back to the relational plan — WAND's
    threshold pruning assumes an unfiltered top-k)."""
    from inverted_index_spark.segments import build_segments, segments_fresh

    path = str(tmp_path / "segidx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 4}") for i in range(64)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=16, positions=True)
    assert segments_fresh(path)
    eng = FtsEngine(idx)  # segments would route unfiltered calls
    allowed = spark.createDataFrame(
        [(i,) for i in range(0, 64, 2)], "doc_id long"
    )
    got = {r["doc_id"] for r in eng.bm25("alpha", k=64,
                                         filter_docs=allowed).collect()}
    assert got == set(range(0, 64, 2))
    got2 = {
        r["doc_id"]
        for r in eng.results(Match("w1"), filter_docs=allowed).collect()
    }
    assert got2 == {i for i in range(64) if i % 4 == 1 and i % 2 == 0}


def test_conversation_topk(spark, eng):
    conv_map = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        F.concat(
            F.lit("conv-"), F.expr("doc_id DIV 8").cast("string")
        ).alias("conv_id"),
    )
    per_doc = {
        r["doc_id"]: r["score"]
        for r in eng.bm25("scan merge join", k=None).collect()
    }
    # expected: max turn score per conversation, ties -> conv_id asc
    best: dict = {}
    n_turns: dict = {}
    for d, s in per_doc.items():
        c = f"conv-{d // 8}"
        best[c] = max(best.get(c, float("-inf")), s)
        n_turns[c] = n_turns.get(c, 0) + 1
    expect = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    got = conversation_topk(
        eng, conv_map, "scan merge join", k=5, agg="max"
    ).collect()
    assert [(r["conv_id"], r["score"]) for r in got] == expect
    assert all(r["n_turns"] == n_turns[r["conv_id"]] for r in got)

    # sum aggregation ranks by total evidence
    total: dict = {}
    for d, s in per_doc.items():
        c = f"conv-{d // 8}"
        total[c] = total.get(c, 0.0) + s
    expect_sum = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got_sum = conversation_topk(
        eng, conv_map, "scan merge join", k=5, agg="sum"
    ).collect()
    assert [r["conv_id"] for r in got_sum] == [c for c, _ in expect_sum]
    for r, (_, s) in zip(got_sum, expect_sum):
        assert r["score"] == pytest.approx(s)

    with pytest.raises(ValueError):
        conversation_topk(eng, conv_map, "scan", agg="median")


def test_conversation_context(spark, eng):
    from inverted_index_spark.transcripts import conversation_context

    turn_docs = spark.createDataFrame(
        [(c * 4 + t, f"c{c}", t, f"text-{c}-{t}")
         for c in range(3) for t in range(4)],
        "doc_id long, conv_id string, turn_idx int, text string",
    )
    # hits: turn 0 of conv c0 (window clips below) and turn 2 of c1
    hits = spark.createDataFrame([(0,), (6,)], "doc_id long")
    got = sorted(
        (r["hit_doc_id"], r["doc_id"], r["offset"])
        for r in conversation_context(turn_docs, hits, window=1).collect()
    )
    assert got == [
        (0, 0, 0), (0, 1, 1),            # clipped at the conv start
        (6, 5, -1), (6, 6, 0), (6, 7, 1),
    ]
    # payload columns ride along
    row = conversation_context(turn_docs, hits, window=0).collect()[0]
    assert row["text"].startswith("text-")
    # window=0 is just the hits themselves
    assert {
        r["doc_id"]
        for r in conversation_context(turn_docs, hits, window=0).collect()
    } == {0, 6}
    # a turn in two hits' windows appears once PER HIT
    hits2 = spark.createDataFrame([(5,), (7,)], "doc_id long")
    per_hit = conversation_context(turn_docs, hits2, window=1).collect()
    assert sum(1 for r in per_hit if r["doc_id"] == 6) == 2
    with pytest.raises(ValueError):
        conversation_context(turn_docs, hits, window=-1)


def test_doc_range_wand_equals_filtered_relational(spark, tmp_path):
    """doc_range WAND == relational bm25 with the same id-range filter:
    exact filtered top-k at segment speed, global idf/avgdl, structural
    shard pruning (shards ARE doc ranges)."""
    from inverted_index_spark.segments import build_segments, load_manifest
    from inverted_index_spark.wand import (
        _shards_in_range,
        wand_topk,
        wand_topk_pandas,
    )

    path = str(tmp_path / "ridx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} tok{i}") for i in range(128)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)
    eng = FtsEngine(idx, use_segments=False)
    allowed = spark.createDataFrame(
        [(i,) for i in range(40, 100)], "doc_id long"
    )
    want = [
        (r["doc_id"], round(r["score"], 5))
        for r in eng.bm25("alpha w3", k=200, filter_docs=allowed).collect()
    ]
    assert want and all(40 <= d < 100 for d, _ in want)
    for mode in ("spark", "local"):
        got = [
            (r["doc_id"], round(r["score"], 5))
            for r in wand_topk(
                spark, path, "alpha w3", k=200, mode=mode,
                doc_range=(40, 100),
            ).collect()
        ]
        assert got == want, mode
    pdf = wand_topk_pandas(path, "alpha w3", k=200, doc_range=(40, 100))
    assert [
        (int(d), round(float(s), 5))
        for d, s in zip(pdf["doc_id"], pdf["score"])
    ] == want

    # structural pruning: a range inside one shard opens exactly it
    man = load_manifest(path)
    inr = _shards_in_range(man["shards"], man, (33, 60))
    assert [s["shard_id"] for s in inr] == [1]
    # boundary-exclusive semantics: [lo, hi)
    edge = wand_topk(spark, path, "tok40 tok99 tok100", k=10,
                     doc_range=(40, 100), mode="spark").collect()
    assert sorted(r["doc_id"] for r in edge) == [40, 99]
    # empty range -> empty frame
    assert wand_topk(
        spark, path, "alpha", k=5, doc_range=(1000, 2000)
    ).count() == 0


def test_doc_range_segment_query_matches_relational(spark, tmp_path):
    """doc_range on the positional evaluator: segment route (both
    serving modes + pandas) == relational range-filtered results, full
    positions included."""
    from inverted_index_spark.build import load_index
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import (
        segment_query,
        segment_query_pandas,
    )

    path = str(tmp_path / "ridx2")
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} tok{i}") for i in range(96)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)
    q = And(Match("alpha"), Match("w2"))
    rel = FtsEngine(idx, use_segments=False)
    want = [
        (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
        for r in rel.results(q, doc_range=(20, 70)).collect()
    ]
    assert want and all(20 <= d < 70 for d, _, _ in want)
    for mode in ("spark", "local"):
        got = [
            (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
            for r in segment_query(
                spark, path, q, mode=mode, doc_range=(20, 70)
            ).collect()
        ]
        assert got == want, mode
    pdf = segment_query_pandas(path, q, doc_range=(20, 70))
    assert [int(d) for d in pdf["doc_id"]] == [d for d, _, _ in want]
    # the routed engine API agrees (fresh segments, doc_range stays on
    # the segment path)
    eng = FtsEngine(load_index(spark, path))
    routed = [
        (r["doc_id"], r["score"], [tuple(p) for p in r["positions"]])
        for r in eng.results(q, doc_range=(20, 70)).collect()
    ]
    assert routed == want


def test_conversation_topk_role_boosts(spark, eng):
    """Role boosts scale each turn's BM25 score before the conversation
    max; unmapped roles weight 1.0; statistics stay corpus-global (the
    boosted ranking is a pure per-doc multiply of the unboosted one)."""
    roles = ["user", "assistant", "system", "tool"]
    conv_map = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id",
        F.concat(
            F.lit("conv-"), F.expr("doc_id DIV 8").cast("string")
        ).alias("conv_id"),
        F.element_at(
            F.array(*[F.lit(r) for r in roles]),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
    )
    boosts = {"assistant": 2.0, "user": 1.5}
    per_doc = {
        r["doc_id"]: r["score"]
        for r in eng.bm25("scan merge join", k=None).collect()
    }
    best: dict = {}
    for d, s in per_doc.items():
        w = boosts.get(roles[d % 4], 1.0)
        c = f"conv-{d // 8}"
        best[c] = max(best.get(c, float("-inf")), s * w)
    expect = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    got = conversation_topk(
        eng, conv_map, "scan merge join", k=5, role_boosts=boosts
    ).collect()
    assert [r["conv_id"] for r in got] == [c for c, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["score"] == pytest.approx(s)

    # boosts with no role column -> explicit error
    with pytest.raises(ValueError, match="role"):
        conversation_topk(
            eng, conv_map.drop("role"), "scan", role_boosts=boosts
        )


def test_facets_counts_match_membership(spark, eng):
    """facets() == groupBy counts over the query's match set, for every
    requested facet column in one call; membership-only (no positions)."""
    from inverted_index_spark.qast import Match, Near

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    roles = ["user", "assistant", "system", "tool"]
    meta = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(r) for r in roles]),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.pmod(F.col("doc_id"), F.lit(10)).alias("decile"),
    )
    match_ids = {
        r["doc_id"]
        for r in eng.results(Match("merge"), with_positions=False).collect()
    }
    expect: dict = {}
    for d in match_ids:
        expect[("role", roles[d % 4])] = expect.get(("role", roles[d % 4]), 0) + 1
        expect[("decile", str(d % 10))] = expect.get(("decile", str(d % 10)), 0) + 1
    got = {
        (r["facet"], r["value"]): r["n_docs"]
        for r in eng.facets(Match("merge"), meta, ["role", "decile"]).collect()
    }
    assert got == expect

    # composes with any algebra node (Near membership here)
    near_ids = {
        r["doc_id"]
        for r in eng.results(
            Near("scan merge", 3), with_positions=False
        ).collect()
    }
    got_near = {
        (r["facet"], r["value"]): r["n_docs"]
        for r in eng.facets(Near("scan merge", 3), meta, ["role"]).collect()
    }
    assert sum(got_near.values()) == len(near_ids)

    with pytest.raises(ValueError, match="at least one"):
        eng.facets(Match("merge"), meta, [])
    with pytest.raises(ValueError, match="not in meta"):
        eng.facets(Match("merge"), meta, ["nope"])
