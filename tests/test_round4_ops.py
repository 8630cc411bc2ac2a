"""Round-4 late ops: delete_by_query, span_first, tool analytics,
KMV cardinality sketch."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import build_engine


# ---------------------------------------------------------------- span_first


def test_span_first_basic(spark):
    eng = build_engine(
        spark,
        [
            (1, "scan the merge plan"),       # scan at 0
            (2, "the big scan runs now"),     # scan at 2
            (3, "a b c d scan"),              # scan at 4 (outside end=4)
            (4, "no match here"),
        ],
        ngrams=False,
    )
    rows = eng.span_first("scan", 4).collect()
    assert [(r["doc_id"], r["first_pos"]) for r in rows] == [(1, 0), (2, 2)]
    # wider gate admits doc 3
    rows = eng.span_first("scan", 5).collect()
    assert [(r["doc_id"], r["first_pos"]) for r in rows] == [
        (1, 0), (2, 2), (3, 4),
    ]


def test_span_first_prefix_expansion_and_edges(spark):
    eng = build_engine(
        spark,
        [(1, "scanner starts early"), (2, "late scanning x y scan")],
        ngrams=False,
    )
    # full-token Match semantics are prefix: 'scan' hits scanner/scanning
    rows = eng.span_first("scan", 2).collect()
    assert [(r["doc_id"], r["first_pos"]) for r in rows] == [(1, 0), (2, 1)]
    # empty analyzed query -> empty frame with the contract schema
    out = eng.span_first("...", 3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "first_pos"]
    with pytest.raises(ValueError):
        eng.span_first("scan", 0)


def test_span_first_matches_ngram_engine(spark):
    docs = [(i, f"alpha beta scan gamma token{i % 3}") for i in range(8)]
    full = build_engine(spark, docs, ngrams=False)
    ng = build_engine(spark, docs, ngrams=True)
    a = [(r["doc_id"], r["first_pos"]) for r in full.span_first("scan", 3).collect()]
    b = [(r["doc_id"], r["first_pos"]) for r in ng.span_first("scan", 3).collect()]
    assert a == b == [(i, 2) for i in range(8)]


# ----------------------------------------------------------- delete_by_query


def test_delete_by_query_end_to_end(spark, tmp_path):
    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.upsert import delete_by_query

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            (1, "scan merge join"),
            (2, "window stream batch"),
            (3, "the scanner output"),   # prefix-matches 'scan'
            (4, "merge only here"),
        ],
        ["doc_id", "text"],
    )
    build_and_save(spark, docs, path, ngrams=False, store_docs=False)
    idx = delete_by_query(spark, path, "scan")
    assert idx.n_docs == 2
    survivors = sorted(
        r["doc_id"] for r in idx.docstats.select("doc_id").collect()
    )
    assert survivors == [2, 4]
    # the index still answers queries correctly post-delete
    from inverted_index_spark.qast import Match

    eng = FtsEngine(load_index(spark, path))
    got = sorted(
        r["doc_id"] for r in eng.compile(Match("merge")).docs.collect()
    )
    assert got == [4]
    # no scratch residue inside the index dir
    import os

    assert not any(
        d.startswith("_delete_by_query") for d in os.listdir(path)
    )


def test_delete_by_query_ast_and_no_match(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.qast import And, Match
    from inverted_index_spark.upsert import delete_by_query

    path = str(tmp_path / "idx2")
    docs = spark.createDataFrame(
        [(1, "scan merge"), (2, "scan only"), (3, "merge only")],
        ["doc_id", "text"],
    )
    build_and_save(spark, docs, path, ngrams=False, store_docs=False)
    idx = delete_by_query(spark, path, And(Match("scan"), Match("merge")))
    assert sorted(r["doc_id"] for r in idx.docstats.collect()) == [2, 3]
    # deleting with a query matching nothing is a no-op on the doc set
    idx = delete_by_query(spark, path, Match("absent"))
    assert sorted(r["doc_id"] for r in idx.docstats.collect()) == [2, 3]


# ------------------------------------------------------------ tool analytics


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )


def test_tool_transitions_chains_and_breaks(spark):
    from inverted_index_spark.transcripts import tool_transitions

    turns = _turns(
        spark,
        [
            ("c1", 0, "search"), ("c1", 1, "bash"), ("c1", 2, "bash"),
            ("c1", 3, ""),       ("c1", 4, "python"),  # '' breaks chain
            ("c2", 0, "search"), ("c2", 1, "bash"),
            ("c2", 3, "python"),  # gap: turn 2 missing -> not consecutive
            ("c3", 0, None), ("c3", 1, "search"),  # null breaks too
        ],
    )
    got = {
        (r["src_tool"], r["dst_tool"]): r["n"]
        for r in tool_transitions(turns).collect()
    }
    assert got == {("search", "bash"): 2, ("bash", "bash"): 1}


def test_tool_usage_profile(spark):
    from inverted_index_spark.transcripts import tool_usage

    turns = _turns(
        spark,
        [
            ("c1", 0, "search"), ("c1", 1, ""), ("c1", 2, "bash"),
            ("c2", 0, ""), ("c2", 1, None),          # never calls a tool
            ("c3", 5, "python"),
        ],
    )
    rows = {r["conv_id"]: r for r in tool_usage(turns).collect()}
    assert rows["c1"]["n_turns"] == 3
    assert rows["c1"]["n_tool_calls"] == 2
    assert rows["c1"]["n_distinct_tools"] == 2
    assert (rows["c1"]["first_tool"], rows["c1"]["last_tool"]) == (
        "search", "bash",
    )
    assert rows["c2"]["n_tool_calls"] == 0
    assert rows["c2"]["first_tool"] is None
    assert (rows["c3"]["first_tool"], rows["c3"]["last_tool"]) == (
        "python", "python",
    )


# ------------------------------------------------------------------ sketches


def test_kmv_exact_below_k(spark):
    from inverted_index_spark.pipelines.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", f"v{i}") for i in range(10)] + [("a", "v0"), ("b", "x")],
        ["g", "v"],
    )
    rows = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert rows["a"]["n_kept"] == 10 and rows["a"]["est_distinct"] == 10.0
    assert rows["b"]["n_kept"] == 1 and rows["b"]["est_distinct"] == 1.0


def test_kmv_estimate_accuracy_and_determinism(spark):
    from inverted_index_spark.pipelines.sketches import kmv_distinct

    n = 5000
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(n)], ["g", "v"]
    )
    k = 256
    est = kmv_distinct(df, "g", "v", k=k).collect()[0]["est_distinct"]
    # KMV relative error ~ 1/sqrt(k-2); allow 5 sigma
    assert abs(est - n) / n < 5.0 / math.sqrt(k - 2)
    # deterministic: layout-independent (different partitioning, same
    # estimate bit-for-bit)
    est2 = kmv_distinct(
        df.repartition(7), "g", "v", k=k
    ).collect()[0]["est_distinct"]
    assert est == est2


def test_kmv_matches_pure_python(spark):
    """The sketch is a pure function of the value set: recompute the
    md5 bottom-k on the driver and demand bit-equality."""
    import hashlib

    from inverted_index_spark.pipelines.sketches import kmv_distinct

    vals = [f"tok{i}" for i in range(500)]
    k = 32
    us = sorted(
        {
            int(hashlib.md5(v.encode()).hexdigest()[:8], 16) / float(16**8)
            for v in vals
        }
    )
    expect = (k - 1) / us[k - 1]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    got = kmv_distinct(df, "g", "v", k=k).collect()[0]
    assert got["n_kept"] == k
    assert got["est_distinct"] == pytest.approx(expect, abs=0.0)
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "v", k=1)


def test_group_quantiles_exact(spark):
    from inverted_index_spark.pipelines.sketches import group_quantiles

    vals = [("a", v) for v in [1, 2, 2, 3, 10, 10, 10, 50, 100, 1000]]
    vals += [("b", 7)]
    df = spark.createDataFrame(vals, ["g", "v"])
    rows = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, "g", "v", qs=(0.5, 0.9, 1.0)).collect()
    }
    # sorted a: [1,2,2,3,10,10,10,50,100,1000]; rank ceil(.5*10)=5 -> 10,
    # ceil(.9*10)=9 -> 100, ceil(1*10)=10 -> 1000
    assert rows[("a", 0.5)] == 10.0
    assert rows[("a", 0.9)] == 100.0
    assert rows[("a", 1.0)] == 1000.0
    assert rows[("b", 0.5)] == 7.0
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", qs=())
    with pytest.raises(ValueError):
        group_quantiles(df, "g", "v", qs=(0.0,))


def test_group_quantiles_matches_python_ranks(spark):
    import math as _math

    from inverted_index_spark.pipelines.sketches import group_quantiles

    data = [("g", (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(data, ["g", "v"])
    svals = sorted(v for _, v in data)
    for q in (0.25, 0.5, 0.75, 0.99):
        got = group_quantiles(df, "g", "v", qs=(q,)).collect()[0]["value"]
        expect = float(svals[_math.ceil(q * len(svals)) - 1])
        assert got == expect, (q, got, expect)


def test_group_quantiles_approx_error_bound(spark):
    """DDSketch guarantee: |approx - exact| <= alpha * exact for every
    (group, q) — the approx bin CONTAINS the exact quantile value and
    every bin member is within relative alpha of the representative."""
    import random

    from inverted_index_spark.pipelines.sketches import (
        group_quantiles,
        group_quantiles_approx,
    )

    rng = random.Random(17)
    rows = [
        (f"g{i % 3}", float(rng.randint(1, 100000))) for i in range(4000)
    ] + [("g0", 0.0)] * 7  # zeros exercise the exact zero bin
    # fractional values in (0, 1) exercise NEGATIVE log bins
    rows += [("gf", rng.uniform(0.001, 10.0)) for _ in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    qs = (0.01, 0.5, 0.9, 0.99)
    for alpha in (0.01, 0.05):
        exact = {
            (r["g"], r["q"]): r["value"]
            for r in group_quantiles(df, "g", "v", qs=qs).collect()
        }
        approx = {
            (r["g"], r["q"]): r["value"]
            for r in group_quantiles_approx(
                df, "g", "v", qs=qs, alpha=alpha
            ).collect()
        }
        assert set(approx) == set(exact)
        for k, ex in exact.items():
            # small slack over alpha for the 4-decimal output rounding
            assert abs(approx[k] - ex) <= alpha * ex + 1e-3, (
                k, approx[k], ex, alpha
            )


def test_group_quantiles_approx_zero_and_validation(spark):
    import pytest as _pytest

    from inverted_index_spark.pipelines.sketches import (
        group_quantiles_approx,
    )

    df = spark.createDataFrame(
        [("a", 0.0)] * 9 + [("a", 5.0)], ["g", "v"]
    )
    rows = {
        r["q"]: r["value"]
        for r in group_quantiles_approx(
            df, "g", "v", qs=(0.5, 1.0)
        ).collect()
    }
    assert rows[0.5] == 0.0  # zero bin is exact
    assert abs(rows[1.0] - 5.0) <= 0.01 * 5.0
    with _pytest.raises(ValueError):
        group_quantiles_approx(df, "g", "v", qs=())
    with _pytest.raises(ValueError):
        group_quantiles_approx(df, "g", "v", qs=(1.5,))
    with _pytest.raises(ValueError):
        group_quantiles_approx(df, "g", "v", alpha=0.0)
    neg = spark.createDataFrame([("a", -1.0)], ["g", "v"])
    with _pytest.raises(Exception, match="negative"):
        group_quantiles_approx(neg, "g", "v").collect()


def test_group_quantiles_approx_mergeable(spark):
    """Sketching half the corpus, then the other half, then summing the
    bins equals sketching the whole — i.e. the plan's partial aggs are
    true merges. Verified at the API level: union(a, b) == whole."""
    from inverted_index_spark.pipelines.sketches import (
        group_quantiles_approx,
    )

    rows = [("g", float((i * 37) % 101 + 1)) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "v"])
    half1 = spark.createDataFrame(rows[:250], ["g", "v"])
    half2 = spark.createDataFrame(rows[250:], ["g", "v"])
    whole = group_quantiles_approx(df, "g", "v").collect()
    merged = group_quantiles_approx(half1.union(half2), "g", "v").collect()
    assert sorted(map(tuple, whole)) == sorted(map(tuple, merged))


def test_heavy_hitters_ranks_and_ties(spark):
    from inverted_index_spark.pipelines.sketches import heavy_hitters

    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 3 + [("a", "z")] * 3
        + [("a", "w")] * 1 + [("b", "q")] * 2
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = [
        (r["g"], r["value"], r["cnt"], r["rank"])
        for r in heavy_hitters(df, "g", "v", n=3).collect()
    ]
    # tie between y and z at cnt=3 broken by value asc
    assert got == [
        ("a", "x", 5, 1), ("a", "y", 3, 2), ("a", "z", 3, 3),
        ("b", "q", 2, 1),
    ]
    with pytest.raises(ValueError):
        heavy_hitters(df, "g", "v", n=0)


# -------------------------------------------------------------- ranking eval


def test_ranking_metrics_hand_computed(spark):
    from inverted_index_spark.pipelines.ranking_eval import ranking_metrics

    results = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2), (0, 30, 3),
         (1, 50, 1), (1, 60, 2)],
        "query_id int, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 10, 2), (0, 30, 1), (0, 40, 3),   # 40 relevant, not retrieved
         (1, 99, 1)],                          # q1 retrieves nothing relevant
        "query_id int, doc_id long, rel int",
    )
    rows = {r["query_id"]: r for r in ranking_metrics(results, qrels, k=3).collect()}
    dcg = (2**2 - 1) / math.log2(2) + 0.0 + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert rows[0]["ndcg"] == pytest.approx(dcg / idcg)
    assert rows[0]["mrr"] == 1.0
    assert rows[0]["precision"] == pytest.approx(2 / 3)
    assert rows[0]["recall"] == pytest.approx(2 / 3)
    assert rows[1]["ndcg"] == 0.0 and rows[1]["mrr"] == 0.0
    assert rows[1]["recall"] == 0.0
    with pytest.raises(ValueError):
        ranking_metrics(results, qrels, k=0)


def test_ranking_metrics_cutoff_and_no_qrels(spark):
    from inverted_index_spark.pipelines.ranking_eval import ranking_metrics

    results = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3)],
        "query_id int, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(7, 3, 1)], "query_id int, doc_id long, rel int"
    )
    # k=2 cuts the only relevant hit away
    r = ranking_metrics(results, qrels, k=2).collect()[0]
    assert r["ndcg"] == 0.0 and r["mrr"] == 0.0 and r["recall"] == 0.0
    # a query with zero qrels rows stays defined (all zeros)
    results2 = spark.createDataFrame(
        [(9, 1, 1)], "query_id int, doc_id long, rank int"
    )
    r2 = ranking_metrics(results2, qrels, k=2).collect()
    r2 = {x["query_id"]: x for x in r2}
    assert r2[9]["ndcg"] == 0.0 and r2[9]["precision"] == 0.0


# ------------------------------------------------------------- cooccurrence


def test_cooccurrence_hand_computed(spark):
    from inverted_index_spark.pipelines.textstats import cooccurrence

    docs = spark.createDataFrame([(1, "a b a c")], ["doc_id", "text"])
    rows = cooccurrence(docs, window=2, min_count=1).collect()
    got = {(r["term_a"], r["term_b"]): (r["n"], r["pmi"]) for r in rows}
    # events: (a,b)x2 [i=0->1, 1->2], (b,c) [1->3], (a,c) [2->3]; T=4
    # marginals: a=3, b=3, c=2
    assert got[("a", "b")][0] == 2
    assert got[("a", "b")][1] == pytest.approx(math.log(2 * 4 / (3 * 3)))
    assert got[("b", "c")][0] == 1
    assert got[("b", "c")][1] == pytest.approx(math.log(1 * 4 / (3 * 2)))
    assert got[("a", "c")][0] == 1
    # min_count filters output but not marginals
    rows2 = cooccurrence(docs, window=2, min_count=2).collect()
    assert len(rows2) == 1
    assert rows2[0]["pmi"] == pytest.approx(math.log(8 / 9))
    with pytest.raises(ValueError):
        cooccurrence(docs, window=0)


def test_cooccurrence_matches_positional_self_join(spark):
    """The array-expression generator must emit exactly the events a
    positional self-join defines."""
    from inverted_index_spark.pipelines.textstats import cooccurrence

    import itertools
    import random

    rnd = random.Random(7)
    vocab = ["x", "y", "z", "w", "v"]
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(1, 12))))
        for i in range(20)
    ]
    w = 3
    events = []
    for _, text in docs:
        t = text.split(" ")
        for i, j in itertools.combinations(range(len(t)), 2):
            if 0 < j - i <= w and t[i] != t[j]:
                events.append(tuple(sorted((t[i], t[j]))))
    from collections import Counter

    cnt = Counter(events)
    total = len(events)
    marg = Counter()
    for (a, b), n in cnt.items():
        marg[a] += n
        marg[b] += n
    got = {
        (r["term_a"], r["term_b"]): (r["n"], r["pmi"])
        for r in cooccurrence(
            spark.createDataFrame(docs, ["doc_id", "text"]), window=w,
            min_count=1,
        ).collect()
    }
    assert set(got) == set(cnt)
    for pair, n in cnt.items():
        assert got[pair][0] == n
        expect = math.log(n * total / (marg[pair[0]] * marg[pair[1]]))
        assert got[pair][1] == pytest.approx(expect), pair


# ------------------------------------------- min_window / rescore seg routing


@pytest.fixture(scope="module")
def seg_engine_pair(spark, tmp_path_factory):
    """Saved full-token index + positional segments; (routed, pinned
    relational) engine pair over the identical corpus."""
    import random

    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.segments import build_segments

    rnd = random.Random(11)
    vocab = ["scan", "merge", "join", "stream", "batch", "token", "plan"]
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 20))))
        for i in range(120)
    ]
    path = str(tmp_path_factory.mktemp("segmw") / "idx")
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    idx = build_and_save(spark, df, path, ngrams=False, store_docs=False)
    build_segments(spark, idx, path, shard_docs=16, positions=True)
    loaded = load_index(spark, path)
    return FtsEngine(loaded), FtsEngine(loaded, use_segments=False)


def test_min_window_segment_route_identity(seg_engine_pair):
    routed, rel = seg_engine_pair
    for q in ("scan merge", "scan merge join", "token"):
        a = [(r["doc_id"], r["span"]) for r in routed.min_window(q).collect()]
        b = [(r["doc_id"], r["span"]) for r in rel.min_window(q).collect()]
        assert a == b, q
    # windowed variant too
    a = [(r["doc_id"], r["span"])
         for r in routed.min_window("scan merge", window=3).collect()]
    b = [(r["doc_id"], r["span"])
         for r in rel.min_window("scan merge", window=3).collect()]
    assert a == b


def test_min_window_doc_ids_fast_path(seg_engine_pair):
    routed, rel = seg_engine_pair
    full = {r["doc_id"]: r["span"] for r in rel.min_window("scan merge").collect()}
    some = sorted(full)[::3][:10]
    got = [
        (r["doc_id"], r["span"])
        for r in routed.min_window("scan merge", doc_ids=some).collect()
    ]
    assert got == [(d, full[d]) for d in sorted(some)]
    # ids outside the match set contribute nothing
    got2 = routed.min_window("scan merge", doc_ids=[10**9]).collect()
    assert got2 == []
    # relational fallback (no segments) agrees on the same id filter
    got3 = [
        (r["doc_id"], r["span"])
        for r in rel.min_window("scan merge", doc_ids=some).collect()
    ]
    assert got3 == got


def test_rescore_segment_route_identity(seg_engine_pair):
    routed, rel = seg_engine_pair
    a = [
        (r["doc_id"], round(r["score"], 6))
        for r in routed.rescore("scan merge", k=8, window=25, weight=2.0).collect()
    ]
    b = [
        (r["doc_id"], round(r["score"], 6))
        for r in rel.rescore("scan merge", k=8, window=25, weight=2.0).collect()
    ]
    assert a == b and len(a) == 8


# ------------------------------------------------------------------ changelog


def test_changed_docs_last_action_wins(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.upsert import (
        changed_docs,
        delete_saved,
        upsert_saved,
    )

    path = str(tmp_path / "chlog")
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(10)], ["doc_id", "text"]
    )
    build_and_save(spark, docs, path, ngrams=False, store_docs=False)
    # gen 1: upsert 2 and 4; gen 2: delete 4 and 7; gen 3: re-add 7
    upsert_saved(
        spark, path,
        spark.createDataFrame([(2, "two v2"), (4, "four v2")],
                              ["doc_id", "text"]),
    )
    delete_saved(
        spark, path, spark.createDataFrame([(4,), (7,)], ["doc_id"])
    )
    upsert_saved(
        spark, path, spark.createDataFrame([(7, "seven v2")],
                                           ["doc_id", "text"]),
    )
    got = [
        (r["doc_id"], r["gen"], r["change"])
        for r in changed_docs(spark, path).collect()
    ]
    assert got == [
        (2, 1, "upserted"), (4, 2, "deleted"), (7, 3, "upserted"),
    ]
    # windowed: only gen 2's view
    got2 = [
        (r["doc_id"], r["gen"], r["change"])
        for r in changed_docs(spark, path, gen_from=1, gen_to=2).collect()
    ]
    assert got2 == [(4, 2, "deleted"), (7, 2, "deleted")]
    # fresh index (no generations) -> empty with the contract schema
    path2 = str(tmp_path / "chlog2")
    build_and_save(spark, docs, path2, ngrams=False, store_docs=False)
    out = changed_docs(spark, path2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "gen", "change"]
    with pytest.raises(ValueError):
        changed_docs(spark, path, gen_from=5)
