"""Hybrid lexical+vector retrieval (RRF fusion) — engine extension.

The reference has no vector side (/root/reference/src/index.rs:15-20);
these tests pin the fusion algebra itself (rank sentinel, additivity,
ordering, N-way), then the end-to-end engine surface against
independently computed ranks.
"""

import math

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.hybrid import (
    hybrid_topk,
    hybrid_weighted_topk,
    normalized_topn,
    ranked_topn,
    rrf_fuse,
    weighted_fuse,
)
from tests.conftest import build_engine

DOCS = [
    (0, "apple banana cherry"),
    (1, "apple apple pie"),
    (2, "banana split banana"),
    (3, "cherry tart"),
    (4, "apple banana banana apple"),
    (5, "grape jelly toast"),
    (6, "banana bread apple"),
    (7, "plain oatmeal"),
]

# dim-4 unit-ish vectors; ids shared with DOCS
EMBS = [
    (0, [1.0, 0.1, 0.0, 0.0]),
    (1, [0.9, 0.2, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.1, 0.0]),
    (3, [0.1, 0.9, 0.2, 0.0]),
    (4, [0.5, 0.5, 0.5, 0.0]),
    (5, [0.0, 0.0, 1.0, 0.1]),
    (6, [0.2, 0.1, 0.9, 0.3]),
    (7, [0.0, 0.0, 0.0, 1.0]),
]


@pytest.fixture(scope="module")
def small_engine(spark):
    return build_engine(spark, DOCS, ngrams=False)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.createDataFrame(
        EMBS, "vec_id long, embedding array<float>"
    )


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_fuse_golden(spark):
    # lex: a=1 b=2 ; vec: b=1 c=2  (k_rrf=60)
    lex = _ranked(spark, [(1, 1), (2, 2)])
    vec = _ranked(spark, [(2, 1), (3, 2)])
    out = rrf_fuse([lex, vec], k=10).collect()
    got = {r["doc_id"]: (r["rank_1"], r["rank_2"], r["rrf"]) for r in out}
    assert got[1] == (1, 0, pytest.approx(1 / 61))
    assert got[2] == (2, 1, pytest.approx(1 / 62 + 1 / 61))
    assert got[3] == (0, 2, pytest.approx(1 / 62))
    # doc 2 is in both lists -> must rank first
    assert [r["doc_id"] for r in out] == [2, 1, 3]


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    lex = _ranked(spark, [(7, 1), (3, 2)])
    vec = _ranked(spark, [(3, 1), (7, 2)])
    out = rrf_fuse([lex, vec], k=10).collect()
    # identical rrf (1/61 + 1/62) -> doc_id asc
    assert [r["doc_id"] for r in out] == [3, 7]
    assert out[0]["rrf"] == pytest.approx(out[1]["rrf"])


def test_rrf_fuse_three_way_and_limit(spark):
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(2, 1), (3, 2)])
    c = _ranked(spark, [(2, 1), (4, 2)])
    out = rrf_fuse([a, b, c], k=2).collect()
    assert len(out) == 2
    assert out[0]["doc_id"] == 2
    assert out[0]["rrf"] == pytest.approx(1 / 62 + 1 / 61 + 1 / 61)
    assert {c_ for c_ in out[0].asDict()} == {
        "doc_id", "rank_1", "rank_2", "rank_3", "rrf",
    }


def test_rrf_fuse_validates(spark):
    with pytest.raises(ValueError):
        rrf_fuse([], k=10)
    with pytest.raises(ValueError):
        rrf_fuse([_ranked(spark, [(1, 1)])], k_rrf=0)


def test_ranked_topn_truncates_and_ranks(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1)], "doc_id long, s double"
    )
    out = ranked_topn(df, "s", "doc_id", 3).collect()
    # score desc, doc_id asc on ties; truncated to 3
    assert [(r["doc_id"], r["rank"]) for r in out] == [(2, 1), (3, 2), (1, 3)]


def test_hybrid_topk_matches_manual_fusion(spark, small_engine, embeddings):
    qvec = [1.0, 0.0, 0.0, 0.0]
    n = 5
    lex_rows = (
        small_engine.bm25("apple banana", k=n)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    emb_rows = embeddings.collect()

    def cos(v):
        d = sum(x * y for x, y in zip(v, qvec))
        return d / (math.sqrt(sum(x * x for x in v)) *
                    math.sqrt(sum(y * y for y in qvec)))

    vec_rows = sorted(
        ((r["vec_id"], cos(r["embedding"])) for r in emb_rows),
        key=lambda t: (-t[1], t[0]),
    )[:n]
    expect = {}
    for i, r in enumerate(lex_rows, start=1):
        expect.setdefault(r["doc_id"], [0, 0])[0] = i
    for i, (vid, _) in enumerate(vec_rows, start=1):
        expect.setdefault(vid, [0, 0])[1] = i

    got = hybrid_topk(
        small_engine, embeddings, "apple banana", qvec, k=20, n_each=n
    ).collect()
    assert len(got) == len(expect)
    for r in got:
        lex_r, vec_r = expect[r["doc_id"]]
        assert (r["lex_rank"], r["vec_rank"]) == (lex_r, vec_r)
        want = (1 / (60 + lex_r) if lex_r else 0.0) + (
            1 / (60 + vec_r) if vec_r else 0.0
        )
        assert r["rrf"] == pytest.approx(want)
    # ordered by rrf desc, doc_id asc
    keys = [(-r["rrf"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_hybrid_composes_with_ann_side(spark, small_engine, embeddings):
    """The scale path: fuse BM25 with an LSH-ANN top-n instead of the
    brute cosine side. At full probe (hamming == n_planes) LSH is
    exact, so the fusion must equal hybrid_topk's brute-force result —
    proving any (id, score) retriever plugs into rrf_fuse."""
    from pyspark.sql import functions as F

    from inverted_index_spark.pipelines.similarity import (
        build_lsh,
        lsh_search,
    )

    qvec = [1.0, 0.1, 0.0, 0.0]
    n = 5
    lsh = build_lsh(embeddings, n_planes=2)
    ann = lsh_search(lsh, qvec, k=n, hamming=2)  # full probe == exact
    lex = ranked_topn(
        small_engine.bm25("apple banana", k=n).select("doc_id", "score"),
        "score", "doc_id", n,
    )
    vec = ranked_topn(ann, "cos", "vec_id", n).withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = rrf_fuse([lex, vec], k=20, id_col="doc_id").select(
        "doc_id",
        F.col("rank_1").alias("lex_rank"),
        F.col("rank_2").alias("vec_rank"),
        "rrf",
    )
    brute = hybrid_topk(
        small_engine, embeddings, "apple banana", qvec, k=20, n_each=n
    )
    got = sorted(fused.collect(), key=lambda r: r["doc_id"])
    want = sorted(brute.collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert [(r["lex_rank"], r["vec_rank"]) for r in got] == [
        (r["lex_rank"], r["vec_rank"]) for r in want
    ]


def test_engine_hybrid_delegates(spark, small_engine, embeddings):
    qvec = [0.0, 1.0, 0.0, 0.0]
    a = small_engine.hybrid("apple", embeddings, qvec, k=3).collect()
    b = hybrid_topk(small_engine, embeddings, "apple", qvec, k=3).collect()
    assert a == b


def test_normalized_topn(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 6.0), (3, 4.0), (4, 1.0)], "doc_id long, s double"
    )
    out = {r["doc_id"]: r["nscore"]
           for r in normalized_topn(df, "s", "doc_id", 3).collect()}
    # top-3 = {2:6, 3:4, 1:2}; min 2, max 6
    assert out == {2: pytest.approx(1.0), 3: pytest.approx(0.5),
                   1: pytest.approx(0.0)}
    # all-equal scores normalize to 1.0, not 0/0
    same = spark.createDataFrame([(1, 3.0), (2, 3.0)], "doc_id long, s double")
    outs = {r["doc_id"]: r["nscore"]
            for r in normalized_topn(same, "s", "doc_id", 5).collect()}
    assert outs == {1: 1.0, 2: 1.0}


def test_weighted_fuse_golden(spark):
    a = spark.createDataFrame([(1, 1.0), (2, 0.5)], "doc_id long, nscore double")
    b = spark.createDataFrame([(2, 1.0), (3, 0.25)], "doc_id long, nscore double")
    out = weighted_fuse([a, b], [0.7, 0.3], k=10).collect()
    got = {r["doc_id"]: (r["norm_1"], r["norm_2"], r["wscore"]) for r in out}
    assert got[1] == (1.0, 0.0, pytest.approx(0.7))
    assert got[2] == (0.5, 1.0, pytest.approx(0.7 * 0.5 + 0.3))
    assert got[3] == (0.0, 0.25, pytest.approx(0.3 * 0.25))
    assert [r["doc_id"] for r in out] == [1, 2, 3]  # 0.7, 0.65, 0.075


def test_weighted_fuse_validates(spark):
    a = spark.createDataFrame([(1, 1.0)], "doc_id long, nscore double")
    with pytest.raises(ValueError):
        weighted_fuse([], [])
    with pytest.raises(ValueError):
        weighted_fuse([a], [0.5, 0.5])
    with pytest.raises(ValueError):
        weighted_fuse([a], [-1.0])
    with pytest.raises(ValueError):
        hybrid_weighted_topk(None, None, "x", [1.0], alpha=1.5)


def test_hybrid_weighted_matches_manual(spark, small_engine, embeddings):
    qvec = [1.0, 0.0, 0.0, 0.0]
    n, alpha = 5, 0.6
    lex_rows = (
        small_engine.bm25("apple banana", k=n)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    ls = [r["score"] for r in lex_rows]
    lex_norm = {
        r["doc_id"]: (1.0 if max(ls) == min(ls)
                      else (r["score"] - min(ls)) / (max(ls) - min(ls)))
        for r in lex_rows
    }
    emb_rows = embeddings.collect()

    def cos(v):
        d = sum(x * y for x, y in zip(v, qvec))
        return d / (math.sqrt(sum(x * x for x in v)) *
                    math.sqrt(sum(y * y for y in qvec)))

    vec_sorted = sorted(
        ((r["vec_id"], cos(r["embedding"])) for r in emb_rows),
        key=lambda t: (-t[1], t[0]),
    )[:n]
    vs = [c for _, c in vec_sorted]
    vec_norm = {
        vid: (1.0 if max(vs) == min(vs)
              else (c - min(vs)) / (max(vs) - min(vs)))
        for vid, c in vec_sorted
    }
    got = hybrid_weighted_topk(
        small_engine, embeddings, "apple banana", qvec,
        alpha=alpha, k=20, n_each=n,
    ).collect()
    expect_ids = set(lex_norm) | set(vec_norm)
    assert {r["doc_id"] for r in got} == expect_ids
    for r in got:
        ln = lex_norm.get(r["doc_id"], 0.0)
        vn = vec_norm.get(r["doc_id"], 0.0)
        assert r["lex_norm"] == pytest.approx(ln, abs=1e-6)
        assert r["vec_norm"] == pytest.approx(vn, abs=1e-6)
        assert r["wscore"] == pytest.approx(
            alpha * ln + (1 - alpha) * vn, abs=1e-6
        )
    keys = [(-r["wscore"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)
