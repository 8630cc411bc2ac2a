"""Training-data pipeline ops: ANN recall, near-dup detection with
planted duplicates, token counting, rolling fingerprints."""

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.pipelines.dedup import near_dup_pairs, with_text_hash
from inverted_index_spark.pipelines.similarity import (
    cosine_topk,
    lsh_bucketed_topk,
    neardup_pairs_cosine,
)
from inverted_index_spark.pipelines.textstats import (
    rolling_fingerprint,
    token_counts,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_lsh_topk_recall_on_planted_neighbors(spark, embeddings):
    """LSH is an ANN method: it must retrieve genuinely-near vectors.

    The synthetic corpus is near-orthogonal noise (best cos ~0.33), so
    recall is only meaningful on planted neighbors: 5 slightly-perturbed
    copies of the query vector, all at cos > 0.999.
    """
    qvec = list(
        embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )
    planted = [
        (10000 + i, [x + (0.001 * ((i + j) % 3 - 1)) for j, x in enumerate(qvec)])
        for i in range(5)
    ]
    embs = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    )
    exact = [r["vec_id"] for r in cosine_topk(embs, qvec, k=6).collect()]
    assert set(exact) == {0, 10000, 10001, 10002, 10003, 10004}
    approx = {
        r["vec_id"] for r in lsh_bucketed_topk(embs, qvec, k=6, n_planes=8).collect()
    }
    assert 0 in approx
    assert len(approx & set(exact)) >= 5  # >= 4/5 planted neighbors found


def test_ivf_topk_recall_on_planted_neighbors(spark, embeddings):
    from inverted_index_spark.pipelines.similarity import ivf_topk

    qvec = list(
        embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )
    planted = [
        (20000 + i, [x + (0.001 * ((i + j) % 3 - 1)) for j, x in enumerate(qvec)])
        for i in range(5)
    ]
    embs = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    )
    exact = {r["vec_id"] for r in cosine_topk(embs, qvec, k=6).collect()}
    assert exact == {0, 20000, 20001, 20002, 20003, 20004}
    approx = {
        r["vec_id"]
        for r in ivf_topk(embs, qvec, k=6, n_centroids=8, n_probe=2).collect()
    }
    # near-identical vectors share the query's cell: all found
    assert approx == exact


def test_ivf_deterministic(spark, embeddings):
    from inverted_index_spark.pipelines.similarity import ivf_topk

    qvec = list(
        embeddings.filter(F.col("vec_id") == 3).select("embedding").first()[
            "embedding"
        ]
    )
    a = [r["vec_id"] for r in ivf_topk(embeddings, qvec, k=5).collect()]
    b = [r["vec_id"] for r in ivf_topk(embeddings, qvec, k=5).collect()]
    assert a == b and a[0] == 3


def test_lsh_saved_index_prunes_partitions(spark, embeddings, tmp_path):
    """A saved LshIndex is partitioned by signature; a pruned probe must
    read only the probe buckets' files, and full probe equals brute
    force exactly."""
    from inverted_index_spark.pipelines.similarity import (
        build_lsh,
        load_lsh,
        lsh_search,
        save_lsh,
    )

    path = str(tmp_path / "lsh")
    save_lsh(build_lsh(embeddings, n_planes=4), path)
    idx = load_lsh(spark, path)
    qvec = list(
        embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )
    pruned = lsh_search(idx, qvec, k=10, hamming=0)
    # hamming=0 -> the sig predicate must be a PARTITION filter (bucket
    # dirs skipped at planning time), not a post-scan row filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "sig" in pf[0]
    exact = [tuple(r) for r in cosine_topk(embeddings, qvec, k=10).collect()]
    full = [tuple(r) for r in lsh_search(idx, qvec, k=10, hamming=4).collect()]
    assert full == exact


def test_ivf_saved_index_prunes_partitions(spark, embeddings, tmp_path):
    from inverted_index_spark.pipelines.similarity import (
        build_ivf,
        ivf_search,
        load_ivf,
        save_ivf,
    )

    path = str(tmp_path / "ivf")
    save_ivf(build_ivf(embeddings, n_centroids=8), path)
    idx = load_ivf(spark, path)
    qvec = list(
        embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )
    pruned = ivf_search(idx, qvec, k=10, n_probe=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0]
    exact = [tuple(r) for r in cosine_topk(embeddings, qvec, k=10).collect()]
    full = [tuple(r) for r in ivf_search(idx, qvec, k=10, n_probe=8).collect()]
    assert full == exact


def test_knn_join_exact_matches_per_query_topk(spark, embeddings):
    """The batch exact knn_join must equal running cosine_topk once per
    query vector."""
    from inverted_index_spark.pipelines.similarity import knn_join

    qs = embeddings.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_join(qs, embeddings, k=5).collect()
    }
    for qrow in qs.collect():
        want = cosine_topk(embeddings, list(qrow["embedding"]), k=5).collect()
        for rank, r in enumerate(want, start=1):
            assert got[(qrow["vec_id"], rank)] == r["vec_id"]


def test_knn_join_exact_plan_broadcasts_queries(spark, embeddings):
    """The exact path must broadcast the query side (corpus is never
    shuffled to form pairs); the only exchange is the per-query window."""
    from inverted_index_spark.pipelines.similarity import knn_join

    qs = embeddings.filter(F.col("vec_id") < 3)
    plan = (
        knn_join(qs, embeddings, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_join_full_probe_equals_exact(spark, embeddings):
    from inverted_index_spark.pipelines.similarity import knn_join

    qs = embeddings.filter(F.col("vec_id") < 3)
    exact = sorted(tuple(r) for r in knn_join(qs, embeddings, k=5).collect())
    full = sorted(
        tuple(r)
        for r in knn_join(
            qs, embeddings, k=5, n_planes=4, hamming=4
        ).collect()
    )
    assert full == exact


def test_knn_join_pruned_probe_finds_planted_neighbors(spark, embeddings):
    """Planted perturbed copies of each query must be retrieved even at
    hamming=1 — near-identical vectors share the signature bucket."""
    from inverted_index_spark.pipelines.similarity import knn_join

    base = embeddings.filter(F.col("vec_id") < 2)
    planted = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(1.0) + F.lit(1e-4)
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(planted)
    got = knn_join(base, corpus, k=3, n_planes=4, hamming=1).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in (0, 1):
        assert qid + 100000 in by_q[qid], "planted neighbor missed"
        assert qid in by_q[qid], "query's own copy missed"


def test_neardup_cosine_finds_planted_dup(spark, embeddings):
    # plant an exact duplicate of vec 0 with a new id
    v0 = embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[
        "embedding"
    ]
    planted = spark.createDataFrame(
        [(99999, list(v0))], "vec_id long, embedding array<float>"
    )
    embs = embeddings.select("vec_id", "embedding").unionByName(planted)
    pairs = neardup_pairs_cosine(embs, threshold=0.999).collect()
    assert any(r["vec_a"] == 0 and r["vec_b"] == 99999 for r in pairs)


def test_minhash_neardup_finds_planted_dup(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different words about spark shuffles here"),
        ],
        ["doc_id", "text"],
    )
    pairs = near_dup_pairs(docs, num_hashes=8, rows_per_band=2, k=3, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_near_dup_clusters_transitive_closure(spark):
    """a~b and b~c must land in ONE cluster even though (a,c) was never
    emitted as a pair; cluster_id is the component min; keep marks it."""
    from inverted_index_spark.pipelines.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dup_clusters(pairs).collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        10: (10, True),
        11: (10, False),
    }


def test_near_dup_clusters_converges_on_long_chain(spark):
    """A diameter-5 chain needs several label-propagation rounds; the
    loop must iterate to convergence, not stop after one pass."""
    from inverted_index_spark.pipelines.dedup import near_dup_clusters

    chain = [(i, i + 1) for i in range(1, 7)]  # 1-2-3-4-5-6-7
    got = near_dup_clusters(
        spark.createDataFrame(chain, ["doc_a", "doc_b"])
    ).collect()
    assert {r["cluster_id"] for r in got} == {1}
    assert sorted(r["doc_id"] for r in got) == list(range(1, 8))
    assert [r["doc_id"] for r in got if r["keep"]] == [1]


def test_near_dup_clusters_random_graphs_match_union_find(spark):
    """Property check: on seeded random pair graphs the distributed
    min-label propagation must equal a pure-Python union-find."""
    import random

    from inverted_index_spark.pipelines.dedup import near_dup_clusters

    for seed in (7, 21, 99):
        rnd = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rnd.sample(range(n), 2)))
                for _ in range(rnd.randint(10, 80))
            }
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        want = {
            v: min(u for u in touched if find(u) == find(v)) for v in touched
        }
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(
                spark.createDataFrame(edges, ["doc_a", "doc_b"])
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_near_dup_clusters_end_to_end_planted(spark):
    """Planted triple: A~B and B~C pair up but A,C may not; the cluster
    step must still put all three in one component."""
    from inverted_index_spark.pipelines.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "a quick brown fox jumps over the lazy dog tonight"),
            (9, "completely different words about spark shuffles here"),
        ],
        ["doc_id", "text"],
    )
    pairs = near_dup_pairs(docs, num_hashes=8, rows_per_band=2, k=3, threshold=0.5)
    got = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
    assert got.get(1) == got.get(2) == got.get(3) == 1
    assert 9 not in got  # no pair -> trivially its own cluster, not emitted


def test_lsh_bucket_cap_drops_mega_bucket_keeps_other_pairs(spark):
    """30 identical docs form one >cap bucket in EVERY band: with the
    cap their quadratic pair set is suppressed, while a distinct
    near-dup pair in small buckets is still found."""
    from inverted_index_spark.pipelines.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "same boilerplate license header text repeated verbatim")
            for i in range(100, 130)]
    rows += [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    sigs = minhash_signatures(
        spark.createDataFrame(rows, ["doc_id", "text"]), num_hashes=8, k=2
    )
    capped = lsh_candidate_pairs(
        sigs, num_hashes=8, rows_per_band=2, max_bucket_size=10
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (1, 2) in got
    assert not any(a >= 100 for a, _ in got)  # mega-bucket suppressed
    uncapped = lsh_candidate_pairs(sigs, num_hashes=8, rows_per_band=2).count()
    assert uncapped >= 30 * 29 // 2  # without the cap it IS quadratic


def test_near_dup_clusters_priority_picks_best_copy(spark):
    """With a priority table the keeper is the cluster's max-priority
    doc (ties -> lowest doc_id), not the min doc_id."""
    from inverted_index_spark.pipelines.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"])
    prio = spark.createDataFrame(
        [(1, 1.0), (2, 9.0), (3, 9.0), (11, 5.0)],  # 10 missing -> sorts last
        ["doc_id", "priority"],
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in near_dup_clusters(pairs, priority=prio).collect()
    }
    assert got == {
        1: (1, False),
        2: (1, True),   # max priority, tie with 3 -> lower doc_id
        3: (1, False),
        10: (10, False),  # missing priority sorts below 11's 5.0
        11: (10, True),
    }


def test_dedup_corpus_end_to_end(spark):
    """Exact dups collapse to the lowest id, near-dup clusters keep one
    representative, unique docs pass through with all columns."""
    from inverted_index_spark.pipelines.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup of 1
            (3, "the quick brown fox jumps over the lazy dog today"),
            (4, "the quick brown fox jumps over the lazy dog tonight"),  # near dup of 3
            (5, "completely different words about spark shuffles here"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_corpus(
            docs, num_hashes=8, rows_per_band=2, k=3, threshold=0.5
        ).collect()
    )
    assert kept == [1, 3, 5]


def test_incremental_neardup_matches_from_scratch(spark, tmp_path):
    """Batch dedup against a saved bucket index must return exactly the
    from-scratch pairs that involve >= 1 new doc."""
    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        incremental_near_dup_pairs,
        save_dedup_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "dix")
    save_dedup_index(
        build_dedup_index(old, num_hashes=8, rows_per_band=2, k=2),
        path, num_hashes=8, rows_per_band=2, k=2,
    )
    got = {
        tuple(r)
        for r in incremental_near_dup_pairs(
            spark, path, new, old, threshold=0.2
        ).collect()
    }
    full = near_dup_pairs(docs, num_hashes=8, rows_per_band=2, k=2, threshold=0.2)
    want = {
        tuple(r)
        for r in full.collect()
        if r["doc_a"] % 5 == 0 or r["doc_b"] % 5 == 0
    }
    assert got == want and len(got) > 0


def test_incremental_neardup_prunes_bucket_partitions(spark, tmp_path):
    """The saved bucket table read must carry a bp partition filter so a
    small batch opens only the prefixes it touches."""
    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        incremental_near_dup_pairs,
        save_dedup_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") >= 3)
    new = docs.filter(F.col("doc_id") < 3)
    path = str(tmp_path / "dix")
    save_dedup_index(
        build_dedup_index(old, num_hashes=8, rows_per_band=2, k=2),
        path, num_hashes=8, rows_per_band=2, k=2,
    )
    pairs = incremental_near_dup_pairs(spark, path, new, old, threshold=0.2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln and "bp" in ln]
    assert pf, "bucket read must prune on the bp partition column"


def test_incremental_neardup_stale_index_is_safe(spark, tmp_path):
    """Bucket rows for deleted/updated docs must never produce wrong
    pairs: the verify recomputes from the CURRENT doc table, so a
    deleted doc yields no pair and an updated doc is verified against
    its new text."""
    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        incremental_near_dup_pairs,
        save_dedup_index,
    )

    old = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about spark shuffles here"),
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "dix")
    save_dedup_index(
        build_dedup_index(old, num_hashes=8, rows_per_band=2, k=2),
        path, num_hashes=8, rows_per_band=2, k=2,
    )
    # doc 1 deleted, doc 2 rewritten to something unrelated — the index
    # still holds both docs' ORIGINAL bucket rows (stale)
    current = spark.createDataFrame(
        [(2, "now entirely rewritten content with zero fox overlap")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    pairs = incremental_near_dup_pairs(
        spark, path, new, current, threshold=0.3
    ).collect()
    docs_in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert 1 not in docs_in_pairs  # deleted doc cannot pair
    assert 2 not in docs_in_pairs  # updated doc verified vs NEW text


def test_extend_dedup_index_replay_idempotent(spark, tmp_path):
    """Re-extending with the same batch id overwrites that batch's own
    dir: row set unchanged, later batches see identical state."""
    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        extend_dedup_index,
        save_dedup_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    path = str(tmp_path / "dix")
    save_dedup_index(
        build_dedup_index(old, num_hashes=8, rows_per_band=2, k=2),
        path, num_hashes=8, rows_per_band=2, k=2,
    )
    extend_dedup_index(b1, path, batch="b1")
    once = {tuple(r) for r in spark.read.parquet(f"{path}/buckets").collect()}
    extend_dedup_index(b1, path, batch="b1")  # replay
    twice = {tuple(r) for r in spark.read.parquet(f"{path}/buckets").collect()}
    assert once == twice
    assert any(r for r in once if r[-2] == "b1" or "b1" in map(str, r))


def test_near_dup_candidate_only_verify_matches_full_verify(spark):
    """The candidate-only Jaccard verify must return exactly what the
    (non-scalable) corpus-wide verify + candidate semi-join returns."""
    from inverted_index_spark.pipelines.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fast = near_dup_pairs(docs, num_hashes=8, rows_per_band=2, k=2, threshold=0.2)
    sigs = minhash_signatures(docs, num_hashes=8, k=2)
    cands = lsh_candidate_pairs(sigs, num_hashes=8, rows_per_band=2)
    slow = ngram_jaccard_pairs(docs, k=2, threshold=0.2).join(
        cands, ["doc_a", "doc_b"], "left_semi"
    )
    got = {tuple(r) for r in fast.collect()}
    want = {tuple(r) for r in slow.collect()}
    assert got == want and len(got) > 0


def test_near_dup_plan_has_no_corpus_shingle_self_join(spark):
    """The physical plan must not contain the shingle-table self-join on
    shingle equality over non-candidate docs: every join above the
    shingle explode is either the band-bucket join or candidate-pruned
    (preceded by a LeftSemi against candidate doc ids)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # near_dup_pairs checkpoints its intermediates (cands, sh_c), which
    # truncates the visible lineage — neutralize localCheckpoint so the
    # WHOLE logical plan, including the subtrees that normally run
    # inside checkpoint materialization, is inspectable
    from unittest import mock

    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4; runtime objects override the method)
    with mock.patch.object(
        type(docs), "localCheckpoint", lambda self, *a, **k: self
    ):
        plan = (
            near_dup_pairs(docs, num_hashes=8, rows_per_band=2, k=2)
            ._jdf.queryExecution()
            .toString()
        )
    # the full-verify shape joined shingles-to-shingles with a doc_id <
    # doc_id condition and NO semi-join prune; candidate-only shape
    # always prunes the shingle table first
    assert "LeftSemi" in plan


def test_simhash_pairs_blocking_equals_brute_force(spark):
    """Pigeonhole band-blocking must lose NOTHING: the blocked pair set
    equals brute-force popcount over all pairs."""
    from inverted_index_spark.pipelines.dedup import simhash, simhash_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    got = {tuple(r) for r in simhash_pairs(docs, bits=32, max_hamming=8).collect()}
    fps = simhash(docs, bits=32)
    fa = fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"))
    fb = fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"))
    brute = {
        tuple(r)
        for r in fa.crossJoin(fb)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= 8)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    }
    assert got == brute and len(got) > 0


def test_simhash_pairs_planted_near_dup(spark):
    from inverted_index_spark.pipelines.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different words about spark shuffles here"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs, max_hamming=6).collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_ngram_contamination_and_decontaminate(spark):
    from inverted_index_spark.pipelines.corpus import (
        decontaminate,
        ngram_contamination,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally clean document with none of the benchmark text inside"),
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(100, "prefix words then alpha beta gamma delta epsilon zeta eta theta suffix")],
        ["doc_id", "text"],
    )
    hits = {r["doc_id"]: r["n_hits"] for r in ngram_contamination(train, evals, n=8).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits
    clean = [r["doc_id"] for r in decontaminate(train, evals, n=8).collect()]
    assert clean == [2]


def test_bloom_contamination_superset_and_merge(spark):
    """Bloom flags must be a SUPERSET of the exact hits (one-sided
    error), deterministic, and mergeable across eval shards (Bloom
    union == bit OR == distinct set-bit union)."""
    import pytest as _pytest

    from inverted_index_spark.pipelines.corpus import (
        bloom_contamination,
        ngram_contamination,
    )

    train = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    evals = train.filter("doc_id < 6")
    exact = {
        r["doc_id"]
        for r in ngram_contamination(train, evals, n=8).collect()
    }
    out = bloom_contamination(
        train, evals, n=8, m_bits=4096, k_hashes=3
    ).collect()
    flagged = {r["doc_id"] for r in out if r["contaminated"]}
    assert exact <= flagged, "Bloom missed a true hit (impossible)"
    # every train doc has a decision row
    assert {r["doc_id"] for r in out} == {
        r["doc_id"] for r in train.select("doc_id").collect()
    }
    for r in out:
        assert r["contaminated"] == (r["n_flagged"] > 0)
        assert 0 <= r["n_flagged"] <= r["n_grams"]
    # a generous filter has no false positives on this corpus scale
    big = bloom_contamination(
        train, evals, n=8, m_bits=1 << 20, k_hashes=4
    ).collect()
    assert {r["doc_id"] for r in big if r["contaminated"]} == exact
    # mergeability: filter built from eval split A union split B ==
    # filter built from the whole eval set
    a = evals.filter("doc_id % 2 = 0")
    b = evals.filter("doc_id % 2 = 1")
    whole = sorted(
        map(tuple, bloom_contamination(train, evals, n=8).collect())
    )
    merged = sorted(
        map(tuple, bloom_contamination(train, a.union(b), n=8).collect())
    )
    assert whole == merged
    with _pytest.raises(ValueError):
        bloom_contamination(train, evals, m_bits=1)
    with _pytest.raises(ValueError):
        bloom_contamination(train, evals, k_hashes=0)
    # a doc shorter than n tokens has no shingles but still gets its
    # decision row: n_grams = 0, never contaminated
    short = spark.createDataFrame(
        [(9001, "too short"), (9002, " ".join(f"w{i}" for i in range(12)))],
        ["doc_id", "text"],
    )
    srows = {
        r["doc_id"]: r
        for r in bloom_contamination(short, evals, n=8).collect()
    }
    assert set(srows) == {9001, 9002}
    assert srows[9001]["n_grams"] == 0
    assert srows[9001]["contaminated"] is False


def test_group_sample_n_exact_and_deterministic(spark):
    import hashlib

    from inverted_index_spark.pipelines.corpus import group_sample_n

    docs = spark.createDataFrame(
        [(i, "big" if i < 400 else "small") for i in range(410)],
        ["doc_id", "g"],
    )
    out = group_sample_n(docs, "g", n=25).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    # exact n from the big group; the 10-doc group returns whole
    assert len(by_g["big"]) == 25
    assert len(by_g["small"]) == 10
    assert [r["rank"] for r in by_g["small"]] == list(range(1, 11))
    # selection = the n smallest md5 uniforms (pure python recompute)
    def u(doc_id):
        return int(
            hashlib.md5(f"fts|{doc_id}".encode()).hexdigest()[:8], 16
        ) / 2**32

    want_big = sorted(range(400), key=lambda d: (u(d), d))[:25]
    got_big = [r["doc_id"] for r in sorted(by_g["big"], key=lambda r: r["rank"])]
    assert got_big == want_big
    # layout-independent
    again = group_sample_n(docs.repartition(13), "g", n=25).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_sample_n(docs, "g", n=0)
    with _pytest.raises(ValueError):
        group_sample_n(docs, "g", n=5, oversample=0.5)


def test_domain_stats_hand_golden(spark):
    from inverted_index_spark.pipelines.textstats import domain_stats

    docs = spark.createDataFrame(
        [
            (1, "see http://A.com/x and https://a.com/y plus http://b.org/z"),
            (2, "again http://a.com/q only"),
            (3, "no urls at all"),
            (4, "scheme-less www.c.net is not matched http://C.net/ok"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["domain"]: (r["n_docs"], r["n_urls"]) for r in domain_stats(docs).collect()}
    # hosts lowercase; n_docs distinct-doc counts; n_urls occurrences
    assert rows == {
        "a.com": (2, 3),
        "b.org": (1, 1),
        "c.net": (1, 1),
    }


def test_corpus_split_deterministic_and_proportional(spark):
    from inverted_index_spark.pipelines.corpus import corpus_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = {r["doc_id"]: r["split"] for r in corpus_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs.repartition(13)).collect()
    }
    assert a == b, "split must not depend on partition layout"
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert 0.8 * n <= c["train"] <= 0.97 * n  # 0.9 nominal, 500 docs
    # different seed -> different assignment (overwhelmingly)
    d = {r["doc_id"]: r["split"] for r in corpus_split(docs, seed="other").collect()}
    assert d != a


def test_exact_dup_rank(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["dup_rank"] for r in with_text_hash(docs).collect()}
    assert rows == {1: 0, 2: 1, 3: 0}


def test_token_counts(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a1b2, x! 12345")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert rows[1]["ws_tokens"] == 2
    # "a1b2, x! 12345" ws: 3. bpe pieces: a,1,b,2,",", " x","!", " ",123,45
    assert rows[2]["ws_tokens"] == 3
    assert rows[2]["bpe_tokens"] > rows[2]["ws_tokens"]


def test_repetition_flags_repeated_ngrams(spark):
    from inverted_index_spark.pipelines.textstats import repetition

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # one shingle repeated
            (2, "every word here is different okay"),      # all distinct
            (3, "ab"),                                      # shorter than k
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition(docs, k=3).collect()}
    assert got[1]["n_shingles"] == 4
    assert got[1]["dup_shingle_ratio"] == 0.75   # 1 distinct of 4
    assert got[1]["top_shingle_ratio"] == 1.0
    assert got[2]["dup_shingle_ratio"] == 0.0
    assert got[3]["n_shingles"] == 0 and got[3]["top_shingle_ratio"] == 0.0


def test_pattern_counts(spark):
    from inverted_index_spark.pipelines.textstats import pattern_counts

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.com or visit https://x.io/p?q=1 room 42"),
            (2, "no patterns at all in this text"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pattern_counts(docs).collect()}
    assert got[1]["n_emails"] == 1
    assert got[1]["n_urls"] == 1
    assert got[1]["n_digit_runs"] == 2  # "1" in the url query + "42"
    assert got[2]["n_emails"] == got[2]["n_urls"] == got[2]["n_digit_runs"] == 0


def test_rolling_fingerprint_matches_pure_python(spark):
    import hashlib

    def expected(text, window=8):
        toks = text.split(" ")
        if len(toks) < window:
            return hashlib.md5(text.encode()).hexdigest()
        return min(
            hashlib.md5(" ".join(toks[i : i + window]).encode()).hexdigest()
            for i in range(len(toks) - window + 1)
        )

    texts = {
        1: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        2: "prefix w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        3: "just three words",  # shorter than window -> whole-text hash
        4: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",  # exact dup of 1
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    fps = {r["doc_id"]: r["fp"] for r in rolling_fingerprint(docs, window=8).collect()}
    assert fps == {i: expected(t) for i, t in texts.items()}
    assert fps[1] == fps[4]  # exact duplicates always collide


def test_jaccard_df_cap_exact_for_pairs_sharing_rare_shingles(spark):
    """max_shingle_df prunes candidate generation only: pairs that share
    at least one sub-cap shingle get EXACT jaccard values, identical to
    the uncapped path."""
    from inverted_index_spark.pipelines.dedup import ngram_jaccard_pairs

    stop = "the quick brown"  # shared by everyone -> df above cap
    docs = spark.createDataFrame(
        [
            (1, f"{stop} alpha beta gamma"),
            (2, f"{stop} alpha beta delta"),
            (3, f"{stop} zeta eta theta"),
            (4, f"{stop} zeta eta theta"),
        ],
        ["doc_id", "text"],
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=2, threshold=0.2).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, k=2, threshold=0.2, max_shingle_df=3
        ).collect()
    }
    # capped is a subset with EXACT values (verification is uncapped)
    assert capped == {k: full[k] for k in capped}
    # pairs sharing a rare shingle always survive the cap
    assert (1, 2) in capped and (3, 4) in capped and capped[(3, 4)] == 1.0
    # pairs sharing ONLY stopword shingles are the (low-jaccard) ones
    # the cap prunes; at a real threshold both paths agree exactly
    full_hi = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k=2, threshold=0.5).collect()
    }
    capped_hi = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, k=2, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    assert capped_hi == full_hi


def test_ivf_centroids_survive_adversarial_partition_order(spark, embeddings):
    """Regression (round-3): the k-means sample must be a real Bernoulli
    sample, not the first rows in partition order. Adversarial input: a
    single repartition(1) + sort puts 2048+ near-identical vectors
    first; first-N sampling would fit every centroid on that one blob
    and recall on the rest of the space would collapse."""
    import numpy as np

    from inverted_index_spark.pipelines.similarity import (
        _kmeans_centroids,
        ivf_topk,
    )

    qvec = list(
        embeddings.filter(F.col("vec_id") == 7).select("embedding").first()[
            "embedding"
        ]
    )
    dim = len(qvec)
    # 300 near-identical "blob" vectors with ids sorting FIRST: the
    # old first-N "sample" (sample=256) would consist of blob ONLY
    blob = [
        (-(i + 1), [1.0 + 0.0001 * ((i + j) % 5) for j in range(dim)])
        for i in range(300)
    ]
    embs = (
        embeddings.select("vec_id", "embedding")
        .unionByName(
            spark.createDataFrame(blob, "vec_id long, embedding array<float>")
        )
        .repartition(1)
        .sortWithinPartitions("vec_id")  # blob occupies the head
    )
    cent = _kmeans_centroids(embs, n_centroids=8, vec_col="embedding", sample=256)
    # centroids must not all collapse onto the blob direction (the blob
    # is ~37% of rows: most centroids must describe the other 63%)
    blob_dir = np.ones(dim) / np.sqrt(dim)
    sims = cent @ blob_dir
    assert (sims < 0.95).sum() >= 4, sims
    # and a probe for a non-blob vector still finds it
    got = [
        r["vec_id"]
        for r in ivf_topk(embs, qvec, k=3, n_centroids=8, n_probe=2).collect()
    ]
    assert got[0] == 7


def test_normalize_text_rules(spark):
    """NFC composition, control strip, EXPLICIT-ASCII whitespace
    collapse (U+00A0 must survive — Python \\s would eat it, RE2/Java
    \\s would not; the explicit class is the dialect-stable subset),
    trim, null passthrough, and the form whitelist."""
    import pytest

    from inverted_index_spark.pipelines.textstats import normalize_text

    rows = [
        (0, "été\t\tok"),   # combining acute -> composed é
        (1, "  a\x01b\x00c  "),          # control bytes stripped
        (2, None),
        (3, "x   y"),               # NBSP is NOT ASCII whitespace
        (4, "a\r\nb\fc\x0bd"),           # all five ASCII ws chars
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"] for r in normalize_text(df).collect()
    }
    assert got[0] == "été ok"
    assert got[1] == "abc"
    assert got[2] is None
    assert got[3] == "x   y"
    assert got[4] == "a b c d"
    # NFKC folds compatibility chars that NFC preserves
    fi = spark.createDataFrame([(0, "ﬁsh")], "doc_id long, text string")
    assert normalize_text(fi).collect()[0]["text"] == "ﬁsh"
    assert normalize_text(fi, form="NFKC").collect()[0]["text"] == "fish"
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


class TestStratifiedSample:
    def _docs(self, spark):
        rows = [(i, f"doc {i}", ["en", "de", "fr"][i % 3]) for i in range(300)]
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    def test_matches_md5_recompute_and_is_nested(self, spark):
        import hashlib

        from inverted_index_spark.pipelines.corpus import stratified_sample

        docs = self._docs(spark)

        def u(doc_id, seed="fts"):
            h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8]
            return int(h, 16) / 2**32

        rates = {"en": 1.0, "de": 0.3}
        got = {r["doc_id"] for r in
               stratified_sample(docs, "lang", rates).collect()}
        want = {
            i for i in range(300)
            if u(i) < rates.get(["en", "de", "fr"][i % 3], 0.0)
        }
        assert got == want
        # nested: the 0.3 sample is a subset of the 0.5 sample (same seed)
        bigger = {r["doc_id"] for r in
                  stratified_sample(docs, "lang", {"de": 0.5}).collect()}
        smaller = {r["doc_id"] for r in
                   stratified_sample(docs, "lang", {"de": 0.3}).collect()}
        assert smaller <= bigger
        # default_rate catches unlisted strata
        dflt = {r["doc_id"] for r in
                stratified_sample(docs, "lang", {}, default_rate=1.0).collect()}
        assert dflt == set(range(300))

    def test_layout_independent(self, spark):
        from inverted_index_spark.pipelines.corpus import stratified_sample

        docs = self._docs(spark)
        a = {r["doc_id"] for r in
             stratified_sample(docs, "lang", {"en": 0.4}).collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs.repartition(7), "lang", {"en": 0.4}).collect()}
        assert a == b

    def test_validation(self, spark):
        import pytest

        from inverted_index_spark.pipelines.corpus import stratified_sample

        docs = self._docs(spark)
        with pytest.raises(ValueError):
            stratified_sample(docs, "lang", {"en": 1.5})
        with pytest.raises(ValueError):
            stratified_sample(docs, "lang", {}, default_rate=-0.1)


class TestPackSequences:
    def _docs(self, spark):
        # deterministic pseudo-random lengths incl. one over-budget doc
        rows = [(i, (i * 37 % 90) + 1) for i in range(200)]
        rows[50] = (50, 512)  # longer than any budget below
        return spark.createDataFrame(rows, ["doc_id", "n_tokens"]), dict(rows)

    def test_matches_python_prefix_sum(self, spark):
        from inverted_index_spark.pipelines.corpus import pack_sequences

        docs, lens = self._docs(spark)
        budget = 256
        got = {
            r["doc_id"]: (r["seq_id"], r["seq_off"])
            for r in pack_sequences(docs, budget).collect()
        }
        cum = 0
        for i in range(200):
            assert got[i] == (cum // budget, cum % budget), i
            cum += lens[i]
        # seq_off always inside the budget
        assert all(0 <= off < budget for _, off in got.values())

    def test_layout_independent_and_columns_kept(self, spark):
        from inverted_index_spark.pipelines.corpus import pack_sequences

        docs, _ = self._docs(spark)
        a = sorted(
            (r["doc_id"], r["seq_id"], r["seq_off"])
            for r in pack_sequences(docs, 128).collect()
        )
        b = sorted(
            (r["doc_id"], r["seq_id"], r["seq_off"])
            for r in pack_sequences(
                docs.repartition(9), 128, num_partitions=3
            ).collect()
        )
        assert a == b
        out = pack_sequences(docs, 128)
        assert set(out.columns) == {"doc_id", "n_tokens", "seq_id", "seq_off"}

    def test_validation(self, spark):
        import pytest

        from inverted_index_spark.pipelines.corpus import pack_sequences

        docs, _ = self._docs(spark)
        with pytest.raises(ValueError):
            pack_sequences(docs, 0)


class TestStemFilter:
    def test_spark_matches_python_twin_randomized(self, spark):
        import random

        from inverted_index_spark.pipelines.textstats import (
            stem_filter,
            stem_query_text,
        )

        rng = random.Random(7)
        stems = ["pon", "quer", "tabl", "glas", "focu", "tre", "t", "go",
                 "runner", "batch", "index", "merg", "a", "the", "u", "s"]
        sufs = ["", "s", "es", "ies", "ss", "us", "aes", "ees", "oes",
                "eies", "aies", "y"]
        rows = []
        for i in range(120):
            n = rng.randint(1, 12)
            words = [rng.choice(stems) + rng.choice(sufs) for _ in range(n)]
            if rng.random() < 0.3:
                words[rng.randrange(n)] = words[rng.randrange(n)].upper()
            rows.append((i, " ".join(words)))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r["text"] for r in stem_filter(df).collect()}
        for d, t in rows:
            assert got[d] == stem_query_text(t), (t, got[d])

    def test_stopwords_and_flags(self, spark):
        from inverted_index_spark.pipelines.textstats import stem_filter

        df = spark.createDataFrame(
            [(0, "the tables are fast queries")], ["doc_id", "text"]
        )
        assert stem_filter(df).collect()[0]["text"] == "table fast query"
        # stem=False: stopword drop only
        assert (
            stem_filter(df, stem=False).collect()[0]["text"]
            == "tables fast queries"
        )
        # custom stopword list
        assert (
            stem_filter(df, stopwords=["fast"], stem=False).collect()[0]["text"]
            == "the tables are queries"
        )
        # empty stopword list keeps everything
        assert (
            stem_filter(df, stopwords=[], stem=False).collect()[0]["text"]
            == "the tables are fast queries"
        )

    def test_end_to_end_plural_conflation(self, spark):
        """Index the stemmed corpus; a stemmed query matches plural
        and singular variants alike."""
        from tests.conftest import build_engine

        from inverted_index_spark.pipelines.textstats import (
            stem_filter,
            stem_query_text,
        )

        rows = [(0, "fast tables win"), (1, "a fast table wins"),
                (2, "slow index loses")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        stemmed = [(r["doc_id"], r["text"]) for r in stem_filter(df).collect()]
        eng = build_engine(spark, stemmed, ngrams=False)
        q = stem_query_text("fast tables")
        got = {r["doc_id"] for r in eng.bm25(q, k=10).collect()}
        assert got == {0, 1}
