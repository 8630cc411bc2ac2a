"""Round-4 late additions: line-level corpus dedup, unigram-LM
perplexity scoring, and per-bucket top_hits."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import build_engine


class TestLineDedup:
    def test_boilerplate_lines_removed(self, spark):
        from inverted_index_spark.pipelines.dedup import line_dedup

        docs = spark.createDataFrame(
            [
                (1, "cookie banner\nreal content one\nfooter text"),
                (2, "cookie banner\nreal content two\nfooter text"),
                (3, "unique intro\nreal content three"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in line_dedup(docs, min_docs=2).collect()
        }
        assert out[1]["text"] == "real content one"
        assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
        assert out[2]["text"] == "real content two"
        assert out[3]["text"] == "unique intro\nreal content three"
        assert out[3]["n_removed"] == 0

    def test_plan_construction_runs_no_spark_job(self, spark):
        """line_dedup/span_dedup internally localCheckpoint a shared
        working table; with eager=False that must not launch a Spark
        job until the caller runs an action (ADVICE r4: merely
        building a never-used DataFrame used to trigger a job)."""
        from inverted_index_spark.pipelines.dedup import (
            line_dedup,
            span_dedup,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
            ["doc_id", "text"],
        )
        sc = spark.sparkContext
        group = "no-job-at-construction"
        sc.setJobGroup(group, "plan construction only")
        try:
            ld = line_dedup(docs, min_docs=2)
            sd = span_dedup(docs, window=4)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            assert jobs == [], (
                f"plan construction launched Spark jobs {jobs}"
            )
        finally:
            sc.setJobGroup("", "")
        # the frames still work when acted on
        assert ld.count() == 2 and sd.count() == 2

    def test_all_lines_removed_yields_empty_doc(self, spark):
        from inverted_index_spark.pipelines.dedup import line_dedup

        docs = spark.createDataFrame(
            [(1, "same\nsame2"), (2, "same\nsame2")], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert out[1]["text"] == "" and out[1]["n_removed"] == 2
        assert out[2]["text"] == "" and out[2]["n_lines"] == 2

    def test_repeats_within_one_doc_do_not_count(self, spark):
        from inverted_index_spark.pipelines.dedup import line_dedup

        # 'dup' appears 3x but only in doc 1 -> distinct-doc count is 1
        docs = spark.createDataFrame(
            [(1, "dup\ndup\ndup\nkeep"), (2, "other")], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
        assert out[1]["text"] == "dup\ndup\ndup\nkeep"
        assert out[1]["n_removed"] == 0

    def test_order_preserved_and_min_docs(self, spark):
        from inverted_index_spark.pipelines.dedup import line_dedup

        docs = spark.createDataFrame(
            [
                (1, "b\na\nb\nc"),
                (2, "b\nz"),
                (3, "b\ny"),
            ],
            ["doc_id", "text"],
        )
        # b occurs in 3 docs; min_docs=4 keeps everything
        out4 = {r["doc_id"]: r for r in line_dedup(docs, min_docs=4).collect()}
        assert out4[1]["text"] == "b\na\nb\nc"
        # min_docs=3 drops every b, preserving the order of survivors
        out3 = {r["doc_id"]: r for r in line_dedup(docs, min_docs=3).collect()}
        assert out3[1]["text"] == "a\nc" and out3[1]["n_removed"] == 2

    def test_min_docs_validation(self, spark):
        from inverted_index_spark.pipelines.dedup import line_dedup

        with pytest.raises(ValueError):
            line_dedup(spark.range(1).withColumn("text", F.lit("x")), min_docs=1)


class TestLmScore:
    def test_matches_hand_computed_model(self, spark):
        from inverted_index_spark.pipelines.textstats import lm_score

        rows = [(1, "a a b"), (2, "b c")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in lm_score(docs, alpha=0.5).collect()}

        # python oracle
        toks = {d: t.split(" ") for d, t in rows}
        from collections import Counter

        c = Counter(t for ts in toks.values() for t in ts)
        big_t, v = sum(c.values()), len(c)
        logp = {t: math.log((n + 0.5) / (big_t + 0.5 * v)) for t, n in c.items()}
        for d, ts in toks.items():
            ce = -sum(logp[t] for t in ts) / len(ts)
            assert out[d]["n_tokens"] == len(ts)
            assert out[d]["cross_entropy"] == pytest.approx(ce, rel=1e-12)
            assert out[d]["perplexity"] == pytest.approx(math.exp(ce), rel=1e-12)

    def test_common_tokens_score_lower_entropy(self, spark):
        from inverted_index_spark.pipelines.textstats import lm_score

        docs = spark.createDataFrame(
            [(i, "the the the") for i in range(5)] + [(99, "zxq wvu tsr")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r["cross_entropy"] for r in lm_score(docs).collect()}
        assert out[0] < out[99]

    def test_broadcast_flag_equivalent(self, spark):
        from inverted_index_spark.pipelines.textstats import lm_score

        docs = spark.createDataFrame(
            [(i, f"w{i % 3} w{i % 5} common") for i in range(20)],
            ["doc_id", "text"],
        )
        a = sorted(lm_score(docs, broadcast_vocab=True).collect())
        b = sorted(lm_score(docs, broadcast_vocab=False).collect())
        # join strategy changes float summation order -> last-ulp only
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert (ra["doc_id"], ra["n_tokens"]) == (rb["doc_id"], rb["n_tokens"])
            assert ra["cross_entropy"] == pytest.approx(
                rb["cross_entropy"], rel=1e-12
            )


class TestFacetTopHits:
    @pytest.fixture(scope="class")
    def eng(self, spark):
        return build_engine(
            spark,
            [
                (1, "merge sort fast"),
                (2, "merge merge merge"),
                (3, "merge join"),
                (4, "sort only here"),
                (5, "merge scan"),
            ],
            ngrams=False,
        )

    def test_per_bucket_topk(self, spark, eng):
        meta = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
            ["doc_id", "role"],
        )
        rows = eng.facet_top_hits("merge", meta, "role", k=2).collect()
        by_bucket = {}
        for r in rows:
            by_bucket.setdefault(r["role"], []).append(r)
        # bucket a: docs 1,2 both match; bucket b: 3,5 match (4 doesn't)
        assert [r["rank"] for r in by_bucket["a"]] == [1, 2]
        assert {r["doc_id"] for r in by_bucket["a"]} == {1, 2}
        assert {r["doc_id"] for r in by_bucket["b"]} == {3, 5}
        # ranks follow score desc within the bucket; scores agree with bm25
        full = {r["doc_id"]: r["score"] for r in eng.bm25("merge", k=None).collect()}
        for rs in by_bucket.values():
            scores = [r["score"] for r in rs]
            assert scores == sorted(scores, reverse=True)
            for r in rs:
                assert r["score"] == pytest.approx(full[r["doc_id"]])

    def test_k_truncates_buckets(self, spark, eng):
        meta = spark.createDataFrame(
            [(i, "x") for i in (1, 2, 3, 5)], ["doc_id", "role"]
        )
        rows = eng.facet_top_hits("merge", meta, "role", k=3).collect()
        assert len(rows) == 3 and [r["rank"] for r in rows] == [1, 2, 3]

    def test_validation(self, spark, eng):
        meta = spark.createDataFrame([(1, "x")], ["doc_id", "role"])
        with pytest.raises(ValueError):
            eng.facet_top_hits("merge", meta, "nope")
        with pytest.raises(ValueError):
            eng.facet_top_hits("merge", meta, "role", k=0)
        # doc_id passes the membership check but would build a
        # duplicate-column frame with an ambiguous window partition —
        # must be a clear ValueError, not a late AnalysisException
        with pytest.raises(ValueError, match="doc_id"):
            eng.facet_top_hits("merge", meta, "doc_id")


class TestKmeans:
    def _numpy_oracle(self, rows, k, iters, seed="fts"):
        import hashlib

        import numpy as np

        ids = [r[0] for r in rows]
        x = np.array([r[1] for r in rows], dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        ranked = sorted(
            range(len(ids)),
            key=lambda i: (
                hashlib.md5(f"{seed}|{ids[i]}".encode()).hexdigest(),
                ids[i],
            ),
        )
        cent = x[ranked[:k]].copy()
        for _ in range(iters):
            sims = x @ cent.T
            # first (lowest) cell wins ties, matching the Spark fold
            assign = sims.argmax(axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cent[c] = m / max(np.linalg.norm(m), 1e-12)
        sims = x @ cent.T
        return cent, {ids[i]: int(sims[i].argmax()) for i in range(len(ids))}

    def test_matches_numpy_lloyd(self, spark):
        import numpy as np

        from inverted_index_spark.pipelines.similarity import kmeans

        rng = np.random.default_rng(7)
        # three well-separated blobs in 8-d
        base = rng.normal(size=(3, 8)) * 5
        rows = [
            (i, (base[i % 3] + rng.normal(scale=0.1, size=8)).tolist())
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cent, assigned = kmeans(df, k=3, iters=3)
        want_cent, want_assign = self._numpy_oracle(rows, k=3, iters=3)
        got = {r["vid"]: r["cell"] for r in assigned.collect()}
        assert got == want_assign
        assert np.allclose(np.array(cent), want_cent, atol=1e-9)
        # Lloyd did real work: assignments use >1 cell and two vectors
        # from the same tight blob never straddle more cells than the
        # numpy oracle says (bit-identical partition, already asserted)
        assert len(set(got.values())) > 1

    def test_deterministic_and_layout_independent(self, spark):
        import numpy as np

        from inverted_index_spark.pipelines.similarity import kmeans

        rng = np.random.default_rng(11)
        rows = [(i, rng.normal(size=4).tolist()) for i in range(30)]
        df1 = spark.createDataFrame(rows, ["vec_id", "embedding"])
        df2 = spark.createDataFrame(
            list(reversed(rows)), ["vec_id", "embedding"]
        ).repartition(7)
        c1, a1 = kmeans(df1, k=2, iters=2)
        c2, a2 = kmeans(df2, k=2, iters=2)
        assert np.allclose(np.array(c1), np.array(c2), atol=1e-12)
        assert sorted(map(tuple, a1.select("vid", "cell").collect())) == sorted(
            map(tuple, a2.select("vid", "cell").collect())
        )

    def test_feeds_ivf(self, spark):
        import numpy as np

        from inverted_index_spark.pipelines.similarity import build_ivf, kmeans

        rng = np.random.default_rng(3)
        rows = [(i, rng.normal(size=4).tolist()) for i in range(20)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cent, _ = kmeans(df, k=2, iters=1)
        idx = build_ivf(df, centroids=cent)
        assert [list(c) for c in idx.centroids] == cent
        assert idx.assigned.count() == 20

    def test_validation(self, spark):
        from inverted_index_spark.pipelines.similarity import kmeans

        df = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
        with pytest.raises(ValueError):
            kmeans(df, k=0)
        with pytest.raises(ValueError):
            kmeans(df, k=1, iters=0)


class TestRedact:
    def test_each_pattern_and_order(self, spark):
        from inverted_index_spark.pipelines.textstats import redact

        docs = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@corp.example.org now"),
                (2, "see https://ex.com/a?b=c#d and more"),
                (3, "call 5551234567 or 123 ok"),
                # email inside a URL must become <URL>, not <EMAIL>
                (4, "ftp http://user@host.com/p q"),
                (5, "clean text stays identical"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r["text"] for r in redact(docs).collect()}
        assert out[1] == "mail <EMAIL> now"
        assert out[2] == "see <URL> and more"
        assert out[3] == "call <NUM> or 123 ok"
        assert out[4] == "ftp <URL> q"
        assert out[5] == "clean text stays identical"

    def test_other_columns_untouched(self, spark):
        from inverted_index_spark.pipelines.textstats import redact

        docs = spark.createDataFrame(
            [(1, "a@b.co", "keep")], ["doc_id", "text", "extra"]
        )
        row = redact(docs).collect()[0]
        assert row["extra"] == "keep" and row["text"] == "<EMAIL>"


class TestHashedTfidf:
    def test_matches_hand_model(self, spark):
        import hashlib

        from inverted_index_spark.pipelines.textstats import hashed_tfidf

        rows = [(1, "a a b"), (2, "b c"), (3, "c c c")]
        dim = 16
        out = {
            (r["doc_id"], r["bucket"]): r["w"]
            for r in hashed_tfidf(
                spark.createDataFrame(rows, ["doc_id", "text"]), dim=dim
            ).collect()
        }

        def b(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

        from collections import Counter
        tf = {d: Counter(b(t) for t in txt.split(" ")) for d, txt in rows}
        df = Counter()
        for d in tf:
            for bk in tf[d]:
                df[bk] += 1
        n = 3
        want = {}
        for d in tf:
            for bk, f in tf[d].items():
                want[(d, bk)] = f * (math.log((n + 1) / (df[bk] + 1)) + 1)
        assert set(out) == set(want)
        for key in want:
            assert out[key] == pytest.approx(want[key], rel=1e-12)

    def test_collisions_pool(self, spark):
        from inverted_index_spark.pipelines.textstats import hashed_tfidf

        # dim=1 forces every term into bucket 0: tf pools, df_b = N
        rows = hashed_tfidf(
            spark.createDataFrame([(1, "x y z"), (2, "q")], ["doc_id", "text"]),
            dim=1,
        ).collect()
        got = {(r["doc_id"], r["bucket"]): r["w"] for r in rows}
        # w = tf * (ln((2+1)/(2+1)) + 1) = tf
        assert got[(1, 0)] == pytest.approx(3.0)
        assert got[(2, 0)] == pytest.approx(1.0)

    def test_validation(self, spark):
        from inverted_index_spark.pipelines.textstats import hashed_tfidf

        with pytest.raises(ValueError):
            hashed_tfidf(
                spark.createDataFrame([(1, "a")], ["doc_id", "text"]), dim=0
            )


class TestTfidfKmeansComposition:
    def test_text_clustering_pipeline(self, spark):
        """hashed_tfidf long form repacks to dense vectors that kmeans
        consumes directly — the corpus-mixture-analysis composition."""
        from inverted_index_spark.pipelines.similarity import kmeans
        from inverted_index_spark.pipelines.textstats import hashed_tfidf

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(6)]
            + [(i, "delta epsilon zeta") for i in range(6, 12)],
            ["doc_id", "text"],
        )
        dim = 32
        vec = hashed_tfidf(docs, dim=dim)
        dense = vec.groupBy("doc_id").agg(
            F.aggregate(
                F.collect_list(F.struct("bucket", "w")),
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, s: F.transform(
                    acc,
                    lambda v, i: F.when(
                        i.cast("bigint") == s["bucket"], v + s["w"]
                    ).otherwise(v),
                ),
            ).alias("embedding")
        ).withColumnRenamed("doc_id", "vec_id")
        cent, assigned = kmeans(dense, k=2, iters=2)
        got = {r["vid"]: r["cell"] for r in assigned.collect()}
        # identical texts -> identical vectors -> one cell per text group
        assert len({got[i] for i in range(6)}) == 1
        assert len({got[i] for i in range(6, 12)}) == 1
        assert got[0] != got[6]


class TestLineDedupRandomized:
    def test_matches_python_oracle_on_random_corpus(self, spark):
        """Randomized parity: line_dedup == a pure-Python reimplementation
        over a corpus engineered to contain cross-doc duplicate lines,
        in-doc repeats, all-dup docs and unique docs."""
        import random

        from inverted_index_spark.pipelines.dedup import line_dedup

        rng = random.Random(42)
        pool = [f"line {i}" for i in range(12)]  # small pool -> collisions
        rows = []
        for d in range(40):
            n = rng.randint(1, 6)
            rows.append((d, "\n".join(rng.choice(pool) for _ in range(n))))
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        for min_docs in (2, 3, 10):
            got = {
                r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
                for r in line_dedup(docs, min_docs=min_docs).collect()
            }
            # python oracle
            from collections import defaultdict

            docs_per_line = defaultdict(set)
            for d, t in rows:
                for ln in t.split("\n"):
                    docs_per_line[ln].add(d)
            dup = {l for l, ds in docs_per_line.items() if len(ds) >= min_docs}
            want = {}
            for d, t in rows:
                lines = t.split("\n")
                kept = [l for l in lines if l not in dup]
                want[d] = ("\n".join(kept), len(lines), len(lines) - len(kept))
            assert got == want


class TestLmScoreRandomized:
    def test_matches_python_oracle_on_random_corpus(self, spark):
        import math
        import random
        from collections import Counter

        from inverted_index_spark.pipelines.textstats import lm_score

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
            for d in range(60)
        ]
        out = {
            r["doc_id"]: r
            for r in lm_score(
                spark.createDataFrame(rows, ["doc_id", "text"]), alpha=0.25
            ).collect()
        }
        c = Counter(t for _, txt in rows for t in txt.split(" "))
        big_t, v = sum(c.values()), len(c)
        logp = {
            t: math.log((n + 0.25) / (big_t + 0.25 * v)) for t, n in c.items()
        }
        for d, txt in rows:
            ts = txt.split(" ")
            ce = -sum(logp[t] for t in ts) / len(ts)
            assert out[d]["n_tokens"] == len(ts)
            assert out[d]["cross_entropy"] == pytest.approx(ce, rel=1e-9)

    def test_alpha_validation(self, spark):
        from inverted_index_spark.pipelines.textstats import lm_score

        with pytest.raises(ValueError):
            lm_score(
                spark.createDataFrame([(1, "a")], ["doc_id", "text"]),
                alpha=0.0,
            )


class TestKmeansEdgeCases:
    def test_empty_corpus_raises(self, spark):
        from inverted_index_spark.pipelines.similarity import kmeans

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="non-empty"):
            kmeans(empty, k=2)

    def test_fewer_vectors_than_k(self, spark):
        from inverted_index_spark.pipelines.similarity import kmeans

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
        )
        cent, assigned = kmeans(df, k=5, iters=1)
        # effective k = n; centroid list length is authoritative
        assert len(cent) == 2
        assert assigned.count() == 2


class TestNewOpPlans:
    """Plan pins for the scale-critical shapes of the late ops."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_lm_score_model_join_is_broadcast(self, spark):
        from inverted_index_spark.pipelines.textstats import lm_score

        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(10)], ["doc_id", "text"]
        )
        plan = self._plan(lm_score(docs))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_hashed_tfidf_weight_join_is_broadcast(self, spark):
        from inverted_index_spark.pipelines.textstats import hashed_tfidf

        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(10)], ["doc_id", "text"]
        )
        plan = self._plan(hashed_tfidf(docs, dim=8))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_kmeans_assignment_pass_is_shuffle_free(self, spark):
        """The per-iteration assignment (centroids as literals, argmax
        fold) must be a narrow map over the vector scan — any Exchange
        here would shuffle the corpus once per Lloyd iteration."""
        from pyspark.sql import functions as F

        from inverted_index_spark.pipelines import similarity as S

        emb = spark.createDataFrame(
            [(i, [float(i % 3), 1.0]) for i in range(10)],
            ["vec_id", "embedding"],
        )
        normed = (
            emb.select(
                F.col("vec_id").alias("vid"),
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("_dv"),
            )
            .select(
                "vid",
                "_dv",
                F.greatest(S._norm(F.col("_dv")), F.lit(1e-12)).alias("_nv"),
            )
            .select(
                "vid",
                F.transform(F.col("_dv"), lambda x: x / F.col("_nv")).alias(
                    "v"
                ),
            )
        )
        cents = [[1.0, 0.0], [0.0, 1.0]]
        best_sim, best_idx = None, None
        for i, c in enumerate(cents):
            p = F.array(*[F.lit(float(x)) for x in c])
            sim = S._dot(F.col("v"), p)
            if best_sim is None:
                best_sim, best_idx = sim, F.lit(i)
            else:
                best_idx = F.when(sim > best_sim, F.lit(i)).otherwise(best_idx)
                best_sim = F.greatest(sim, best_sim)
        assigned = normed.select("vid", best_idx.alias("cell"))
        plan = self._plan(assigned)
        assert "Exchange" not in plan


class TestSpanDedup:
    def _oracle(self, rows, window):
        """Pure-Python window-granular ExactSubstr reimplementation."""
        from collections import defaultdict

        occ = defaultdict(list)  # span text -> [(doc, pos)]
        toks = {d: t.split(" ") for d, t in rows}
        for d, ts in toks.items():
            for p in range(len(ts) - window + 1):
                occ[" ".join(ts[p : p + window])].append((d, p))
        masked = defaultdict(set)
        for span, os_ in occ.items():
            if len(os_) >= 2:
                canon = min(os_)
                for d, p in os_:
                    if (d, p) != canon:
                        masked[d].update(range(p, p + window))
        out = {}
        for d, ts in toks.items():
            kept = [t for i, t in enumerate(ts) if i not in masked[d]]
            out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
        return out

    def test_planted_repeated_span(self, spark):
        from inverted_index_spark.pipelines.dedup import span_dedup

        header = "this software is provided as is without any warranty"
        rows = [
            (d, f"unique{d}a unique{d}b unique{d}c {header} tail{d}")
            for d in range(5)
        ]
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
            for r in span_dedup(
                spark.createDataFrame(rows, ["doc_id", "text"]), window=4
            ).collect()
        }
        want = self._oracle(rows, 4)
        assert got == want
        # the canonical doc keeps its header; the others lose it
        assert header in got[0][0]
        for d in range(1, 5):
            assert header not in got[d][0]
            assert got[d][2] > 0

    def test_random_corpus_matches_oracle(self, spark):
        import random

        from inverted_index_spark.pipelines.dedup import span_dedup

        rng = random.Random(13)
        vocab = [f"t{i}" for i in range(8)]  # tiny vocab -> real dups
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
            for d in range(30)
        ]
        for window in (2, 3):
            got = {
                r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
                for r in span_dedup(
                    spark.createDataFrame(rows, ["doc_id", "text"]),
                    window=window,
                ).collect()
            }
            assert got == self._oracle(rows, window)

    def test_short_docs_untouched_and_validation(self, spark):
        import pytest

        from inverted_index_spark.pipelines.dedup import span_dedup

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], ["doc_id", "text"]
        )
        # window=3 > doc length: no windows, nothing removed
        out = {r["doc_id"]: r for r in span_dedup(docs, window=3).collect()}
        assert out[1]["text"] == "a b" and out[1]["n_removed"] == 0
        with pytest.raises(ValueError):
            span_dedup(docs, window=1)


class TestSpanDedupMax:
    """dup_spans / span_dedup_max: duplicate windows coalesced into
    maximal spans (gaps-and-islands), ExactSubstr's removed-region
    granularity."""

    def _mask_oracle(self, rows, window):
        """Per-doc masked-token-index set, reusing TestSpanDedup's
        canonical-min semantics."""
        from collections import defaultdict

        occ = defaultdict(list)
        toks = {d: t.split(" ") for d, t in rows}
        for d, ts in toks.items():
            for p in range(len(ts) - window + 1):
                occ[" ".join(ts[p : p + window])].append((d, p))
        masked = defaultdict(set)
        for span, os_ in occ.items():
            if len(os_) >= 2:
                canon = min(os_)
                for d, p in os_:
                    if (d, p) != canon:
                        masked[d].update(range(p, p + window))
        return masked

    @staticmethod
    def _runs(idx_set):
        """Maximal runs of consecutive indices -> [(start, end)]."""
        runs, cur = [], None
        for i in sorted(idx_set):
            if cur is None or i > cur[1] + 1:
                if cur:
                    runs.append(tuple(cur))
                cur = [i, i]
            else:
                cur[1] = i
        if cur:
            runs.append(tuple(cur))
        return runs

    def test_planted_region_is_one_span(self, spark):
        from inverted_index_spark.pipelines.dedup import dup_spans

        header = "this software is provided as is without any warranty ok"
        rows = [
            (d, f"u{d}a u{d}b {header} tail{d}") for d in range(4)
        ]
        spans = dup_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), window=4
        ).collect()
        # canonical doc 0 keeps its header; docs 1-3 each report ONE
        # maximal span covering exactly the 10 header tokens
        by_doc = {}
        for r in spans:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 not in by_doc
        for d in (1, 2, 3):
            (s,) = by_doc[d]
            assert (s["span_start"], s["span_end"]) == (2, 11)
            assert s["span_len"] == 10 and s["n_windows"] == 7

    def test_matches_span_dedup_and_mask_oracle(self, spark):
        import random

        from inverted_index_spark.pipelines.dedup import (
            dup_spans,
            span_dedup,
            span_dedup_max,
        )

        rng = random.Random(29)
        vocab = [f"t{i}" for i in range(8)]
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
            for d in range(30)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        for window in (2, 3):
            masked = self._mask_oracle(rows, window)
            # span table == maximal consecutive runs of the masked set
            want = {
                (d, s, e)
                for d, m in masked.items()
                for s, e in self._runs(m)
                if m
            }
            got_rows = dup_spans(docs, window=window).collect()
            got = {
                (r["doc_id"], r["span_start"], r["span_end"])
                for r in got_rows
            }
            assert got == want
            # property: spans per doc are disjoint with a gap >= 1
            per_doc = {}
            for r in got_rows:
                per_doc.setdefault(r["doc_id"], []).append(
                    (r["span_start"], r["span_end"])
                )
            for sp in per_doc.values():
                sp.sort()
                for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
                    assert s2 > e1 + 1
            # span-driven rebuild == window-union rebuild, plus n_spans
            a = {
                r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
                for r in span_dedup(docs, window=window).collect()
            }
            b = {}
            for r in span_dedup_max(docs, window=window).collect():
                b[r["doc_id"]] = (r["text"], r["n_tokens"], r["n_removed"])
                assert r["n_spans"] == len(per_doc.get(r["doc_id"], []))
            assert a == b

    def test_no_window_straddle_residue(self, spark):
        """Every duplicate (non-canonical) window occurrence must lie
        WHOLLY inside one reported maximal span — no duplicated run of
        length >= window survives outside the span table."""
        import random

        from inverted_index_spark.pipelines.dedup import dup_spans

        rng = random.Random(31)
        vocab = [f"t{i}" for i in range(6)]
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 20))))
            for d in range(25)
        ]
        window = 3
        masked = self._mask_oracle(rows, window)
        spans = {}
        for r in dup_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), window=window
        ).collect():
            spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        # recompute the raw dup occurrences from the oracle's mask
        # membership: a masked window start p means tokens p..p+w-1 are
        # all masked, and some span must contain the whole range
        for d, m in masked.items():
            for s, e in self._runs(m):
                assert any(
                    ss <= s and e <= se for ss, se in spans.get(d, [])
                ), f"doc {d} run ({s},{e}) not covered"

    def test_validation(self, spark):
        import pytest

        from inverted_index_spark.pipelines.dedup import (
            dup_spans,
            span_dedup_max,
        )

        docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            dup_spans(docs, window=1)
        with pytest.raises(ValueError):
            span_dedup_max(docs, window=0)
        # no dups at all: empty span table, doc untouched, n_spans=0
        assert dup_spans(docs, window=2).count() == 0
        out = span_dedup_max(docs, window=2).collect()[0]
        assert out["text"] == "a b" and out["n_spans"] == 0


class TestTemperatureMix:
    def test_matches_hand_formula_and_feeds_sampler(self, spark):
        from inverted_index_spark.pipelines.corpus import (
            stratified_sample,
            temperature_mix,
        )

        docs = spark.createDataFrame(
            [(i, "en" if i < 80 else ("de" if i < 95 else "fr"))
             for i in range(100)],
            ["doc_id", "lang"],
        )
        out = {r["lang"]: r for r in temperature_mix(docs, "lang", 0.5).collect()}
        import math

        n = {"en": 80, "de": 15, "fr": 5}
        z = sum(v ** 0.5 for v in n.values())
        for lang, cnt in n.items():
            w = cnt ** 0.5 / z
            assert out[lang]["n_docs"] == cnt
            assert out[lang]["weight"] == pytest.approx(w, rel=1e-12)
            assert out[lang]["rate"] == pytest.approx(
                min(1.0, w * 100 / cnt), rel=1e-12
            )
        # low-resource groups upsampled relative to natural share
        assert out["fr"]["weight"] > 5 / 100
        assert out["en"]["weight"] < 80 / 100
        # rates feed the deterministic sampler directly
        rates = {r["lang"]: r["rate"] for r in
                 temperature_mix(docs, "lang", 0.5).collect()}
        sampled = stratified_sample(docs, "lang", rates)
        assert 0 < sampled.count() <= 100

    def test_alpha_extremes(self, spark):
        from inverted_index_spark.pipelines.corpus import temperature_mix

        docs = spark.createDataFrame(
            [(i, "a" if i < 9 else "b") for i in range(10)],
            ["doc_id", "lang"],
        )
        nat = {r["lang"]: r["weight"]
               for r in temperature_mix(docs, "lang", 1.0).collect()}
        assert nat["a"] == pytest.approx(0.9) and nat["b"] == pytest.approx(0.1)
        uni = {r["lang"]: r["weight"]
               for r in temperature_mix(docs, "lang", 0.0).collect()}
        assert uni["a"] == pytest.approx(0.5) and uni["b"] == pytest.approx(0.5)
        with pytest.raises(ValueError):
            temperature_mix(docs, "lang", -0.1)
