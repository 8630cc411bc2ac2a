"""Transcript corpus generation + stable doc-id assignment."""

from pyspark.sql import functions as F

from inverted_index_spark.transcripts import (
    assign_doc_ids,
    synthetic_transcripts,
    transcript_docs,
    transcripts_from_documents,
)


def test_synthetic_shape_and_determinism(spark):
    a = synthetic_transcripts(spark, n_conversations=20, turns_per_conv=4, seed=7)
    b = synthetic_transcripts(spark, n_conversations=20, turns_per_conv=4, seed=7)
    assert a.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict(a.dtypes)["turn_idx"] == "int"
    assert dict(a.dtypes)["ts"] == "timestamp"
    assert a.count() == 80
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # different seed -> different text
    c = synthetic_transcripts(spark, n_conversations=20, turns_per_conv=4, seed=8)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_doc_ids_dense_and_ordered(spark):
    tr = synthetic_transcripts(spark, n_conversations=30, turns_per_conv=5, seed=1)
    docs = assign_doc_ids(tr, num_partitions=7)
    rows = docs.select("doc_id", "conv_id", "turn_idx").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(150))
    # doc_id order == (conv_id, turn_idx) lexicographic order
    by_key = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["doc_id"] for r in by_key] == list(range(150))


def test_doc_ids_stable_across_partitioning(spark):
    tr = synthetic_transcripts(spark, n_conversations=25, turns_per_conv=4, seed=3)
    a = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(tr, num_partitions=3).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in assign_doc_ids(tr.repartition(13), num_partitions=11).collect()
    }
    assert a == b


def test_transcripts_from_documents_roundtrip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    tr = transcripts_from_documents(docs, turns_per_conv=8)
    assert tr.count() == docs.count()
    out = transcript_docs(tr)
    # reassigned ids reproduce the original dense ordering, texts intact
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out.collect():
        assert orig[r["doc_id"]] == r["text"]


def test_recency_boosted_topk_matches_manual(spark):
    """function_score recency decay: final = bm25 * 0.5^(age_h/hl),
    unclamped (future turns boost above 1), checked against a manual
    recomputation from the engine's own undecayed scores."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from inverted_index_spark.transcripts import recency_boosted_topk
    from tests.conftest import build_engine

    docs = [
        (0, "apple banana"),
        (1, "apple apple"),
        (2, "banana cherry apple"),
        (3, "cherry tart"),
    ]
    eng = build_engine(spark, docs, ngrams=False)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = 1735689600  # 2025-01-01 00:00:00 UTC
    # doc i is i days old relative to `now`
    meta = spark.createDataFrame(
        [(d, base - d * 86400) for d, _ in docs], "doc_id long, e long"
    ).select("doc_id", F.timestamp_seconds("e").alias("ts"))
    now = "2025-01-01 00:00:00"
    hl = 24.0
    got = recency_boosted_topk(
        eng, meta, "apple banana", now, half_life_hours=hl, k=10
    ).collect()
    undecayed = {
        r["doc_id"]: r["score"]
        for r in eng.bm25("apple banana", k=None).collect()
    }
    assert {r["doc_id"] for r in got} == set(undecayed)
    for r in got:
        age_h = r["doc_id"] * 24.0
        assert r["decayed"] == pytest.approx(
            undecayed[r["doc_id"]] * 0.5 ** (age_h / hl), rel=1e-12
        )
    keys = [(-r["decayed"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)
    # a future turn (negative age) must boost above its raw score
    fut = spark.createDataFrame(
        [(d, base + 86400) for d, _ in docs], "doc_id long, e long"
    ).select("doc_id", F.timestamp_seconds("e").alias("ts"))
    boosted = recency_boosted_topk(eng, fut, "apple", now, 24.0, k=10).collect()
    for r in boosted:
        assert r["decayed"] == pytest.approx(2.0 * r["score"], rel=1e-12)
    with pytest.raises(ValueError):
        recency_boosted_topk(eng, meta, "apple", now, half_life_hours=0)


class TestConversationHaving:
    DOCS = [
        # conv 0
        (0, "alpha beta"), (1, "gamma delta"), (2, "beta beta"), (3, "zeta"),
        # conv 1
        (4, "alpha"), (5, "beta"), (6, "epsilon"), (7, "zeta"),
        # conv 2
        (8, "beta"), (9, "alpha"), (10, "delta"), (11, "epsilon"),
        # conv 3
        (12, "zeta"), (13, "zeta"), (14, "alpha beta"), (15, "gamma"),
    ]
    ROLES = ["user", "assistant", "system", "tool"]

    def _setup(self, spark):
        from tests.conftest import build_engine

        eng = build_engine(spark, self.DOCS, ngrams=False)
        conv_map = spark.createDataFrame(
            [(d, f"c{d // 4}", self.ROLES[d % 4]) for d, _ in self.DOCS],
            ["doc_id", "conv_id", "role"],
        )
        return eng, conv_map

    def _brute(self, must, must_not=()):
        def members(term, role):
            return {
                f"c{d // 4}"
                for d, text in self.DOCS
                if term in text.split()
                and (role is None or self.ROLES[d % 4] == role)
            }

        convs = members(*must[0])
        for m in must[1:]:
            convs &= members(*m)
        for m in must_not:
            convs -= members(*m)
        return sorted(convs)

    def test_matches_brute_force(self, spark):
        from inverted_index_spark.transcripts import conversation_having

        eng, conv_map = self._setup(spark)
        cases = [
            ([("alpha", None)], []),
            ([("alpha", "user")], []),                 # doc_id % 4 == 0
            ([("alpha", None), ("gamma", None)], []),
            ([("alpha", None)], [("gamma", None)]),
            ([("beta", "assistant"), ("alpha", "user")], [("zeta", "user")]),
        ]
        for must, must_not in cases:
            got = [
                r["conv_id"]
                for r in conversation_having(
                    eng,
                    conv_map,
                    [(t, r) if r else t for t, r in must],
                    [(t, r) if r else t for t, r in must_not] or None,
                ).collect()
            ]
            assert got == self._brute(must, must_not), (must, must_not)

    def test_string_clauses_and_compound_ast(self, spark):
        from inverted_index_spark.qast import And, Match
        from inverted_index_spark.transcripts import conversation_having

        eng, conv_map = self._setup(spark)
        # a clause may itself be compound: a TURN matching alpha AND beta
        got = [
            r["conv_id"]
            for r in conversation_having(
                eng, conv_map, [And(Match("alpha"), Match("beta"))]
            ).collect()
        ]
        want = sorted(
            {f"c{d // 4}" for d, text in self.DOCS
             if {"alpha", "beta"} <= set(text.split())}
        )
        assert got == want
        # string clauses parse through the query language
        got2 = [
            r["conv_id"]
            for r in conversation_having(
                eng, conv_map, ["alpha AND beta"]
            ).collect()
        ]
        assert got2 == want

    def test_validation(self, spark):
        import pytest

        from inverted_index_spark.transcripts import conversation_having

        eng, conv_map = self._setup(spark)
        with pytest.raises(ValueError, match="at least one"):
            conversation_having(eng, conv_map, [])
        with pytest.raises(ValueError, match="role"):
            conversation_having(
                eng, conv_map.drop("role"), [("alpha", "user")]
            )
