"""Randomized mutation-interleaving fuzz: the saved-index lifecycle
(upsert -> compact -> segment build/refresh, in ANY order) must keep
the engine answer-identical to the pure-Python oracle after EVERY step.

The round-2 advice bug class (upsert -> compact -> upsert overwriting a
live commit dir) was an interleaving bug; the individual flows each had
green tests. This fuzz executes random op sequences and re-checks full
query parity (doc sets, byte positions, scores, rank order) after each
mutation, with the engine routing freely between the relational
generation-view and the segment paths as freshness flips."""

import random

import pytest

from inverted_index_spark.build import build_and_save, load_index
from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.qast import And, AtLeast, Match, Near, Phrase, Prefix
from inverted_index_spark.query import FtsEngine

WORDS = [
    "scan", "merge", "join", "filter", "window", "stream", "batch",
    "İstanbul", "mixé", "sort", "group",
]


def _text(rng):
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8)))


def _check(spark, path, mirror, rng, label):
    oracle = OracleIndex()
    for doc_id in sorted(mirror):
        oracle.add(doc_id, mirror[doc_id])
    idx = load_index(spark, path)
    eng = FtsEngine(idx)
    t1, t2 = rng.choice(WORDS).lower(), rng.choice(WORDS).lower()
    for q in [
        Match(t1),
        And(Match(t1), Match(t2)),
        Phrase(f"{t1} {t2}"),
        Prefix(t1[:2]),
        Near(f"{t1} {t2}", rng.randint(1, 3)),
        AtLeast(2, Match(t1), Match(t2), Phrase(f"{t1} {t2}")),
    ]:
        expect = [
            (r.doc_id, [tuple(p) for p in r.positions], round(r.score, 5))
            for r in oracle.query(q)
        ]
        got = [
            (
                r["doc_id"],
                [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                round(r["score"], 5),
            )
            for r in eng.results(q).collect()
        ]
        assert got == expect, f"{label}: {q} diverged"


@pytest.mark.parametrize("seed", [3, 11])
def test_random_mutation_interleavings(spark, tmp_path, seed):
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.upsert import compact_index, upsert_saved

    rng = random.Random(seed)
    path = str(tmp_path / "idx")
    mirror = {i: _text(rng) for i in range(24)}
    docs = spark.createDataFrame(
        sorted(mirror.items()), "doc_id long, text string"
    )
    build_and_save(spark, docs, path, ngrams=True, term_buckets=4)
    _check(spark, path, mirror, rng, "initial")

    next_id = len(mirror)
    ops = ["upsert", "upsert", "segments", "upsert", "compact", "refresh",
           "delete", "delete"]
    rng.shuffle(ops)
    for step, op in enumerate(ops):
        if op == "delete":
            from inverted_index_spark.upsert import delete_saved

            victims = rng.sample(sorted(mirror), min(2, len(mirror)))
            for d in victims:
                del mirror[d]
            delete_saved(
                spark,
                path,
                spark.createDataFrame([(int(d),) for d in victims],
                                      "doc_id long"),
            )
        elif op == "upsert":
            changed = {}
            for _ in range(rng.randint(1, 3)):
                if rng.random() < 0.5 and mirror:
                    doc_id = rng.choice(sorted(mirror))
                else:
                    doc_id, next_id = next_id, next_id + 1
                changed[doc_id] = _text(rng)
            mirror.update(changed)
            upsert_saved(
                spark,
                path,
                spark.createDataFrame(
                    sorted(changed.items()), "doc_id long, text string"
                ),
            )
        elif op == "compact":
            compact_index(spark, path)
        elif op == "segments":
            build_segments(
                spark, load_index(spark, path), path,
                shard_docs=8, block_docs=4, positions=True,
            )
        elif op == "refresh":
            import os

            from inverted_index_spark.segments import (
                MANIFEST_NAME,
                refresh_segments,
            )

            # a real maintenance job refreshes only if segments exist;
            # refresh-before-any-build raises by documented contract
            if os.path.exists(os.path.join(path, MANIFEST_NAME)):
                refresh_segments(spark, load_index(spark, path), path)
            else:
                with pytest.raises(FileNotFoundError):
                    refresh_segments(spark, load_index(spark, path), path)
        _check(spark, path, mirror, rng, f"step {step}: {op}")


@pytest.mark.parametrize("seed", [5])
def test_random_interleavings_with_streaming(spark, tmp_path, seed):
    """Streaming appends interleaved with batch upserts, stream/batch
    compaction and segment maintenance: the merged live view
    (refresh_index = base + generations + un-compacted stream deltas)
    must stay oracle-identical after every op. Streamed docs use 43-bit
    hash ids (disjoint from the small batch ids by construction — the
    deployment convention that makes mixing the two sound)."""
    import os

    from inverted_index_spark.segments import (
        MANIFEST_NAME,
        build_segments,
        refresh_segments,
    )
    from inverted_index_spark.streaming import (
        append_batch,
        compact_stream,
        refresh_index,
        streaming_doc_id,
    )
    from inverted_index_spark.upsert import compact_index, upsert_saved

    rng = random.Random(seed)
    path = str(tmp_path / "idx")
    mirror = {i: _text(rng) for i in range(16)}
    docs = spark.createDataFrame(
        sorted(mirror.items()), "doc_id long, text string"
    )
    build_and_save(spark, docs, path, ngrams=True, term_buckets=4)

    def check(label):
        oracle = OracleIndex()
        for doc_id in sorted(mirror):
            oracle.add(doc_id, mirror[doc_id])
        eng = FtsEngine(refresh_index(spark, path))
        t1, t2 = rng.choice(WORDS).lower(), rng.choice(WORDS).lower()
        for q in [Match(t1), And(Match(t1), Match(t2)), Phrase(f"{t1} {t2}")]:
            expect = [
                (r.doc_id, [tuple(p) for p in r.positions],
                 round(r.score, 5))
                for r in oracle.query(q)
            ]
            got = [
                (
                    r["doc_id"],
                    [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
                    round(r["score"], 5),
                )
                for r in eng.results(q).collect()
            ]
            assert got == expect, f"{label}: {q} diverged"

    check("initial")
    next_id, next_conv, batch_id = len(mirror), 0, 0
    ops = ["stream", "upsert", "segments", "stream", "compact_stream",
           "upsert", "compact", "refresh", "delete"]
    rng.shuffle(ops)
    for step, op in enumerate(ops):
        if op == "delete":
            # streamed (43-bit hash) ids are deletable too: delete_saved
            # folds uncompacted stream deltas first so the tombstone
            # supersedes them
            from inverted_index_spark.upsert import delete_saved

            victims = rng.sample(sorted(mirror), min(2, len(mirror)))
            for d in victims:
                del mirror[d]
            delete_saved(
                spark,
                path,
                spark.createDataFrame([(int(d),) for d in victims],
                                      "doc_id long"),
            )
        elif op == "upsert":
            changed = {}
            for _ in range(rng.randint(1, 2)):
                if rng.random() < 0.5:
                    doc_id = rng.choice(
                        [d for d in mirror if d < 10_000] or [next_id]
                    )
                else:
                    doc_id, next_id = next_id, next_id + 1
                changed[doc_id] = _text(rng)
            mirror.update(changed)
            upsert_saved(
                spark, path,
                spark.createDataFrame(
                    sorted(changed.items()), "doc_id long, text string"
                ),
            )
        elif op == "stream":
            rows = []
            for _ in range(rng.randint(1, 2)):
                conv, next_conv = f"fuzzconv-{next_conv}", next_conv + 1
                for t in range(rng.randint(1, 2)):
                    rows.append((conv, t, _text(rng)))
            batch = spark.createDataFrame(
                rows, "conv_id string, turn_idx int, text string"
            )
            for r in batch.withColumn(
                "doc_id", streaming_doc_id()
            ).collect():
                mirror[r["doc_id"]] = r["text"]
            append_batch(path, ngrams=True)(batch, batch_id)
            batch_id += 1
        elif op == "compact_stream":
            if os.path.isdir(os.path.join(path, "stream_delta")):
                compact_stream(spark, path)
        elif op == "segments":
            build_segments(
                spark, refresh_index(spark, path), path,
                shard_docs=8, block_docs=4, positions=True,
            )
        elif op == "compact":
            compact_index(spark, path)
        elif op == "refresh":
            if os.path.exists(os.path.join(path, MANIFEST_NAME)):
                refresh_segments(spark, load_index(spark, path), path)
        check(f"step {step}: {op}")


@pytest.mark.parametrize("seed", [7])
def test_time_travel_random_interleavings(spark, tmp_path, seed, monkeypatch):
    """Time-travel contract under random mutation interleavings: for
    EVERY commit version the history produced, a pin either reproduces
    exactly the corpus state as of that commit (doc sets, positions,
    scores — scores exercise the pinned-docstats n_docs/avgdl
    derivation) or raises the loud expired-snapshot ValueError. Never
    wrong rows, never a deep missing-path crash. Expiry must happen
    exactly when the snapshot depends on delta generations
    (@delta_gen > 0) that a LATER compaction folded."""
    from inverted_index_spark import commitio
    from inverted_index_spark.upsert import (
        compact_index,
        delete_saved,
        upsert_saved,
    )

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    cat = commitio.DeltaLogCatalog()
    prev = commitio.set_catalog(cat)
    try:
        rng = random.Random(seed)
        path = str(tmp_path / "ttidx")
        mirror = {i: _text(rng) for i in range(16)}
        docs = spark.createDataFrame(
            sorted(mirror.items()), "doc_id long, text string"
        )
        build_and_save(spark, docs, path, ngrams=False)

        # (version, mirror-at-version, index of the op that made it)
        history = []
        compact_steps = []
        ops = ["upsert", "upsert", "delete", "compact", "upsert",
               "delete", "compact", "upsert"]
        rng.shuffle(ops)
        next_id = len(mirror)
        for step, op in enumerate(ops):
            if op == "compact":
                compact_index(spark, path)
                compact_steps.append(step)
            elif op == "delete":
                victims = rng.sample(sorted(mirror), min(2, len(mirror)))
                for d in victims:
                    del mirror[d]
                delete_saved(
                    spark, path,
                    spark.createDataFrame(
                        [(int(d),) for d in victims], "doc_id long"
                    ),
                )
            else:
                changed = {}
                for _ in range(rng.randint(1, 3)):
                    if rng.random() < 0.5 and mirror:
                        doc_id = rng.choice(sorted(mirror))
                    else:
                        doc_id, next_id = next_id, next_id + 1
                    changed[doc_id] = _text(rng)
                mirror.update(changed)
                upsert_saved(
                    spark, path,
                    spark.createDataFrame(
                        sorted(changed.items()), "doc_id long, text string"
                    ),
                )
            v = cat.latest_version(path)
            assert v is not None
            history.append((v, dict(mirror), step))

        assert compact_steps, "shuffle must keep at least one compact"
        last_compact = max(compact_steps)
        for v, mirror_v, step in history:
            st = cat.state_at(path, v)
            delta_dependent = int(st.get("@delta_gen", "0") or 0) > 0
            expect_expired = delta_dependent and step < last_compact
            if expect_expired:
                with pytest.raises(ValueError, match="expired"):
                    with commitio.pinned_version(path, v):
                        load_index(spark, path)
            else:
                with commitio.pinned_version(path, v):
                    _check(spark, path, mirror_v, random.Random(v),
                           f"pin v{v} (op {step})")
    finally:
        commitio.set_catalog(prev)
