"""Incremental (delta + tombstone) upsert on a saved index: reference
update_doc semantics (index.rs:221-230) without rewriting base files."""

import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.build import build_and_save
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.upsert import (
    compact_index,
    load_index_merged,
    upsert_saved,
)


@pytest.fixture()
def saved(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            (0, "learn to program in rust today"),
            (1, "what sorcery is this"),
            (2, "rust belt cities"),
        ],
        ["doc_id", "text"],
    )
    build_and_save(spark, docs, path, ngrams=False)
    return path


def _docs_of(spark, path, term):
    eng = FtsEngine(load_index_merged(spark, path))
    return sorted(
        r["doc_id"] for r in eng.bm25(term, k=100).collect()
    )


def test_upsert_replaces_and_removes_stale(spark, saved):
    base_files = set(os.listdir(os.path.join(saved, "postings")))
    changed = spark.createDataFrame(
        [(0, "learn to code in python today")], ["doc_id", "text"]
    )
    idx = upsert_saved(spark, saved, changed)
    # stale term: 'rust' no longer in doc 0; still in doc 2
    assert _docs_of(spark, saved, "rust") == [2]
    assert _docs_of(spark, saved, "python") == [0]
    # 'program' disappears entirely -> gone from the term dictionary
    assert idx.termdict.filter(F.col("term") == "program").count() == 0
    # doc stats follow the new content
    row = idx.docstats.filter(F.col("doc_id") == 0).first()
    assert row["doclen_tokens"] == 6
    assert row["doclen_bytes"] == len("learn to code in python today")
    # base postings files untouched
    assert set(os.listdir(os.path.join(saved, "postings"))) == base_files


def test_multi_generation_latest_wins(spark, saved):
    upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(1, "first rewrite spark")], ["doc_id", "text"]),
    )
    idx = upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(1, "second rewrite flink")], ["doc_id", "text"]),
    )
    assert _docs_of(spark, saved, "flink") == [1]
    assert _docs_of(spark, saved, "spark") == []
    assert _docs_of(spark, saved, "sorcery") == []
    assert idx.n_docs == 3


def test_new_doc_via_upsert(spark, saved):
    idx = upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(9, "brand new document")], ["doc_id", "text"]),
    )
    assert idx.n_docs == 4
    assert _docs_of(spark, saved, "brand") == [9]


def test_doc_store_follows_upsert(spark, tmp_path):
    path = str(tmp_path / "idx2")
    docs = spark.createDataFrame(
        [(0, "original words"), (1, "other doc")], ["doc_id", "text"]
    )
    from inverted_index_spark.build import build_and_save

    build_and_save(spark, docs, path, ngrams=True, store_docs=True)
    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(0, "replaced words")], ["doc_id", "text"]),
    )
    idx = load_index_merged(spark, path)
    eng = FtsEngine(idx)
    res = eng.search("replaced", k=5)
    hl = eng.highlight(res, "[", "]").collect()
    assert len(hl) == 1 and hl[0]["highlighted"] == "[replaced] words"
    texts = {r["doc_id"]: r["text"] for r in idx.docs.collect()}
    assert texts == {0: "replaced words", 1: "other doc"}


def test_upsert_invalidates_stale_segments(spark, tmp_path):
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments, load_manifest
    from inverted_index_spark.wand import wand_topk

    path = str(tmp_path / "segidx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(100)]
        + [(100, "gamma delta target")],
        ["doc_id", "text"],
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32)
    n_shards = len(load_manifest(path)["shards"])
    assert [r["doc_id"] for r in wand_topk(spark, path, "gamma", k=5).collect()] == [
        100
    ]

    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(100, "epsilon zeta replaced")], ["doc_id", "text"]),
    )
    # the manifest is the serving COMMIT POINT: it keeps every row (a
    # concurrent coordinator serve must see a complete snapshot), the
    # staleness lives in the pending sidecar + stale source token
    import json as _json

    from inverted_index_spark.segments import PENDING_NAME, segments_fresh

    m = load_manifest(path)
    assert len(m["shards"]) == n_shards
    assert _json.load(
        open(os.path.join(path, PENDING_NAME))
    ) == [100 // 32]
    assert not segments_fresh(path)

    # rebuilding with resume touches only the invalidated shard, and
    # WAND now serves the new content
    idx2 = load_index_merged(spark, path)
    m2 = build_segments(spark, idx2, path, shard_docs=32)
    assert m2["built_shards"] == 1
    assert m2["resumed_shards"] == n_shards - 1
    assert wand_topk(spark, path, "gamma", k=5).count() == 0
    assert [
        r["doc_id"] for r in wand_topk(spark, path, "epsilon", k=5).collect()
    ] == [100]


def test_compact_preserves_results(spark, saved):
    upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(0, "compacted content here")], ["doc_id", "text"]),
    )
    before = _docs_of(spark, saved, "compacted")
    compact_index(spark, saved)
    assert _docs_of(spark, saved, "compacted") == before == [0]
    assert _docs_of(spark, saved, "learn") == []
    assert not os.path.isdir(os.path.join(saved, "postings_delta"))
    import json

    assert json.load(open(os.path.join(saved, "meta.json")))["generation"] == 0


def test_commit_protocol_versioned_dirs_and_crash_safety(spark, tmp_path):
    """Upserts commit derived tables via versioned dirs + one catalog
    pointer swap; a half-written version without a publish is invisible
    to readers (object-store-safe, no in-place dir replacement)."""
    import json
    import os

    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.commitio import table_path, version_dir
    from inverted_index_spark.upsert import upsert_saved

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"doc number w{i % 5} text") for i in range(30)],
        "doc_id long, text string",
    )
    build_and_save(spark, docs, path, ngrams=False)
    upsert_saved(
        spark,
        path,
        spark.createDataFrame([(3, "changed entirely now")], "doc_id long, text string"),
    )
    cat = json.load(open(os.path.join(path, "catalog.json")))
    assert cat["termdict"] == "termdict.v1"
    assert os.path.isdir(os.path.join(path, "termdict.v1"))
    assert not os.path.isdir(os.path.join(path, "termdict"))  # superseded, gc'd
    assert table_path(path, "termdict").endswith("termdict.v1")

    # simulate a crash: a half-written v2 exists but was never published
    os.makedirs(version_dir(path, "termdict", 2))
    idx = load_index(spark, path)
    assert idx.termdict.count() > 0  # still served from v1
    assert table_path(path, "termdict").endswith("termdict.v1")


def test_upsert_compact_upsert_cycle(spark, saved):
    """Regression (round-3 advice): compact_index resets the meta
    generation to 0, so a later upsert's derived-table versions must
    come from commitio.next_version — a meta-derived version collided
    with the live termdict.v1/docstats.v1, overwrote it in place, and
    then gc'd the directory the catalog pointed at."""
    import json

    upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(0, "first rewrite alpha")], ["doc_id", "text"]),
    )
    compact_index(spark, saved)
    upsert_saved(
        spark,
        saved,
        spark.createDataFrame([(1, "second rewrite beta")], ["doc_id", "text"]),
    )
    assert _docs_of(spark, saved, "beta") == [1]
    assert _docs_of(spark, saved, "alpha") == [0]
    assert _docs_of(spark, saved, "sorcery") == []
    # every catalog TABLE entry points at a directory that exists
    # (@-prefixed keys are inert markers — @delta_gen is the snapshot
    # high-water mark, never a table name)
    cat = json.load(open(os.path.join(saved, "catalog.json")))
    for name, d in cat.items():
        if name.startswith("@"):
            continue
        assert os.path.isdir(os.path.join(saved, d)), (name, d)
    # compact again: must pick a fresh postings version, not overwrite
    # the live directory merged_postings is reading
    compact_index(spark, saved)
    assert _docs_of(spark, saved, "beta") == [1]
    assert _docs_of(spark, saved, "alpha") == [0]


def test_catalog_adapter_seam(spark, saved):
    """The commit protocol runs unchanged against a pluggable catalog
    (the seam a real Iceberg/Delta binding implements): all pointer
    reads/writes route through the adapter, swaps are atomic batches,
    and the JSON file is untouched while the adapter is active."""
    import json

    from inverted_index_spark import commitio

    class DictCatalog(commitio.CatalogAdapter):
        def __init__(self):
            self.entries = {}
            self.swaps = []

        def resolve(self, path, name):
            return self.entries.get((path, name))

        def swap(self, path, mapping):
            self.swaps.append(dict(mapping))
            for name, d in mapping.items():
                self.entries[(path, name)] = d

    fake = DictCatalog()
    prev = commitio.set_catalog(fake)
    try:
        upsert_saved(
            spark,
            saved,
            spark.createDataFrame(
                [(0, "adapter routed rewrite")], ["doc_id", "text"]
            ),
        )
        # one atomic multi-table swap; pointers live in the adapter
        assert len(fake.swaps) == 1
        # tables plus the @delta_gen snapshot marker (time travel)
        assert set(fake.swaps[0]) == {
            "termdict", "docstats", "docs", "@delta_gen",
        }
        assert fake.swaps[0]["@delta_gen"] == "1"
        assert _docs_of(spark, saved, "adapter") == [0]
        assert not os.path.exists(os.path.join(saved, "catalog.json"))
    finally:
        commitio.set_catalog(prev)


def test_deltalog_catalog_protocol(tmp_path):
    """DeltaLogCatalog unit semantics: append-only numbered commits,
    create-if-absent versioning, replay-later-wins, checkpointing."""
    import json

    from inverted_index_spark.commitio import DeltaLogCatalog

    root = str(tmp_path)
    cat = DeltaLogCatalog(checkpoint_every=3)
    assert cat.resolve(root, "t") is None
    cat.swap(root, {"t": "t.v1"})
    cat.swap(root, {"t": "t.v2", "u": "u.v1"})
    assert cat.resolve(root, "t") == "t.v2"
    assert cat.resolve(root, "u") == "u.v1"
    # commits are numbered files; nothing modified in place
    log = os.path.join(root, "_fts_log")
    names = sorted(os.listdir(log))
    assert f"{0:020d}.json" in names and f"{1:020d}.json" in names
    # third commit triggers a checkpoint (checkpoint_every=3)
    cat.swap(root, {"t": "t.v3"})
    assert os.path.exists(os.path.join(log, f"{2:020d}.checkpoint.json"))
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))
    # a fresh adapter instance replays from the checkpoint
    cat2 = DeltaLogCatalog(checkpoint_every=3)
    assert cat2.resolve(root, "t") == "t.v3"
    assert cat2.resolve(root, "u") == "u.v1"
    with open(os.path.join(log, f"{2:020d}.checkpoint.json")) as fh:
        assert json.load(fh) == {"t": "t.v3", "u": "u.v1"}


def test_deltalog_catalog_concurrent_claim(tmp_path):
    """A writer that loses the create-if-absent race retries on the
    next version — the competing commit is never overwritten."""
    from inverted_index_spark.commitio import DeltaLogCatalog

    root = str(tmp_path)
    cat = DeltaLogCatalog()
    cat.swap(root, {"t": "t.v1"})
    # simulate a concurrent committer claiming version 1 first
    log = os.path.join(root, "_fts_log")
    with open(os.path.join(log, f"{1:020d}.json"), "x") as fh:
        fh.write('{"swap": {"t": "t.external"}}')
    cat.swap(root, {"u": "u.v1"})  # must land at version 2
    assert os.path.exists(os.path.join(log, f"{2:020d}.json"))
    # replay: the external commit survives, later commits win per-key
    assert cat.resolve(root, "t") == "t.external"
    assert cat.resolve(root, "u") == "u.v1"


def test_deltalog_catalog_end_to_end(spark, saved):
    """The full upsert -> compact -> segment refresh cycle runs green
    with the Delta-log-style adapter installed — the seam proven
    against a real (non-default) catalog implementation."""
    from inverted_index_spark import commitio
    from inverted_index_spark.segments import build_segments, refresh_segments
    from inverted_index_spark.segquery import segment_search

    prev = commitio.set_catalog(commitio.DeltaLogCatalog(checkpoint_every=4))
    try:
        idx0 = load_index_merged(spark, saved)
        build_segments(spark, idx0, saved, shard_docs=2, positions=True)
        upsert_saved(
            spark,
            saved,
            spark.createDataFrame(
                [(0, "delta log routed rewrite"), (3, "brand new rust doc")],
                ["doc_id", "text"],
            ),
        )
        assert _docs_of(spark, saved, "rust") == [2, 3]
        assert _docs_of(spark, saved, "delta") == [0]
        compact_index(spark, saved)
        assert _docs_of(spark, saved, "rust") == [2, 3]
        refresh_segments(spark, load_index_merged(spark, saved), saved)
        got = segment_search(spark, saved, "rust", k=10).collect()
        assert sorted(r["doc_id"] for r in got) == [2, 3]
        # pointer state lives in the log, not catalog.json
        assert os.path.exists(os.path.join(saved, "_fts_log"))
        assert not os.path.exists(os.path.join(saved, "catalog.json"))
        # append-only history: several commits recorded
        log = os.path.join(saved, "_fts_log")
        commits = [n for n in os.listdir(log) if n.endswith(".json")
                   and not n.endswith(".checkpoint.json")]
        assert len(commits) >= 2
    finally:
        commitio.set_catalog(prev)


def test_deltalog_catalog_unreadable_commit_never_dropped(tmp_path):
    """Review regression: an externally-claimed commit file with no
    payload must not crash swap() (old code raised JSONDecodeError out
    of the checkpoint replay) and must ABORT the checkpoint attempt —
    a checkpoint that finalized past an unreadable commit would drop
    its swap from every checkpoint-based read."""
    from inverted_index_spark.commitio import DeltaLogCatalog

    root = str(tmp_path)
    cat = DeltaLogCatalog(checkpoint_every=3)
    cat.swap(root, {"t": "t.v1"})  # version 0
    log = os.path.join(root, "_fts_log")
    # an empty claimed commit at version 1 (a crashed/in-flight foreign
    # writer — this class's own commits are hard-linked with content)
    open(os.path.join(log, f"{1:020d}.json"), "x").close()
    # version 2 is a checkpoint boundary: must commit fine, checkpoint
    # must abort (not finalize past the unreadable version 1)
    cat.swap(root, {"u": "u.v1"})
    assert os.path.exists(os.path.join(log, f"{2:020d}.json"))
    assert not os.path.exists(os.path.join(log, "_last_checkpoint"))
    assert cat.resolve(root, "t") == "t.v1"
    assert cat.resolve(root, "u") == "u.v1"
    # commit files are complete the instant they are visible
    with open(os.path.join(log, f"{2:020d}.json")) as fh:
        assert "u.v1" in fh.read()


def test_time_travel_pinned_reads(spark, saved, monkeypatch):
    """Iceberg-style snapshot reads: with the DeltaLogCatalog and
    retained generations, pinned_version(path, v) serves the index
    exactly as of log commit v — catalog-versioned tables via the
    pinned pointer state, delta/tombstone generations via the
    @delta_gen high-water mark each commit records."""
    import pytest

    from inverted_index_spark import commitio
    from inverted_index_spark.upsert import delete_saved

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    cat = commitio.DeltaLogCatalog()
    prev = commitio.set_catalog(cat)
    try:
        # base: 0 "learn to program in rust today", 1 "what sorcery
        # is this", 2 "rust belt cities"
        upsert_saved(
            spark, saved,
            spark.createDataFrame(
                [(0, "time travel zero")], ["doc_id", "text"]
            ),
        )
        v0 = cat.latest_version(saved)
        delete_saved(
            spark, saved,
            spark.createDataFrame([(2,)], ["doc_id"]),
        )
        v1 = cat.latest_version(saved)
        upsert_saved(
            spark, saved,
            spark.createDataFrame(
                [(3, "future rust doc")], ["doc_id", "text"]
            ),
        )
        assert v0 is not None and v1 is not None and v1 > v0
        # latest: doc 0 rewritten, doc 2 deleted, doc 3 added
        assert _docs_of(spark, saved, "rust") == [3]
        assert _docs_of(spark, saved, "travel") == [0]
        with commitio.pinned_version(saved, v0):
            # as of v0: doc 2 still present, doc 3 not yet indexed
            assert _docs_of(spark, saved, "rust") == [2]
            assert _docs_of(spark, saved, "travel") == [0]
            assert _docs_of(spark, saved, "future") == []
        with commitio.pinned_version(saved, v1):
            # as of v1: doc 2 deleted, doc 3 still absent
            assert _docs_of(spark, saved, "rust") == []
        # unpinned again: latest
        assert _docs_of(spark, saved, "rust") == [3]
        # a version the log never committed
        with pytest.raises(ValueError, match="no commit"):
            with commitio.pinned_version(saved, 999):
                pass
    finally:
        commitio.set_catalog(prev)


def test_pinned_version_requires_history_catalog(tmp_path):
    import pytest

    from inverted_index_spark import commitio

    # default JsonCatalog keeps no history
    with pytest.raises(ValueError, match="commit history"):
        with commitio.pinned_version(str(tmp_path), 0):
            pass


def test_compaction_expires_pinned_snapshots(spark, saved, monkeypatch):
    """compact_index is the vacuum: it folds the delta generations old
    pins depend on and resets the generation counter (a later upsert
    would reuse gen numbers). A pin from before the compaction epoch
    must therefore FAIL LOUDLY — never silently resurrect pre-upsert
    rows or mix epochs — while post-compaction pins keep working."""
    from inverted_index_spark import commitio
    from inverted_index_spark.upsert import compact_index

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    cat = commitio.DeltaLogCatalog()
    prev = commitio.set_catalog(cat)
    try:
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(0, "pre compact text")],
                                  ["doc_id", "text"]),
        )
        v_pre = cat.latest_version(saved)
        with commitio.pinned_version(saved, v_pre):
            pass  # valid before compaction
        compact_index(spark, saved)
        with pytest.raises(ValueError, match="expired"):
            with commitio.pinned_version(saved, v_pre):
                pass
        # a post-compaction mutation pins fine again
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(1, "post compact text")],
                                  ["doc_id", "text"]),
        )
        v_post = cat.latest_version(saved)
        with commitio.pinned_version(saved, v_post):
            assert _docs_of(spark, saved, "post") == [1]
    finally:
        commitio.set_catalog(prev)


def test_state_at_raises_on_unreadable_commit(tmp_path):
    """A historical commit file that exists but cannot be parsed is
    real corruption (the hard-link protocol publishes complete files):
    state_at must raise, not synthesize a wrong snapshot."""
    import os

    from inverted_index_spark import commitio

    cat = commitio.DeltaLogCatalog()
    path = str(tmp_path)
    cat.swap(path, {"t": "t.v1"})
    cat.swap(path, {"t": "t.v2"})
    log = os.path.join(path, cat.LOG_DIR)
    victim = os.path.join(log, f"{0:020d}.json")
    with open(victim, "w") as fh:
        fh.write("{ not json")
    with pytest.raises(ValueError, match="unreadable"):
        cat.state_at(path, 1)
    # the latest-read path still treats it as invisible (mid-flush
    # semantics), unchanged
    assert cat.resolve(path, "t") == "t.v2"


def test_delta_free_pin_survives_compaction(spark, saved, monkeypatch):
    """A pinned snapshot that depends on NO delta generations
    (@delta_gen == 0 — e.g. the compaction commit itself) reads only
    versioned base dirs, which retention keeps reconstructable: a later
    compaction must NOT expire it. Only delta-dependent pins expire."""
    from inverted_index_spark import commitio
    from inverted_index_spark.upsert import compact_index

    monkeypatch.setenv("SPARK_GRAFT_RETAIN_VERSIONS", "1")
    cat = commitio.DeltaLogCatalog()
    prev = commitio.set_catalog(cat)
    try:
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(0, "alpha epoch text")],
                                  ["doc_id", "text"]),
        )
        compact_index(spark, saved)
        v_c1 = cat.latest_version(saved)  # delta-free snapshot
        docs_c1 = _docs_of(spark, saved, "alpha")
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(0, "beta epoch text")],
                                  ["doc_id", "text"]),
        )
        v_delta = cat.latest_version(saved)  # delta-dependent snapshot
        compact_index(spark, saved)
        with commitio.pinned_version(saved, v_c1):
            assert _docs_of(spark, saved, "alpha") == docs_c1
        with pytest.raises(ValueError, match="expired"):
            with commitio.pinned_version(saved, v_delta):
                pass
    finally:
        commitio.set_catalog(prev)


def test_vacuumed_pin_fails_loudly(spark, saved, monkeypatch):
    """Without retention, gc_superseded vacuums the versioned dirs a
    snapshot maps to: pinning such a snapshot must raise the
    expired-snapshot ValueError at pin time, not surface later as a
    missing-path crash inside a Spark scan."""
    from inverted_index_spark import commitio
    from inverted_index_spark.upsert import compact_index

    monkeypatch.delenv("SPARK_GRAFT_RETAIN_VERSIONS", raising=False)
    cat = commitio.DeltaLogCatalog()
    prev = commitio.set_catalog(cat)
    try:
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(0, "vacuum target text")],
                                  ["doc_id", "text"]),
        )
        compact_index(spark, saved)
        v_c1 = cat.latest_version(saved)  # delta-free snapshot
        upsert_saved(
            spark, saved,
            spark.createDataFrame([(1, "vacuum second text")],
                                  ["doc_id", "text"]),
        )
        compact_index(spark, saved)  # gc deletes v_c1's base dirs
        with pytest.raises(ValueError, match="expired"):
            with commitio.pinned_version(saved, v_c1):
                pass
    finally:
        commitio.set_catalog(prev)
