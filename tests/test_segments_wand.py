"""Segment build + block-max WAND: rank-identity vs the DataFrame BM25
path, manifest metrics, and checkpoint/resume (SURVEY §7 step 7)."""

import json
import os

import pytest

from inverted_index_spark.build import build_and_save, load_index
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.segments import build_segments, load_manifest
from inverted_index_spark.wand import wand_topk


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segidx"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(spark, idx, path, shard_docs=64, block_docs=16)
    return path, idx, manifest


QUERIES = [
    "scan merge join",
    "window stream batch group",
    "the a of",
    "merge",
    "nonexistentterm scan",
]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_matches_dataframe_bm25(spark, indexed, q):
    path, idx, _ = indexed
    # pin the DataFrame plan: with fresh segments the engine would
    # route bm25 to WAND itself, making this equivalence test circular
    eng = FtsEngine(idx, use_segments=False)
    expect = [(r["doc_id"], r["score"]) for r in eng.bm25(q, k=10).collect()]
    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, path, q, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b))


def test_wand_batch_matches_single(spark, indexed):
    from inverted_index_spark.wand import wand_topk_batch

    path, idx, _ = indexed
    texts = QUERIES[:4]
    batch = wand_topk_batch(spark, path, texts, k=10).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, text in enumerate(texts):
        single = wand_topk(spark, path, text, k=10).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], text
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9


def test_wand_empty_query(spark, indexed):
    path, _, _ = indexed
    assert wand_topk(spark, path, "zzzznotaterm", k=5).count() == 0


def test_manifest_metrics(indexed):
    path, idx, manifest = indexed
    shards = manifest["shards"]
    assert len(shards) >= 2  # 500 docs / 64-doc shards
    assert sum(s["n_postings"] for s in shards) > 0
    for s in shards:
        assert s["postings_per_sec"] > 0
        assert s["skew_ratio"] >= 1.0
        assert s["enc_bytes"] < s["raw_bytes"]  # compression works
        assert len(s["fingerprint"]) == 40
        assert os.path.exists(os.path.join(path, "segments", s["file"]))


def test_resume_skips_done_shards(spark, indexed):
    path, idx, manifest = indexed
    victim_row = manifest["shards"][0]
    os.remove(os.path.join(path, "segments", victim_row["file"]))
    m2 = build_segments(spark, idx, path, shard_docs=64, block_docs=16)
    # only the missing shard was rebuilt; the rest resumed from manifest
    assert m2["built_shards"] == 1
    assert m2["resumed_shards"] == len(manifest["shards"]) - 1
    # shard ids are stable; the rebuilt shard carries a NEW write-once
    # file name, untouched shards keep theirs
    assert {s["shard_id"] for s in m2["shards"]} == {
        s["shard_id"] for s in manifest["shards"]
    }
    by_id = {s["shard_id"]: s["file"] for s in m2["shards"]}
    rebuilt = by_id[victim_row["shard_id"]]
    assert rebuilt != victim_row["file"]
    assert os.path.exists(os.path.join(path, "segments", rebuilt))
    for s in manifest["shards"][1:]:
        assert by_id[s["shard_id"]] == s["file"]


def test_wand_after_resume_still_correct(spark, indexed):
    path, idx, _ = indexed
    eng = FtsEngine(idx, use_segments=False)
    q = "scan merge join"
    expect = [r["doc_id"] for r in eng.bm25(q, k=10).collect()]
    got = [r["doc_id"] for r in wand_topk(spark, path, q, k=10).collect()]
    assert got == expect


@pytest.fixture(scope="module")
def pos_indexed(spark, tmp_path_factory):
    """Full-token index + POSITIONAL segments over the same docs."""
    path = str(tmp_path_factory.mktemp("posidx"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(
        spark, idx, path, shard_docs=64, block_docs=16, positions=True
    )
    return path, idx, manifest


def _results_key(rows):
    return {
        r["doc_id"]: (
            round(float(r["score"]), 6),
            [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
        )
        for r in rows
    }


@pytest.mark.parametrize("q", ["merge", "scan merge join", "nonexistentterm"])
def test_segment_search_matches_engine(spark, pos_indexed, q):
    from inverted_index_spark.qast import Match
    from inverted_index_spark.segquery import segment_search

    path, idx, _ = pos_indexed
    # positional segments exist at idx.path: pin the DataFrame plan or
    # the routed engine would compare the segment path against itself
    eng = FtsEngine(idx, use_segments=False)
    expect = _results_key(eng.results(Match(q)).collect())
    got = _results_key(
        segment_search(spark, path, q, with_positions=True).collect()
    )
    assert got == expect


@pytest.mark.parametrize("q", ["batch batch", "merge scan", "the the"])
def test_segment_phrase_matches_engine(spark, pos_indexed, q):
    from inverted_index_spark.qast import Phrase
    from inverted_index_spark.segquery import segment_phrase

    path, idx, _ = pos_indexed
    # positional segments exist at idx.path: pin the DataFrame plan or
    # the routed engine would compare the segment path against itself
    eng = FtsEngine(idx, use_segments=False)
    expect = _results_key(eng.results(Phrase(q)).collect())
    got = _results_key(segment_phrase(spark, path, q).collect())
    assert got == expect


def test_rare_term_opens_few_shards(spark, tmp_path):
    """Term->shard pruning: a df=1 term opens 1 shard, not all.

    Rare-term query cost must be O(df / shard_docs), not O(shards) —
    the distributed analogue of the reference's O(log n) dictionary
    lookup (src/index.rs:122-127)."""
    from inverted_index_spark.segquery import _shards_for_ranges, _term_ranges
    from inverted_index_spark.wand import shards_for_terms, wand_topk

    path = str(tmp_path / "rareidx")
    rows = [(i, f"common words w{i % 7} everywhere") for i in range(300)]
    rows.append((300, "common words zzzuniqueterm here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(spark, idx, path, shard_docs=16, block_docs=8)
    total = len(manifest["shards"])
    assert total >= 15
    pruned = shards_for_terms(spark, path, manifest, ["zzzuniqueterm"])
    assert len(pruned) == 1
    pruned2 = _shards_for_ranges(
        spark, path, manifest, _term_ranges(path, ["zzzuniqueterm"])
    )
    assert len(pruned2) == 1
    # the pruned query still finds the one matching doc
    got = wand_topk(spark, path, "zzzuniqueterm", k=5).collect()
    assert [r["doc_id"] for r in got] == [300]


def test_segment_queries_on_parity_ngram_index(spark, tmp_path):
    """segquery on a PARITY (edge-ngram) index: _term_ranges degenerates
    to exact term lookup (the stored ngrams do the prefix matching), and
    results must still be bit-identical to the DataFrame engine."""
    from inverted_index_spark.qast import Match, Phrase
    from inverted_index_spark.segquery import segment_phrase, segment_search

    path = str(tmp_path / "parityseg")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(120)
    idx = build_and_save(spark, docs, path, ngrams=True)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8, positions=True)
    eng = FtsEngine(idx, use_segments=False)
    for q in ["mer", "batch batch"]:
        expect = _results_key(eng.results(Match(q)).collect())
        got = _results_key(
            segment_search(spark, path, q, with_positions=True).collect()
        )
        assert got == expect, f"match {q!r}"
    expect = _results_key(eng.results(Phrase("batch batch")).collect())
    got = _results_key(segment_phrase(spark, path, "batch batch").collect())
    assert got == expect


def test_segment_highlight_matches_engine_highlight(spark, pos_indexed):
    """The full segment-served user story: search -> highlight without
    touching the postings parquet, identical to the engine's output."""
    from inverted_index_spark.qast import Match
    from inverted_index_spark.segquery import segment_highlight, segment_search

    path, idx, _ = pos_indexed
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    eng = FtsEngine(idx, use_segments=False)
    expect = {
        r["doc_id"]: r["highlighted"]
        for r in eng.highlight(
            eng.results(Match("merge"), k=5), "<b>", "</b>"
        ).collect()
    }
    res = segment_search(spark, path, "merge", k=5, with_positions=True)
    got = {
        r["doc_id"]: r["highlighted"]
        for r in segment_highlight(res, docs, "<b>", "</b>").collect()
    }
    assert got == expect and len(got) == 5


# ----------------------------------------------------------------------
# compound algebra served from segments (round 3): And / Or / Prefix /
# arbitrary nesting must be bit-identical to the DataFrame engine


def _compound_cases():
    from inverted_index_spark.qast import And, Match, Or, Phrase, Prefix

    return [
        And(Match("scan"), Match("merge")),
        Or(Match("window"), Match("stream")),
        Prefix("mer"),
        Prefix(""),
        And(Match("scan")),
        Or(Match("scan")),
        And(Or(Match("scan"), Match("window")), Match("merge")),
        Or(And(Match("scan"), Match("merge")), Phrase("batch batch")),
        And(Match("scan"), Prefix("mer")),
        And(Match("scan"), Match("zzzznotaterm")),
    ]


@pytest.mark.parametrize("qi", range(10))
def test_segment_compound_matches_engine(spark, pos_indexed, qi):
    from inverted_index_spark.segquery import segment_query

    q = _compound_cases()[qi]
    path, idx, _ = pos_indexed
    # positional segments exist at idx.path: pin the DataFrame plan or
    # the routed engine would compare the segment path against itself
    eng = FtsEngine(idx, use_segments=False)
    expect = _results_key(eng.results(q).collect())
    got = _results_key(
        segment_query(spark, path, q, with_positions=True).collect()
    )
    assert got == expect


def test_segment_and_prunes_to_rare_terms_shards(spark, tmp_path):
    """Structural shard pruning: And(rare, common) opens only the RARE
    term's shards (intersection of child shard sets), so a selective
    conjunction costs O(df_rare / shard_docs) file opens."""
    from inverted_index_spark import metacache
    from inverted_index_spark.qast import And, Match
    from inverted_index_spark.segquery import (
        _compile_node,
        _node_shards,
        segment_query,
    )

    path = str(tmp_path / "andprune")
    rows = [(i, f"common words w{i % 7} everywhere") for i in range(300)]
    rows.append((300, "common words zzzuniqueterm here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(
        spark, idx, path, shard_docs=16, block_docs=8, positions=True
    )
    assert len(manifest["shards"]) >= 15
    ranges: list = []
    tree = _compile_node(
        And(Match("zzzuniqueterm"), Match("common")), False, ranges
    )
    sets = metacache.shard_sets_for_ranges(path, ranges)
    want = _node_shards(tree, sets)
    assert want is not None and len(want) == 1
    got = segment_query(
        spark, path, And(Match("zzzuniqueterm"), Match("common"))
    ).collect()
    assert [r["doc_id"] for r in got] == [300]


def test_bm25_routes_to_wand_when_segments_fresh(spark, tmp_path):
    """FtsEngine routes bm25/bm25_batch to the segment WAND path when
    segments reflect the live postings state, and falls back to the
    DataFrame plan (serving the merged generation view) the moment an
    upsert makes them stale."""
    from inverted_index_spark.segments import segments_fresh
    from inverted_index_spark.upsert import load_index_merged, upsert_saved

    path = str(tmp_path / "routeidx")
    docs = spark.createDataFrame(
        [(i, f"route words w{i % 5} alpha") for i in range(100)],
        "doc_id long, text string",
    )
    idx = build_and_save(spark, docs, path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8)
    assert segments_fresh(path)
    eng = FtsEngine(idx)
    routed = [(r["doc_id"], round(r["score"], 9))
              for r in eng.bm25("alpha w1", k=10).collect()]
    direct = [(r["doc_id"], round(r["score"], 9))
              for r in wand_topk(spark, path, "alpha w1", k=10).collect()]
    assert routed == direct
    br = eng.bm25_batch(["alpha w1"], k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in br] == direct

    # upsert supersedes the segments: routing must stop
    upsert_saved(
        spark,
        path,
        spark.createDataFrame(
            [(0, "completely zzreplaced content")], "doc_id long, text string"
        ),
    )
    assert not segments_fresh(path)
    eng2 = FtsEngine(load_index_merged(spark, path))
    got = [r["doc_id"] for r in eng2.bm25("zzreplaced", k=5).collect()]
    assert got == [0]


def test_results_routes_to_segment_query(spark, pos_indexed):
    """With fresh POSITIONAL segments, results()/search() themselves
    serve from segments: the routed engine equals the pinned DataFrame
    engine bit-for-bit (the routing must change the plan, not the
    answer)."""
    from inverted_index_spark.qast import And, Match

    path, idx, _ = pos_indexed
    routed = FtsEngine(idx)
    pinned = FtsEngine(idx, use_segments=False)
    for q in [Match("merge"), And(Match("scan"), Match("merge"))]:
        a = _results_key(routed.results(q, k=7).collect())
        b = _results_key(pinned.results(q, k=7).collect())
        assert a == b


def test_segment_query_batch_matches_singles(spark, pos_indexed):
    """One segment pass for many ASTs: per-query results equal the
    single-query evaluator (same per-shard top-k + driver merge)."""
    from inverted_index_spark.qast import And, Match, Or, Phrase, Prefix
    from inverted_index_spark.segquery import segment_query, segment_query_batch

    path, _, _ = pos_indexed
    qs = [
        Match("merge"),
        And(Match("scan"), Match("merge")),
        Or(Match("window"), Match("stream")),
        Phrase("batch batch"),
        Prefix("mer"),
        Match("zzzznotaterm"),
    ]
    batch = segment_query_batch(spark, path, qs, k=7, with_positions=True)
    by_q: dict = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(qs):
        single = segment_query(spark, path, q, k=7, with_positions=True).collect()
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        key = lambda r: (  # noqa: E731
            r["doc_id"],
            round(float(r["score"]), 6),
            [(p["begin"], p["end"], p["pos"]) for p in r["positions"]],
        )
        assert [key(r) for r in got] == [key(r) for r in single], qid


def test_explain_segment_query_previews_the_pruned_plan(spark, tmp_path):
    """explain_segment_query must report, without running any Spark job,
    exactly the pruning segment_query performs: a rare-term And opens 1
    shard, Or unions children, an unservable query is empty — and the
    explained file list agrees with the docs the evaluator returns."""
    from inverted_index_spark.qast import And, Match, Or, Phrase
    from inverted_index_spark.segquery import (
        explain_segment_query,
        segment_query,
    )

    path = str(tmp_path / "explainidx")
    rows = [(i, f"common words w{i % 7} everywhere") for i in range(300)]
    rows.append((300, "common words zzzuniqueterm here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_and_save(spark, docs, path, ngrams=False)
    manifest = build_segments(
        spark, idx, path, shard_docs=16, block_docs=8, positions=True
    )
    total = len(manifest["shards"])

    q = And(Match("zzzuniqueterm"), Match("common"))
    plan = explain_segment_query(path, q)
    assert not plan["empty"] and plan["positional"]
    assert plan["shards_total"] == total
    assert plan["shards_open"] == 1, "And must prune to the rare term"
    assert plan["tree"] == "And(Match[zzzuniqueterm], Match[common])"
    by_lo = {r["lo"]: r for r in plan["ranges"]}
    assert by_lo["zzzuniqueterm"]["df_full"] == 1
    assert by_lo["zzzuniqueterm"]["shards"] == 1
    assert by_lo["common"]["df_full"] == 301

    # the single explained file really is where the answer lives
    got = segment_query(spark, path, q).collect()
    assert [r["doc_id"] for r in got] == [300]

    # serving preview: one tiny pruned shard -> mode=auto serves locally
    assert plan["serving"] == "local"
    assert 0 < plan["pruned_enc_bytes"] <= 32 << 20

    wide = explain_segment_query(path, Or(Match("zzzuniqueterm"), Match("common")))
    assert wide["shards_open"] == total, "Or unions children"

    empty = explain_segment_query(path, Phrase("zzzuniqueterm"))
    assert empty["empty"] and empty["shards_open"] == 0


def test_map_files_process_pool_matches_threads(spark, pos_indexed, monkeypatch):
    """The fork-based pool in _map_files (used when shard fan-out is
    big enough) must be bit-identical to the thread path — same
    kernels, same merge, only the executor differs. Forced on here via
    SPARK_GRAFT_SERVE_PROC_MIN=0 so even the small test index exercises
    the process branch (and its pickle/fork plumbing)."""
    from inverted_index_spark.qast import And, Match, Or
    from inverted_index_spark.segquery import segment_query_pandas

    path, _, _ = pos_indexed
    q = And(Match("merge"), Or(Match("scan"), Match("window")))
    # the request cache would satisfy the second call without running
    # the thread path at all, making the comparison vacuous
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "0")
    monkeypatch.setenv("SPARK_GRAFT_SERVE_PROC_MIN", "0")
    monkeypatch.setenv("SPARK_GRAFT_SERVE_PROCS", "4")
    with_procs = segment_query_pandas(path, q, k=10)
    monkeypatch.setenv("SPARK_GRAFT_SERVE_PROCS", "0")
    with_threads = segment_query_pandas(path, q, k=10)
    assert with_procs.equals(with_threads)
    assert len(with_procs) > 0


def test_map_files_process_pool_fallback(monkeypatch):
    """An unusable process pool must fall back to threads, not fail."""
    from inverted_index_spark import segquery

    calls = []

    def fn(x):
        calls.append(x)
        import pandas as pd

        return pd.DataFrame({"v": [x]})

    monkeypatch.setenv("SPARK_GRAFT_SERVE_PROC_MIN", "0")
    monkeypatch.setenv("SPARK_GRAFT_SERVE_PROCS", "not-a-number")
    parts = segquery._map_files(fn, list(range(4)))
    assert len(parts) == 4 and sorted(calls) == [0, 1, 2, 3]


def test_request_cache_hits_and_invalidates(spark, pos_indexed, monkeypatch):
    """Coordinator request cache: a repeated serve is answered without
    touching shard files; rewriting the manifest (what every
    refresh/invalidation does) expires the entry; returned frames are
    copies (caller mutation cannot poison the cache); cache=0 disables."""
    import os

    from inverted_index_spark import metacache, segquery
    from inverted_index_spark.qast import Match
    from inverted_index_spark.segquery import segment_query_pandas

    path, _, _ = pos_indexed
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "8")
    reads = []
    orig = segquery._read_shard

    def counting(*a, **kw):
        reads.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(segquery, "_read_shard", counting)
    metacache._REQ_CACHE.clear()
    q = Match("merge")
    first = segment_query_pandas(path, q, k=5, with_positions=False)
    n_first = len(reads)
    assert n_first > 0
    second = segment_query_pandas(path, q, k=5, with_positions=False)
    assert len(reads) == n_first, "second serve must be a cache hit"
    assert first.equals(second)
    # mutating the returned frame must not poison the cache
    second.loc[:, "score"] = -1.0
    third = segment_query_pandas(path, q, k=5, with_positions=False)
    assert third.equals(first)
    # manifest CONTENT change (what refresh/invalidate does) expires
    # the snapshot — the key fingerprints the bytes, so even two
    # rewrites inside one mtime tick on a coarse filesystem expire
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as fh:
        mtext = fh.read()
    with open(mpath, "w") as fh:
        fh.write(mtext[:-1] + " }" if mtext.endswith("}") else mtext + " ")
    segment_query_pandas(path, q, k=5, with_positions=False)
    assert len(reads) > n_first, "new snapshot must re-read"
    with open(mpath, "w") as fh:
        fh.write(mtext)  # restore for other tests
    # kill switch
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "0")
    before = len(reads)
    segment_query_pandas(path, q, k=5, with_positions=False)
    segment_query_pandas(path, q, k=5, with_positions=False)
    assert len(reads) >= before + 2


def test_request_cache_wand(spark, pos_indexed, monkeypatch):
    from inverted_index_spark import metacache
    from inverted_index_spark.wand import wand_topk_pandas

    path, _, _ = pos_indexed
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "8")
    metacache._REQ_CACHE.clear()
    a = wand_topk_pandas(path, "merge scan", k=5)
    b = wand_topk_pandas(path, "merge scan", k=5)
    assert a.equals(b)
    assert any(k[1] == "wand" for k in metacache._REQ_CACHE)


def test_request_cache_bounds_and_isolation(spark, pos_indexed, monkeypatch):
    """Review regressions: k=None results are never cached (they are
    corpus-sized); cached position LISTS are isolated from caller
    mutation (pandas copy() shares object cells); a list doc_range is
    accepted (hashability normalization)."""
    from inverted_index_spark import metacache
    from inverted_index_spark.qast import Match
    from inverted_index_spark.segquery import segment_query_pandas

    path, _, _ = pos_indexed
    monkeypatch.setenv("SPARK_GRAFT_SERVE_CACHE", "8")
    metacache._REQ_CACHE.clear()
    segment_query_pandas(path, Match("merge"), k=None)
    assert not metacache._REQ_CACHE, "k=None must not be cached"
    # positions-list isolation — outer list AND the dicts inside it
    # (a shallow list(v) copy would still share the position dicts)
    first = segment_query_pandas(path, Match("merge"), k=3)
    assert len(metacache._REQ_CACHE) == 1
    cell = first["positions"].iloc[0]
    assert cell and isinstance(cell[0], dict), "expected dict positions"
    orig_len, orig_pos = len(cell), cell[0]["pos"]
    cell.append({"begin": 9, "end": 9, "pos": 999})
    cell[0]["pos"] = orig_pos + 10_000  # inner-dict mutation
    again = segment_query_pandas(path, Match("merge"), k=3)
    assert len(again["positions"].iloc[0]) == orig_len
    assert again["positions"].iloc[0][0]["pos"] == orig_pos
    # list doc_range normalizes into the key instead of raising
    r = segment_query_pandas(
        path, Match("merge"), k=3, doc_range=[0, 10**9]
    )
    assert len(r) > 0


def test_request_snapshot_memoized_and_fips_safe(pos_indexed, monkeypatch):
    """The manifest fingerprint is memoized on (mtime_ns, size) — the
    hot path pays a stat, not a read+hash, per call — but ONLY once the
    manifest mtime has settled past the timestamp-tick window (a
    just-rewritten manifest is re-hashed every call, so an in-tick
    inode-recycled rewrite can never serve a stale alias); and a FIPS
    build whose md5 raises ValueError falls back to crc32 instead of
    taking down serving."""
    import builtins
    import hashlib
    import time

    from inverted_index_spark import metacache

    path, _, _ = pos_indexed
    from inverted_index_spark.segments import MANIFEST_NAME

    manifest_path = os.path.join(path, MANIFEST_NAME)

    opens = []
    real_open = builtins.open

    def counting_open(f, *a, **kw):
        opens.append(f)
        return real_open(f, *a, **kw)

    def manifest_opens():
        n = len([f for f in opens if "manifest" in str(f)])
        opens.clear()
        return n

    # fresh manifest (mtime = now): NOT memoized — every call re-hashes
    os.utime(manifest_path)
    metacache._MEMO.clear()
    monkeypatch.setattr(builtins, "open", counting_open)
    f1 = metacache.request_snapshot(path)
    f2 = metacache.request_snapshot(path)
    assert f1 == f2 and f1 is not None
    assert manifest_opens() == 2, (
        "an unsettled manifest must be re-read every call (same-tick "
        "rewrite safety)"
    )

    # settled manifest (mtime pushed past the tick window): memoized
    st = os.stat(manifest_path)
    os.utime(manifest_path, (st.st_atime, time.time() - 10.0))
    metacache._MEMO.clear()
    snap1 = metacache.request_snapshot(path)
    assert snap1 is not None
    opens.clear()
    snap2 = metacache.request_snapshot(path)
    assert snap2 == snap1
    assert manifest_opens() == 0, (
        "memoized fingerprint must not re-read the manifest"
    )
    monkeypatch.undo()

    def fips_md5(*a, **kw):
        raise ValueError("md5 disabled for FIPS")

    monkeypatch.setattr(hashlib, "md5", fips_md5)
    metacache._MEMO.clear()
    snap3 = metacache.request_snapshot(path)
    assert snap3 is not None and snap3[0] == snap1[0]
    metacache._MEMO.clear()
