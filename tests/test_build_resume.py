"""Resumable kernel-direct builds: per-partition checkpoints, lineage +
metrics manifest, fingerprint-guarded skip (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

All tests drive build_and_save(store_docs=False) over a file-backed
corpus (resume requires file lineage for the input fingerprint).
"""

import glob
import json
import os

import pytest

from inverted_index_spark.build import (
    build_and_save,
    load_build_manifest,
    load_index,
)
from inverted_index_spark.query import FtsEngine

BUCKETS = 4


def _corpus(spark, tmp_path, n=60, shift=0):
    words = ["scan", "merge", "join", "filter", "window", "stream",
             "group", "value", "batch", "sort"]
    rows = [
        (i, " ".join(words[(i + j + shift) % len(words)]
                     for j in range(1 + i % 7)))
        for i in range(n)
    ]
    p = str(tmp_path / f"corpus_{shift}")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2).write.mode(
        "overwrite"
    ).parquet(p)
    return spark.read.parquet(p)


def _build(spark, docs, path, **kw):
    return build_and_save(
        spark, docs, path, ngrams=False, store_docs=False,
        term_buckets=BUCKETS, **kw
    )


def _mtimes(path):
    out = {}
    for sub in ("postings", "docstats", "termdict_partials", "build_tasks"):
        for f in glob.glob(os.path.join(path, sub, "part-*")):
            out[os.path.relpath(f, path)] = os.stat(f).st_mtime_ns
    return out


def _topk(spark, path, docs):
    idx = load_index(spark, path, docs=docs)
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in FtsEngine(idx, use_segments=False)
        .bm25("scan merge", k=10)
        .collect()
    ]


def test_manifest_records_per_task_lineage_and_metrics(spark, tmp_path):
    docs = _corpus(spark, tmp_path)
    path = str(tmp_path / "idx")
    _build(spark, docs, path)

    m = load_build_manifest(path)
    assert m is not None and m["fingerprint"]
    assert m["n_tasks"] >= 1 and m["resumed_tasks"] == 0
    assert m["total_docs"] == 60
    assert m["total_postings"] > 0 and m["total_postings_bytes"] > 0
    assert m["skew_ratio"] >= 1.0
    for t in m["tasks"]:
        assert t["files"] and all(
            os.path.exists(os.path.join(path, rel)) for rel in t["files"]
        )
        assert t["elapsed_sec"] >= 0 and t["postings_per_sec"] > 0
    # manifest totals agree with the tables themselves
    idx = load_index(spark, path, docs=docs)
    assert idx.postings.count() == m["total_postings"]
    assert idx.docstats.count() == m["total_docs"]


def test_resume_skips_every_completed_partition(spark, tmp_path):
    docs = _corpus(spark, tmp_path)
    path = str(tmp_path / "idx")
    _build(spark, docs, path)
    before_files = _mtimes(path)
    before_ans = _topk(spark, path, docs)

    _build(spark, docs, path, resume=True)
    assert _mtimes(path) == before_files, "resume must not rewrite anything"
    m = load_build_manifest(path)
    assert m["resumed_tasks"] == m["n_tasks"] > 0
    assert _topk(spark, path, docs) == before_ans


def test_resume_rebuilds_only_the_lost_partition(spark, tmp_path):
    docs = _corpus(spark, tmp_path)
    path = str(tmp_path / "idx")
    _build(spark, docs, path)
    before_ans = _topk(spark, path, docs)

    # simulate a crash that lost one partition's checkpoint: drop its
    # sidecar + data files (sidecar-first deletion == the real crash
    # window, where data files may exist but the sidecar does not)
    side = sorted(glob.glob(os.path.join(path, "build_tasks", "*.json")))[0]
    with open(side) as fh:
        lost = json.load(fh)
    os.remove(side)
    for rel in lost["files"]:
        os.remove(os.path.join(path, rel))
    before_files = _mtimes(path)

    _build(spark, docs, path, resume=True)
    after_files = _mtimes(path)
    rebuilt = set(lost["files"]) | {
        os.path.relpath(side, path)
    }
    for rel, mt in before_files.items():
        assert after_files[rel] == mt, f"untouched partition rewritten: {rel}"
    for rel in rebuilt:
        assert rel in after_files, f"lost file not rebuilt: {rel}"
    m = load_build_manifest(path)
    assert m["resumed_tasks"] == m["n_tasks"] - 1
    # the repaired index answers identically (termdict re-merged from
    # the full partial set, docstats/postings complete)
    assert _topk(spark, path, docs) == before_ans


def test_changed_corpus_invalidates_the_checkpoint(spark, tmp_path):
    docs_a = _corpus(spark, tmp_path)
    path = str(tmp_path / "idx")
    _build(spark, docs_a, path)

    docs_b = _corpus(spark, tmp_path, shift=3)
    _build(spark, docs_b, path, resume=True)
    m = load_build_manifest(path)
    assert m["resumed_tasks"] == 0, "different corpus must rebuild in full"

    # ground truth: a from-scratch build over corpus B
    path_b = str(tmp_path / "idx_b")
    _build(spark, docs_b, path_b)
    assert _topk(spark, path, docs_b) == _topk(spark, path_b, docs_b)


def test_in_memory_corpus_disables_resume(spark, tmp_path):
    rows = [(i, "scan merge join") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "idx")
    _build(spark, docs, path)
    m1 = load_build_manifest(path)
    assert m1["fingerprint"] is None
    _build(spark, docs, path, resume=True)
    m2 = load_build_manifest(path)
    assert m2["resumed_tasks"] == 0


def test_resume_with_store_docs_reuses_the_committed_doc_store(
    spark, tmp_path
):
    docs = _corpus(spark, tmp_path)
    path = str(tmp_path / "idx")
    build_and_save(
        spark, docs, path, ngrams=False, store_docs=True,
        term_buckets=BUCKETS,
    )
    store = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(os.path.join(path, "docs", "*.parquet"))
    }
    before = _mtimes(path)
    build_and_save(
        spark, docs, path, ngrams=False, store_docs=True,
        term_buckets=BUCKETS, resume=True,
    )
    assert _mtimes(path) == before
    assert {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(os.path.join(path, "docs", "*.parquet"))
    } == store, "resume must not rewrite the doc store"


def test_corpus_validation_fails_fast(spark, tmp_path):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from inverted_index_spark.build import build_index

    good = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    bad_missing = good.select(F.col("doc_id").alias("id"), "text")
    bad_type = good.select(F.col("doc_id").cast("string"), "text")
    with _pytest.raises(ValueError, match="missing column"):
        build_index(spark, bad_missing)
    with _pytest.raises(ValueError, match="integer type"):
        build_index(spark, bad_type)
    with _pytest.raises(ValueError, match="text must be string"):
        _ = build_index(
            spark, good.select("doc_id", F.col("doc_id").alias("text"))
        )
