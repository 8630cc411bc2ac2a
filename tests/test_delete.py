"""Document deletion: tombstone-only generations, no base rewrite.

The reference has no standalone delete (upsert supersedes in place,
/root/reference/src/index.rs:36-51); a corpus pipeline needs one (GDPR
erasure, dedup-driven pruning). delete_saved writes ONE tombstone
generation — no delta postings — and the merged view, derived tables,
doc store, segments and meta all converge on the smaller corpus.
"""

import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark import commitio
from inverted_index_spark.build import build_and_save, load_index
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.segments import (
    build_segments,
    load_manifest,
    refresh_segments,
    segments_fresh,
)
from inverted_index_spark.upsert import (
    compact_index,
    delete_saved,
    load_index_merged,
    upsert_saved,
)
from inverted_index_spark.wand import wand_topk


def _corpus(spark, n=120):
    return spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} tok{i}") for i in range(n)],
        "doc_id long, text string",
    )


def _ids(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def _match_ids(spark, path, text):
    eng = FtsEngine(load_index_merged(spark, path), use_segments=False)
    return sorted(r["doc_id"] for r in eng.search(text, k=None).collect())


def test_delete_without_prior_upsert(spark, tmp_path):
    """Tombstone-only generation with NO delta dir: the merged view must
    still apply it (regression: merged_postings used to short-circuit
    when postings_delta was absent)."""
    path = str(tmp_path / "idx")
    build_and_save(spark, _corpus(spark), path, ngrams=False)
    assert not os.path.isdir(os.path.join(path, "postings_delta"))

    idx = delete_saved(spark, path, _ids(spark, [3, 10, 17]))
    assert idx.n_docs == 117
    assert _match_ids(spark, path, "alpha") == [
        i for i in range(120) if i not in (3, 10, 17)
    ]
    # unique term of a deleted doc vanishes from the term dictionary
    td = spark.read.parquet(commitio.table_path(path, "termdict"))
    assert td.filter(F.col("term") == "tok3").count() == 0
    assert td.filter(F.col("term") == "tok4").count() == 1
    # doc store rows gone
    docs = spark.read.parquet(commitio.table_path(path, "docs"))
    assert docs.filter(F.col("doc_id").isin(3, 10, 17)).count() == 0
    assert docs.count() == 117
    # docstats/meta consistent
    ds = spark.read.parquet(commitio.table_path(path, "docstats"))
    assert ds.count() == 117


def test_delete_then_segment_refresh_and_wand(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx = build_and_save(spark, _corpus(spark), path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, block_docs=8,
                   positions=True)
    before = {
        f: os.path.getmtime(os.path.join(path, "segments", f))
        for f in os.listdir(os.path.join(path, "segments"))
        if f.endswith(".parquet")
    }

    delete_saved(spark, path, _ids(spark, [33, 40]))  # both in shard 1
    assert not segments_fresh(path)
    refresh_segments(spark, load_index_merged(spark, path), path)
    assert segments_fresh(path)

    # only shard 1 was re-encoded
    after = {
        f: os.path.getmtime(os.path.join(path, "segments", f))
        for f in os.listdir(os.path.join(path, "segments"))
        if f.endswith(".parquet")
    }
    untouched = {f for f in before if f in after and before[f] == after[f]}
    assert len(untouched) >= 2

    got = {
        r["doc_id"]
        for r in wand_topk(spark, path, "alpha", k=200, mode="spark").collect()
    }
    assert 33 not in got and 40 not in got
    assert len(got) == 118

    # segment-served query algebra agrees
    from inverted_index_spark.qast import Match
    from inverted_index_spark.segquery import segment_query_pandas

    pdf = segment_query_pandas(path, Match("tok33"), k=5)
    assert len(pdf) == 0


def test_delete_entire_shard_range(spark, tmp_path):
    """Deleting every doc of a shard's range drops the shard from the
    manifest on refresh instead of leaving an empty file entry."""
    path = str(tmp_path / "idx")
    idx = build_and_save(spark, _corpus(spark, 96), path, ngrams=False)
    build_segments(spark, idx, path, shard_docs=32, positions=True)
    assert len(load_manifest(path)["shards"]) == 3

    delete_saved(spark, path, _ids(spark, range(32, 64)))
    refresh_segments(spark, load_index_merged(spark, path), path)
    man = load_manifest(path)
    assert sorted(s["shard_id"] for s in man["shards"]) == [0, 2]
    assert segments_fresh(path)
    got = {
        r["doc_id"]
        for r in wand_topk(spark, path, "alpha", k=200, mode="spark").collect()
    }
    assert got == set(range(32)) | set(range(64, 96))


def test_delete_then_compact_then_readd(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_and_save(spark, _corpus(spark, 50), path, ngrams=False)
    delete_saved(spark, path, _ids(spark, [7]))
    compact_index(spark, path)
    # physical fold: no tombstone rows survive, generation reset
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    assert _match_ids(spark, path, "alpha") == [
        i for i in range(50) if i != 7
    ]
    # re-add the deleted id with new content
    upsert_saved(
        spark,
        path,
        spark.createDataFrame(
            [(7, "alpha readded zzz7")], "doc_id long, text string"
        ),
    )
    assert 7 in set(_match_ids(spark, path, "alpha"))
    assert _match_ids(spark, path, "zzz7") == [7]
    assert _match_ids(spark, path, "tok7") == []


def test_delete_readd_without_compact(spark, tmp_path):
    """Generation ordering: delete (gen1) then upsert of the same id
    (gen2) resurrects the doc with the NEW content only."""
    path = str(tmp_path / "idx")
    build_and_save(spark, _corpus(spark, 30), path, ngrams=False)
    delete_saved(spark, path, _ids(spark, [5]))
    assert _match_ids(spark, path, "tok5") == []
    upsert_saved(
        spark,
        path,
        spark.createDataFrame(
            [(5, "alpha phoenix")], "doc_id long, text string"
        ),
    )
    assert _match_ids(spark, path, "phoenix") == [5]
    assert _match_ids(spark, path, "tok5") == []
    idx = load_index(spark, path)
    assert idx.n_docs == 30


def test_delete_absent_ids_is_noop(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_and_save(spark, _corpus(spark, 20), path, ngrams=False)
    idx = delete_saved(spark, path, _ids(spark, [999, 1000]))
    assert idx.n_docs == 20
    assert _match_ids(spark, path, "alpha") == list(range(20))


def test_delete_store_docs_false(spark, tmp_path):
    """No doc store: delete still refreshes postings/derived tables."""
    path = str(tmp_path / "idx")
    build_and_save(
        spark, _corpus(spark, 20), path, ngrams=False, store_docs=False
    )
    idx = delete_saved(spark, path, _ids(spark, [0, 1]))
    assert idx.n_docs == 18
    assert _match_ids(spark, path, "alpha") == list(range(2, 20))


def test_delete_streamed_uncompacted_doc(spark, tmp_path):
    """Uncompacted stream deltas bypass the generation filter, so
    delete_saved folds them into a generation first — a streamed doc is
    deletable the moment it is visible."""
    from inverted_index_spark.streaming import (
        append_batch,
        refresh_index,
        streaming_doc_id,
    )

    path = str(tmp_path / "idx")
    build_and_save(spark, _corpus(spark, 10), path, ngrams=False)
    batch = spark.createDataFrame(
        [("conv-a", 0, "alpha streamed gone"),
         ("conv-b", 0, "alpha streamed kept")],
        "conv_id string, turn_idx int, text string",
    )
    ids = {
        r["conv_id"]: r["doc_id"]
        for r in batch.withColumn("doc_id", streaming_doc_id()).collect()
    }
    append_batch(path, ngrams=False)(batch, 0)

    eng = FtsEngine(refresh_index(spark, path), use_segments=False)
    assert {r["doc_id"] for r in eng.search("streamed", k=None).collect()} == set(
        ids.values()
    )

    delete_saved(spark, path, _ids(spark, [ids["conv-a"]]))
    # fold happened: no stream batches remain
    assert not any(
        x.startswith("batch=")
        for t in ("postings", "docstats", "docs")
        for x in (
            os.listdir(os.path.join(path, "stream_delta", t))
            if os.path.isdir(os.path.join(path, "stream_delta", t))
            else []
        )
    )
    eng2 = FtsEngine(refresh_index(spark, path), use_segments=False)
    assert {r["doc_id"] for r in eng2.search("streamed", k=None).collect()} == {
        ids["conv-b"]
    }
    assert {r["doc_id"] for r in eng2.search("alpha", k=None).collect()} == (
        set(range(10)) | {ids["conv-b"]}
    )
