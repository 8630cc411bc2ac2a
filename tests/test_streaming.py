"""Structured Streaming incremental index append (SURVEY §2.4 streaming
row: out of reference scope, engine extension)."""

import os

from pyspark.sql import functions as F

from inverted_index_spark.build import build_and_save
from inverted_index_spark.query import FtsEngine
from inverted_index_spark.streaming import (
    refresh_index,
    stream_transcripts_to_index,
    streaming_doc_id,
)
from inverted_index_spark.transcripts import synthetic_transcripts

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def test_streaming_doc_id_unique_and_deterministic(spark):
    tr = synthetic_transcripts(spark, n_conversations=500, turns_per_conv=6)
    ids = tr.withColumn("doc_id", streaming_doc_id())
    assert ids.select("doc_id").distinct().count() == 3000
    a = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in ids.collect()}
    b = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in tr.repartition(7).withColumn("doc_id", streaming_doc_id()).collect()
    }
    assert a == b


def test_stream_append_then_query(spark, tmp_path):
    idx_path = str(tmp_path / "idx")
    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    # bootstrap: batch-build over the first 40 conversations
    all_tr = synthetic_transcripts(spark, n_conversations=60, turns_per_conv=4)
    first = all_tr.filter(F.col("conv_id") < "conv-00000040")
    boot_docs = first.withColumn("doc_id", streaming_doc_id()).select(
        "doc_id", "text"
    )
    build_and_save(spark, boot_docs, idx_path, ngrams=False)

    # late-arriving conversations land as files; stream them in
    rest = all_tr.filter(F.col("conv_id") >= "conv-00000040")
    rest.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    q = stream_transcripts_to_index(stream, idx_path, ckpt, ngrams=False)
    q.awaitTermination(120)

    idx = refresh_index(spark, idx_path)
    assert idx.n_docs == 240
    # a term present in the streamed docs is now searchable
    streamed_ids = {
        r["doc_id"]
        for r in rest.withColumn("doc_id", streaming_doc_id())
        .select("doc_id")
        .collect()
    }
    eng = FtsEngine(idx)
    got = {r["doc_id"] for r in eng.bm25("merge scan", k=300).collect()}
    assert got & streamed_ids, "streamed docs never matched"

    # restart with same checkpoint: no reprocessing, counts unchanged
    stream2 = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    q2 = stream_transcripts_to_index(stream2, idx_path, ckpt, ngrams=False)
    q2.awaitTermination(60)
    idx2 = refresh_index(spark, idx_path)
    assert idx2.n_docs == 240


def test_append_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME batch id must
    overwrite, not duplicate, its postings/docstats/docs output."""
    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.streaming import append_batch

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=10, turns_per_conv=3)
    boot = tr.filter(F.col("conv_id") < "conv-00000005")
    build_and_save(
        spark,
        boot.withColumn("doc_id", streaming_doc_id()).select("doc_id", "text"),
        idx_path,
        ngrams=False,
    )
    rest = tr.filter(F.col("conv_id") >= "conv-00000005")
    fn = append_batch(idx_path, ngrams=False)
    fn(rest, 0)
    once = refresh_index(spark, idx_path)
    n_docs, n_postings = once.n_docs, once.postings.count()
    fn(rest, 0)  # crash-replay of the same micro-batch
    twice = refresh_index(spark, idx_path)
    assert twice.n_docs == n_docs == 30
    assert twice.postings.count() == n_postings


def test_stream_registry_mode_dense_stable_ids(spark, tmp_path):
    """Registry id mode: collision-free dense conversation ordinals,
    stable across batches (a conversation seen again reuses its
    ordinal), doc store keeps the (doc_id, text) schema."""
    from inverted_index_spark.streaming import TURN_BITS, append_batch

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=12, turns_per_conv=2)
    build_and_save(
        spark,
        tr.filter(F.col("conv_id") < "conv-00000004")
        .withColumn("doc_id", streaming_doc_id())
        .select("doc_id", "text"),
        idx_path,
        ngrams=False,
    )
    fn = append_batch(idx_path, ngrams=False, id_mode="registry")
    fn(tr.filter(
        (F.col("conv_id") >= "conv-00000004")
        & (F.col("conv_id") < "conv-00000008")
    ), 0)
    fn(tr.filter(F.col("conv_id") >= "conv-00000006"), 1)  # overlap: 6,7 again
    import os

    reg = spark.read.parquet(
        os.path.join(idx_path, "stream_delta", "registry")
    ).select("conv_id", "conv_no")
    rows = {r["conv_id"]: r["conv_no"] for r in reg.collect()}
    # 8 registered conversations, each exactly once, dense ordinals
    assert len(rows) == 8 and sorted(rows.values()) == list(range(8))
    docs_delta = spark.read.parquet(
        os.path.join(idx_path, "stream_delta", "docs")
    ).drop("batch")
    assert set(docs_delta.columns) == {"doc_id", "text"}
    # batch 1 re-streamed convs 6,7: their ids reuse registry ordinals,
    # so the union view dedupes to one row per (conv, turn)
    idx = refresh_index(spark, idx_path)
    streamed = idx.docstats.filter(
        F.col("doc_id") < (8 << TURN_BITS)
    )
    assert streamed.select("doc_id").distinct().count() == 8 * 2


def test_stream_append_then_incremental_segments(spark, tmp_path):
    """Streamed docs flow onto the segment scale path: after an append,
    build_segments(resume=True) builds ONLY the new docs' shards (their
    doc-range shard ids are new) and WAND + segment search serve the
    streamed content."""
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.segquery import segment_search
    from inverted_index_spark.streaming import append_batch
    from inverted_index_spark.wand import wand_topk

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=30, turns_per_conv=3)
    boot = tr.filter(F.col("conv_id") < "conv-00000020")
    build_and_save(
        spark,
        boot.withColumn("doc_id", streaming_doc_id()).select("doc_id", "text"),
        idx_path,
        ngrams=False,
    )
    idx0 = refresh_index(spark, idx_path)
    m0 = build_segments(spark, idx0, idx_path, shard_docs=64, positions=True)

    rest = tr.filter(F.col("conv_id") >= "conv-00000020").withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzstreamedterm"))
    )
    append_batch(idx_path, ngrams=False)(rest, 0)

    # fold the deltas into the base tables so every DISK-reading path
    # (WAND's termdict lookup, segment resume) sees the streamed docs
    from inverted_index_spark.build import load_index
    from inverted_index_spark.streaming import compact_stream

    compact_stream(spark, idx_path)
    assert not os.path.isdir(
        os.path.join(idx_path, "stream_delta", "postings")
    )
    idx1 = load_index(spark, idx_path)
    m1 = build_segments(spark, idx1, idx_path, shard_docs=64, positions=True)
    assert m1["resumed_shards"] == len(m0["shards"])
    assert m1["built_shards"] >= 1  # only the streamed doc ranges

    streamed_ids = {
        r["doc_id"]
        for r in rest.withColumn("doc_id", streaming_doc_id())
        .select("doc_id")
        .collect()
    }
    got = {
        r["doc_id"]
        for r in wand_topk(spark, idx_path, "zzstreamedterm", k=50).collect()
    }
    assert got == streamed_ids
    got2 = {
        r["doc_id"]
        for r in segment_search(spark, idx_path, "zzstreamedterm").collect()
    }
    assert got2 == streamed_ids


def test_registry_replay_preserves_assignments(spark, tmp_path):
    """Regression (round-3 advice): a replayed registry batch must
    reproduce identical registry contents. Anti-joining against the
    batch's OWN previous output deleted its conv_no assignments and
    silently dropped every one of those conversations' turns."""
    from inverted_index_spark.streaming import append_batch

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=6, turns_per_conv=2)
    fn = append_batch(idx_path, ngrams=False, id_mode="registry")
    b0 = tr.filter(F.col("conv_id") < "conv-00000003")
    b1 = tr.filter(F.col("conv_id") >= "conv-00000003")
    fn(b0, 0)
    fn(b1, 1)

    def registry():
        return {
            r["conv_id"]: r["conv_no"]
            for r in spark.read.parquet(
                os.path.join(idx_path, "stream_delta", "registry")
            ).collect()
        }

    def batch1_postings():
        return (
            spark.read.parquet(
                os.path.join(idx_path, "stream_delta", "postings", "batch=1")
            ).count()
        )

    reg_before, n_before = registry(), batch1_postings()
    assert n_before > 0
    # replay batch 1 (crash after the registry write, before/after the
    # postings write — foreachBatch re-runs the whole batch)
    fn(b1, 1)
    assert registry() == reg_before
    assert batch1_postings() == n_before


def test_compact_stream_incremental_base_untouched(spark, tmp_path):
    """compact_stream folds stream deltas as ONE upsert delta
    generation: the base postings files are byte-identical afterwards
    and the catalog's postings pointer is unchanged — compaction cost
    scales with the delta, not the corpus."""
    from inverted_index_spark.commitio import table_path
    from inverted_index_spark.build import load_index
    from inverted_index_spark.streaming import append_batch, compact_stream

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=20, turns_per_conv=3)
    boot = tr.filter(F.col("conv_id") < "conv-00000015")
    build_and_save(
        spark,
        boot.withColumn("doc_id", streaming_doc_id()).select("doc_id", "text"),
        idx_path,
        ngrams=False,
    )
    rest = tr.filter(F.col("conv_id") >= "conv-00000015").withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzcompactincr"))
    )
    append_batch(idx_path, ngrams=False)(rest, 0)

    pdir = table_path(idx_path, "postings")
    before = {
        f: (os.path.getsize(os.path.join(pdir, f)),
            os.path.getmtime(os.path.join(pdir, f)))
        for f in os.listdir(pdir)
    }
    compact_stream(spark, idx_path)
    after = {
        f: (os.path.getsize(os.path.join(pdir, f)),
            os.path.getmtime(os.path.join(pdir, f)))
        for f in os.listdir(pdir)
    }
    assert after == before
    assert table_path(idx_path, "postings") == pdir
    # the delta generation serves the streamed docs through load_index
    idx = load_index(spark, idx_path)
    n_streamed = rest.count()
    assert (
        idx.postings.filter(F.col("term") == "zzcompactincr").count()
        == n_streamed
    )
    assert idx.n_docs == 60
    # termdict was merged incrementally and carries the streamed term
    assert (
        idx.termdict.filter(F.col("term") == "zzcompactincr").first()["df"]
        == n_streamed
    )


def test_compact_stream_publishes_docs_without_base(spark, tmp_path):
    """Regression (round-3 advice): with store_docs=False there is no
    base docs dir — streamed doc-store rows must be published as the
    initial docs table, not deleted."""
    from inverted_index_spark.commitio import table_path
    from inverted_index_spark.build import load_index
    from inverted_index_spark.streaming import append_batch, compact_stream

    idx_path = str(tmp_path / "idx")
    tr = synthetic_transcripts(spark, n_conversations=10, turns_per_conv=2)
    boot = tr.filter(F.col("conv_id") < "conv-00000008")
    build_and_save(
        spark,
        boot.withColumn("doc_id", streaming_doc_id()).select("doc_id", "text"),
        idx_path,
        ngrams=False,
        store_docs=False,
    )
    rest = tr.filter(F.col("conv_id") >= "conv-00000008")
    append_batch(idx_path, ngrams=False)(rest, 0)
    compact_stream(spark, idx_path)
    docs_dir = table_path(idx_path, "docs")
    assert os.path.isdir(docs_dir)
    streamed_ids = {
        r["doc_id"]
        for r in rest.withColumn("doc_id", streaming_doc_id())
        .select("doc_id")
        .collect()
    }
    stored = {
        r["doc_id"] for r in spark.read.parquet(docs_dir).collect()
    }
    assert stored == streamed_ids
    assert load_index(spark, idx_path).docs is not None


def test_id_mode_selection_and_warning(spark, tmp_path):
    """id_mode='auto' picks hash only under the collision bound;
    explicit hash above the bound warns (round-3: the 10^11-conversation
    design point makes hash collisions certain)."""
    import warnings

    from inverted_index_spark.streaming import (
        choose_id_mode,
        hash_collision_bound,
        stream_transcripts_to_index,
    )

    assert choose_id_mode(None) == "registry"
    # n^2 / 2^44 <= 1e-6 holds up to n ~= 4195
    assert choose_id_mode(1_000) == "hash"
    assert choose_id_mode(10_000) == "registry"
    assert choose_id_mode(10**11) == "registry"
    assert hash_collision_bound(10**11) == 1.0
    assert hash_collision_bound(1_000) < 1e-6

    src_dir = str(tmp_path / "in")
    tr = synthetic_transcripts(spark, n_conversations=4, turns_per_conv=2)
    tr.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        q = stream_transcripts_to_index(
            stream,
            str(tmp_path / "idx"),
            str(tmp_path / "ckpt"),
            ngrams=False,
            id_mode="hash",
            expected_conversations=10**9,
        )
        q.awaitTermination(60)
        assert any("collision" in str(x.message) for x in w)

    # auto at huge scale -> registry ids (dense ordinals, not hashes)
    stream2 = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    q2 = stream_transcripts_to_index(
        stream2,
        str(tmp_path / "idx2"),
        str(tmp_path / "ckpt2"),
        ngrams=False,
        id_mode="auto",
        expected_conversations=10**9,
    )
    q2.awaitTermination(60)
    reg_dir = os.path.join(str(tmp_path / "idx2"), "stream_delta", "registry")
    assert os.path.isdir(reg_dir)


def test_stream_ingest_dedup_drops_near_dups(spark, tmp_path):
    """Ingest-time dedup: a streamed doc near-duping an ALREADY-ACCEPTED
    corpus doc is rejected; within-batch twins keep one representative;
    unique docs pass; the bucket index is extended with kept docs only."""
    import datetime

    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        save_dedup_index,
    )

    idx_path = str(tmp_path / "idx")
    dix = str(tmp_path / "dix")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime.datetime(2026, 1, 1)

    boot_rows = [
        ("boot-0", 0, "user",
         "the quick brown fox jumps over the lazy dog today", None, ts),
        ("boot-1", 0, "user",
         "completely different words about spark shuffles here", None, ts),
        ("boot-2", 0, "user",
         "a third unrelated document mentioning merge scan pipelines", None, ts),
    ]
    boot = spark.createDataFrame(boot_rows, TRANSCRIPT_SCHEMA)
    boot_docs = boot.withColumn("doc_id", streaming_doc_id()).select(
        "doc_id", "text"
    )
    build_and_save(spark, boot_docs, idx_path, ngrams=False)
    save_dedup_index(
        build_dedup_index(boot_docs, num_hashes=8, rows_per_band=2, k=2),
        dix, num_hashes=8, rows_per_band=2, k=2,
    )

    new_rows = [
        # near-dup of boot-0 (J=0.8 on bigrams) -> rejected vs corpus
        ("s-corpdup", 0, "user",
         "the quick brown fox jumps over the lazy dog tonight", None, ts),
        ("s-uniq", 0, "user",
         "entirely novel sentence with no overlap to anything stored", None, ts),
        # within-batch twins -> exactly one kept
        ("s-twin-a", 0, "user",
         "twin documents sharing almost every word in this sentence yes", None, ts),
        ("s-twin-b", 0, "user",
         "twin documents sharing almost every word in this sentence indeed", None, ts),
    ]
    spark.createDataFrame(new_rows, TRANSCRIPT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = stream_transcripts_to_index(
        stream, idx_path, ckpt, ngrams=False,
        dedup_index_path=dix, dedup_threshold=0.5,
    )
    q.awaitTermination(120)

    idx = refresh_index(spark, idx_path)
    texts = [r["text"] for r in idx.docs.collect()]
    assert idx.n_docs == 5  # 3 boot + uniq + one twin
    assert not any("tonight" in t for t in texts), "corpus near-dup ingested"
    assert any("novel" in t for t in texts)
    assert sum("twin documents" in t for t in texts) == 1
    # the bucket index gained exactly the 2 kept docs' rows (4 bands each)
    import pyspark.sql.functions as SF
    added = (
        spark.read.parquet(f"{dix}/buckets")
        .filter(SF.col("batch") != "base")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert added == 2


def test_stream_ingest_dedup_replay_is_idempotent(spark, tmp_path):
    """Crash-replay of a deduped batch must reproduce the ORIGINAL
    decision: the replayed read excludes the batch's own bucket/doc
    dirs, so previously-kept docs do not self-match and vanish."""
    import datetime

    from inverted_index_spark.streaming import append_batch
    from inverted_index_spark.pipelines.dedup import (
        build_dedup_index,
        save_dedup_index,
    )

    idx_path = str(tmp_path / "idx")
    dix = str(tmp_path / "dix")
    ts = datetime.datetime(2026, 1, 1)
    boot_rows = [
        ("boot-0", 0, "user",
         "the quick brown fox jumps over the lazy dog today", None, ts),
        ("boot-1", 0, "user",
         "completely different words about spark shuffles here", None, ts),
    ]
    boot = spark.createDataFrame(boot_rows, TRANSCRIPT_SCHEMA)
    boot_docs = boot.withColumn("doc_id", streaming_doc_id()).select(
        "doc_id", "text"
    )
    build_and_save(spark, boot_docs, idx_path, ngrams=False)
    save_dedup_index(
        build_dedup_index(boot_docs, num_hashes=8, rows_per_band=2, k=2),
        dix, num_hashes=8, rows_per_band=2, k=2,
    )
    batch = spark.createDataFrame(
        [
            ("s-corpdup", 0, "user",
             "the quick brown fox jumps over the lazy dog tonight", None, ts),
            ("s-uniq", 0, "user",
             "entirely novel sentence with no overlap to anything stored",
             None, ts),
        ],
        TRANSCRIPT_SCHEMA,
    )
    fn = append_batch(idx_path, ngrams=False, dedup_index_path=dix,
                      dedup_threshold=0.5)
    fn(batch, 0)
    once = refresh_index(spark, idx_path)
    texts_once = sorted(r["text"] for r in once.docs.collect())
    assert once.n_docs == 3  # 2 boot + uniq; corpdup rejected
    fn(batch, 0)  # crash-replay: same batch id, index already extended
    twice = refresh_index(spark, idx_path)
    assert twice.n_docs == 3
    assert sorted(r["text"] for r in twice.docs.collect()) == texts_once
    import pyspark.sql.functions as SF
    added = (
        spark.read.parquet(f"{dix}/buckets")
        .filter(SF.col("batch") != "base")
        .select("doc_id").distinct().count()
    )
    assert added == 1  # only s-uniq, once
