"""Structured Streaming ingestion: incremental index maintenance.

The reference engine is batch/in-memory only; its closest analogue is
the per-document upsert (/root/reference/src/index.rs:35-63). At
transcript scale, new conversation turns arrive continuously, so the
engine supports appending to the index from a stream:

    readStream (new transcript turns)
      -> same tokenize pandas UDF as the batch path
      -> foreachBatch: per micro-batch postings build, written into
         batch-id-keyed delta directories next to the base index

Idempotency / exactly-once
--------------------------
``foreachBatch`` is at-least-once: after a crash Spark replays the whole
micro-batch. Every write here therefore lands in a directory keyed by
the batch id (``stream_delta/postings/batch=<id>/`` etc.) with
``mode("overwrite")`` — a replayed batch overwrites its own partial
output instead of appending a duplicate, which makes the sink
effectively exactly-once (the classic idempotent-foreachBatch pattern).
The base index directories are never touched by the stream;
``refresh_index`` presents base + deltas as one view.

doc_id assignment
-----------------
A stream cannot use the batch zipWithIndex (a global sort over all
history). Two modes:

* **hash** (default, stateless): ``doc_id = pmod(xxhash64(conv_id),
  2^43) << 20 | turn_idx``. 43 conversation bits is every bit the
  63-bit non-negative long leaves after the 20 turn bits. Collision
  probability between conversations is the birthday bound
  ``P ~= n^2 / 2^44``: negligible below ~10^5 conversations (P<1e-4 at
  4e4), ~0.3% at 1e6, and certain at the 10^11-conversation design
  point — at that scale use the registry mode.
* **registry** (``id_mode="registry"``): a conversation registry table
  (``conv_id -> conv_no``, dense longs) is maintained incrementally —
  each batch anti-joins its conversations against the registry and
  assigns new ones the next free ordinals (scalable prefix-sum
  assignment, transcripts.assign_doc_ids). Collision-free by
  construction for up to 2^43 conversations x 2^20 turns. Registry
  appends are batch-id-keyed too, so replays re-use the already
  registered ordinals instead of re-assigning.

Ordering: the index append is order-independent in both modes — ids
derive from (conv_id, turn_idx), not arrival order. Watermarking /
event-time windows for late-turn analytics live in pipelines/events.py.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import FtsIndex, load_index
from .udfs import make_tokenize_udf

# streaming doc ids: high bits = conversation key, low 20 bits = turn
TURN_BITS = 20
CONV_BITS = 43  # 63 non-negative long bits - TURN_BITS
STREAM_DIR = "stream_delta"


def streaming_doc_id():
    """Deterministic, order-independent doc id for a transcript turn
    (hash mode — see module docstring for the collision bound)."""
    return (
        F.shiftleft(F.pmod(F.xxhash64("conv_id"), F.lit(1 << CONV_BITS)), TURN_BITS)
        + F.col("turn_idx")
    ).cast("long")


def _registry_doc_ids(
    spark: SparkSession, batch_df: DataFrame, index_path: str, batch_id: int
) -> DataFrame:
    """Collision-free ids via the conversation registry (see module
    docstring). One anti-join + one tiny max() per batch; the registry
    write is batch-id-keyed and therefore replay-idempotent."""
    from .transcripts import assign_doc_ids

    reg_dir = os.path.join(index_path, STREAM_DIR, "registry")
    reg = None
    base = 0
    if os.path.isdir(reg_dir) and os.listdir(reg_dir):
        reg = spark.read.parquet(reg_dir).select("conv_id", "conv_no")
        base = (reg.agg(F.max("conv_no")).first()[0] or -1) + 1
    new = batch_df.select("conv_id").distinct()
    if reg is not None:
        new = new.join(reg, "conv_id", "left_anti")
    assigned = assign_doc_ids(new, order_cols=["conv_id"]).select(
        "conv_id", (F.col("doc_id") + F.lit(base)).cast("long").alias("conv_no")
    )
    assigned.write.mode("overwrite").parquet(
        os.path.join(reg_dir, f"batch={batch_id}")
    )
    full = spark.read.parquet(reg_dir).select("conv_id", "conv_no")
    return batch_df.join(full, "conv_id").withColumn(
        "doc_id",
        (F.shiftleft(F.col("conv_no"), TURN_BITS) + F.col("turn_idx")).cast(
            "long"
        ),
    )


def append_batch(index_path: str, ngrams: bool = False, id_mode: str = "hash"):
    """Return a foreachBatch function that applies one micro-batch.

    Each call tokenizes the batch's turns and writes postings, docstats
    and doc-store rows into ``stream_delta/<table>/batch=<id>/`` with
    overwrite — idempotent under foreachBatch replay (see module
    docstring). The doc-store delta carries only the base doc-store
    columns (doc_id, text) so the docs directory keeps one schema.
    """
    tokenize = make_tokenize_udf(ngrams=ngrams)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if id_mode == "registry":
            with_ids = _registry_doc_ids(spark, batch_df, index_path, batch_id)
        else:
            with_ids = batch_df.withColumn("doc_id", streaming_doc_id())
        docs = with_ids.select("doc_id", "text")
        tokens = docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("t")
        ).select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.begin").alias("begin"),
            F.col("t.end").alias("end"),
            F.col("t.pos").alias("pos"),
            F.col("t.full").alias("full"),
        )
        delta = os.path.join(index_path, STREAM_DIR)
        (
            tokens.groupBy("term", "doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("begin", "end", "pos"))
                ).alias("positions"),
                F.sum(F.when(F.col("full"), 1).otherwise(0))
                .cast("int")
                .alias("tf"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(delta, "postings", f"batch={batch_id}"))
        )
        (
            docs.select("doc_id", F.octet_length("text").alias("doclen_bytes"))
            .join(
                tokens.filter("full").groupBy("doc_id").agg(
                    F.count("*").cast("int").alias("doclen_tokens")
                ),
                "doc_id",
                "left",
            )
            .fillna({"doclen_tokens": 0})
            .write.mode("overwrite")
            .parquet(os.path.join(delta, "docstats", f"batch={batch_id}"))
        )
        docs.write.mode("overwrite").parquet(
            os.path.join(delta, "docs", f"batch={batch_id}")
        )

    return fn


def stream_transcripts_to_index(
    transcripts_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    ngrams: bool = False,
    trigger_once: bool = True,
    id_mode: str = "hash",
):
    """Wire a transcript readStream into the index (returns the query).

    ``trigger_once`` processes all available data then stops — the
    pattern for incremental batch jobs (cron-style index refresh); pass
    False for a continuous micro-batch stream.
    """
    writer = (
        transcripts_stream.writeStream.foreachBatch(
            append_batch(index_path, ngrams=ngrams, id_mode=id_mode)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _delta(spark: SparkSession, index_path: str, table: str) -> Optional[DataFrame]:
    d = os.path.join(index_path, STREAM_DIR, table)
    if os.path.isdir(d) and os.listdir(d):
        return spark.read.parquet(d).drop("batch")
    return None


def compact_stream(spark: SparkSession, index_path: str) -> None:
    """Fold stream deltas into the base tables (the off-peak maintenance
    job, cf. upsert.compact_index): postings/docstats/docs each land in
    a NEW versioned directory committed with one catalog pointer swap
    (commitio.py), termdict is recomputed from the compacted postings,
    and the delta directories are removed (the conversation registry is
    kept — it is ongoing id-assignment state). After compaction every
    disk-reading path (load_index, WAND's termdict lookup, segment
    builds) sees the streamed documents without needing refresh_index's
    in-memory union view."""
    import json as _json

    from . import commitio

    delta_root = os.path.join(index_path, STREAM_DIR)
    tables = [
        t
        for t in ("postings", "docstats", "docs")
        if _delta(spark, index_path, t) is not None
    ]
    if not tables:
        return
    updates = {}
    # postings: RAW base (keeps the term='' stat rows) + delta rows
    base_raw = spark.read.parquet(commitio.table_path(index_path, "postings"))
    dp = _delta(spark, index_path, "postings")
    newp = (
        base_raw.unionByName(dp.select(*base_raw.columns))
        if dp is not None
        else base_raw
    )
    gen = commitio.next_version(index_path, "postings")
    newp.write.mode("overwrite").parquet(
        commitio.version_dir(index_path, "postings", gen)
    )
    updates["postings"] = gen

    ds = _delta(spark, index_path, "docstats")
    base_ds = spark.read.parquet(commitio.table_path(index_path, "docstats"))
    newds = (
        base_ds.unionByName(ds.select(*base_ds.columns))
        if ds is not None
        else base_ds
    )
    gen = commitio.next_version(index_path, "docstats")
    newds.write.mode("overwrite").parquet(
        commitio.version_dir(index_path, "docstats", gen)
    )
    updates["docstats"] = gen

    dd = _delta(spark, index_path, "docs")
    docs_dir = commitio.table_path(index_path, "docs")
    if dd is not None and os.path.isdir(docs_dir):
        base_docs = spark.read.parquet(docs_dir)
        gen = commitio.next_version(index_path, "docs")
        base_docs.select("doc_id", "text").unionByName(
            dd.select("doc_id", "text")
        ).write.mode("overwrite").parquet(
            commitio.version_dir(index_path, "docs", gen)
        )
        updates["docs"] = gen

    gen = commitio.next_version(index_path, "termdict")
    (
        spark.read.parquet(commitio.version_dir(index_path, "postings", updates["postings"]))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
            .cast("long")
            .alias("df_full"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .write.mode("overwrite")
        .parquet(commitio.version_dir(index_path, "termdict", gen))
    )
    updates["termdict"] = gen

    superseded = commitio.publish(index_path, updates)
    commitio.gc_superseded(index_path, superseded)
    import shutil

    for t in ("postings", "docstats", "docs"):
        shutil.rmtree(os.path.join(delta_root, t), ignore_errors=True)

    # meta.json n_docs/avgdl now reflect the compacted docstats
    meta_path = os.path.join(index_path, "meta.json")
    with open(meta_path) as fh:
        meta = _json.load(fh)
    stats = (
        spark.read.parquet(commitio.table_path(index_path, "docstats"))
        .agg(F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl"))
        .collect()[0]
    )
    meta["n_docs"] = int(stats["n"])
    meta["avgdl"] = float(stats["avgdl"] or 0.0)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(meta, fh)
    os.replace(tmp, meta_path)


def refresh_index(spark: SparkSession, index_path: str) -> FtsIndex:
    """Base index + stream deltas as one queryable view.

    meta.json's n_docs/avgdl and the termdict snapshot cover only the
    base build; this re-derives them over base+delta (cheap columnar
    aggregates). The base directories on disk are untouched — run
    ``compact_stream`` to fold deltas in durably so disk-only readers
    (WAND, segment builds after restart) see the streamed docs.
    """
    idx = load_index(spark, index_path)
    dp = _delta(spark, index_path, "postings")
    if dp is not None:
        idx.postings = idx.postings.unionByName(
            dp.select(*idx.postings.columns)
        )
    ds = _delta(spark, index_path, "docstats")
    if ds is not None:
        idx.docstats = idx.docstats.unionByName(
            ds.select(*idx.docstats.columns)
        )
    dd = _delta(spark, index_path, "docs")
    if dd is not None and idx.docs is not None:
        idx.docs = idx.docs.select("doc_id", "text").unionByName(
            dd.select("doc_id", "text")
        )
    elif dd is not None:
        idx.docs = dd.select("doc_id", "text")
    stats = idx.docstats.agg(
        F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl")
    ).collect()[0]
    idx.n_docs = int(stats["n"])
    idx.avgdl = float(stats["avgdl"] or 0.0)
    # termdict parquet is a batch snapshot; appended postings change df,
    # so re-derive it from the live postings view
    idx.termdict = idx.postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("long")
        .alias("df_full"),
        F.sum("tf").cast("long").alias("cf"),
    )
    return idx
