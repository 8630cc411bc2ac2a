"""Structured Streaming ingestion: incremental index maintenance.

The reference engine is batch/in-memory only; its closest analogue is
the per-document upsert (/root/reference/src/index.rs:35-63). At
transcript scale, new conversation turns arrive continuously, so the
engine supports appending to the index from a stream:

    readStream (new transcript turns)
      -> same tokenize pandas UDF as the batch path
      -> foreachBatch: per micro-batch postings build, appended as new
         parquet files to the postings table (doc-partitioned, so a new
         batch never rewrites existing data), plus docstats append

``foreachBatch`` (not a streaming agg) is the right shape here: the
postings build is a batch transformation of each micro-batch, the sink
is transactional per batch id (Spark tracks committed batch ids in the
checkpoint), and term statistics are re-derived lazily at query time
from the appended files. Watermarking / event-time windows are exposed
for late-turn handling in the session-analytics pipeline
(pipelines/events.py); the index append itself is order-independent
because doc_ids are derived deterministically from (conv_id, turn_idx).

doc_id assignment in a stream cannot use the batch zipWithIndex (a
global sort over all history); instead streaming docs get
``doc_id = xxhash64(conv_id) * 2^20 + turn_idx`` — stable, collision-
checked in tests at corpus scale, order-independent, and monotone per
conversation so per-conversation locality is preserved.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import FtsIndex, load_index
from .udfs import make_tokenize_udf

# streaming doc ids: high bits = conv hash, low 20 bits = turn ordinal
TURN_BITS = 20


def streaming_doc_id():
    """Deterministic, order-independent doc id for a transcript turn."""
    return (
        F.shiftleft(F.abs(F.xxhash64("conv_id")) % F.lit(1 << 42), TURN_BITS)
        + F.col("turn_idx")
    ).cast("long")


def append_batch(index_path: str, ngrams: bool = False):
    """Return a foreachBatch function that appends one micro-batch.

    Each call tokenizes the batch's turns and appends postings +
    docstats rows as new parquet files. Existing files are never
    touched — the postings table is doc-partitioned, so a new doc's
    rows are purely additive (the reference's upsert-remove branch,
    index.rs:38-51, applies only to re-indexed doc ids; streaming
    transcripts are append-only turns).
    """
    tokenize = make_tokenize_udf(ngrams=ngrams)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumn("doc_id", streaming_doc_id()).select(
            "doc_id", "text"
        )
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
            .write.mode("append")
            .parquet(os.path.join(index_path, "postings"))
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
            .write.mode("append")
            .parquet(os.path.join(index_path, "docstats"))
        )
        batch_df.withColumn("doc_id", streaming_doc_id()).write.mode(
            "append"
        ).parquet(os.path.join(index_path, "docs"))

    return fn


def stream_transcripts_to_index(
    transcripts_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    ngrams: bool = False,
    trigger_once: bool = True,
):
    """Wire a transcript readStream into the index (returns the query).

    ``trigger_once`` processes all available data then stops — the
    pattern for incremental batch jobs (cron-style index refresh); pass
    False for a continuous micro-batch stream.
    """
    writer = (
        transcripts_stream.writeStream.foreachBatch(
            append_batch(index_path, ngrams=ngrams)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh_index(spark: SparkSession, index_path: str) -> FtsIndex:
    """Reload the index after stream appends, re-deriving corpus stats.

    meta.json's n_docs/avgdl go stale as batches append; recompute from
    the docstats files (a cheap columnar aggregate) rather than trusting
    the snapshot.
    """
    idx = load_index(spark, index_path)
    stats = idx.docstats.agg(
        F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl")
    ).collect()[0]
    idx.n_docs = int(stats["n"])
    idx.avgdl = float(stats["avgdl"] or 0.0)
    # termdict parquet is a batch snapshot; appended postings change df,
    # so re-derive it from the live postings table
    idx.termdict = idx.postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("long")
        .alias("df_full"),
        F.sum("tf").cast("long").alias("cf"),
    )
    return idx
