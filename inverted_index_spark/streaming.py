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


def hash_collision_bound(n_conversations: int) -> float:
    """Birthday bound on ANY two conversations colliding in hash id
    mode: P ~= n^2 / 2^(CONV_BITS+1)."""
    return min(1.0, float(n_conversations) ** 2 / float(2 ** (CONV_BITS + 1)))


def choose_id_mode(
    expected_conversations: Optional[int] = None,
    max_collision_prob: float = 1e-6,
) -> str:
    """Pick the doc-id mode for a stream.

    'hash' only when the caller states an expected conversation count
    whose birthday bound stays under ``max_collision_prob``
    (n <= sqrt(p * 2^44): ~4.2k conversations at the strict 1e-6
    default, ~132k at 1e-3); 'registry' otherwise — at the
    10^11-conversation design point hash collisions are certain, so the
    safe default when the scale is unknown is the registry."""
    if expected_conversations is None:
        return "registry"
    if hash_collision_bound(expected_conversations) <= max_collision_prob:
        return "hash"
    return "registry"


def _registry_doc_ids(
    spark: SparkSession, batch_df: DataFrame, index_path: str, batch_id: int
) -> DataFrame:
    """Collision-free ids via the conversation registry (see module
    docstring). One anti-join + one tiny max() per batch.

    Replay safety: the registry is read EXCLUDING this batch's own
    ``batch=<id>`` directory. A replayed batch therefore sees exactly
    the registrations that existed before its first attempt, recomputes
    the identical deterministic assignment (anti-join + conv_id-ordered
    prefix sum over the same inputs), and overwrites its directory with
    the same contents — instead of anti-joining against its own partial
    output and deleting its previous assignments (which would silently
    drop every already-registered conversation's turns from the batch).
    This also keeps the write target out of the job's read set (no
    read-while-overwriting a subdirectory of the same path).
    """
    from .transcripts import assign_doc_ids

    reg_dir = os.path.join(index_path, STREAM_DIR, "registry")
    own = f"batch={batch_id}"
    prior_dirs = []
    if os.path.isdir(reg_dir):
        prior_dirs = [
            os.path.join(reg_dir, d)
            for d in sorted(os.listdir(reg_dir))
            if d.startswith("batch=") and d != own
        ]
    reg = None
    base = 0
    if prior_dirs:
        reg = spark.read.parquet(*prior_dirs).select("conv_id", "conv_no")
        base = (reg.agg(F.max("conv_no")).first()[0] or -1) + 1
    new = batch_df.select("conv_id").distinct()
    if reg is not None:
        new = new.join(reg, "conv_id", "left_anti")
    assigned = assign_doc_ids(new, order_cols=["conv_id"]).select(
        "conv_id", (F.col("doc_id") + F.lit(base)).cast("long").alias("conv_no")
    )
    assigned.write.mode("overwrite").parquet(os.path.join(reg_dir, own))
    full = spark.read.parquet(reg_dir).select("conv_id", "conv_no")
    return batch_df.join(full, "conv_id").withColumn(
        "doc_id",
        (F.shiftleft(F.col("conv_no"), TURN_BITS) + F.col("turn_idx")).cast(
            "long"
        ),
    )


def _corpus_docs_excluding(
    spark: SparkSession, index_path: str, batch_id: int
) -> DataFrame:
    """(doc_id, text) of every ALREADY-ACCEPTED document: the base doc
    store plus stream-delta doc batches, excluding the current batch's
    own dir so a foreachBatch replay sees exactly the pre-batch state."""
    from . import commitio

    parts = []
    base = commitio.table_path(index_path, "docs")
    if os.path.isdir(base):
        parts.append(spark.read.parquet(base).select("doc_id", "text"))
    d = os.path.join(index_path, STREAM_DIR, "docs")
    if os.path.isdir(d):
        dirs = [
            os.path.join(d, x)
            for x in sorted(os.listdir(d))
            if x.startswith("batch=") and x != f"batch={batch_id}"
        ]
        if dirs:
            parts.append(
                spark.read.option("basePath", d)
                .parquet(*dirs)
                .select("doc_id", "text")
            )
    if not parts:
        return spark.createDataFrame([], "doc_id long, text string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dedup_batch(
    spark: SparkSession,
    docs: DataFrame,
    dedup_index_path: str,
    index_path: str,
    batch_id: int,
    threshold: float,
    max_bucket_size,
) -> DataFrame:
    """Drop a micro-batch's near-dups before indexing: docs pairing with
    an already-accepted corpus doc are rejected outright (corpus-first —
    accepted data never loses to an arrival), then within-batch clusters
    among the survivors keep one representative. Decisions are
    deterministic and replay-safe: the bucket index and doc store are
    both read excluding this batch's own dirs, and the index extension
    overwrites only ``batch=<id>``."""
    from .pipelines.dedup import (
        extend_dedup_index,
        incremental_near_dup_pairs,
        near_dup_clusters,
    )

    corpus = _corpus_docs_excluding(spark, index_path, batch_id)
    pairs = (
        incremental_near_dup_pairs(
            spark,
            dedup_index_path,
            docs,
            corpus,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            exclude_batches=(str(batch_id),),
        )
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    flag = docs.select("doc_id", F.lit(True).alias("flag"))
    p = (
        pairs.join(
            flag.select(
                F.col("doc_id").alias("doc_a"), F.col("flag").alias("a_new")
            ),
            "doc_a",
            "left",
        )
        .join(
            flag.select(
                F.col("doc_id").alias("doc_b"), F.col("flag").alias("b_new")
            ),
            "doc_b",
            "left",
        )
        .fillna({"a_new": False, "b_new": False})
    )
    vs_corpus = (
        p.filter(F.col("a_new") & ~F.col("b_new"))
        .select(F.col("doc_a").alias("doc_id"))
        .union(
            p.filter(F.col("b_new") & ~F.col("a_new")).select(
                F.col("doc_b").alias("doc_id")
            )
        )
        .distinct()
    )
    both = (
        p.filter(F.col("a_new") & F.col("b_new"))
        .select("doc_a", "doc_b")
        .join(vs_corpus.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_anti")
        .join(vs_corpus.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_anti")
    )
    batch_losers = (
        near_dup_clusters(both).filter(~F.col("keep")).select("doc_id")
    )
    kept = docs.join(
        vs_corpus.union(batch_losers).distinct(), "doc_id", "left_anti"
    ).localCheckpoint()
    extend_dedup_index(kept, dedup_index_path, batch=str(batch_id))
    return kept


def append_batch(
    index_path: str,
    ngrams: bool = False,
    id_mode: str = "hash",
    dedup_index_path: str | None = None,
    dedup_threshold: float = 0.5,
    dedup_max_bucket_size: int | None = None,
):
    """Return a foreachBatch function that applies one micro-batch.

    Each call tokenizes the batch's turns and writes postings, docstats
    and doc-store rows into ``stream_delta/<table>/batch=<id>/`` with
    overwrite — idempotent under foreachBatch replay (see module
    docstring). The doc-store delta carries only the base doc-store
    columns (doc_id, text) so the docs directory keeps one schema.

    ``dedup_index_path`` switches on ingest-time dedup: each batch is
    checked against the persisted LSH bucket index (built with
    ``pipelines.dedup.save_dedup_index``) and near-dups are dropped
    BEFORE tokenization — see ``_dedup_batch`` for the policy and the
    replay-safety argument. The doc store must be enabled (candidate
    verification reads corpus text).
    """
    tokenize = make_tokenize_udf(ngrams=ngrams)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if id_mode == "registry":
            with_ids = _registry_doc_ids(spark, batch_df, index_path, batch_id)
        else:
            with_ids = batch_df.withColumn("doc_id", streaming_doc_id())
        docs = with_ids.select("doc_id", "text")
        if dedup_index_path is not None:
            docs = _dedup_batch(
                spark,
                docs,
                dedup_index_path,
                index_path,
                batch_id,
                dedup_threshold,
                dedup_max_bucket_size,
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
    expected_conversations: Optional[int] = None,
    dedup_index_path: Optional[str] = None,
    dedup_threshold: float = 0.5,
    dedup_max_bucket_size: Optional[int] = None,
):
    """Wire a transcript readStream into the index (returns the query).

    ``trigger_once`` processes all available data then stops — the
    pattern for incremental batch jobs (cron-style index refresh); pass
    False for a continuous micro-batch stream.

    ``id_mode="auto"`` resolves via ``choose_id_mode``: hash ids only
    when ``expected_conversations`` keeps the birthday bound under
    1e-6, registry otherwise. An explicit ``id_mode="hash"`` with a
    stated scale above that bound warns instead of silently risking
    doc-id collisions.

    ``dedup_index_path`` enables ingest-time near-dup filtering against
    a persisted LSH bucket index (see ``append_batch``).
    """
    if id_mode == "auto":
        id_mode = choose_id_mode(expected_conversations)
    elif id_mode == "hash" and expected_conversations is not None:
        p = hash_collision_bound(expected_conversations)
        if p > 1e-6:
            import warnings

            warnings.warn(
                f"hash id mode: conversation-id collision probability "
                f"~{p:.2e} at {expected_conversations} conversations; "
                f"pass id_mode='registry' (collision-free) or 'auto'",
                stacklevel=2,
            )
    writer = (
        transcripts_stream.writeStream.foreachBatch(
            append_batch(
                index_path,
                ngrams=ngrams,
                id_mode=id_mode,
                dedup_index_path=dedup_index_path,
                dedup_threshold=dedup_threshold,
                dedup_max_bucket_size=dedup_max_bucket_size,
            )
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


def _snapshot_batches(index_path: str) -> dict:
    """Batch directories per delta table, frozen at call time. Batches a
    concurrently running stream writes after this snapshot are neither
    read nor deleted by the compaction."""
    snap: dict = {}
    for t in ("postings", "docstats", "docs"):
        d = os.path.join(index_path, STREAM_DIR, t)
        if os.path.isdir(d):
            dirs = sorted(
                os.path.join(d, x)
                for x in os.listdir(d)
                if x.startswith("batch=")
            )
            if dirs:
                snap[t] = dirs
    return snap


def compact_stream(spark: SparkSession, index_path: str) -> None:
    """Fold stream deltas into the index INCREMENTALLY (the off-peak
    maintenance job).

    The base postings files are never read or rewritten: the snapshot of
    stream batches becomes ONE upsert delta generation
    (``postings_delta/gen=g`` + ``tombstones/gen=g`` — the same
    machinery as upsert.upsert_saved), so compaction cost scales with
    the delta size, not the corpus — at the 10^12-turn design point an
    O(corpus) rewrite per maintenance run would be fatal. Only the small
    derived tables (docstats, termdict, docs) are refreshed, each into a
    NEW versioned directory committed with one catalog pointer swap
    (commitio.py). termdict is merged incrementally (base + delta
    aggregate) when the streamed doc ids are all new — the common
    append-only case — and re-derived from the generation-filtered view
    only when a streamed doc id overwrites an existing document.

    After compaction every disk-reading path (load_index — which is
    generation-aware — WAND's termdict lookup, segment builds) sees the
    streamed documents. ``upsert.compact_index`` remains the explicit
    heavyweight operation that folds all generations into a fresh base.

    Only the snapshotted batch directories are deleted at the end;
    batches written concurrently survive for the next run. When the
    index has no base doc store, a streamed doc-store delta is published
    as the initial docs table instead of being dropped. The conversation
    registry is kept — it is ongoing id-assignment state.
    """
    import json as _json
    import shutil

    from . import commitio
    from .upsert import DELTA_DIR, TOMB_DIR, _invalidate_segments

    snap = _snapshot_batches(index_path)
    if not snap:
        return
    meta_path = os.path.join(index_path, "meta.json")
    with open(meta_path) as fh:
        meta = _json.load(fh)
    gen = int(meta.get("generation", 0)) + 1
    updates: dict = {}

    sp = spark.read.parquet(*snap["postings"]) if "postings" in snap else None
    sd = spark.read.parquet(*snap["docstats"]) if "docstats" in snap else None
    dd = spark.read.parquet(*snap["docs"]) if "docs" in snap else None

    base_ds = spark.read.parquet(commitio.table_path(index_path, "docstats"))
    changed = None
    if sd is not None:
        changed = sd.select("doc_id").distinct()
    elif sp is not None:
        changed = sp.select("doc_id").distinct()

    if sp is not None and sd is not None:
        # delta generation = stream postings + synthesized per-doc stat
        # rows (term='', tf=doclen_bytes): later upsert_saved docstats
        # derivations read byte lengths from exactly these rows
        stat_rows = sd.select(
            F.lit("").alias("term"),
            "doc_id",
            F.array()
            .cast("array<struct<begin:int,end:int,pos:int>>")
            .alias("positions"),
            F.col("doclen_bytes").cast("int").alias("tf"),
        )
        cols = ["term", "doc_id", "positions", "tf"]
        (
            sp.select(*cols)
            .unionByName(stat_rows.select(*cols))
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(index_path, DELTA_DIR, f"gen={gen}"))
        )
        changed.write.mode("overwrite").parquet(
            os.path.join(index_path, TOMB_DIR, f"gen={gen}")
        )

        # docstats: base minus superseded docs, plus the stream's rows
        updates["docstats"] = commitio.next_version(index_path, "docstats")
        (
            base_ds.join(changed, "doc_id", "left_anti")
            .unionByName(sd.select(*base_ds.columns))
            .write.mode("overwrite")
            .parquet(
                commitio.version_dir(
                    index_path, "docstats", updates["docstats"]
                )
            )
        )

        # termdict: incremental merge when the stream only appended new
        # docs (no base contributions to subtract); full re-derive from
        # the generation-filtered view otherwise
        n_overlap = changed.join(base_ds.select("doc_id"), "doc_id").count()
        delta_td = (
            sp.filter(F.col("term") != "")
            .groupBy("term")
            .agg(
                F.count("*").cast("long").alias("df"),
                F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
                .cast("long")
                .alias("df_full"),
                F.sum("tf").cast("long").alias("cf"),
            )
        )
        updates["termdict"] = commitio.next_version(index_path, "termdict")
        if n_overlap == 0:
            base_td = spark.read.parquet(
                commitio.table_path(index_path, "termdict")
            )
            merged_td = (
                base_td.unionByName(delta_td)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("df_full").cast("long").alias("df_full"),
                    F.sum("cf").cast("long").alias("cf"),
                )
            )
        else:
            from .upsert import merged_postings

            # merged_postings scans the postings_delta directory itself,
            # so the gen written above is already part of the view
            merged_td = (
                merged_postings(spark, index_path)
                .filter(F.col("term") != "")
                .groupBy("term")
                .agg(
                    F.count("*").cast("long").alias("df"),
                    F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
                    .cast("long")
                    .alias("df_full"),
                    F.sum("tf").cast("long").alias("cf"),
                )
            )
        merged_td.write.mode("overwrite").parquet(
            commitio.version_dir(index_path, "termdict", updates["termdict"])
        )

    docs_dir = commitio.table_path(index_path, "docs")
    if dd is not None:
        updates["docs"] = commitio.next_version(index_path, "docs")
        new_docs = dd.select("doc_id", "text")
        if os.path.isdir(docs_dir):
            new_docs = (
                spark.read.parquet(docs_dir)
                .select("doc_id", "text")
                .join(dd.select("doc_id").distinct(), "doc_id", "left_anti")
                .unionByName(new_docs)
            )
        # no base doc store (store_docs=False): the stream delta BECOMES
        # the initial docs table instead of being dropped below
        new_docs.write.mode("overwrite").parquet(
            commitio.version_dir(index_path, "docs", updates["docs"])
        )

    # stream compaction writes delta generation `gen`: record it as the
    # snapshot's delta high-water mark (time travel, commitio.publish)
    superseded = commitio.publish(
        index_path, updates, extra={"@delta_gen": str(gen)}
    )
    commitio.gc_superseded(index_path, superseded)

    if changed is not None:
        _invalidate_segments(spark, index_path, changed)

    # delete ONLY the snapshotted batch directories (plus each table dir
    # if that leaves it empty — concurrent batches keep it alive)
    for t, dirs in snap.items():
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        try:
            os.rmdir(os.path.join(index_path, STREAM_DIR, t))
        except OSError:
            pass

    stats = (
        spark.read.parquet(commitio.table_path(index_path, "docstats"))
        .agg(F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl"))
        .collect()[0]
    )
    if sp is not None and sd is not None:
        meta["generation"] = gen
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
