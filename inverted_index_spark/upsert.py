"""Incremental upsert for saved indexes: MERGE semantics, no base rewrite.

The reference upserts one document at a time by deleting its old
postings in place (/root/reference/src/index.rs:36-51). In-place surgery
on immutable parquet is a rewrite of every touched file, so at scale the
engine uses the lakehouse pattern instead (Iceberg MERGE INTO /
delete-files semantics, hand-rolled over plain parquet):

  * each upsert batch is a **generation** g (monotone, in meta.json);
  * the batch's postings (same assembly kernels as the batch build,
    including the term='' per-doc stat rows) land as NEW files under
    ``postings_delta/gen=g/`` — the base is never touched;
  * the batch's doc ids land in ``tombstones/gen=g/``;
  * the read view keeps a posting row of generation r iff
    ``r >= max tombstone generation for its doc`` — so a re-indexed
    doc's old rows (r < g) vanish and its new rows (r = g) survive,
    across any number of generations;
  * termdict and docstats are re-derived from the merged view per batch
    (small columnar aggregates); ``compact_index`` folds everything
    back into a fresh generation-0 base.

Correctness matches the reference's observable semantics: stale
postings gone, stale terms disappear from the term dictionary (their
df drops to 0 and the aggregate drops the row), doc stats updated
(test_upsert_incremental.py mirrors reference test update_doc).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import commitio
from .build import FtsIndex, load_index
from .udfs import POSTINGS_ROW_SCHEMA

DELTA_DIR = "postings_delta"
TOMB_DIR = "tombstones"


def _meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def _write_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "meta.json"))


def merged_postings(spark: SparkSession, path: str) -> DataFrame:
    """Generation-filtered postings view (stat rows included).

    Base rows are generation 0; delta rows carry their directory's
    ``gen``. A per-doc max-tombstone-generation table (one small agg)
    joins against every row: keep iff ``row.gen >= max_tomb_gen(doc)``.
    """
    base = spark.read.parquet(commitio.table_path(path, "postings")).withColumn(
        "gen", F.lit(0)
    )
    # time travel: a pinned snapshot carries the delta high-water mark
    # its commit recorded (@delta_gen) — later delta/tombstone
    # generations are invisible to the pinned read, exactly as the
    # catalog-versioned tables are
    pinned = commitio.pinned_state(path)
    dmax = int(pinned.get("@delta_gen", 0)) if pinned is not None else None
    delta_path = os.path.join(path, DELTA_DIR)
    if os.path.isdir(delta_path) and os.listdir(delta_path):
        delta = spark.read.parquet(delta_path)
        if dmax is not None:
            delta = delta.filter(F.col("gen") <= dmax)
        allp = base.unionByName(delta.select(*base.columns))
    else:
        allp = base
    tomb_path = os.path.join(path, TOMB_DIR)
    if not (os.path.isdir(tomb_path) and os.listdir(tomb_path)):
        # no tombstones -> nothing to supersede (delete_saved can write a
        # tombstone-only generation with NO delta, so tombstones must
        # apply even when the delta dir is absent)
        return allp.drop("gen")
    tombs = spark.read.parquet(tomb_path)
    if dmax is not None:
        tombs = tombs.filter(F.col("gen") <= dmax)
    tombs = tombs.groupBy("doc_id").agg(F.max("gen").alias("tomb_gen"))
    return (
        allp.join(F.broadcast(tombs), "doc_id", "left")
        .filter(F.col("tomb_gen").isNull() | (F.col("gen") >= F.col("tomb_gen")))
        .drop("gen", "tomb_gen")
    )


def _assemble(docs: DataFrame, ngrams: bool) -> DataFrame:
    from .arrow_build import make_assemble_postings_arrow

    return docs.select("doc_id", "text").mapInArrow(
        make_assemble_postings_arrow(ngrams), schema=POSTINGS_ROW_SCHEMA
    )


def upsert_saved(
    spark: SparkSession,
    path: str,
    changed_docs: DataFrame,
    docs: Optional[DataFrame] = None,
) -> FtsIndex:
    """Apply one upsert batch (re-indexed or new docs) to a saved index.

    ``changed_docs``: (doc_id, text) of every document whose content
    changed or that is new; previous versions of exactly these doc ids
    are superseded. Base postings files are not rewritten — the batch
    appends one delta generation + tombstones and refreshes the small
    derived tables (termdict, docstats, meta).
    """
    meta = _meta(path)
    gen = int(meta.get("generation", 0)) + 1
    ngrams = bool(meta.get("ngrams", False))

    (
        _assemble(changed_docs, ngrams)
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, DELTA_DIR, f"gen={gen}"))
    )
    (
        changed_docs.select("doc_id")
        .distinct()
        .write.mode("overwrite")
        .parquet(os.path.join(path, TOMB_DIR, f"gen={gen}"))
    )

    return _refresh_after_mutation(
        spark, path, meta, gen, changed_docs, new_docs=changed_docs, docs=docs
    )


def delete_saved(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    docs: Optional[DataFrame] = None,
    fold_stream: bool = True,
) -> FtsIndex:
    """Remove documents from a saved index (the reference has no
    standalone delete — upsert supersedes in place — but a corpus
    pipeline needs one: GDPR erasure, dedup-driven pruning).

    ``doc_ids``: a one-column (doc_id) DataFrame. The batch is a
    tombstone-ONLY generation — no delta postings, no base rewrite; the
    merged view drops every posting, stat row and doc-store row of the
    deleted ids, the small derived tables are refreshed, and the segment
    shards covering those ids are invalidated for the next
    ``refresh_segments``. Deleting ids absent from the index is a no-op
    for them. ``compact_index`` later reclaims the space physically.

    Deletes apply to everything visible at delete time, INCLUDING
    streamed docs whose deltas are not yet compacted: uncompacted stream
    deltas bypass the generation filter (streaming.refresh_index unions
    them verbatim), so they are first folded into a generation
    (``streaming.compact_stream`` — delta-sized, base untouched) and the
    tombstone generation written after it supersedes them.
    ``fold_stream=False`` skips that (delete then only affects
    base + generation docs until the next compaction)."""
    if fold_stream:
        from .streaming import STREAM_DIR, compact_stream

        sd = os.path.join(path, STREAM_DIR)
        if os.path.isdir(sd) and os.listdir(sd):
            compact_stream(spark, path)
    # meta read AFTER the fold — compaction bumps the generation
    meta = _meta(path)
    gen = int(meta.get("generation", 0)) + 1
    (
        doc_ids.select("doc_id")
        .distinct()
        .write.mode("overwrite")
        .parquet(os.path.join(path, TOMB_DIR, f"gen={gen}"))
    )
    return _refresh_after_mutation(
        spark, path, meta, gen, doc_ids.select("doc_id"), new_docs=None,
        docs=docs,
    )


def delete_by_query(
    spark: SparkSession,
    path: str,
    query,
    docs: Optional[DataFrame] = None,
    fold_stream: bool = True,
) -> FtsIndex:
    """Delete every document matching ``query`` (the Elasticsearch
    ``_delete_by_query`` shape; an engine extension — the reference
    mutates only by whole-doc re-index, src/index.rs:36-51).

    ``query`` is a :mod:`~inverted_index_spark.qast` AST or a query
    STRING (parsed with the query language). It is evaluated against
    the index's CURRENT merged view (base + deltas − tombstones), so
    earlier mutations are respected; the matching doc ids then become
    one tombstone-only generation via :func:`delete_saved` — no base
    rewrite, segments invalidated for the next refresh, space
    reclaimed by ``compact_index``.

    Scale shape: the matching set comes from a term-pruned postings
    scan (bounded by the query terms' document frequencies, never a
    corpus scan), and the tombstone write is one distinct projection of
    that set. The corpus-pipeline use is "purge everything matching a
    contamination / policy pattern" in one declarative call.
    """
    from .qparse import parse_query
    from .query import FtsEngine

    if isinstance(query, str):
        query = parse_query(query)
    idx = load_index(spark, path)
    ids = FtsEngine(idx).compile(query).docs.select("doc_id")
    # materialize the match BEFORE the mutation: delete_saved's derived-
    # table refresh re-evaluates its doc_ids frame AFTER overwriting
    # termdict/docstats, which a lazy plan over those tables (fuzzy /
    # wildcard expansion reads termdict) would race. Spill to a scratch
    # parquet — distributed, any size — rather than collecting.
    scratch = os.path.join(path, "_delete_by_query_tmp")
    ids.write.mode("overwrite").parquet(scratch)
    try:
        return delete_saved(
            spark,
            path,
            spark.read.parquet(scratch),
            docs=docs,
            fold_stream=fold_stream,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def changed_docs(
    spark: SparkSession,
    path: str,
    gen_from: int = 0,
    gen_to: Optional[int] = None,
) -> DataFrame:
    """Changelog between two commits (the Iceberg/Delta CDC
    ``table_changes`` shape): every doc touched by a generation in
    ``(gen_from, gen_to]`` with its LAST action in the window ->
    (doc_id, gen, change) where change is 'upserted' or 'deleted',
    ordered by doc_id. Defaults cover everything since the base build.

    Reads ONLY the generation dirs (each upsert batch writes its ids to
    ``tombstones/gen=g`` and its new postings to ``postings_delta/
    gen=g``; a delete writes the tombstone side alone), so the
    changelog costs O(touched docs), never a corpus diff. History
    reaches back to the last ``compact_index`` (compaction folds
    generations into a new base and resets the log — snapshot the
    changelog first if you need it); uncompacted STREAMING appends live
    outside generations and are not changelog events until
    ``compact_stream`` folds them.
    """
    meta = _meta(path)
    cur = int(meta.get("generation", 0))
    if gen_to is None:
        gen_to = cur
    if not (0 <= gen_from <= gen_to <= cur):
        raise ValueError(
            f"need 0 <= gen_from <= gen_to <= {cur}, "
            f"got ({gen_from}, {gen_to})"
        )
    schema = "doc_id long, gen int, change string"
    tomb_path = os.path.join(path, TOMB_DIR)
    if not (os.path.isdir(tomb_path) and os.listdir(tomb_path)):
        return spark.createDataFrame([], schema)
    touched = (
        spark.read.parquet(tomb_path)
        .select("doc_id", F.col("gen").cast("int").alias("gen"))
        .filter((F.col("gen") > gen_from) & (F.col("gen") <= gen_to))
    )
    delta_path = os.path.join(path, DELTA_DIR)
    if os.path.isdir(delta_path) and os.listdir(delta_path):
        ups = (
            spark.read.parquet(delta_path)
            .select("doc_id", F.col("gen").cast("int").alias("gen"))
            .filter((F.col("gen") > gen_from) & (F.col("gen") <= gen_to))
            .distinct()
            .withColumn("up", F.lit(1))
        )
        touched = touched.join(ups, ["doc_id", "gen"], "left")
    else:
        touched = touched.withColumn("up", F.lit(None).cast("int"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("gen"))
    return (
        touched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "gen",
            F.when(F.col("up").isNotNull(), F.lit("upserted"))
            .otherwise(F.lit("deleted"))
            .alias("change"),
        )
        .orderBy("doc_id")
    )


def _refresh_after_mutation(
    spark: SparkSession,
    path: str,
    meta: dict,
    gen: int,
    touched_docs: DataFrame,
    new_docs: Optional[DataFrame],
    docs: Optional[DataFrame],
) -> FtsIndex:
    """Post-mutation bookkeeping shared by upsert_saved / delete_saved:
    re-derive termdict + docstats from the merged view, sync the doc
    store (anti-join out touched ids, union ``new_docs`` back in when
    the mutation carries replacements), publish with one catalog-pointer
    swap, invalidate touched segment shards, re-stamp meta.

    Derived tables are rewritten into NEW versioned directories —
    object-store-safe: no in-place rename/delete of live data. Versions
    come from commitio.next_version, NOT the meta generation:
    compact_index resets the generation counter to 0, so a meta-derived
    version could collide with a live directory (overwrite-in-place,
    then gc of the directory the catalog points at)."""
    ngrams = bool(meta.get("ngrams", False))
    merged = merged_postings(spark, path)
    postings = merged.filter(F.col("term") != "")
    updates = {
        "termdict": commitio.next_version(path, "termdict"),
        "docstats": commitio.next_version(path, "docstats"),
    }
    postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).cast("long").alias("df_full"),
        F.sum("tf").cast("long").alias("cf"),
    ).write.mode("overwrite").parquet(
        commitio.version_dir(path, "termdict", updates["termdict"])
    )
    (
        merged.filter(F.col("term") == "")
        .select("doc_id", F.col("tf").cast("int").alias("doclen_bytes"))
        .join(
            postings.groupBy("doc_id").agg(
                F.sum("tf").cast("int").alias("doclen_tokens")
            ),
            "doc_id",
            "left",
        )
        .fillna({"doclen_tokens": 0})
        .write.mode("overwrite")
        .parquet(commitio.version_dir(path, "docstats", updates["docstats"]))
    )

    # keep the doc store (if this index carries one) in sync, or
    # highlight/doc lookups would serve superseded text
    docs_dir = commitio.table_path(path, "docs")
    if os.path.isdir(docs_dir):
        base_docs = spark.read.parquet(docs_dir)
        updates["docs"] = commitio.next_version(path, "docs")
        kept = base_docs.join(
            touched_docs.select("doc_id").distinct(), "doc_id", "left_anti"
        )
        if new_docs is not None:
            kept = kept.unionByName(new_docs, allowMissingColumns=True)
        kept.write.mode("overwrite").parquet(
            commitio.version_dir(path, "docs", updates["docs"])
        )

    superseded = commitio.publish(
        path, updates, extra={"@delta_gen": str(gen)}
    )
    commitio.gc_superseded(path, superseded)
    if "docs" in updates and docs is None:
        docs = spark.read.parquet(commitio.table_path(path, "docs"))

    _invalidate_segments(spark, path, touched_docs)

    docstats = spark.read.parquet(commitio.table_path(path, "docstats"))
    stats = docstats.agg(
        F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl")
    ).collect()[0]
    meta.update(
        generation=gen,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
    )
    _write_meta(path, meta)

    return FtsIndex(
        postings=postings,
        docstats=docstats,
        termdict=spark.read.parquet(commitio.table_path(path, "termdict")),
        docs=docs,
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        ngrams=ngrams,
    )


def _invalidate_segments(
    spark: SparkSession, path: str, changed_docs: DataFrame
) -> None:
    """Mark segment shards whose doc range intersects the upsert batch.

    Compressed segments are snapshots of the postings; an upsert makes
    the shards covering its doc ids stale. The changed shard ids
    (including brand-new ranges absent from the manifest) are recorded
    in the ``segments_pending.json`` sidecar: ``refresh_segments``
    re-encodes exactly these doc ranges with a range-pruned scan, and
    ``build_segments(resume=True)`` excludes them from its resume set
    so a stale shard is never carried forward.

    The manifest itself is NOT touched — it is the serving commit
    point, and dropping rows here would hand a concurrent coordinator
    serve an INCOMPLETE snapshot (missing doc ranges) for the whole
    invalidation->refresh window. Readers keep the last complete
    snapshot (its write-once files stay on disk until the post-refresh
    GC) until the next manifest commit makes the mutation visible —
    Lucene's stale-but-consistent reader semantics; freshness-aware
    routing (segments_fresh) sends LIVE queries to the relational plan
    meanwhile.
    """
    from .segments import MANIFEST_NAME, record_pending_shards

    manifest_path = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(manifest_path):
        return
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    shard_docs = int(manifest["shard_docs"])
    changed_shards = {
        int(r["s"])
        for r in changed_docs.select(
            # long DIV: exact for hash-range doc ids (int32 cast of a
            # double quotient would wrap and miss the real shards)
            F.expr(f"doc_id DIV {int(shard_docs)}").alias("s")
        )
        .distinct()
        .collect()
    }
    record_pending_shards(path, changed_shards)


def compact_index(spark: SparkSession, path: str) -> None:
    """Fold delta generations back into a generation-0 base (the
    maintenance job a real deployment schedules off-peak)."""
    from .segments import segments_fresh

    meta = _meta(path)
    gen = int(meta.get("generation", 0))
    if gen == 0:
        return
    # compaction rewrites files but preserves the merged VIEW — segments
    # that are fresh now stay answer-identical after the fold, so their
    # manifest gets re-stamped below instead of forcing a full rebuild
    seg_were_fresh = segments_fresh(path)
    # next_version, NOT the meta generation: after a previous compact the
    # live postings dir can be postings.v<gen> itself — a meta-derived
    # version would overwrite the very directory merged_postings reads
    pgen = commitio.next_version(path, "postings")
    merged_postings(spark, path).sortWithinPartitions(
        "term", "doc_id"
    ).write.mode("overwrite").parquet(
        commitio.version_dir(path, "postings", pgen)
    )
    # compaction folds every delta into the new base: the snapshot
    # commit resets the delta high-water mark AND stamps a fresh
    # compaction-epoch NONCE — delta-dependent pins from before it are
    # expired (their delta generations are physically folded/removed
    # below, and a later upsert reuses generation numbers);
    # pinned_version refuses them. A nonce, not a counter: a counter
    # would be a read-modify-write across two commits, and two racing
    # compactions could both publish the same value, silently
    # re-validating pins in between them.
    superseded = commitio.publish(
        path,
        {"postings": pgen},
        extra={"@delta_gen": "0", "@epoch": uuid.uuid4().hex},
    )
    commitio.gc_superseded(path, superseded)
    shutil.rmtree(os.path.join(path, DELTA_DIR), ignore_errors=True)
    shutil.rmtree(os.path.join(path, TOMB_DIR), ignore_errors=True)
    meta["generation"] = 0
    _write_meta(path, meta)
    if seg_were_fresh:
        from .segments import MANIFEST_NAME, _source_token

        manifest_path = os.path.join(path, MANIFEST_NAME)
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        manifest["source"] = _source_token(path)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, manifest_path)


def load_index_merged(
    spark: SparkSession, path: str, docs: Optional[DataFrame] = None
) -> FtsIndex:
    """Alias kept for API compatibility: ``load_index`` is
    generation-aware and always serves the merged view."""
    return load_index(spark, path, docs=docs)
