"""Merge saved indexes: the time-partitioned ingest pattern.

A 10^12-turn deployment doesn't build one index; it builds per-window
(per-day / per-source) indexes as data lands and merges them. The
doc-sliced layout makes that merge almost free:

* **postings / docstats / docs** are term-sorted-within-file parquet
  whose union IS the merged table — the merge hard-links (or copies)
  the files; no rows are read, shuffled or rewritten. On an object
  store this maps to server-side copies.
* **termdict** is re-aggregated from the inputs' termdicts (tiny —
  O(vocabulary), never O(postings)).
* **segments** carry over file-by-file when every input's segments are
  fresh and layout-compatible: shard_id = doc_id DIV shard_docs, so
  disjoint doc-id ranges give disjoint shard ids except at range
  boundaries. Colliding boundary shards are dropped, recorded in the
  pending sidecar, and re-encoded by the same incremental
  ``refresh_segments`` machinery every other mutation uses — merge cost
  is O(metadata + boundary shards), not O(corpus). Kept shards' WAND
  bounds stay sound under the merged corpus's avgdl via the per-shard
  ``max(1, avgdl_live/avgdl_built)`` rescale (wand.py) — the same
  argument that makes incremental refresh sound.

The reference is single-index in-memory (/root/reference/src/index.rs);
merging is the distributed-deployment extension of its doc-id-keyed
maps' union semantics.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import commitio
from .build import FtsIndex, load_index
from .upsert import _meta

_COPY_TABLES = ("postings", "docstats", "docs")


def _parquet_schema_names(d: str) -> Optional[frozenset]:
    """Column-name set of the first parquet file under ``d``."""
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            return frozenset(pq.read_schema(os.path.join(d, name)).names)
    return None


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _copy_table_files(src_dir: str, dst_dir: str, prefix: str) -> int:
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".parquet"):
            continue
        _link_or_copy(
            os.path.join(src_dir, name),
            os.path.join(dst_dir, f"{prefix}{name}"),
        )
        n += 1
    return n


def merge_indexes(
    spark: SparkSession,
    paths: List[str],
    out: str,
    verify_disjoint: bool = True,
) -> dict:
    """Merge the saved indexes at ``paths`` into a new index at ``out``.

    Preconditions (raised on violation):
    * every input is fully compacted — generation 0, no stream deltas
      (``compact_index`` / ``compact_stream`` first); merging live delta
      state would need cross-index generation arithmetic;
    * all inputs share the ``ngrams`` analyzer flag;
    * doc-id sets are pairwise disjoint (verified with one small
      docstats-only job unless ``verify_disjoint=False`` — the caller
      partitioned the corpus and may already know).

    Segments are reused file-by-file when every input has FRESH segments
    with identical layout (positional flag, shard_docs, block_docs,
    k1/b); boundary-shard collisions are re-encoded incrementally. With
    any incompatibility the merged index simply has no segments (run
    ``build_segments``); the relational paths work immediately either
    way.

    Returns a summary dict: n_docs, files_linked, segments
    ("reused" | "reused+reencoded:N" | "skipped:<why>") and docs
    ("linked" | "skipped:<why>" — the doc store carries over only when
    EVERY input has one with the same columns; a partial or
    mixed-schema store would silently misread).
    """
    if len(paths) < 2:
        raise ValueError("merge_indexes needs at least two inputs")
    if os.path.exists(out) and (
        not os.path.isdir(out) or os.listdir(out)
    ):
        raise ValueError(f"output {out!r} is not an empty directory")

    metas = [_meta(p) for p in paths]
    ngrams = {bool(m.get("ngrams", False)) for m in metas}
    if len(ngrams) != 1:
        raise ValueError("inputs mix ngrams and full-token analyzers")
    for p, m in zip(paths, metas):
        if int(m.get("generation", 0)) != 0:
            raise ValueError(
                f"{p} has un-compacted generations — run compact_index first"
            )
        sd = os.path.join(p, "stream_delta", "postings")
        if os.path.isdir(sd) and any(
            x.startswith("batch=") for x in os.listdir(sd)
        ):
            raise ValueError(
                f"{p} has un-compacted stream deltas — run compact_stream first"
            )

    if verify_disjoint:
        dup = None
        for i, p in enumerate(paths):
            ds = spark.read.parquet(
                commitio.table_path(p, "docstats")
            ).select("doc_id")
            dup = ds if dup is None else dup.unionByName(ds)
        n_dup = (
            dup.groupBy("doc_id").count().filter(F.col("count") > 1).count()
        )
        if n_dup:
            raise ValueError(
                f"doc-id sets overlap ({n_dup} ids in more than one input) — "
                "merged indexes must partition the doc-id space"
            )

    os.makedirs(out, exist_ok=True)
    files = 0
    docs_note = "linked"
    if not all(os.path.isdir(commitio.table_path(p, "docs")) for p in paths):
        docs_note = "skipped:missing-in-some-inputs"
    else:
        schemas = {
            _parquet_schema_names(commitio.table_path(p, "docs"))
            for p in paths
        }
        if len(schemas) != 1:
            # rider columns differ: a linked union would read with a
            # footer-sampling-dependent schema (silent column loss)
            docs_note = "skipped:schema-mismatch"
    for name in _COPY_TABLES:
        if name == "docs" and docs_note != "linked":
            continue
        for i, p in enumerate(paths):
            files += _copy_table_files(
                commitio.table_path(p, name),
                os.path.join(out, name),
                f"m{i}-",
            )

    # termdict: O(vocabulary) re-aggregation, the one genuinely merged
    # derived table (df/cf are additive over disjoint doc sets)
    td = None
    for p in paths:
        t = spark.read.parquet(commitio.table_path(p, "termdict"))
        td = t if td is None else td.unionByName(t)
    (
        td.groupBy("term")
        .agg(
            F.sum("df").cast("long").alias("df"),
            F.sum("df_full").cast("long").alias("df_full"),
            F.sum("cf").cast("long").alias("cf"),
        )
        .repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 1), "term"
        )
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "termdict"))
    )

    # exact in O(1) from the input metas (disjoint doc sets):
    # n = sum(n_i), avgdl = sum(n_i * avgdl_i) / n — no docstats scan
    n_docs = sum(int(m["n_docs"]) for m in metas)
    tokens = sum(int(m["n_docs"]) * float(m["avgdl"]) for m in metas)
    meta = {
        "n_docs": n_docs,
        "avgdl": tokens / max(n_docs, 1),
        "ngrams": ngrams.pop(),
        "generation": 0,
    }
    with open(os.path.join(out, "meta.json"), "w") as fh:
        json.dump(meta, fh)

    seg_note = _merge_segments(spark, paths, out, meta)

    return {
        "n_docs": meta["n_docs"],
        "avgdl": meta["avgdl"],
        "files_linked": files,
        "segments": seg_note,
        "docs": docs_note,
    }


def _merge_segments(
    spark: SparkSession, paths: List[str], out: str, meta: dict
) -> str:
    """File-level segment reuse (see merge_indexes). Returns a note."""
    from .segments import (
        MANIFEST_NAME,
        _publish_term_shards,
        _source_token,
        load_manifest,
        record_pending_shards,
        refresh_segments,
        segments_fresh,
    )

    manifests = []
    for p in paths:
        if not os.path.exists(os.path.join(p, MANIFEST_NAME)):
            return "skipped:no-segments"
        if not segments_fresh(p):
            return "skipped:stale-segments"
        manifests.append(load_manifest(p))
    keys = {
        (
            bool(m.get("positional", False)),
            int(m["shard_docs"]),
            int(m["block_docs"]),
            float(m["k1"]),
            float(m["b"]),
        )
        for m in manifests
    }
    if len(keys) != 1:
        return "skipped:incompatible-layout"
    positional, shard_docs, block_docs, k1, b = keys.pop()

    # shard_id = doc_id DIV shard_docs: disjoint doc ranges collide only
    # where a boundary shard's range spans two inputs
    owners: dict = {}
    colliding: set = set()
    for i, m in enumerate(manifests):
        for s in m["shards"]:
            sid = int(s["shard_id"])
            if sid in owners:
                colliding.add(sid)
            else:
                owners[sid] = (i, s)

    seg_dir = os.path.join(out, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    kept_rows = []
    for sid in sorted(owners):
        if sid in colliding:
            continue
        i, row = owners[sid]
        _link_or_copy(
            os.path.join(paths[i], "segments", row["file"]),
            os.path.join(seg_dir, row["file"]),
        )
        row = dict(row)
        if row.get("avgdl_built") is None:
            # legacy pre-avgdl_built rows: their bounds were computed
            # under the source manifest's own avgdl — record it, or the
            # merged manifest's (different) avgdl would make WAND's
            # mu_scale=1.0 assumption unsound
            row["avgdl_built"] = float(manifests[i]["avgdl"])
        kept_rows.append(row)

    # merged term->shard map: every input's rows except colliding ids
    # (re-added with fresh stats by the refresh below)
    ts = None
    for p in paths:
        t = spark.read.parquet(commitio.table_path(p, "term_shards"))
        ts = t if ts is None else ts.unionByName(t, allowMissingColumns=True)
    if colliding:
        ts = ts.filter(~F.col("shard_id").isin([int(s) for s in colliding]))
    _publish_term_shards(spark, out, ts)

    manifest = {
        "version": 2,
        "shard_docs": shard_docs,
        "block_docs": block_docs,
        "k1": k1,
        "b": b,
        "n_docs": meta["n_docs"],
        "avgdl": meta["avgdl"],
        "positional": positional,
        "built_shards": 0,
        "resumed_shards": len(kept_rows),
        "source": _source_token(out),
        "shards": kept_rows,
    }
    if colliding:
        # record pending BEFORE publishing a live-source-token manifest:
        # a crash in between must leave a manifest that refresh treats
        # as incomplete, never one that serves with missing doc ranges
        # (same ordering invariant as upsert._invalidate_segments)
        record_pending_shards(out, colliding)
    mp = os.path.join(out, MANIFEST_NAME)
    tmp = mp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, mp)

    if colliding:
        # boundary ranges span two inputs: re-encode exactly those doc
        # ranges from the merged postings BEFORE returning — a manifest
        # missing live doc ranges must never be served
        refresh_segments(spark, load_index(spark, out), out)
        return f"reused+reencoded:{len(colliding)}"
    return "reused"


def load_merged(spark: SparkSession, path: str) -> FtsIndex:
    """Convenience: a merged index is a normal saved index."""
    return load_index(spark, path)
