"""Compressed posting segments with block-max metadata + build manifests.

The scale path of the index (north rule: delta/varint-compressed segment
files, block-max WAND top-k, per-partition lineage/metrics, resumable
builds). The reference has no equivalent — it holds postings as plain
in-memory vectors (/root/reference/src/postings.rs:19); this layer exists
for the 10^12-turn design point.

Layout
------
``<path>/segments/shard-NNNNN-<nonce>.parquet`` — one file per
**doc-range shard**, WRITE-ONCE: every (re)encode writes a fresh nonce
name, the manifest is the commit point referencing exactly one
generation per shard, and superseded generations are deleted only
after the new manifest lands (``_gc_unreferenced_shards``;
``SPARK_GRAFT_RETAIN_VERSIONS=1`` keeps them). Concurrent coordinator
serves therefore read a consistent snapshot — the Lucene
commit-point/write-once-segment discipline — instead of racing an
in-place rewrite. Rows, sorted by ``(term, block_id)``:

    term:string | block_id:long | n:int | doc_ids:binary | tfs:binary
    | max_u:float

* ``doc_ids`` — delta+varint blob (codecs.py) of the docs in this
  (term, block); blocks are aligned on global doc-id ranges
  (``block_id = doc_id // block_docs``), the same alignment for every
  term, so one block holds a doc's *complete* contribution for any
  query — WAND can finalize scores block-locally (wand.py).
* ``tfs`` — varint blob, parallel to doc_ids.
* ``max_u`` — max over the block of the BM25 tf-normalization
  ``u = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``; the query-time upper
  bound for the block is ``sum_t idf_t * max_u_t``.
* one special row per block, ``term = ''``: doc_ids + varint ``dls``
  (doclen_tokens) for every doc in the block — the per-shard doc-stats
  needed to recompute exact u at query time.

Parquet is the container only — entropy coding of postings is ours; the
columnar container gives term-predicate row-group pruning for free
because rows are term-sorted.

Skew stance (explicit, per north rule): sharding by **doc range** makes
task sizes uniform by construction — a Zipf-hot term's postings spread
over *all* shards instead of hammering one reducer, so no salting is
needed on this path (the term-partitioned alternative would need it; the
two-phase salted aggregation lives in build.salted_termdict for the
global term statistics). Residual within-shard skew is *recorded* per
shard (``skew_ratio``) in the manifest.

Manifest (``<path>/manifest.json``): per shard — file, row/posting
counts, encoded vs raw bytes, build seconds, postings/sec, skew ratio,
input fingerprint. Re-running ``build_segments`` skips shards whose
manifest entry + file already exist (checkpoint/resume); lineage = the
fingerprint of the exact postings fed to the shard.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from typing import List, Optional, Tuple

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import FtsIndex
from .codecs import encode_doc_ids, varint_encode

K1 = 1.2
B = 0.75

MANIFEST_NAME = "manifest.json"
DOCSTATS_TERM = ""  # sorts before every real term

SEGMENT_SCHEMA = (
    "shard_id long, file string, n_terms long, n_blocks long, n_postings long, "
    "raw_bytes long, enc_bytes long, build_sec double, postings_per_sec double, "
    "skew_ratio double, fingerprint string, avgdl_built double"
)

# Sidecar listing doc-range shards whose postings changed since the
# manifest was stamped (written by upsert._invalidate_segments on every
# mutation path). refresh_segments folds exactly these; a full
# build_segments clears it.
PENDING_NAME = "segments_pending.json"


def _write_shard(table, seg_dir: str, block_docs: int, avgdl: float):
    """Encode + write one shard (runs inside applyInArrow on executors).

    ``table`` is the shard's postings as a pyarrow Table (term, doc_id,
    tf, dl, db, shard_id[, positions]); arrow-native so the optional
    ``positions`` list<struct> column flattens to plain numpy arrays
    without a per-row Python conversion. Returns a one-row manifest
    Table (SEGMENT_SCHEMA)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .codecs import encode_pos_block

    t_start = time.perf_counter()
    shard_id = int(table.column("shard_id")[0].as_py())
    table = table.sort_by([("term", "ascending"), ("doc_id", "ascending")])

    doc_ids_all = table.column("doc_id").to_numpy()
    tf_all = table.column("tf").to_numpy().astype(np.int64)
    dl_all = table.column("dl").to_numpy().astype(np.int64)
    db_all = table.column("db").to_numpy().astype(np.int64)
    u_all = (
        tf_all
        * (K1 + 1.0)
        / (tf_all + K1 * (1.0 - B + B * dl_all / max(avgdl, 1e-12)))
    )
    block_all = doc_ids_all // block_docs

    with_positions = "positions" in table.column_names
    if with_positions:
        posl = table.column("positions").combine_chunks()
        pos_counts_all = posl.value_lengths().to_numpy().astype(np.int64)
        flat = posl.flatten()  # StructArray (already a single chunk)
        pb_all = flat.field("begin").to_numpy().astype(np.int64)
        pe_all = flat.field("end").to_numpy().astype(np.int64)
        pp_all = flat.field("pos").to_numpy().astype(np.int64)
        pstarts = np.concatenate(([0], np.cumsum(pos_counts_all)))

    fingerprint = hashlib.sha1()
    fingerprint.update(np.ascontiguousarray(doc_ids_all).tobytes())
    fingerprint.update(np.ascontiguousarray(tf_all).tobytes())

    terms: List[str] = []
    block_ids: List[int] = []
    ns: List[int] = []
    id_blobs: List[bytes] = []
    tf_blobs: List[bytes] = []
    max_us: List[float] = []
    pc_blobs: List[bytes] = []
    pos_blobs: List[bytes] = []

    # doc-stats rows (term=''): unique docs of the shard per block.
    # tfs blob = doclen_tokens, pos_counts blob = doclen_bytes (parity
    # scoring needs byte lengths; WAND needs token lengths)
    uids, first_idx = np.unique(doc_ids_all, return_index=True)
    udls = dl_all[first_idx]
    udbs = db_all[first_idx]
    ublocks = uids // block_docs
    for b0 in np.unique(ublocks):
        sel = ublocks == b0
        terms.append(DOCSTATS_TERM)
        block_ids.append(int(b0))
        ns.append(int(sel.sum()))
        id_blobs.append(encode_doc_ids(uids[sel]))
        tf_blobs.append(varint_encode(udls[sel].astype(np.uint64)))
        max_us.append(0.0)
        pc_blobs.append(varint_encode(udbs[sel].astype(np.uint64)))
        pos_blobs.append(b"")

    # posting rows, grouped by (term, block) over the term-sorted frame
    # — fully vectorized: ONE varint pass per column with per-row byte
    # offsets (codecs.varint_encode_segmented), arrow binary columns
    # built straight from (offsets, bytes) buffers; no per-row Python.
    term_arr = np.asarray(table.column("term").to_pylist(), dtype=object)
    change = np.flatnonzero(
        (term_arr[1:] != term_arr[:-1]) | (block_all[1:] != block_all[:-1])
    )
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [len(term_arr)]))

    from .codecs import _segmented_delta, varint_encode_segmented

    id_deltas = _segmented_delta(doc_ids_all, starts)
    ids_bytes, ids_off = varint_encode_segmented(id_deltas, starts)
    tf_bytes, tf_off = varint_encode_segmented(
        tf_all.astype(np.uint64), starts
    )
    max_u_rows = np.maximum.reduceat(u_all, starts)

    if with_positions:
        pc_bytes, pc_off = varint_encode_segmented(
            pos_counts_all.astype(np.uint64), starts
        )
        # per-doc (= per posting) delta encode over the flat triples
        nonempty = pstarts[:-1][pos_counts_all > 0]
        bd = _segmented_delta(pb_all, nonempty)
        wd = (pe_all - pb_all).astype(np.uint64)
        pd = _segmented_delta(pp_all, nonempty)
        # planar-per-row layout: row i's values occupy
        # [3*rps_i, 3*(rps_i + pc_i)): [bd block][width block][pd block]
        rps = pstarts[starts]
        row_pc = pstarts[ends] - rps
        P = int(pstarts[-1])
        base = np.repeat(3 * rps, row_pc)
        pcrep = np.repeat(row_pc, row_pc)
        i_in = np.arange(P) - np.repeat(rps, row_pc)
        out_vals = np.empty(3 * P, dtype=np.uint64)
        out_vals[base + i_in] = bd
        out_vals[base + pcrep + i_in] = wd
        out_vals[base + 2 * pcrep + i_in] = pd
        pos_bytes, pos_off = varint_encode_segmented(out_vals, 3 * rps)
    else:
        pc_bytes = np.empty(0, np.uint8)
        pc_off = np.zeros(starts.size + 1, np.int64)
        pos_bytes = np.empty(0, np.uint8)
        pos_off = np.zeros(starts.size + 1, np.int64)

    # per-term posting counts (skew metric) without a Python dict
    t_change = np.flatnonzero(term_arr[1:] != term_arr[:-1])
    t_bounds = np.concatenate(([0], t_change + 1, [len(term_arr)]))
    per_term = np.diff(t_bounds)
    n_terms_distinct = int(per_term.size)

    def _bin(data: np.ndarray, off: np.ndarray) -> "pa.Array":
        return pa.Array.from_buffers(
            pa.binary(),
            off.size - 1,
            [None, pa.py_buffer(off.astype(np.int32).tobytes()),
             pa.py_buffer(data.tobytes())],
        )

    stats_part = {
        "term": pa.array(terms, pa.string()),
        "block_id": pa.array(block_ids, pa.int64()),
        "n": pa.array(ns, pa.int32()),
        "doc_ids": pa.array(id_blobs, pa.binary()),
        "tfs": pa.array(tf_blobs, pa.binary()),
        "max_u": pa.array(max_us, pa.float64()),
        "pos_counts": pa.array(pc_blobs, pa.binary()),
        "positions": pa.array(pos_blobs, pa.binary()),
    }
    rows_part = {
        "term": pa.array(term_arr[starts].tolist(), pa.string()),
        "block_id": pa.array(block_all[starts].astype(np.int64), pa.int64()),
        "n": pa.array((ends - starts).astype(np.int32), pa.int32()),
        "doc_ids": _bin(ids_bytes, ids_off),
        "tfs": _bin(tf_bytes, tf_off),
        "max_u": pa.array(max_u_rows, pa.float64()),
        "pos_counts": _bin(pc_bytes, pc_off),
        "positions": _bin(pos_bytes, pos_off),
    }
    out = pa.table(
        {
            name: pa.concat_arrays(
                [stats_part[name], rows_part[name].cast(stats_part[name].type)
                 if rows_part[name].type != stats_part[name].type
                 else rows_part[name]]
            )
            for name in stats_part
        }
    )
    enc_bytes = int(
        ids_off[-1] + tf_off[-1] + pos_off[-1]
        + sum(len(x) for x in id_blobs) + sum(len(x) for x in tf_blobs)
    )
    n_postings = int(len(doc_ids_all))
    # WRITE-ONCE naming (Lucene commit-point semantics): every write
    # gets a fresh nonce, so a refresh NEVER mutates a file a concurrent
    # coordinator serve may be reading from the old manifest — readers
    # planning from a manifest see exactly that manifest's immutable
    # files, and superseded generations are garbage-collected only
    # after the new manifest is committed (_gc_unreferenced_shards).
    # A nonce, not the content fingerprint: the fingerprint covers
    # doc_ids+tfs only, while the bytes also depend on positions and
    # the avgdl baked into max_u, so equal fingerprints can carry
    # different bytes — reusing the name would be in-place mutation.
    fname = f"shard-{shard_id:05d}-{uuid.uuid4().hex[:10]}.parquet"
    fpath = os.path.join(seg_dir, fname)
    tmp = fpath + ".tmp"
    pq.write_table(out, tmp, row_group_size=4096, compression="zstd")
    os.replace(tmp, fpath)

    build_sec = time.perf_counter() - t_start
    counts = per_term if per_term.size else np.array([0])
    raw_bytes = n_postings * 12  # 8B doc_id + 4B tf
    if with_positions:
        raw_bytes += int(pstarts[-1]) * 12  # 3 x int32 per position
    return pa.table(
        {
            "shard_id": pa.array([shard_id], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "n_terms": pa.array([n_terms_distinct], pa.int64()),
            "n_blocks": pa.array(
                [int(np.unique(np.asarray(block_ids + [int(x) for x in block_all[starts]])).size)],
                pa.int64(),
            ),
            "n_postings": pa.array([n_postings], pa.int64()),
            "raw_bytes": pa.array([int(raw_bytes)], pa.int64()),
            "enc_bytes": pa.array([int(enc_bytes)], pa.int64()),
            "build_sec": pa.array([build_sec], pa.float64()),
            "postings_per_sec": pa.array(
                [n_postings / max(build_sec, 1e-9)], pa.float64()
            ),
            "skew_ratio": pa.array(
                [float(counts.max() / max(counts.mean(), 1e-9))], pa.float64()
            ),
            "fingerprint": pa.array([fingerprint.hexdigest()], pa.string()),
            # the avgdl the block-max bounds were computed under: after
            # later mutations drift the corpus avgdl, WAND rescales this
            # shard's bounds by max(1, avgdl_live/avgdl_built) — u is
            # decreasing in dl/avgdl, so that ratio bounds the growth of
            # any block's true max u (wand.py) and skipping stays sound
            "avgdl_built": pa.array([float(avgdl)], pa.float64()),
        }
    )


def _source_token(index_path: str) -> dict:
    """Snapshot of the postings state a segment build derives from.

    Any mutation path changes at least one component: upserts and
    stream compactions bump the meta generation, compact_index swaps
    the catalog's postings pointer, a full rebuild changes the dir
    mtime. Used by ``segments_fresh`` to decide whether WAND answers
    would equal the live postings' answers.
    """
    import json as _json

    from . import commitio

    pdir = commitio.table_path(index_path, "postings")
    tok: dict = {"postings_dir": os.path.basename(pdir.rstrip("/"))}
    if os.path.isdir(pdir):
        tok["mtime"] = os.path.getmtime(pdir)
    meta_path = os.path.join(index_path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            tok["generation"] = int(
                _json.load(fh).get("generation", 0)
            )
    return tok


def segments_fresh(path: str, positional: Optional[bool] = None) -> bool:
    """True iff segments exist and reflect the CURRENT postings state
    (source token matches and no un-compacted stream deltas) — the
    guard for routing relational BM25 calls to the WAND scale path."""
    manifest_path = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(manifest_path):
        return False
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    if positional is not None and bool(
        manifest.get("positional", False)
    ) != positional:
        return False
    src = manifest.get("source")
    if src is None or src != _source_token(path):
        return False
    # a non-empty pending sidecar means recorded doc ranges are NOT in
    # the shard set yet (e.g. a merge that crashed between publishing
    # its manifest and re-encoding boundary collisions) — serving would
    # silently miss those docs. Mutation paths also flip the source
    # token, but the sidecar check closes every crash window on its own.
    if os.path.exists(_pending_path(path)):
        return False
    sd = os.path.join(path, "stream_delta", "postings")
    if os.path.isdir(sd) and any(
        x.startswith("batch=") for x in os.listdir(sd)
    ):
        return False
    return True


def shards_in_range(shards, shard_docs: int, doc_range) -> list:
    """Manifest shard rows whose doc range intersects ``[lo, hi)`` —
    shard s covers [s*shard_docs, (s+1)*shard_docs) by construction
    (shared by WAND and the positional evaluator so the two can never
    disagree on shard->doc-range geometry)."""
    lo, hi = doc_range
    sd = int(shard_docs)
    return [
        s
        for s in shards
        if (int(s["shard_id"]) + 1) * sd > lo and int(s["shard_id"]) * sd < hi
    ]


def _pending_path(path: str) -> str:
    return os.path.join(path, PENDING_NAME)


def record_pending_shards(path: str, shard_ids) -> None:
    """Accumulate shard ids touched by a mutation (upsert / stream
    compaction) so ``refresh_segments`` knows exactly which doc ranges
    to re-encode. Idempotent union; atomic replace."""
    p = _pending_path(path)
    cur: set = set()
    if os.path.exists(p):
        with open(p) as fh:
            cur = set(json.load(fh))
    cur |= {int(s) for s in shard_ids}
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(cur), fh)
    os.replace(tmp, p)


def _clear_pending(path: str) -> None:
    try:
        os.remove(_pending_path(path))
    except FileNotFoundError:
        pass


def _postings_src(index: FtsIndex, shard_docs: int, positions: bool):
    """Postings frame a segment (re)build encodes, with dl/db joined in
    and the doc-range shard id attached."""
    cols = ["term", "doc_id", "tf"] + (["positions"] if positions else [])
    # term='' guards against a caller passing the raw postings files
    # (build_and_save's per-doc stat rows carry tf=doclen_bytes).
    # Non-positional segments serve BM25/WAND only -> full-token rows
    # (tf>0) suffice; positional segments must also keep the parity
    # index's tf=0 edge-ngram rows, whose positions drive Match/Phrase
    # (the WAND scorer masks tf=0 so BM25 semantics are unchanged).
    pred = F.col("term") != ""
    if not positions:
        pred = pred & (F.col("tf") > 0)
    return (
        index.postings.filter(pred)
        .select(*cols)
        .join(
            # broadcast: docstats is ~1% of postings bytes; a shuffle
            # join here would move every posting (plus positions) once
            # more before the shard groupBy
            F.broadcast(
                index.docstats.select(
                    "doc_id",
                    F.col("doclen_tokens").alias("dl"),
                    F.col("doclen_bytes").alias("db"),
                )
            ),
            "doc_id",
        )
        # integer DIV on longs: exact for the full 63-bit doc-id space
        # (streaming hash ids reach ~2^62; a double-division int cast
        # would wrap/collide)
        .withColumn("shard_id", F.expr(f"doc_id DIV {int(shard_docs)}"))
    )


def _term_shard_stats(src, positions: bool):
    """(term, shard_id, n_postings, n_positions) rows for the
    second-level map: exact per-(term, shard) posting/position counts.

    The counts are the planner's cost statistics: a query's pruned read
    volume is bounded by sum(n_postings)*12B + sum(n_positions)*12B
    (raw struct widths — delta/varint encoding only shrinks them), which
    is what decides coordinator-local vs distributed serving
    (metacache.serve_locally). n_postings doubles as the term's
    per-shard df for explain output."""
    if positions:
        npos = F.sum(
            F.when(F.col("positions").isNull(), F.lit(0)).otherwise(
                F.size("positions")
            )
        )
    else:
        npos = F.sum(F.lit(0))
    return src.groupBy("term", "shard_id").agg(
        F.count(F.lit(1)).alias("n_postings"),
        npos.cast("long").alias("n_positions"),
    )


def _publish_term_shards(spark: SparkSession, path: str, pairs_df) -> None:
    """Commit a (term, shard_id[, n_postings, n_positions]) map as a
    new catalog-managed version.

    Sorted by term so a term-predicate read prunes row groups (min/max
    fences) on top of column pruning; versioned-dir + pointer swap so a
    reader mid-refresh never sees a half-written map (commitio.py)."""
    from . import commitio

    gen = commitio.next_version(path, "term_shards")
    (
        pairs_df.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 1), "term"
        )
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(commitio.version_dir(path, "term_shards", gen))
    )
    superseded = commitio.publish(path, {"term_shards": gen})
    commitio.gc_superseded(path, superseded)


def build_segments(
    spark: SparkSession,
    index: FtsIndex,
    path: str,
    shard_docs: int = 4096,
    block_docs: int = 128,
    resume: bool = True,
    positions: bool = False,
) -> dict:
    """Build compressed segments from an index's postings table.

    One Spark task per doc-range shard; each writes its file atomically
    and reports a manifest row. With ``resume=True``, shards already
    recorded in the manifest (file present) are filtered out *before*
    the shuffle — a re-run after failure only pays for missing shards.

    ``positions=True`` additionally encodes every posting's byte-offset
    position triples (codecs.encode_pos_block) so phrase / parity
    queries are served from the segments too (segquery.py) — the
    reference's positional postings (/root/reference/src/postings.rs:19)
    on the compressed scale path.

    Also writes ``<path>/term_shards`` — the exact term -> shard-id map
    (a second-level inverted index, tiny relative to postings): query
    paths prune to the shards that actually contain their terms, so a
    rare-term query opens O(df / shard_docs) files, not O(shards).
    """
    seg_dir = os.path.join(path, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    manifest_path = os.path.join(path, MANIFEST_NAME)

    done: dict = {}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            old = json.load(fh)
        # pending shards are STALE vs the live postings (the manifest
        # keeps their rows as the serving commit point): a resume must
        # rebuild them, never carry them forward
        pend: set = set()
        pp = _pending_path(path)
        if os.path.exists(pp):
            with open(pp) as fh:
                pend = {int(s) for s in json.load(fh)}
        if bool(old.get("positional", False)) == positions:
            for row in old.get("shards", []):
                if int(row["shard_id"]) not in pend and os.path.exists(
                    os.path.join(seg_dir, row["file"])
                ):
                    done[row["shard_id"]] = row

    src = _postings_src(index, shard_docs, positions)
    todo = src
    if done:
        todo = src.filter(~F.col("shard_id").isin(list(done)))

    avgdl = index.avgdl

    def write_group(table):
        return _write_shard(table, seg_dir, block_docs, avgdl)

    new_rows = [
        r.asDict()
        for r in todo.groupBy("shard_id")
        .applyInArrow(write_group, schema=SEGMENT_SCHEMA)
        .collect()
    ]

    # exact term->shard map (second-level inverted index) with
    # per-(term, shard) cost statistics
    _publish_term_shards(spark, path, _term_shard_stats(src, positions))

    shards = sorted(
        list(done.values()) + new_rows, key=lambda r: r["shard_id"]
    )
    manifest = {
        "version": 2,
        "shard_docs": shard_docs,
        "block_docs": block_docs,
        "k1": K1,
        "b": B,
        "n_docs": index.n_docs,
        "avgdl": index.avgdl,
        "positional": positions,
        "built_shards": len(new_rows),
        "resumed_shards": len(done),
        "source": _source_token(path),
        "shards": shards,
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, manifest_path)
    _gc_unreferenced_shards(seg_dir, manifest)
    # a full build over the live view subsumes any recorded deltas
    _clear_pending(path)
    return manifest


def _gc_unreferenced_shards(seg_dir: str, manifest: dict) -> None:
    """Delete shard files the just-committed manifest does not
    reference — the superseded write-once generations. The manifest is
    the commit point: readers that planned from it hold only files it
    references (immutable by the write-once naming), POSIX unlink keeps
    any already-open file alive for its reader, and a reader still
    planning from a SUPERSEDED manifest either opened its files in time
    or fails loudly with FileNotFoundError — never a torn mix of old
    and new shard content. ``SPARK_GRAFT_RETAIN_VERSIONS=1`` (or any
    non-``0`` value — the SAME gate as ``commitio.gc_superseded``, so
    one flag governs both retention surfaces) keeps superseded files so
    old-manifest readers stay fully isolated (the segment analogue of
    the table-dir retention). Orphaned ``.parquet.tmp`` files (a task
    retry or crash between write and rename; unbounded growth now that
    every attempt gets a fresh nonce name) are swept too, age-gated so
    an in-flight write a few seconds old is never touched."""
    retain = os.environ.get("SPARK_GRAFT_RETAIN_VERSIONS", "0") not in ("0", "")
    live = {r["file"] for r in manifest.get("shards", [])}
    try:
        names = os.listdir(seg_dir)
    except OSError:
        return
    now = time.time()
    for n in names:
        p = os.path.join(seg_dir, n)
        if not retain and (
            n.startswith("shard-")
            and n.endswith(".parquet")
            and n not in live
        ):
            try:
                os.remove(p)
            except OSError:
                pass
        elif n.startswith("shard-") and n.endswith(".parquet.tmp"):
            try:
                if now - os.path.getmtime(p) > 600.0:
                    os.remove(p)
            except OSError:
                pass


def refresh_segments(
    spark: SparkSession, index: FtsIndex, path: str
) -> dict:
    """Fold index mutations into the segments INCREMENTALLY.

    After an upsert or stream compaction, ``segments_pending.json``
    (written by upsert._invalidate_segments) lists exactly the doc-range
    shards whose postings changed. This re-encodes ONLY those ranges:

    * the postings scan carries sargable ``doc_id`` range predicates
      (contiguous pending runs), so parquet min/max fences skip the
      untouched majority of the base files — refresh I/O scales with the
      delta, not the corpus;
    * untouched shard files are never rewritten (their manifest rows,
      including ``fingerprint`` and ``avgdl_built``, carry over);
    * the term->shard map is merged incrementally (old pairs of
      surviving shards + the rebuilt ranges' pairs) and committed as a
      new catalog version;
    * the manifest is re-stamped with the live source token, n_docs and
      avgdl — kept shards' block-max bounds remain sound under the
      avgdl drift because WAND rescales them by
      ``max(1, avgdl_live / avgdl_built)`` per shard (wand.py).

    ``index`` must be the LIVE merged view of the index at ``path``
    (load_index is generation-aware; upsert_saved returns it). Falls
    back to a full ``build_segments`` when no manifest exists, when the
    manifest is stale without a recorded pending set (a mutation that
    bypassed the library), or when the pending set covers half the
    shards (a full rebuild is cheaper than range-filtered scans).

    The reference rebuilds nothing — it mutates in-memory maps per doc
    (/root/reference/src/index.rs:36-51); this is the immutable-storage
    analogue: Lucene-style per-segment refresh over parquet.
    """
    manifest_path = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"{manifest_path}: no segments to refresh — run build_segments"
        )
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    shard_docs = int(manifest["shard_docs"])
    block_docs = int(manifest["block_docs"])
    positions = bool(manifest.get("positional", False))
    seg_dir = os.path.join(path, "segments")

    pending: set = set()
    pp = _pending_path(path)
    if os.path.exists(pp):
        with open(pp) as fh:
            pending = {int(s) for s in json.load(fh)}
    # defensive: manifest rows whose file vanished are rebuilt too
    pending |= {
        int(r["shard_id"])
        for r in manifest["shards"]
        if not os.path.exists(os.path.join(seg_dir, r["file"]))
    }

    def _full() -> dict:
        return build_segments(
            spark,
            index,
            path,
            shard_docs=shard_docs,
            block_docs=block_docs,
            resume=True,
            positions=positions,
        )

    if not pending:
        if manifest.get("source") == _source_token(path):
            return manifest  # already fresh, nothing to do
        # stale with no recorded deltas: some mutation bypassed
        # _invalidate_segments — the only safe answer is a full pass
        return _full()

    kept = [
        r for r in manifest["shards"] if int(r["shard_id"]) not in pending
    ]
    if 2 * len(pending) >= len(kept) + len(pending):
        return _full()

    # contiguous pending runs -> sargable doc_id range predicates
    runs: List[Tuple[int, int]] = []
    for s in sorted(pending):
        if runs and s == runs[-1][1]:
            runs[-1] = (runs[-1][0], s + 1)
        else:
            runs.append((s, s + 1))
    src = _postings_src(index, shard_docs, positions)
    if len(runs) <= 128:
        rng = None
        for lo, hi in runs:
            p = (F.col("doc_id") >= lo * shard_docs) & (
                F.col("doc_id") < hi * shard_docs
            )
            rng = p if rng is None else (rng | p)
        src = src.filter(rng)
    else:
        # too many disjoint ranges for a useful pushdown expression;
        # post-scan filter is still delta-sized output (full-scan input)
        src = src.filter(F.col("shard_id").isin([int(s) for s in pending]))

    os.makedirs(seg_dir, exist_ok=True)
    avgdl = index.avgdl

    def write_group(table):
        return _write_shard(table, seg_dir, block_docs, avgdl)

    new_rows = [
        r.asDict()
        for r in src.groupBy("shard_id")
        .applyInArrow(write_group, schema=SEGMENT_SCHEMA)
        .collect()
    ]

    # incremental term->shard merge: surviving shards keep their pairs,
    # rebuilt ranges contribute fresh ones (an emptied shard simply
    # drops out of both)
    from . import commitio

    ts_dir = commitio.table_path(path, "term_shards")
    pairs = _term_shard_stats(src, positions)
    if os.path.isdir(ts_dir):
        old_pairs = spark.read.parquet(ts_dir).filter(
            ~F.col("shard_id").isin([int(s) for s in pending])
        )
        # allowMissingColumns: surviving rows from a pre-stats map keep
        # null counts — the planner treats those as unknown cost
        pairs = old_pairs.unionByName(pairs, allowMissingColumns=True)
    _publish_term_shards(spark, path, pairs)

    manifest.update(
        n_docs=index.n_docs,
        avgdl=index.avgdl,
        built_shards=len(new_rows),
        resumed_shards=len(kept),
        source=_source_token(path),
        shards=sorted(kept + new_rows, key=lambda r: r["shard_id"]),
    )
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, manifest_path)
    _gc_unreferenced_shards(seg_dir, manifest)
    # after the stamped manifest lands, the folded deltas are covered; a
    # crash before this line leaves the sidecar -> refresh reruns (idempotent)
    _clear_pending(path)
    return manifest


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)
