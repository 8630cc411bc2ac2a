"""Block-max WAND top-k BM25 over compressed segments.

Distributed plan: one task per segment shard (mapInPandas over the
manifest), each scanning only the query terms' rows of its shard file
(parquet row-group pruning on the term-sorted rows) and running a
block-at-a-time scorer with block-max pruning; the driver merges the
per-shard top-k candidates (k rows per shard — tiny) with the global
(score desc, doc_id asc) order.

Exactness argument: blocks are aligned on global doc-id ranges, so a
block holds a doc's complete (term, tf) contribution for the whole
query — scores finalize block-locally. Blocks are visited in ascending
doc-id order, so every candidate from a later block has a larger doc_id
than everything already in the heap; with the tie order "score desc,
doc_id asc" a tie never displaces an incumbent, hence skipping a block
whenever ``upper_bound <= threshold`` (sum of idf*max_u over the query
terms present in the block vs. the k-th best score so far) loses no
result. The per-shard top-k is exact, so the merged global top-k is too
(verified rank-identical vs. the DataFrame BM25 path and the pure-Python
oracle in tests/test_segments_wand.py).

The reference engine scores every matching doc and sorts
(/root/reference/src/index.rs:148-156) — WAND is the scale replacement
(SURVEY §4 top-k pruning row).
"""

from __future__ import annotations

import heapq
import os
from typing import Dict, Iterator, List, Optional, Tuple

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import analyze_query
from .codecs import decode_doc_ids, decode_tfs, varint_decode
from .segments import DOCSTATS_TERM, load_manifest

RESULT_SCHEMA = "doc_id long, score double"


def _score_shard(
    file_path: str,
    weights: Dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    mu_scale: float = 1.0,
    doc_range: Optional[Tuple[int, int]] = None,
    block_docs: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k of one shard via block-max skipping. Returns (ids, scores)."""
    import pyarrow.parquet as pq

    terms = list(weights)
    table = pq.read_table(
        file_path,
        columns=["term", "block_id", "n", "doc_ids", "tfs", "max_u"],
        filters=[("term", "in", terms + [DOCSTATS_TERM])],
    )
    return _score_shard_table(
        table, weights, k, k1, b, avgdl, mu_scale, doc_range, block_docs
    )


def _score_shard_table(
    table,
    weights: Dict[str, float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    mu_scale: float = 1.0,
    doc_range: Optional[Tuple[int, int]] = None,
    block_docs: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Block-max scorer over an in-memory shard table (rows may cover a
    superset of ``weights``'s terms — extra terms are ignored).

    ``mu_scale``: soundness factor for stored block-max bounds when the
    live avgdl has drifted since the shard was encoded. Stored
    ``max_u`` was computed under ``avgdl_built``; with
    u(tf, dl) = tf(k1+1)/(tf + k1(1-b) + k1*b*dl/avgdl) the ratio
    u_new/u_old = (x + y/a_old)/(x + y/a_new)  (x, y >= 0) is at most
    ``a_new/a_old`` when avgdl grew and at most 1 otherwise, so
    ``mu_scale = max(1, avgdl_live/avgdl_built)`` times the stored bound
    upper-bounds every true u — block skipping stays exact. Exact
    scores are always recomputed from the decoded dl with the live
    avgdl, so only the bound (never a result) is approximate."""
    if table.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    tcol = table.column("term").to_pylist()
    bcol = table.column("block_id").to_numpy()
    ncol = table.column("n").to_numpy()
    ids_col = table.column("doc_ids").to_pylist()
    tfs_col = table.column("tfs").to_pylist()
    mu_col = table.column("max_u").to_numpy()

    # organize: block_id -> (docstats row idx, [posting row idxs])
    blocks: Dict[int, List[int]] = {}
    dl_rows: Dict[int, int] = {}
    for i, (t, blk) in enumerate(zip(tcol, bcol)):
        if t == DOCSTATS_TERM:
            dl_rows[int(blk)] = i
        elif t in weights:  # batch reads carry other queries' terms too
            blocks.setdefault(int(blk), []).append(i)

    heap: List[Tuple[float, int]] = []  # (score, -doc_id); heap[0] = worst
    for blk in sorted(blocks):
        if doc_range is not None and block_docs:
            # blocks are doc-aligned (block_id = doc_id // block_docs):
            # skip boundary-shard blocks wholly outside [lo, hi) before
            # any decode
            blo = blk * int(block_docs)
            if blo >= doc_range[1] or blo + int(block_docs) <= doc_range[0]:
                continue
        rows = blocks[blk]
        ub = mu_scale * sum(weights[tcol[i]] * mu_col[i] for i in rows)
        if len(heap) == k and ub <= heap[0][0]:
            continue  # block-max skip: cannot beat current threshold
        # decode block doc-stats once
        di = dl_rows[blk]
        ds_ids = decode_doc_ids(ids_col[di], int(ncol[di]))
        ds_dl = varint_decode(tfs_col[di], int(ncol[di])).astype(np.float64)
        # accumulate exact scores for every doc in the block
        id_parts: List[np.ndarray] = []
        s_parts: List[np.ndarray] = []
        for i in rows:
            ids = decode_doc_ids(ids_col[i], int(ncol[i]))
            tfs = decode_tfs(tfs_col[i], int(ncol[i])).astype(np.float64)
            # positional parity segments carry tf=0 edge-ngram rows for
            # Match/Phrase serving; BM25 counts full tokens only
            sel = tfs > 0
            if doc_range is not None:
                # [lo, hi) doc-id restriction: candidates outside never
                # enter the heap; block-max skipping stays exact because
                # a bound over the block's superset bounds any subset
                sel &= (ids >= doc_range[0]) & (ids < doc_range[1])
            if not sel.all():
                ids, tfs = ids[sel], tfs[sel]
            if ids.size == 0:
                continue
            dl = ds_dl[np.searchsorted(ds_ids, ids)]
            u = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))
            id_parts.append(ids)
            s_parts.append(weights[tcol[i]] * u)
        if not id_parts:
            continue
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        totals = np.zeros(uids.size, np.float64)
        np.add.at(totals, inv, all_s)
        if len(heap) == k:
            mask = totals > heap[0][0]
            uids, totals = uids[mask], totals[mask]
        for d, s in zip(uids.tolist(), totals.tolist()):
            if len(heap) < k:
                heapq.heappush(heap, (s, -d))
            elif s > heap[0][0]:
                heapq.heapreplace(heap, (s, -d))
    if not heap:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        np.array([-d for _, d in out], np.int64),
        np.array([s for s, _ in out], np.float64),
    )


def _query_weights(
    spark: SparkSession,
    index_path: str,
    texts: List[str],
    manifest: dict,
    termdict: Optional[DataFrame],
) -> List[Dict[str, float]]:
    """Per-query idf weights, one termdict lookup for the whole batch."""
    n = float(manifest["n_docs"])
    per_query_terms: List[List[str]] = []
    for text in texts:
        terms: List[str] = []
        for tok in analyze_query(text):
            if tok.term not in terms:
                terms.append(tok.term)
        per_query_terms.append(terms)
    all_terms = sorted({t for ts in per_query_terms for t in ts})
    if termdict is None:
        # driver-side filtered parquet read (metacache) — no Spark job
        # ahead of the shard scan; a caller holding a live in-memory
        # termdict view (e.g. refresh_index) passes it explicitly
        from .metacache import term_dfs

        dfs = term_dfs(index_path, all_terms)
    else:
        dfs = {
            r["term"]: r["df_full"]
            for r in termdict.filter(F.col("term").isin(all_terms)).collect()
        }
    return [
        {
            t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            for t in terms
            if dfs.get(t, 0) > 0
        }
        for terms in per_query_terms
    ]


def _apply_boosts(
    weights: Dict[str, float], boosts: Optional[Dict[str, float]]
) -> Dict[str, float]:
    """Query-time term boosting (Lucene ``term^boost``): each term's idf
    weight multiplies by its boost. WAND stays EXACT under boosting —
    block bounds are ``weight * max_u`` per term, so scaling a weight
    scales its bound identically; a boost of 0 drops the term. Negative
    boosts are rejected (a negative weight breaks the upper-bound
    argument)."""
    if not boosts:
        return weights
    for t, w in boosts.items():
        if w != w or w < 0:  # NaN or negative
            raise ValueError(f"invalid boost for {t!r}: {w}")
    return {
        t: w * float(boosts.get(t, 1.0))
        for t, w in weights.items()
        if float(boosts.get(t, 1.0)) > 0
    }


def _bound_scale(avgdl_live: float, shard_row: dict) -> float:
    """max(1, avgdl_live/avgdl_built) for a manifest shard row — the
    factor that keeps this shard's stored block-max bounds sound after
    incremental refreshes drift the corpus avgdl (see
    _score_shard_table). Rows from pre-refresh manifests carry no
    avgdl_built; they were built under the manifest's own avgdl, which
    is only updated together with a rebuild, so 1.0 is exact there."""
    built = shard_row.get("avgdl_built")
    if not built or built <= 0:
        return 1.0
    return max(1.0, float(avgdl_live) / float(built))


def shards_for_terms(
    spark: SparkSession, index_path: str, manifest: dict, terms
) -> List[dict]:
    """Manifest shard rows pruned to those containing >= 1 query term.

    Uses the exact ``term_shards`` map written by build_segments, read
    DRIVER-SIDE with parquet predicate pushdown (metacache.py — the map
    is range-partitioned and sorted by term, so row-group fences prune;
    no Spark job runs before the shard scan). A rare term therefore
    costs O(df / shard_docs) shard opens instead of O(shards) — the
    distributed analogue of the reference's O(log n) sorted-dictionary
    term lookup (/root/reference/src/index.rs:122-127). Falls back to
    every shard when the map is absent (pre-v2 layouts).
    """
    return shards_and_cost_for_terms(spark, index_path, manifest, terms)[0]


def shards_and_cost_for_terms(
    spark, index_path: str, manifest: dict, terms
) -> Tuple[List[dict], Optional[int]]:
    """(pruned shard rows, est read bytes) — the cost is the per-term
    statistics bound (postings only; WAND never reads positions), None
    when the map predates the stats columns. Drives the
    local-vs-distributed serving decision (metacache.serve_locally)."""
    from .metacache import estimate_read_bytes, range_stats_for_ranges

    terms = list(terms)
    if not terms:
        return manifest["shards"], None
    # exact terms = degenerate ranges [t, t + NUL)
    stats = range_stats_for_ranges(
        index_path, [(t, t + "\x00") for t in terms]
    )
    est = estimate_read_bytes(stats, with_positions=False)
    if stats is None or any(s is None for s in stats):
        return manifest["shards"], est
    hit = set().union(*(s["shards"] for s in stats))
    return [s for s in manifest["shards"] if s["shard_id"] in hit], est


def _empty_wand_pdf(batch: bool = False) -> pd.DataFrame:
    cols = {}
    if batch:
        cols["query_id"] = pd.Series([], dtype="int32")
    cols["doc_id"] = pd.Series([], dtype="int64")
    cols["score"] = pd.Series([], dtype="float64")
    if batch:
        cols["rank"] = pd.Series([], dtype="int32")
    return pd.DataFrame(cols)


def _local_wand(
    seg_dir: str, shards: List[dict], weights: Dict[str, float],
    k: int, k1: float, b: float, avgdl: float,
    doc_range: Optional[Tuple[int, int]] = None,
    block_docs: Optional[int] = None,
) -> pd.DataFrame:
    """In-process block-max WAND over the pruned shard files — the same
    _score_shard kernel the executors run, merged identically
    ((score desc, doc_id asc), head(k))."""
    from .segquery import _map_files

    def one(shard_row):
        f = os.path.join(seg_dir, shard_row["file"])
        ids, scores = _score_shard(
            f, weights, k, k1, b, avgdl,
            float(_bound_scale(avgdl, shard_row)),
            doc_range, block_docs,
        )
        if ids.size == 0:
            return None
        return pd.DataFrame({"doc_id": ids, "score": scores})

    parts = _map_files(one, shards)
    if not parts:
        return _empty_wand_pdf()
    pdf = pd.concat(parts, ignore_index=True)
    return (
        pdf.sort_values(
            ["score", "doc_id"],
            ascending=[False, True],
            kind="mergesort",
            ignore_index=True,
        )
        .head(k)
        .reset_index(drop=True)
    )


def _local_wand_batch(
    seg_dir: str, shards: List[dict], live, k: int,
    k1: float, b: float, avgdl: float,
) -> pd.DataFrame:
    """In-process batched WAND + per-query rank merge (identical to the
    mapInPandas path's window rank)."""
    import pyarrow.parquet as pq

    from .segquery import _map_files

    union_terms = sorted({t for _, w in live for t in w})

    def one(shard_row):
        f = os.path.join(seg_dir, shard_row["file"])
        sc = _bound_scale(avgdl, shard_row)
        table = pq.read_table(
            f,
            columns=["term", "block_id", "n", "doc_ids", "tfs", "max_u"],
            filters=[("term", "in", union_terms + [DOCSTATS_TERM])],
        )
        frames = []
        for qid, w in live:
            ids, scores = _score_shard_table(
                table, w, k, k1, b, avgdl, float(sc)
            )
            if ids.size == 0:
                continue
            frames.append(
                pd.DataFrame({"query_id": qid, "doc_id": ids, "score": scores})
            )
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    parts = _map_files(one, shards)
    if not parts:
        return _empty_wand_pdf(batch=True)
    pdf = pd.concat(parts, ignore_index=True)
    pdf = pdf.sort_values(
        ["query_id", "score", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
        ignore_index=True,
    )
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[pdf["rank"] <= k].reset_index(drop=True)


def wand_topk_pandas(
    index_path: str,
    text: str,
    k: int = 10,
    doc_range: Optional[Tuple[int, int]] = None,
    boosts: Optional[Dict[str, float]] = None,
) -> pd.DataFrame:
    """QUERY-NODE BM25 serving: block-max WAND top-k straight from the
    segment files in this process — no SparkSession, no JVM, no job.

    Row-identical to ``wand_topk(...).toPandas()``: the same planning
    (metacache term dfs + exact term->shard pruning), the same
    _score_shard kernel, the same merge. A rare-term query costs the
    O(df) pruned file opens and nothing else — milliseconds, the
    distributed analogue of the reference's in-memory serve
    (/root/reference/src/index.rs:149-160)."""
    from . import metacache

    # skip snapshot fingerprinting entirely when the cache is disabled
    # (SPARK_GRAFT_SERVE_CACHE=0 must be zero-cost: the bench kill
    # switch exists so retries measure the engine, not the cache)
    snap = (
        metacache.request_snapshot(index_path)
        if metacache._req_cache_max() > 0
        else None
    )
    key = None
    if snap is not None:
        bkey = tuple(sorted(boosts.items())) if boosts else None
        dr = tuple(doc_range) if doc_range is not None else None
        key = (snap, "wand", text, k, dr, bkey)
        hit = metacache.request_cache_get(key)
        if hit is not None:
            return hit
    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    avgdl = float(manifest["avgdl"])
    k1, b = float(manifest["k1"]), float(manifest["b"])
    weights = _query_weights(None, index_path, [text], manifest, None)[0]
    weights = _apply_boosts(weights, boosts)
    if not weights:
        return _empty_wand_pdf()
    shards = shards_for_terms(None, index_path, manifest, weights)
    if doc_range is not None:
        shards = _shards_in_range(shards, manifest, doc_range)
    out = _local_wand(
        seg_dir, shards, weights, k, k1, b, avgdl, doc_range,
        int(manifest.get("block_docs") or 0) or None,
    )
    if key is not None:
        metacache.request_cache_put(key, out)
    return out


def score_topk_pandas(
    index_path: str,
    text: str,
    k: int = 10,
    similarity: str = "lmd",
    mu: float = 2000.0,
) -> pd.DataFrame:
    """Coordinator serving of the pluggable-similarity family
    (FtsEngine.score_topk's LM Dirichlet / classic TF-IDF) straight
    from the compressed segments — no SparkSession, no JVM.

    Same planning shape as wand_topk_pandas (driver-side term stats +
    exact term->shard pruning), but the per-shard kernel scores
    EXHAUSTIVELY: non-BM25 similarities have no precomputed block-max
    bounds, so there is no sound skip — every posting of the query
    terms is decoded (still O(df), never O(corpus)). Shards are
    doc-disjoint, so per-shard top-k + driver merge is exact, the same
    argument as WAND's. Rank-identical to ``FtsEngine.score_topk``
    (scores equal to float ulps — the two paths sum per-term
    contributions in different orders); pinned in tests.
    """
    if similarity not in ("lmd", "tfidf"):
        raise ValueError(
            f"unknown similarity {similarity!r}; expected 'lmd' or "
            "'tfidf' (bm25 serves via wand_topk_pandas)"
        )
    if similarity == "lmd" and mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    from . import metacache
    from .analysis import analyze_query

    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    if not terms:
        return _empty_wand_pdf()
    n = float(manifest["n_docs"])
    if similarity == "lmd":
        cfs = metacache.term_dfs(index_path, terms, column="cf")
        total = metacache.docstats_total_tokens(index_path)
        if not total:
            return _empty_wand_pdf()
        # absent terms (cf 0) contribute nothing and would divide by 0
        consts = {
            t: float(mu) * (float(cfs[t]) / float(total))
            for t in terms
            if cfs.get(t)
        }

        def term_fn(t, tfs, dl):
            return np.log(1.0 + tfs / consts[t]) + np.log(
                float(mu) / (dl + float(mu))
            )

    else:  # tfidf
        dfs = metacache.term_dfs(index_path, terms, column="df_full")
        consts = {}
        for t in terms:
            if dfs.get(t):
                idf = 1.0 + np.log(n / (float(dfs[t]) + 1.0))
                consts[t] = idf * idf

        def term_fn(t, tfs, dl):
            return np.sqrt(tfs) * consts[t] / np.sqrt(dl)

    if not consts:
        return _empty_wand_pdf()
    shards = shards_for_terms(None, index_path, manifest, list(consts))

    import pyarrow.parquet as pq

    from .segquery import _map_files

    def one(shard_row):
        f = os.path.join(seg_dir, shard_row["file"])
        table = pq.read_table(
            f,
            columns=["term", "block_id", "n", "doc_ids", "tfs"],
            filters=[("term", "in", list(consts) + [DOCSTATS_TERM])],
        )
        if table.num_rows == 0:
            return None
        tcol = table.column("term").to_pylist()
        bcol = table.column("block_id").to_numpy()
        ncol = table.column("n").to_numpy()
        ids_col = table.column("doc_ids").to_pylist()
        tfs_col = table.column("tfs").to_pylist()
        blocks: Dict[int, List[int]] = {}
        dl_rows: Dict[int, int] = {}
        for i, (t, blk) in enumerate(zip(tcol, bcol)):
            if t == DOCSTATS_TERM:
                dl_rows[int(blk)] = i
            elif t in consts:
                blocks.setdefault(int(blk), []).append(i)
        id_parts: List[np.ndarray] = []
        s_parts: List[np.ndarray] = []
        for blk, rows in blocks.items():
            di = dl_rows[blk]
            ds_ids = decode_doc_ids(ids_col[di], int(ncol[di]))
            ds_dl = varint_decode(tfs_col[di], int(ncol[di])).astype(
                np.float64
            )
            for i in rows:
                ids = decode_doc_ids(ids_col[i], int(ncol[i]))
                tfs = decode_tfs(tfs_col[i], int(ncol[i])).astype(np.float64)
                sel = tfs > 0  # parity segments carry tf=0 ngram rows
                if not sel.all():
                    ids, tfs = ids[sel], tfs[sel]
                if ids.size == 0:
                    continue
                dl = ds_dl[np.searchsorted(ds_ids, ids)]
                id_parts.append(ids)
                s_parts.append(term_fn(tcol[i], tfs, dl))
        if not id_parts:
            return None
        all_ids = np.concatenate(id_parts)
        all_s = np.concatenate(s_parts)
        uids, inv = np.unique(all_ids, return_inverse=True)
        totals = np.zeros(uids.size, np.float64)
        np.add.at(totals, inv, all_s)
        # per-shard top-k pushdown (shards are doc-disjoint -> exact)
        if uids.size > k:
            order = np.lexsort((uids, -totals))[:k]
            uids, totals = uids[order], totals[order]
        return pd.DataFrame({"doc_id": uids, "score": totals})

    parts = _map_files(one, shards)
    if not parts:
        return _empty_wand_pdf()
    pdf = pd.concat(parts, ignore_index=True)
    return (
        pdf.sort_values(
            ["score", "doc_id"],
            ascending=[False, True],
            kind="mergesort",
            ignore_index=True,
        )
        .head(k)
        .reset_index(drop=True)
    )


def wand_topk_batch_pandas(
    index_path: str, texts: List[str], k: int = 10
) -> pd.DataFrame:
    """Query-node batched BM25: many queries, one in-process pass over
    the pruned segment files (cf. wand_topk_pandas). Row-identical to
    ``wand_topk_batch(...).toPandas()``."""
    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    avgdl = float(manifest["avgdl"])
    k1, b = float(manifest["k1"]), float(manifest["b"])
    weights = _query_weights(None, index_path, texts, manifest, None)
    live = [(qid, w) for qid, w in enumerate(weights) if w]
    if not live:
        return _empty_wand_pdf(batch=True)
    union_query_terms = {t for _, w in live for t in w}
    shards = shards_for_terms(None, index_path, manifest, union_query_terms)
    return _local_wand_batch(seg_dir, shards, live, k, k1, b, avgdl)


def wand_topk_batch(
    spark: SparkSession,
    index_path: str,
    texts: List[str],
    k: int = 10,
    termdict: Optional[DataFrame] = None,
    mode: str = "auto",
) -> DataFrame:
    """Block-max WAND for MANY queries in one pass over the segments.

    Each shard task opens its file once with the union of every query's
    terms (one parquet read + decode amortized across the batch), runs
    the per-query block-max scorer, and emits k rows per (query, shard);
    the driver merge is a per-query top-k window over
    ``k * len(texts) * n_shards`` tiny rows. Returns
    (query_id, doc_id, score, rank).
    """
    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    avgdl = float(manifest["avgdl"])
    k1, b = float(manifest["k1"]), float(manifest["b"])
    weights = _query_weights(spark, index_path, texts, manifest, termdict)
    live = [(qid, w) for qid, w in enumerate(weights) if w]
    out_schema = "query_id int, doc_id long, score double"
    if not live:
        return spark.createDataFrame([], out_schema + ", rank int")

    union_query_terms = {t for _, w in live for t in w}
    shards, est = shards_and_cost_for_terms(
        spark, index_path, manifest, union_query_terms
    )

    from .metacache import serve_locally

    if serve_locally(shards, mode, est_bytes=est):
        pdf = _local_wand_batch(seg_dir, shards, live, k, k1, b, avgdl)
        rows = [
            (int(q), int(d), float(s), int(r))
            for q, d, s, r in zip(
                pdf["query_id"], pdf["doc_id"], pdf["score"], pdf["rank"]
            )
        ]
        return spark.createDataFrame(rows, out_schema + ", rank int")

    shards_df = spark.createDataFrame(
        [
            (
                os.path.join(seg_dir, s["file"]),
                _bound_scale(avgdl, s),
            )
            for s in shards
        ],
        "file string, mu_scale double",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        union_terms = sorted({t for _, w in live for t in w})
        for pdf in batches:
            for f, sc in zip(pdf["file"], pdf["mu_scale"]):
                table = pq.read_table(
                    f,
                    columns=["term", "block_id", "n", "doc_ids", "tfs", "max_u"],
                    filters=[("term", "in", union_terms + [DOCSTATS_TERM])],
                )
                for qid, w in live:
                    ids, scores = _score_shard_table(
                        table, w, k, k1, b, avgdl, float(sc)
                    )
                    yield pd.DataFrame(
                        {"query_id": qid, "doc_id": ids, "score": scores}
                    )

    from pyspark.sql import Window

    win = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        shards_df.mapInPandas(run, schema=out_schema)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def wand_topk(
    spark: SparkSession,
    index_path: str,
    text: str,
    k: int = 10,
    termdict: Optional[DataFrame] = None,
    mode: str = "auto",
    doc_range: Optional[Tuple[int, int]] = None,
    boosts: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """Distributed BM25 top-k: driver analyzes the query + computes idf,
    executors run block-max WAND per shard, driver merges k*shards rows.

    ``mode="auto"``: when term->shard pruning leaves a small shard set
    (metacache.serve_locally) the driver scores the pruned files itself
    with the same block-max kernel and returns a local relation — a
    rare-term top-k costs zero Spark jobs, the query-node pattern.

    ``doc_range=(lo, hi)``: EXACT filtered top-k over doc ids in
    [lo, hi) at full segment speed — shards are doc ranges, so the
    restriction prunes whole shard files structurally (a time-scoped
    search over time-ordered doc ids opens only the window's shards)
    and masks candidates inside boundary shards before the heap. idf
    and avgdl stay corpus-global (the filter-query contract). Block-max
    skipping stays exact: a block bound over the superset bounds any
    subset. Arbitrary (non-range) filters belong on the relational
    path (``FtsEngine.bm25(filter_docs=...)``).
    """
    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    avgdl = float(manifest["avgdl"])
    k1, b = float(manifest["k1"]), float(manifest["b"])
    weights = _query_weights(spark, index_path, [text], manifest, termdict)[0]
    weights = _apply_boosts(weights, boosts)
    if not weights:
        return spark.createDataFrame([], RESULT_SCHEMA)

    # createDataFrame parallelizes the file list across default
    # parallelism already; an explicit repartition would add a shuffle
    # stage for no balance gain (a task scores files sequentially, and
    # shard files are uniform by construction)
    shards, est = shards_and_cost_for_terms(
        spark, index_path, manifest, weights
    )
    if doc_range is not None:
        pruned = _shards_in_range(shards, manifest, doc_range)
        if not pruned:
            return spark.createDataFrame([], RESULT_SCHEMA)
        if len(pruned) < len(shards):
            # the per-term estimate covered ALL the terms' shards; after
            # range pruning it is stale — fall back to the surviving
            # shards' enc_bytes (serve_locally handles None)
            est = None
        shards = pruned

    from .metacache import serve_locally

    block_docs = int(manifest.get("block_docs") or 0) or None
    if serve_locally(shards, mode, est_bytes=est):
        pdf = _local_wand(
            seg_dir, shards, weights, k, k1, b, avgdl, doc_range,
            block_docs,
        )
        rows = [
            (int(d), float(s)) for d, s in zip(pdf["doc_id"], pdf["score"])
        ]
        return spark.createDataFrame(rows, RESULT_SCHEMA)

    shards_df = spark.createDataFrame(
        [
            (os.path.join(seg_dir, s["file"]), _bound_scale(avgdl, s))
            for s in shards
        ],
        "file string, mu_scale double",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f, sc in zip(pdf["file"], pdf["mu_scale"]):
                ids, scores = _score_shard(
                    f, weights, k, k1, b, avgdl, float(sc), doc_range,
                    block_docs,
                )
                yield pd.DataFrame({"doc_id": ids, "score": scores})

    return (
        shards_df.mapInPandas(run, schema=RESULT_SCHEMA)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _shards_in_range(
    shards: List[dict], manifest: dict, doc_range: Tuple[int, int]
) -> List[dict]:
    from .segments import shards_in_range

    return shards_in_range(shards, manifest["shard_docs"], doc_range)


FED_SCHEMA = "index_id int, doc_id long, score double"


def wand_topk_federated(
    spark: SparkSession,
    paths: List[str],
    text: str,
    k: int = 10,
    mode: str = "auto",
) -> DataFrame:
    """BM25 top-k across SEVERAL indexes with globally consistent
    scoring — the serving shape for time-partitioned deployments whose
    windows aren't merged yet (cf. merge.merge_indexes for the folded
    form).

    Global statistics combine driver-side with zero Spark jobs: N and
    total token mass from each manifest, per-term df summed from each
    index's termdict via metacache. Every shard then scores with the
    SAME global idf and global avgdl, so scores are comparable across
    indexes; per-shard block-max bounds stay sound under the global
    avgdl via the usual max(1, avgdl_live/avgdl_built) rescale (bounds
    computed under a larger avgdl only over-estimate — the refresh-drift
    argument).

    Returns (index_id, doc_id, score) ordered (score desc, doc_id asc,
    index_id asc) — unmerged indexes may share doc ids, so the index
    tag is part of the result identity. ``k1``/``b`` must match across
    inputs. ``mode`` as in wand_topk: "auto" serves the union of pruned
    shard sets in-process when the summed cost bound is small.
    """
    if not paths:
        raise ValueError("wand_topk_federated needs at least one index")
    manifests = [load_manifest(p) for p in paths]
    kb = {(float(m["k1"]), float(m["b"])) for m in manifests}
    if len(kb) != 1:
        raise ValueError("indexes were built with different k1/b")
    k1, b = kb.pop()
    n = float(sum(int(m["n_docs"]) for m in manifests))
    tokens = sum(int(m["n_docs"]) * float(m["avgdl"]) for m in manifests)
    avgdl = tokens / max(n, 1.0)

    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    from .metacache import serve_locally, term_dfs

    dfs: Dict[str, int] = {}
    for p in paths:
        for t, d in term_dfs(p, terms).items():
            dfs[t] = dfs.get(t, 0) + int(d)
    weights = {
        t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        for t in terms
        if dfs.get(t, 0) > 0
    }
    if not weights:
        return spark.createDataFrame([], FED_SCHEMA)

    rows: List[tuple] = []  # (index_id, file, mu_scale)
    all_shards: List[dict] = []
    est_total: Optional[int] = 0
    for i, (p, m) in enumerate(zip(paths, manifests)):
        shards, est = shards_and_cost_for_terms(spark, p, m, weights)
        all_shards.extend(shards)
        est_total = (
            None if (est_total is None or est is None) else est_total + est
        )
        seg_dir = os.path.join(p, "segments")
        for s in shards:
            if s.get("avgdl_built") is None:
                # legacy pre-avgdl_built rows: their bounds are exact
                # under THEIR index's own avgdl, not the global one —
                # backfill so _bound_scale rescales soundly (the same
                # hole merge_indexes plugs when carrying rows over)
                s = dict(s, avgdl_built=float(m["avgdl"]))
            rows.append(
                (i, os.path.join(seg_dir, s["file"]), _bound_scale(avgdl, s))
            )
    if not rows:
        return spark.createDataFrame([], FED_SCHEMA)

    if serve_locally(all_shards, mode, est_bytes=est_total):
        parts = []
        for i, f, sc in rows:
            ids, scores = _score_shard(f, weights, k, k1, b, avgdl, float(sc))
            if ids.size:
                parts.append((i, ids, scores))
        flat = [
            (int(i), int(d), float(s))
            for i, ids, scores in parts
            for d, s in zip(ids, scores)
        ]
        flat.sort(key=lambda r: (-r[2], r[1], r[0]))
        return spark.createDataFrame(flat[:k], FED_SCHEMA)

    shards_df = spark.createDataFrame(rows, "index_id int, file string, mu_scale double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i, f, sc in zip(pdf["index_id"], pdf["file"], pdf["mu_scale"]):
                ids, scores = _score_shard(
                    f, weights, k, k1, b, avgdl, float(sc)
                )
                yield pd.DataFrame(
                    {
                        "index_id": np.full(ids.size, int(i), dtype="int32"),
                        "doc_id": ids,
                        "score": scores,
                    }
                )

    return (
        shards_df.mapInPandas(run, schema=FED_SCHEMA)
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("index_id"))
        .limit(k)
    )


def explain_topk_pandas(
    index_path: str, text: str, k: int = 10
) -> pd.DataFrame:
    """QUERY-NODE score explanation: the BM25 top-k with per-term
    contributions, straight from the segment files in this process — no
    SparkSession, no JVM, no job (the zero-Spark twin of
    ``FtsEngine.explain_bm25``; per-row values agree to float64
    rounding, asserted in tests).

    Plan: ``wand_topk_pandas`` finds the winners (block-max pruned),
    then ONLY the shards that (a) hold a winner doc and (b) contain a
    query term are re-read to decode the winners' (tf, dl) rows — for
    k winners that is at most k shard files, usually far fewer.

    Columns: (doc_id, score, term, tf, df, idf, contrib), ordered
    score desc, doc_id asc, term asc; sum(contrib) per doc == score.
    """
    import pyarrow.parquet as pq

    from .codecs import decode_doc_ids, decode_tfs, varint_decode
    from .metacache import term_dfs

    manifest = load_manifest(index_path)
    seg_dir = os.path.join(index_path, "segments")
    avgdl = float(manifest["avgdl"])
    k1, b = float(manifest["k1"]), float(manifest["b"])
    n = float(manifest["n_docs"])
    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
            "term": pd.Series([], dtype="object"),
            "tf": pd.Series([], dtype="float64"),
            "df": pd.Series([], dtype="float64"),
            "idf": pd.Series([], dtype="float64"),
            "contrib": pd.Series([], dtype="float64"),
        }
    )
    if not terms:
        return empty
    dfs = term_dfs(index_path, sorted(terms))
    weights = {
        t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        for t in terms
        if dfs.get(t, 0) > 0
    }
    if not weights:
        return empty
    top = wand_topk_pandas(index_path, text, k)
    if top.empty:
        return empty
    top_ids = set(int(d) for d in top["doc_id"])
    score_of = {int(d): float(s) for d, s in zip(top["doc_id"], top["score"])}
    shard_docs = int(manifest["shard_docs"])
    want_shards = {d // shard_docs for d in top_ids}
    shards = [
        s
        for s in shards_for_terms(None, index_path, manifest, weights)
        if s["shard_id"] in want_shards
    ]
    rows = []
    want_np = np.array(sorted(top_ids), dtype=np.int64)
    for srow in shards:
        table = pq.read_table(
            os.path.join(seg_dir, srow["file"]),
            columns=["term", "block_id", "n", "doc_ids", "tfs"],
            filters=[("term", "in", list(weights) + [DOCSTATS_TERM])],
        )
        tcol = table.column("term").to_pylist()
        bcol = table.column("block_id").to_numpy()
        ncol = table.column("n").to_numpy()
        ids_col = table.column("doc_ids").to_pylist()
        tfs_col = table.column("tfs").to_pylist()
        dl_rows = {
            int(blk): i
            for i, (t, blk) in enumerate(zip(tcol, bcol))
            if t == DOCSTATS_TERM
        }
        for i, t in enumerate(tcol):
            if t == DOCSTATS_TERM:
                continue
            ids = decode_doc_ids(ids_col[i], int(ncol[i]))
            tfs = decode_tfs(tfs_col[i], int(ncol[i])).astype(np.float64)
            sel = (tfs > 0) & np.isin(ids, want_np)
            if not sel.any():
                continue
            ids, tfs = ids[sel], tfs[sel]
            di = dl_rows[int(bcol[i])]
            ds_ids = decode_doc_ids(ids_col[di], int(ncol[di]))
            ds_dl = varint_decode(tfs_col[di], int(ncol[di])).astype(
                np.float64
            )
            dl = ds_dl[np.searchsorted(ds_ids, ids)]
            u = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))
            w = weights[t]
            for d, tf, uu in zip(ids.tolist(), tfs.tolist(), u.tolist()):
                rows.append(
                    (
                        int(d),
                        score_of[int(d)],
                        t,
                        float(tf),
                        float(dfs[t]),
                        w,
                        w * uu,
                    )
                )
    out = pd.DataFrame(
        rows,
        columns=["doc_id", "score", "term", "tf", "df", "idf", "contrib"],
    )
    return out.sort_values(
        ["score", "doc_id", "term"], ascending=[False, True, True]
    ).reset_index(drop=True)
