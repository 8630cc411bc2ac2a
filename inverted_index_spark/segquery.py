"""Positional segment-served queries: parity Match and Phrase.

Serves the reference's positional query family (Match scoring and
Phrase adjacency — /root/reference/src/postings.rs:66-112,
src/search_result.rs:19-28) from the compressed segment layout
(segments.py with ``positions=True``) instead of the raw postings
parquet, so the uncompressed postings table is not needed at query time.

Distributed plan — same shape as WAND (wand.py): prune shards with the
exact term->shard map, one task per surviving shard file (mapInPandas),
each shard evaluated with a fully vectorized numpy kernel (decode ->
adjacency join on (doc, pos+1) -> neighbor-only coalesce -> parity
score); blocks hold complete docs, so per-shard results are exact and
the driver just merges.

The coalesce kernel reproduces the reference's *neighbor-only* merge
rule (util/coalesce.rs:32-73): rows sorted by (begin, end, pos) merge
only with the immediately preceding output element, and only when the
token ordinal matches and byte ranges touch. Because a merge requires
equal ``pos``, every merge chain is a consecutive run of constant
(doc, pos) rows, which makes the scan expressible as a segmented
cumulative max — no per-row Python.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import analyze_query
from .codecs import decode_doc_ids, decode_pos_block, varint_decode
from .oracle import prefix_upper_bound
from .segments import DOCSTATS_TERM, load_manifest

RESULT_SCHEMA = "doc_id long, score float"
RESULT_POS_SCHEMA = (
    "doc_id long, score float, "
    "positions array<struct<begin:int,end:int,pos:int>>"
)

_POS_SHIFT = np.int64(1) << np.int64(32)  # (doc_idx, pos) -> one int64 key


def _term_ranges(index_path: str, terms: List[str]) -> List[Tuple[str, Optional[str]]]:
    """One (lo, hi) index-term range per query term.

    Full-token index: prefix-expansion range [t, succ(t)) — equivalent
    to the parity index's stored edge-ngrams (query.py:113). Parity
    (ngram) index: degenerate exact range [t, t + chr(0))."""
    meta_path = os.path.join(index_path, "meta.json")
    ngrams = False
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            ngrams = bool(json.load(fh).get("ngrams", False))
    if ngrams:
        return [(t, t + "\x00") for t in terms]
    return [(t, prefix_upper_bound(t)) for t in terms]


def _shards_for_ranges(
    spark: SparkSession, index_path: str, manifest: dict, ranges
) -> List[dict]:
    """Term->shard pruning for range matchers (cf. wand.shards_for_terms)."""
    ts_dir = os.path.join(index_path, "term_shards")
    if not ranges or not os.path.isdir(ts_dir):
        return manifest["shards"]
    pred = None
    for lo, hi in ranges:
        p = F.col("term") >= lo
        if hi is not None:
            p = p & (F.col("term") < hi)
        pred = p if pred is None else (pred | p)
    hit = {
        r["shard_id"]
        for r in spark.read.parquet(ts_dir)
        .filter(pred)
        .select("shard_id")
        .distinct()
        .collect()
    }
    return [s for s in manifest["shards"] if s["shard_id"] in hit]


def _read_shard(file_path: str, ranges) -> Tuple[list, Dict[int, int]]:
    """Decode one shard's rows for the given term ranges.

    Returns (matchers, docbytes): ``matchers[i]`` is the flat
    (docs, begins, ends, poss) arrays of every posting matching range i;
    ``docbytes`` maps doc_id -> doclen_bytes (from the term='' rows).
    """
    import pyarrow.parquet as pq

    filters = [[("term", "==", DOCSTATS_TERM)]]
    for lo, hi in ranges:
        cl = [("term", ">=", lo)]
        if hi is not None:
            cl.append(("term", "<", hi))
        filters.append(cl)
    table = pq.read_table(
        file_path,
        columns=["term", "n", "doc_ids", "pos_counts", "positions"],
        filters=filters,
    )
    tcol = table.column("term").to_pylist()
    ncol = table.column("n").to_numpy()
    ids_col = table.column("doc_ids").to_pylist()
    pc_col = table.column("pos_counts").to_pylist()
    pos_col = table.column("positions").to_pylist()

    matchers = [
        {"d": [], "b": [], "e": [], "p": []} for _ in ranges
    ]
    docbytes: Dict[int, int] = {}
    for i, t in enumerate(tcol):
        n = int(ncol[i])
        ids = decode_doc_ids(ids_col[i], n)
        if t == DOCSTATS_TERM:
            dbs = varint_decode(pc_col[i], n).astype(np.int64)
            docbytes.update(zip(ids.tolist(), dbs.tolist()))
            continue
        counts = varint_decode(pc_col[i], n).astype(np.int64)
        b, e, p = decode_pos_block(pos_col[i], counts)
        drep = np.repeat(ids, counts)
        for mi, (lo, hi) in enumerate(ranges):
            if t >= lo and (hi is None or t < hi):
                m = matchers[mi]
                m["d"].append(drep)
                m["b"].append(b)
                m["e"].append(e)
                m["p"].append(p)

    out = []
    for m in matchers:
        if m["d"]:
            out.append(
                tuple(np.concatenate(m[k]) for k in ("d", "b", "e", "p"))
            )
        else:
            z = np.empty(0, np.int64)
            out.append((z, z, z, z))
    return out, docbytes


def _coalesced(
    docs: np.ndarray, b: np.ndarray, e: np.ndarray, p: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Neighbor-only coalesce -> per-chain (doc, begin, end, pos), in
    (doc, begin, end, pos) sort order. Duplicates merge away."""
    if docs.size == 0:
        return docs, b, e, p
    order = np.lexsort((p, e, b, docs))
    d, bb, ee, pp = docs[order], b[order], e[order], p[order]
    run_break = np.ones(d.size, dtype=bool)
    run_break[1:] = (d[1:] != d[:-1]) | (pp[1:] != pp[:-1])
    run_id = np.cumsum(run_break) - 1
    # run-local cumulative max of `end` (see module docstring)
    m = np.maximum.accumulate(run_id * _POS_SHIFT + ee) - run_id * _POS_SHIFT
    chain_break = run_break.copy()
    chain_break[1:] |= m[:-1] < bb[1:]
    chain_id = np.cumsum(chain_break) - 1
    starts = np.flatnonzero(chain_break)
    last = np.empty(starts.size, dtype=np.int64)
    last[:-1] = starts[1:] - 1
    last[-1] = d.size - 1
    return d[starts], bb[starts], m[last], pp[starts]


def _score_rows(
    member_docs: np.ndarray,
    rows: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    docbytes: Dict[int, int],
    with_positions: bool,
) -> pd.DataFrame:
    """Parity score (float32 sum(width)/sqrt(bytes)) for every member
    doc; docs with no surviving rows score 0 with empty positions."""
    cd, cb, ce, cp = _coalesced(*rows)
    member_docs = np.sort(member_docs)
    widths = np.zeros(member_docs.size, dtype=np.int64)
    idx = np.searchsorted(member_docs, cd)
    np.add.at(widths, idx, ce - cb)
    dbs = np.array(
        [docbytes[int(x)] for x in member_docs], dtype=np.float64
    )
    # bit-for-bit the engine's arithmetic (query.py:337-343): Spark
    # implicitly widens float/float division to double, then the result
    # is cast back to float32
    scores = (
        widths.astype(np.float32).astype(np.float64)
        / np.sqrt(dbs).astype(np.float32).astype(np.float64)
    ).astype(np.float32)
    out = {"doc_id": member_docs, "score": scores}
    if with_positions:
        bounds = np.searchsorted(cd, member_docs, side="left")
        bounds_hi = np.searchsorted(cd, member_docs, side="right")
        out["positions"] = [
            [
                {"begin": int(cb[i]), "end": int(ce[i]), "pos": int(cp[i])}
                for i in range(lo, hi)
            ]
            for lo, hi in zip(bounds, bounds_hi)
        ]
    return pd.DataFrame(out)


def _eval_match(matchers, docbytes, with_positions) -> pd.DataFrame:
    d = np.concatenate([m[0] for m in matchers])
    b = np.concatenate([m[1] for m in matchers])
    e = np.concatenate([m[2] for m in matchers])
    p = np.concatenate([m[3] for m in matchers])
    member = np.unique(d)
    return _score_rows(member, (d, b, e, p), docbytes, with_positions)


def _eval_phrase(matchers, docbytes, with_positions) -> pd.DataFrame:
    member: Optional[np.ndarray] = None
    parts_d: List[np.ndarray] = []
    parts_b: List[np.ndarray] = []
    parts_e: List[np.ndarray] = []
    parts_p: List[np.ndarray] = []
    for (ld, lb, le, lp), (rd, rb, re_, rp) in zip(matchers, matchers[1:]):
        # docs containing BOTH terms stay in the result even with no
        # adjacency (postings.rs:101-112): empty position lists score 0
        pair_docs = np.intersect1d(np.unique(ld), np.unique(rd))
        member = pair_docs if member is None else np.intersect1d(
            member, pair_docs
        )
        # adjacency on (doc, pos + 1) via compact int64 keys
        udocs = np.union1d(np.unique(ld), np.unique(rd))
        lkey = np.searchsorted(udocs, ld) * _POS_SHIFT + lp
        rkey = np.searchsorted(udocs, rd) * _POS_SHIFT + rp
        lhit = np.isin(lkey + 1, rkey)
        rhit = np.isin(rkey - 1, lkey)
        parts_d += [ld[lhit], rd[rhit]]
        parts_b += [lb[lhit], rb[rhit]]
        parts_e += [le[lhit], re_[rhit]]
        parts_p += [lp[lhit], rp[rhit]]
    if member is None or member.size == 0:
        return pd.DataFrame(
            {"doc_id": [], "score": []}
            | ({"positions": []} if with_positions else {})
        )
    d = np.concatenate(parts_d)
    keep = np.isin(d, member)
    rows = (
        d[keep],
        np.concatenate(parts_b)[keep],
        np.concatenate(parts_e)[keep],
        np.concatenate(parts_p)[keep],
    )
    return _score_rows(member, rows, docbytes, with_positions)


def _run_query(
    spark: SparkSession,
    index_path: str,
    terms: List[str],
    kind: str,
    k: Optional[int],
    with_positions: bool,
) -> DataFrame:
    schema = RESULT_POS_SCHEMA if with_positions else RESULT_SCHEMA
    manifest = load_manifest(index_path)
    if not bool(manifest.get("positional", False)):
        raise ValueError(
            "segments were built without positions; rebuild with "
            "build_segments(..., positions=True)"
        )
    ranges = _term_ranges(index_path, terms)
    if not ranges or (kind == "phrase" and len(ranges) < 2):
        return spark.createDataFrame([], schema)
    shards = _shards_for_ranges(spark, index_path, manifest, ranges)
    seg_dir = os.path.join(index_path, "segments")
    files = [os.path.join(seg_dir, s["file"]) for s in shards]
    if not files:
        return spark.createDataFrame([], schema)
    shards_df = spark.createDataFrame([(f,) for f in files], "file string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["file"]:
                matchers, docbytes = _read_shard(f, ranges)
                if kind == "phrase":
                    yield _eval_phrase(matchers, docbytes, with_positions)
                else:
                    yield _eval_match(matchers, docbytes, with_positions)

    res = shards_df.mapInPandas(run, schema=schema).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return res.limit(k) if k is not None else res


def segment_search(
    spark: SparkSession,
    index_path: str,
    text: str,
    k: Optional[int] = None,
    with_positions: bool = False,
) -> DataFrame:
    """Reference ``search`` (Match + parity score, index.rs:72-74)
    served entirely from positional segments."""
    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    return _run_query(spark, index_path, terms, "match", k, with_positions)


def segment_phrase(
    spark: SparkSession,
    index_path: str,
    text: str,
    k: Optional[int] = None,
    with_positions: bool = True,
) -> DataFrame:
    """Reference ``Phrase`` (pairwise positional intersection,
    postings.rs:66-112) served entirely from positional segments —
    rank- and position-identical to FtsEngine.results(Phrase(text))."""
    terms = [t.term for t in analyze_query(text)]
    return _run_query(spark, index_path, terms, "phrase", k, with_positions)


def segment_highlight(
    results: DataFrame,
    docs: DataFrame,
    before: str,
    after: str,
) -> DataFrame:
    """Attach highlighted content to segment-served results
    (search_result.rs:54-66): join the doc store and wrap each
    position's byte range. ``results`` must carry positions
    (``with_positions=True``); ``docs`` is the (doc_id, text) corpus
    table the index references."""
    from .udfs import byte_slice_highlight

    return (
        results.join(docs.select("doc_id", "text"), "doc_id")
        .withColumn(
            "highlighted",
            byte_slice_highlight(
                F.col("text"),
                F.col("positions"),
                F.lit(before),
                F.lit(after),
            ),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
