"""Positional segment-served queries: the FULL reference query algebra.

Serves every variant of the reference's ``Query`` enum — Match, And,
Or, Phrase, Prefix (/root/reference/src/query.rs:5-27, interpreted at
src/index.rs:131-146) — from the compressed segment layout (segments.py
with ``positions=True``) instead of the raw postings parquet, so the
uncompressed postings table is not needed at query time at all.

Distributed plan — same shape as WAND (wand.py): prune shards with the
exact term->shard map (read driver-side, metacache.py — compound nodes
prune structurally: And intersects child shard sets, Or unions), one
task per surviving shard file (mapInPandas), each shard evaluated with
a fully vectorized numpy kernel (decode -> recursive AST evaluation ->
neighbor-only coalesce -> parity score). Doc-range sharding makes every
operator doc-local (a doc's postings for every term live in its own
shard), so per-shard evaluation of the whole tree is exact and the
driver just merges.

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
import threading
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import analyze_query
from .codecs import decode_doc_ids, decode_pos_block, varint_decode
from .oracle import prefix_upper_bound
from .qast import (
    And,
    AndNot,
    AtLeast,
    Fuzzy,
    Match,
    Near,
    Or,
    Phonetic,
    Phrase,
    Prefix,
    Query,
    Regex,
    Wildcard,
)
from .segments import DOCSTATS_TERM, load_manifest

RESULT_SCHEMA = "doc_id long, score float"
RESULT_POS_SCHEMA = (
    "doc_id long, score float, "
    "positions array<struct<begin:int,end:int,pos:int>>"
)

_POS_SHIFT = np.int64(1) << np.int64(32)  # (doc_idx, pos) -> one int64 key

# planning guard: a Wildcard expands to one exact-term range per matched
# dictionary term; past this many the per-range planning metadata
# (stats, shard sets) costs more than the query — callers fall back to
# the relational anchored-rlike plan, which is a single scan
MAX_WILDCARD_EXPANSIONS = int(
    os.environ.get("SPARK_GRAFT_MAX_WILDCARD_EXPANSIONS", "4096")
)


class WildcardTooBroad(ValueError):
    """A dictionary-expansion node (Wildcard/Regex) matched more terms
    than the segment planner will expand (MAX_WILDCARD_EXPANSIONS).
    FtsEngine catches this and serves the query from the relational
    plan instead (a single anchored-rlike scan)."""


def _index_ngrams(index_path: str) -> bool:
    meta_path = os.path.join(index_path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            return bool(json.load(fh).get("ngrams", False))
    return False


def _term_range(term: str, ngrams: bool) -> Tuple[str, Optional[str]]:
    """(lo, hi) index-term range for one analyzed query term.

    Full-token index: prefix-expansion range [t, succ(t)) — equivalent
    to the parity index's stored edge-ngrams (query.py:113). Parity
    (ngram) index: degenerate exact range [t, t + chr(0))."""
    if ngrams:
        return (term, term + "\x00")
    return (term, prefix_upper_bound(term))


def _term_ranges(index_path: str, terms: List[str]) -> List[Tuple[str, Optional[str]]]:
    ngrams = _index_ngrams(index_path)
    return [_term_range(t, ngrams) for t in terms]


def _shards_for_ranges(
    spark: SparkSession, index_path: str, manifest: dict, ranges
) -> List[dict]:
    """Manifest shard rows matching ANY of the term ranges (driver-side
    metacache read — no Spark job; cf. wand.shards_for_terms)."""
    from . import metacache

    if not ranges:
        return manifest["shards"]
    sets = metacache.shard_sets_for_ranges(index_path, list(ranges))
    if sets is None or any(s is None for s in sets):
        return manifest["shards"]
    hit = set().union(*sets)
    return [s for s in manifest["shards"] if s["shard_id"] in hit]


# ----------------------------------------------------------------------
# Query AST -> compiled per-shard evaluation tree
#
# A compiled node is a tuple: ("empty",) | ("match", [range_idx, ...])
# | ("prefix", [range_idx]) | ("phrase", [range_idx per term, in order])
# | ("and", [child, ...]) | ("or", [child, ...]). Leaves index into one
# flat ranges list so each shard file is opened and decoded exactly once
# for the whole tree.


def _compile_node(
    q: Query, ngrams: bool, ranges: list, index_path: Optional[str] = None
) -> tuple:
    if isinstance(q, Match):
        terms: List[str] = []
        for tok in analyze_query(q.text):
            if tok.term not in terms:  # query-token dedup (index.rs:81)
                terms.append(tok.term)
        if not terms:
            return ("empty",)
        idxs = []
        for t in terms:
            idxs.append(len(ranges))
            ranges.append(_term_range(t, ngrams))
        return ("match", idxs)
    if isinstance(q, Prefix):
        # raw, un-analyzed dictionary range scan (query.rs:23-25);
        # empty prefix -> empty result (index.rs:110-112)
        if not q.text:
            return ("empty",)
        idx = len(ranges)
        ranges.append((q.text, prefix_upper_bound(q.text)))
        return ("prefix", [idx])
    if isinstance(q, Phrase):
        terms = [t.term for t in analyze_query(q.text)]
        if len(terms) < 2:  # 1-term phrase -> empty (index.rs:94-106)
            return ("empty",)
        idxs = []
        for t in terms:  # NO dedup: adjacency needs every ordinal slot
            idxs.append(len(ranges))
            ranges.append(_term_range(t, ngrams))
        return ("phrase", idxs)
    if isinstance(q, Wildcard):
        # raw dictionary wildcard: driver-side expansion against the
        # termdict (prefix-banded read, metacache.wildcard_terms) ->
        # exact-term ranges, identical semantics to the relational
        # anchored-rlike plan (dialect-stable translated subset)
        if not q.pattern:
            return ("empty",)
        if index_path is None:
            raise ValueError("Wildcard needs a saved index (term dictionary)")
        from . import metacache

        expanded = metacache.wildcard_terms(index_path, q.pattern)
        if not expanded:
            return ("empty",)
        if len(expanded) > MAX_WILDCARD_EXPANSIONS:
            raise WildcardTooBroad(
                f"Wildcard {q.pattern!r} matches {len(expanded)} dictionary "
                f"terms (> {MAX_WILDCARD_EXPANSIONS}); the segment planner "
                "won't expand it — use the relational plan (FtsEngine falls "
                "back automatically) or narrow the pattern"
            )
        idxs = []
        for t in expanded:
            idxs.append(len(ranges))
            ranges.append((t, t + "\x00"))
        return ("match", idxs)
    if isinstance(q, Regex):
        # raw dictionary regex: driver-side expansion against the
        # termdict (literal-prefix-banded read, metacache.regex_terms)
        # -> exact-term ranges; the dialect-stable validated subset
        # (qast.regex_parse) makes this identical to the relational
        # anchored-rlike plan
        if not q.pattern:
            return ("empty",)
        if index_path is None:
            raise ValueError("Regex needs a saved index (term dictionary)")
        from . import metacache

        expanded = metacache.regex_terms(index_path, q.pattern)
        if not expanded:
            return ("empty",)
        if len(expanded) > MAX_WILDCARD_EXPANSIONS:
            raise WildcardTooBroad(
                f"Regex {q.pattern!r} matches {len(expanded)} dictionary "
                f"terms (> {MAX_WILDCARD_EXPANSIONS}); the segment planner "
                "won't expand it — use the relational plan (FtsEngine falls "
                "back automatically) or narrow the pattern"
            )
        idxs = []
        for t in expanded:
            idxs.append(len(ranges))
            ranges.append((t, t + "\x00"))
        return ("match", idxs)
    if isinstance(q, Near):
        if q.slop < 1:
            raise ValueError(f"Near slop must be >= 1, got {q.slop}")
        terms = [t.term for t in analyze_query(q.text)]
        if len(terms) < 2:  # mirrors Phrase: <2 analyzed terms -> empty
            return ("empty",)
        idxs = []
        for t in terms:  # NO dedup: proximity needs every ordinal slot
            idxs.append(len(ranges))
            ranges.append(_term_range(t, ngrams))
        return ("near", idxs, int(q.slop))
    if isinstance(q, Fuzzy):
        if ngrams:
            raise ValueError(
                "Fuzzy requires a full-token index: an edge-ngram term "
                "dictionary stores prefixes, where edit distance over "
                "entries is meaningless (build with ngrams=False)"
            )
        terms = [t.term for t in analyze_query(q.text)]
        if len(terms) != 1:
            raise ValueError(
                f"Fuzzy wants exactly one analyzed term, got {terms!r}"
            )
        if index_path is None:
            raise ValueError("Fuzzy needs a saved index (term dictionary)")
        from . import metacache

        expanded = metacache.fuzzy_terms(
            index_path, terms[0], q.max_edits, q.max_expansions
        )
        if not expanded:
            return ("empty",)
        idxs = []
        for t in expanded:
            idxs.append(len(ranges))
            # EXACT token range [t, t + chr(0)) — fuzzy expansion terms
            # are full dictionary tokens, never prefix-expanded
            ranges.append((t, t + "\x00"))
        return ("match", idxs)
    if isinstance(q, Phonetic):
        if ngrams:
            raise ValueError(
                "Phonetic requires a full-token index: an edge-ngram "
                "term dictionary stores prefixes, where soundex over "
                "entries is meaningless (build with ngrams=False)"
            )
        terms = [t.term for t in analyze_query(q.text)]
        if len(terms) != 1:
            raise ValueError(
                f"Phonetic wants exactly one analyzed term, got {terms!r}"
            )
        if index_path is None:
            raise ValueError("Phonetic needs a saved index (term dictionary)")
        from . import metacache

        expanded = metacache.phonetic_terms(
            index_path, terms[0], q.max_expansions
        )
        if not expanded:
            return ("empty",)
        idxs = []
        for t in expanded:
            idxs.append(len(ranges))
            # EXACT token range — expansion terms are full dictionary
            # tokens, never prefix-expanded (same as Fuzzy)
            ranges.append((t, t + "\x00"))
        return ("match", idxs)
    if isinstance(q, And):
        children = [_compile_node(c, ngrams, ranges, index_path) for c in q.children]
        if not children:
            return ("empty",)  # And([]) -> empty (postings.rs:33-34)
        if len(children) == 1:
            return children[0]
        return ("and", children)
    if isinstance(q, Or):
        children = [_compile_node(c, ngrams, ranges, index_path) for c in q.children]
        if not children:
            return ("empty",)
        if len(children) == 1:
            return children[0]
        return ("or", children)
    if isinstance(q, AndNot):
        # compile the positive FIRST and bail before touching the
        # negative: a dead positive must not register the negative's
        # (possibly hot) term ranges in the shared list — every opened
        # shard would decode them and the cost estimate would count them
        pos = _compile_node(q.positive, ngrams, ranges, index_path)
        if pos == ("empty",):
            return ("empty",)
        neg = _compile_node(q.negative, ngrams, ranges, index_path)
        if neg == ("empty",):
            return pos
        return ("not", pos, neg)
    if isinstance(q, AtLeast):
        # an empty child can never contribute a vote, so it drops out
        # with m unchanged; the ends collapse to the or/and kernels.
        # (A child compiled before the node proves empty has already
        # registered its ranges — acceptable: that only happens when
        # the node itself is dead, i.e. usually the whole query.)
        children = [
            _compile_node(c, ngrams, ranges, index_path) for c in q.children
        ]
        children = [c for c in children if c != ("empty",)]
        if q.m > len(children):
            return ("empty",)
        if len(children) == 1:
            return children[0]
        if q.m == 1:
            return ("or", children)
        if q.m == len(children):
            return ("and", children)
        return ("atleast", int(q.m), children)
    raise TypeError(f"unknown query node: {q!r}")


def _node_shards(node: tuple, sets) -> Optional[set]:
    """Shard ids a node can possibly touch; None = no constraint.

    And/Phrase members need every term present in the doc's shard ->
    intersection; Match/Or -> union. ``sets[i]`` is range i's shard set
    from metacache (None when the range was too broad to enumerate)."""
    kind = node[0]
    if kind == "empty":
        return set()
    if kind in ("match", "prefix"):
        out: set = set()
        for i in node[1]:
            s = sets[i]
            if s is None:
                return None
            out |= s
        return out
    if kind in ("phrase", "near"):
        inter: Optional[set] = None
        for i in node[1]:
            s = sets[i]
            if s is None:
                continue
            inter = set(s) if inter is None else (inter & s)
        return inter
    if kind == "and":
        inter = None
        for c in node[1]:
            s = _node_shards(c, sets)
            if s is None:
                continue
            inter = set(s) if inter is None else (inter & s)
        return inter
    if kind == "not":
        # doc-sliced layout: every posting of a doc lives in exactly one
        # shard, so the negative's postings for the positive's docs are
        # IN the positive's shards — the negative never widens the scan
        return _node_shards(node[1], sets)
    if kind == "atleast":
        # every posting of a doc lives in ONE shard, so a qualifying
        # doc's shard must appear in >= m children's shard sets: count
        # shard votes (an unconstrained child votes for every shard)
        m = node[1]
        child_sets = [_node_shards(c, sets) for c in node[2]]
        wild = sum(1 for s in child_sets if s is None)
        if wild >= m:
            return None
        votes: dict = {}
        for s in child_sets:
            if s is None:
                continue
            for sh in s:
                votes[sh] = votes.get(sh, 0) + 1
        return {sh for sh, v in votes.items() if v + wild >= m}
    # or
    out = set()
    for c in node[1]:
        s = _node_shards(c, sets)
        if s is None:
            return None
        out |= s
    return out


def _read_shard(
    file_path: str, ranges, doc_range=None
) -> Tuple[list, Dict[int, int]]:
    """Decode one shard's rows for the given term ranges.

    Returns (matchers, docbytes): ``matchers[i]`` is the flat
    (docs, begins, ends, poss) arrays of every posting matching range i;
    ``docbytes`` maps doc_id -> doclen_bytes (from the term='' rows).
    ``doc_range=(lo, hi)`` drops rows of docs outside [lo, hi) — the
    in-kernel half of time-scoped search (whole-shard pruning happens
    in the planner).
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
    # a term repeats across every block row of the shard; resolve its
    # matching ranges ONCE (batch queries carry 100+ ranges — the per-row
    # string-compare loop was O(rows x ranges))
    term_ranges: Dict[str, List[int]] = {}
    for i, t in enumerate(tcol):
        n = int(ncol[i])
        ids = decode_doc_ids(ids_col[i], n)
        if t == DOCSTATS_TERM:
            dbs = varint_decode(pc_col[i], n).astype(np.int64)
            docbytes.update(zip(ids.tolist(), dbs.tolist()))
            continue
        hits = term_ranges.get(t)
        if hits is None:
            hits = [
                mi
                for mi, (lo, hi) in enumerate(ranges)
                if t >= lo and (hi is None or t < hi)
            ]
            term_ranges[t] = hits
        counts = varint_decode(pc_col[i], n).astype(np.int64)
        b, e, p = decode_pos_block(pos_col[i], counts)
        drep = np.repeat(ids, counts)
        if doc_range is not None:
            keep = (drep >= doc_range[0]) & (drep < doc_range[1])
            if not keep.all():
                drep, b, e, p = drep[keep], b[keep], e[keep], p[keep]
        for mi in hits:
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
    k: Optional[int] = None,
) -> pd.DataFrame:
    """Parity score (float32 sum(width)/sqrt(bytes)) for every member
    doc; docs with no surviving rows score 0 with empty positions.

    With ``k`` set, only the shard-local top-k (score desc, doc_id asc)
    is emitted and positions are materialized ONLY for those k docs —
    the global top-k is a subset of the per-shard top-ks (shards
    partition the doc space), so the driver-side merge stays exact
    while a broad query ships k rows per shard instead of every
    matching doc's position arrays.
    """
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
    if k is not None and member_docs.size > k:
        # (score desc, doc_id asc): member_docs is sorted asc, and
        # np.argsort(kind="stable") keeps that order within equal keys
        top = np.argsort(-scores, kind="stable")[:k]
        member_docs, scores = member_docs[top], scores[top]
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


_Z = np.empty(0, np.int64)
_EMPTY_ROWS = (_Z, _Z, _Z, _Z)


def _concat_rows(parts):
    """Concatenate a list of (d, b, e, p) tuples."""
    if not parts:
        return _EMPTY_ROWS
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(4))


def _phrase_member_rows(matchers) -> Tuple[np.ndarray, tuple]:
    """(member docs, adjacency rows) for a phrase's ordered matchers."""
    member: Optional[np.ndarray] = None
    parts: List[tuple] = []
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
        parts.append((ld[lhit], lb[lhit], le[lhit], lp[lhit]))
        parts.append((rd[rhit], rb[rhit], re_[rhit], rp[rhit]))
    if member is None or member.size == 0:
        return _Z, _EMPTY_ROWS
    d, b, e, p = _concat_rows(parts)
    keep = np.isin(d, member)
    return member, (d[keep], b[keep], e[keep], p[keep])


def _near_member_rows(matchers, slop: int) -> Tuple[np.ndarray, tuple]:
    """(member docs, rows) for a Near node: per consecutive pair keep
    (l, r) with 1 <= r.pos - l.pos <= slop; members are docs with >= 1
    hit for EVERY pair (no zero-hit membership, unlike Phrase). The
    windowed check reuses the phrase kernel's compact int64 keys with
    sorted-window probes: an l-row hits iff any r key lies in
    (lkey, lkey + slop] — two searchsorted calls per side, so the cost
    is O(n log n) INDEPENDENT of slop (a per-offset isin loop would let
    a huge user-supplied slop burn CPU). The probe window is clamped to
    2^31: positions are int32 so no in-doc delta can exceed it (the
    clamp loses nothing), and pos + 2^31 < 2^32 (= _POS_SHIFT) keeps a
    probe from ever crossing into the next doc's key space.
    """
    member: Optional[np.ndarray] = None
    parts: List[tuple] = []
    for (ld, lb, le, lp), (rd, rb, re_, rp) in zip(matchers, matchers[1:]):
        udocs = np.union1d(np.unique(ld), np.unique(rd))
        lkey = np.searchsorted(udocs, ld) * _POS_SHIFT + lp
        rkey = np.searchsorted(udocs, rd) * _POS_SHIFT + rp
        win = np.int64(min(int(slop), 1 << 31))
        rsorted = np.sort(rkey)
        lo = np.searchsorted(rsorted, lkey + 1, side="left")
        hi = np.searchsorted(rsorted, lkey + win, side="right")
        lhit = lo < hi
        lsorted = np.sort(lkey)
        lo2 = np.searchsorted(lsorted, rkey - win, side="left")
        hi2 = np.searchsorted(lsorted, rkey - 1, side="right")
        rhit = lo2 < hi2
        pair_docs = np.union1d(np.unique(ld[lhit]), np.unique(rd[rhit]))
        member = pair_docs if member is None else np.intersect1d(
            member, pair_docs
        )
        if member.size == 0:
            return _Z, _EMPTY_ROWS
        parts.append((ld[lhit], lb[lhit], le[lhit], lp[lhit]))
        parts.append((rd[rhit], rb[rhit], re_[rhit], rp[rhit]))
    if member is None or member.size == 0:
        return _Z, _EMPTY_ROWS
    d, b, e, p = _concat_rows(parts)
    keep = np.isin(d, member)
    return member, (d[keep], b[keep], e[keep], p[keep])


def _eval_node(node: tuple, matchers) -> Tuple[np.ndarray, tuple]:
    """Evaluate a compiled tree on one shard -> (member docs, rows).

    Mirrors the engine's combinators (query.py): And = member
    intersection with rows = union of child rows over surviving docs
    (positions of BOTH branches, index.rs:134-137 + postings.rs:38-44);
    Or = member union + row union (MergeCoalesceMap, coalesce.rs:78-120);
    duplicates merge away downstream in _coalesced."""
    kind = node[0]
    if kind == "empty":
        return _Z, _EMPTY_ROWS
    if kind in ("match", "prefix"):
        rows = _concat_rows([matchers[i] for i in node[1]])
        return np.unique(rows[0]), rows
    if kind == "phrase":
        return _phrase_member_rows([matchers[i] for i in node[1]])
    if kind == "near":
        return _near_member_rows([matchers[i] for i in node[1]], node[2])
    if kind == "not":
        member, (d, b, e, p) = _eval_node(node[1], matchers)
        neg_member, _ = _eval_node(node[2], matchers)
        member = np.setdiff1d(member, neg_member)
        keep = np.isin(d, member)
        return member, (d[keep], b[keep], e[keep], p[keep])
    if kind == "atleast":
        # child member arrays are unique per child -> concat + unique
        # with counts = number of children voting for each doc
        votes = [_eval_node(c, matchers) for c in node[2]]
        alld = np.concatenate([v[0] for v in votes])
        uniq, counts = np.unique(alld, return_counts=True)
        member = uniq[counts >= node[1]]
        d, b, e, p = _concat_rows([r for _, r in votes])
        keep = np.isin(d, member)
        return member, (d[keep], b[keep], e[keep], p[keep])
    children = [_eval_node(c, matchers) for c in node[1]]
    if kind == "and":
        member = children[0][0]
        for m, _ in children[1:]:
            member = np.intersect1d(member, m)
        d, b, e, p = _concat_rows([r for _, r in children])
        keep = np.isin(d, member)
        return member, (d[keep], b[keep], e[keep], p[keep])
    # or
    member = children[0][0]
    for m, _ in children[1:]:
        member = np.union1d(member, m)
    return member, _concat_rows([r for _, r in children])


def _render_node(node: tuple, ranges: list) -> str:
    kind = node[0]
    if kind == "empty":
        return "Empty"
    if kind in ("match", "prefix", "phrase"):
        spans = ",".join(ranges[i][0] for i in node[1])
        return f"{kind.capitalize()}[{spans}]"
    if kind == "near":
        spans = ",".join(ranges[i][0] for i in node[1])
        return f"Near[{spans};slop={node[2]}]"
    if kind == "not":
        return (
            f"AndNot({_render_node(node[1], ranges)}, "
            f"{_render_node(node[2], ranges)})"
        )
    if kind == "atleast":
        inner = ", ".join(_render_node(c, ranges) for c in node[2])
        return f"AtLeast[m={node[1]}]({inner})"
    inner = ", ".join(_render_node(c, ranges) for c in node[1])
    return f"{'And' if kind == 'and' else 'Or'}({inner})"


def explain_segment_query(index_path: str, query: Query) -> dict:
    """Driver-side plan preview for ``segment_query`` — zero Spark jobs.

    Runs exactly the compile + metacache pruning ``segment_query``
    performs and returns what the evaluator WOULD do: the analyzed term
    range behind every leaf (with its df_full and term->shard fan-out),
    the rendered evaluation tree, and the final pruned shard list.
    Answers the capacity question "is this query O(df) file opens or a
    full corpus-width scan?" before anything executes.

    Keys: ``empty``, ``positional``, ``ngrams``, ``tree`` (rendered),
    ``ranges`` (list of {lo, hi, df_full, shards: int|"all"}),
    ``shards_total``, ``shards_open``, ``files``, ``serving``
    ("local" when mode=auto would evaluate the pruned set in-process,
    else "spark"), ``pruned_enc_bytes``.
    """
    manifest = load_manifest(index_path)
    ngrams = _index_ngrams(index_path)
    out = {
        "positional": bool(manifest.get("positional", False)),
        "ngrams": ngrams,
        "shards_total": len(manifest.get("shards", [])),
    }
    ranges: list = []
    tree = _compile_node(query, ngrams, ranges, index_path)
    if tree == ("empty",) or not ranges:
        out.update(
            empty=True, tree="Empty", ranges=[], shards_open=0, files=[]
        )
        return out

    from . import metacache

    stats = metacache.range_stats_for_ranges(index_path, ranges)
    est = metacache.estimate_read_bytes(stats, with_positions=True)
    # memo hit: same snapshot+ranges key the stats call just populated
    sets = metacache.shard_sets_for_ranges(index_path, ranges)
    dfs = metacache.term_dfs(index_path, [lo for lo, _ in ranges])
    rinfo = []
    for i, (lo, hi) in enumerate(ranges):
        s = None if sets is None else sets[i]
        st = None if stats is None else stats[i]
        rinfo.append(
            {
                "lo": lo,
                "hi": hi,
                "df_full": int(dfs.get(lo, 0)),
                "shards": "all" if s is None else len(s),
                "n_postings": None if st is None else st["n_postings"],
                "n_positions": None if st is None else st["n_positions"],
            }
        )
    want = None if sets is None else _node_shards(tree, sets)
    shards = (
        manifest["shards"]
        if want is None
        else [s for s in manifest["shards"] if s["shard_id"] in want]
    )
    out.update(
        empty=False,
        tree=_render_node(tree, ranges),
        ranges=rinfo,
        shards_open=len(shards),
        files=[s["file"] for s in shards],
        serving="local"
        if metacache.serve_locally(shards, "auto", est_bytes=est)
        else "spark",
        pruned_enc_bytes=sum(int(s.get("enc_bytes") or 0) for s in shards),
        est_read_bytes=est,
    )
    return out


def _rows_for_spark(pdf: pd.DataFrame) -> list:
    """pandas result -> plain tuples createDataFrame verifies cleanly
    (positions dicts -> struct tuples, numpy scalars -> python)."""
    cols = list(pdf.columns)
    out = []
    for t in pdf.itertuples(index=False):
        row = []
        for c, v in zip(cols, t):
            if c == "positions":
                v = [
                    (int(d["begin"]), int(d["end"]), int(d["pos"]))
                    for d in v
                ]
            elif c == "score":
                v = float(v)
            else:
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return out


# trampoline for the fork-based pool in _map_files: the closure is
# published here immediately before fork, so children inherit it (and
# everything it captures) through copy-on-write memory instead of
# pickling; only this module-level shim crosses the pickle boundary.
_FORK_FN = None
_FORK_LOCK = threading.Lock()


def _fork_call(arg):
    return _FORK_FN(arg)


def _map_files(fn, files: list) -> list:
    """Run ``fn`` over shard files in parallel; drops None results.

    The varint/delta decode kernels hold the GIL for real stretches, so
    a thread pool caps out near one core no matter its width (measured:
    8/16/32 threads all ~5-7 s on a 79-shard dense-term serve). A
    fork-based process pool runs the same serve in ~0.3 s — each child
    decodes its shard slice with a whole core. Processes are used when
    the shard fan-out is big enough to matter
    (> SPARK_GRAFT_SERVE_PROC_MIN files, default 8) and fork is
    available; SPARK_GRAFT_SERVE_PROCS=0 disables them (this also
    drops metacache.serve_locally back to its thread-tier thresholds),
    and any pool failure falls back to the thread path.
    Driver/coordinator-side only — the distributed path is
    mapInPandas, not this.

    Concurrency/caveats: _FORK_LOCK serializes pool runs, so
    concurrent coordinator serves queue behind each other — deliberate:
    forking while another serve's threads hold pyarrow/allocator locks
    is the classic fork-with-threads hazard, and serializing the fork
    window is the cheap way to keep our own threads quiescent at fork
    time. A process that runs other lock-holding threads (e.g. heavy
    JVM callback traffic) should set SPARK_GRAFT_SERVE_PROCS=0."""
    if len(files) <= 1:
        parts = [fn(f) for f in files]
    else:
        parts = None
        proc_min = int(os.environ.get("SPARK_GRAFT_SERVE_PROC_MIN", "8"))
        procs = os.environ.get("SPARK_GRAFT_SERVE_PROCS", "16")
        if procs != "0" and len(files) > proc_min:
            try:
                import multiprocessing
                from concurrent.futures import ProcessPoolExecutor

                ctx = multiprocessing.get_context("fork")
                width = min(max(int(procs), 1), len(files))
                chunk = max(1, len(files) // (width * 2))
                global _FORK_FN
                with _FORK_LOCK:
                    _FORK_FN = fn
                    try:
                        with ProcessPoolExecutor(
                            width, mp_context=ctx
                        ) as ex:
                            parts = list(
                                ex.map(_fork_call, files, chunksize=chunk)
                            )
                    finally:
                        _FORK_FN = None
            except Exception:
                parts = None  # fork unavailable/failed: thread fallback
        if parts is None:
            from concurrent.futures import ThreadPoolExecutor

            width = int(os.environ.get("SPARK_GRAFT_SERVE_THREADS", "8"))
            with ThreadPoolExecutor(min(max(width, 1), len(files))) as ex:
                parts = list(ex.map(fn, files))
    return [p for p in parts if p is not None and len(p)]


def _plan_query(index_path: str, query: Query, doc_range=None):
    """Compile + prune: (ranges, tree, surviving manifest shard rows,
    est_read_bytes).

    Pure driver-side planning — manifest and metacache reads only, no
    Spark. An empty/unsatisfiable query returns ([], tree, [], None).
    ``est_read_bytes`` bounds the pruned read volume from the map's
    per-(term, shard) statistics (None when unavailable) — the input to
    the local-vs-distributed serving decision. ``doc_range`` further
    prunes to shards intersecting [lo, hi) — shards ARE doc ranges."""
    manifest = load_manifest(index_path)
    if not bool(manifest.get("positional", False)):
        raise ValueError(
            "segments were built without positions; rebuild with "
            "build_segments(..., positions=True)"
        )
    ranges: list = []
    tree = _compile_node(query, _index_ngrams(index_path), ranges, index_path)
    if tree == ("empty",) or not ranges:
        return [], tree, [], None

    from . import metacache

    stats = metacache.range_stats_for_ranges(index_path, ranges)
    est = metacache.estimate_read_bytes(stats, with_positions=True)
    # memo hit: same snapshot+ranges key the stats call just populated
    sets = metacache.shard_sets_for_ranges(index_path, ranges)
    if sets is None:
        shards = manifest["shards"]
    else:
        want = _node_shards(tree, sets)
        shards = (
            manifest["shards"]
            if want is None
            else [s for s in manifest["shards"] if s["shard_id"] in want]
        )
    if doc_range is not None:
        from .segments import shards_in_range

        pruned = shards_in_range(shards, manifest["shard_docs"], doc_range)
        if len(pruned) < len(shards):
            # per-term cost estimate is stale after range pruning —
            # fall back to the surviving shards' enc_bytes
            est = None
        shards = pruned
    return ranges, tree, shards, est


def _empty_pdf(with_positions: bool) -> pd.DataFrame:
    cols = {"doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float32")}
    if with_positions:
        cols["positions"] = pd.Series([], dtype=object)
    return pd.DataFrame(cols)


def _local_eval_one(
    index_path: str,
    ranges: list,
    tree: tuple,
    shards: List[dict],
    with_positions: bool,
    k: Optional[int],
    doc_range=None,
) -> pd.DataFrame:
    """Evaluate one compiled tree over the pruned shard files in this
    process — identical kernels to the mapInPandas tasks, merged the
    same way ((score desc, doc_id asc), head(k))."""
    seg_dir = os.path.join(index_path, "segments")
    files = [os.path.join(seg_dir, s["file"]) for s in shards]

    def one(f):
        matchers, docbytes = _read_shard(f, ranges, doc_range)
        member, rows = _eval_node(tree, matchers)
        if member.size == 0:
            return None
        return _score_rows(member, rows, docbytes, with_positions, k)

    parts = _map_files(one, files)
    if not parts:
        return _empty_pdf(with_positions)
    pdf = pd.concat(parts, ignore_index=True)
    pdf = pdf.sort_values(
        ["score", "doc_id"],
        ascending=[False, True],
        kind="mergesort",
        ignore_index=True,
    )
    if k is not None:
        pdf = pdf.head(k).reset_index(drop=True)
    return pdf


def segment_query_pandas(
    index_path: str,
    query: Query,
    k: Optional[int] = None,
    with_positions: bool = True,
    doc_range=None,
) -> pd.DataFrame:
    """QUERY-NODE serving: evaluate a Query AST straight from the
    segment files in this process — no SparkSession, no JVM, no job.

    Row-identical to ``segment_query(...).toPandas()`` (same kernels,
    same merge). This is the low-latency half of a deployment: a
    coordinator with the manifest + metacache serves rare-term top-k in
    milliseconds by opening the O(df) pruned shard files directly
    (local disk here, object-store ranged reads in production), while
    broad scans go through Spark. The reference serves queries from
    process memory (/root/reference/src/index.rs:72-74); this is the
    same shape with the index out-of-process and compressed.
    """
    from . import metacache

    # cache only bounded answers: k=None frames are corpus-sized and
    # would blow the entry-count-bounded LRU's memory; skip snapshot
    # fingerprinting when the cache is disabled (the kill switch must
    # be zero-cost)
    snap = (
        metacache.request_snapshot(index_path)
        if k is not None and metacache._req_cache_max() > 0
        else None
    )
    key = None
    if snap is not None:
        # frozen-dataclass repr fully describes the AST; the manifest
        # fingerprint in `snap` expires the entry when a new manifest
        # COMMITS (refresh/rebuild/compact) — mutations alone leave the
        # manifest, and the cache, on the last complete snapshot
        dr = tuple(doc_range) if doc_range is not None else None
        key = (snap, "segq", repr(query), k, with_positions, dr)
        hit = metacache.request_cache_get(key)
        if hit is not None:
            return hit
    ranges, tree, shards, _ = _plan_query(index_path, query, doc_range)
    if not shards:
        return _empty_pdf(with_positions)
    out = _local_eval_one(index_path, ranges, tree, shards,
                          with_positions, k, doc_range)
    if key is not None:
        metacache.request_cache_put(key, out)
    return out


def segment_query(
    spark: SparkSession,
    index_path: str,
    query: Query,
    k: Optional[int] = None,
    with_positions: bool = True,
    mode: str = "auto",
    doc_range=None,
) -> DataFrame:
    """Execute ANY reference Query AST from positional segments.

    Rank-, score- and position-identical to
    ``FtsEngine.results(query)`` (asserted in tests), without touching
    the uncompressed postings table: compile the AST to a flat range
    list + evaluation tree, prune shards structurally (And intersects
    child shard sets, Or unions — driver-side metacache lookup, no
    Spark job), then one mapInPandas task per surviving shard decodes
    its file once and evaluates the whole tree vectorized.

    ``mode="auto"`` short-circuits to COORDINATOR serving when pruning
    left a small shard set (metacache.serve_locally): the driver runs
    the identical kernels over the pruned files and returns a local
    relation — zero Spark jobs end to end, the query-node half of a
    search deployment. "spark"/"local" pin the path explicitly.
    """
    schema = RESULT_POS_SCHEMA if with_positions else RESULT_SCHEMA
    ranges, tree, shards, est = _plan_query(index_path, query, doc_range)
    if not shards:
        return spark.createDataFrame([], schema)

    from . import metacache

    if metacache.serve_locally(shards, mode, est_bytes=est):
        pdf = _local_eval_one(index_path, ranges, tree, shards,
                              with_positions, k, doc_range)
        return spark.createDataFrame(_rows_for_spark(pdf), schema)

    seg_dir = os.path.join(index_path, "segments")
    files = [os.path.join(seg_dir, s["file"]) for s in shards]
    shards_df = spark.createDataFrame([(f,) for f in files], "file string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["file"]:
                matchers, docbytes = _read_shard(f, ranges, doc_range)
                member, rows = _eval_node(tree, matchers)
                if member.size == 0:
                    continue
                yield _score_rows(member, rows, docbytes, with_positions, k)

    res = shards_df.mapInPandas(run, schema=schema).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return res.limit(k) if k is not None else res


def segment_query_batch(
    spark: SparkSession,
    index_path: str,
    queries: List[Query],
    k: int = 10,
    with_positions: bool = False,
    mode: str = "auto",
) -> DataFrame:
    """Evaluate MANY Query ASTs in ONE pass over the segments.

    Each shard file is opened and decoded once with the union of every
    query's term ranges, then every query assigned to that shard (its
    structural shard set contains it) is evaluated on the in-memory
    arrays — the read/decode cost is amortized across the batch, the
    same shape as wand.wand_topk_batch. Returns
    (query_id, doc_id, score[, positions], rank) with rank 1..k per
    query (parity score desc, doc_id asc); per-query results are
    identical to ``segment_query(..., k=k)``. The offline-relevance
    shape for the positional/parity score family.
    """
    schema = (
        "query_id int, " + (RESULT_POS_SCHEMA if with_positions else RESULT_SCHEMA)
    )
    out_schema = schema + ", rank int"
    ranges, trees, rows, used, est = _plan_batch(index_path, queries)
    if not rows:
        return spark.createDataFrame([], out_schema)

    from . import metacache

    if metacache.serve_locally(used, mode, est_bytes=est):
        pdf = _local_eval_batch(ranges, trees, rows, with_positions, k)
        return spark.createDataFrame(_rows_for_spark(pdf), out_schema)

    shards_df = spark.createDataFrame(rows, "file string, qids array<int>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f, qids in zip(pdf["file"], pdf["qids"]):
                matchers, docbytes = _read_shard(f, ranges)
                for qid in qids:
                    member, qrows = _eval_node(trees[qid], matchers)
                    if member.size == 0:
                        continue
                    res = _score_rows(
                        member, qrows, docbytes, with_positions, k
                    )
                    res.insert(0, "query_id", int(qid))
                    yield res

    from pyspark.sql import Window

    win = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        shards_df.mapInPandas(run, schema=schema)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _plan_batch(index_path: str, queries: List[Query]):
    """Compile + prune a query batch: (ranges, trees,
    [(file, [qid, ...]), ...], used manifest shard rows,
    est_read_bytes). Driver-side planning only — no Spark."""
    manifest = load_manifest(index_path)
    if not bool(manifest.get("positional", False)):
        raise ValueError(
            "segments were built without positions; rebuild with "
            "build_segments(..., positions=True)"
        )
    ngrams = _index_ngrams(index_path)
    ranges: list = []
    trees = [_compile_node(q, ngrams, ranges, index_path) for q in queries]
    live = [(i, t) for i, t in enumerate(trees) if t != ("empty",)]
    if not live or not ranges:
        return ranges, trees, [], [], None

    from . import metacache

    stats = metacache.range_stats_for_ranges(index_path, ranges)
    est = metacache.estimate_read_bytes(stats, with_positions=True)
    # memo hit: same snapshot+ranges key the stats call just populated
    sets = metacache.shard_sets_for_ranges(index_path, ranges)
    all_ids = [s["shard_id"] for s in manifest["shards"]]
    per_shard: Dict[int, List[int]] = {}
    for qid, tree in live:
        want = _node_shards(tree, sets) if sets is not None else None
        for sid in all_ids if want is None else want:
            per_shard.setdefault(sid, []).append(qid)
    seg_dir = os.path.join(index_path, "segments")
    by_id = {s["shard_id"]: s for s in manifest["shards"]}
    rows = [
        (os.path.join(seg_dir, by_id[sid]["file"]), qids)
        for sid, qids in sorted(per_shard.items())
        if sid in by_id
    ]
    used = [by_id[sid] for sid in sorted(per_shard) if sid in by_id]
    return ranges, trees, rows, used, est


def _local_eval_batch(
    ranges: list,
    trees: List[tuple],
    rows: list,
    with_positions: bool,
    k: int,
) -> pd.DataFrame:
    """In-process batch evaluation + per-query rank merge — identical
    results to the mapInPandas path's window rank."""

    def one(item):
        f, qids = item
        matchers, docbytes = _read_shard(f, ranges)
        frames = []
        for qid in qids:
            member, qrows = _eval_node(trees[qid], matchers)
            if member.size == 0:
                continue
            res = _score_rows(member, qrows, docbytes, with_positions, k)
            res.insert(0, "query_id", int(qid))
            frames.append(res)
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    parts = _map_files(one, rows)
    if not parts:
        pdf = _empty_pdf(with_positions)
        pdf.insert(0, "query_id", pd.Series([], dtype="int32"))
        pdf["rank"] = pd.Series([], dtype="int32")
        return pdf
    pdf = pd.concat(parts, ignore_index=True)
    pdf = pdf.sort_values(
        ["query_id", "score", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
        ignore_index=True,
    )
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pdf[pdf["rank"] <= k].reset_index(drop=True)


def segment_query_batch_pandas(
    index_path: str,
    queries: List[Query],
    k: int = 10,
    with_positions: bool = False,
) -> pd.DataFrame:
    """Query-node batch serving: many ASTs, one in-process pass over
    the pruned segment files, no SparkSession (cf.
    segment_query_pandas). Row-identical to
    ``segment_query_batch(...).toPandas()``."""
    ranges, trees, rows, _, _ = _plan_batch(index_path, queries)
    if not rows:
        pdf = _empty_pdf(with_positions)
        pdf.insert(0, "query_id", pd.Series([], dtype="int32"))
        pdf["rank"] = pd.Series([], dtype="int32")
        return pdf
    return _local_eval_batch(ranges, trees, rows, with_positions, k)


def segment_count(
    spark: SparkSession,
    index_path: str,
    query: Query,
    mode: str = "auto",
    doc_range=None,
) -> int:
    """Number of matching docs, served from compressed segments.

    Membership only — no score, no position materialization, no result
    frame: each pruned shard evaluates the compiled tree and reports
    ``member.size``; shards partition the doc space, so the total is
    the plain sum (equals ``FtsEngine.count(query)``, asserted in
    tests). ``mode="auto"`` counts driver-side when pruning left a
    small shard set (the common rare-term case: zero Spark jobs),
    otherwise one mapInPandas pass returning a single int per shard.
    """
    ranges, tree, shards, est = _plan_query(index_path, query, doc_range)
    if not shards:
        return 0

    from . import metacache

    seg_dir = os.path.join(index_path, "segments")
    files = [os.path.join(seg_dir, s["file"]) for s in shards]

    def one(f):
        matchers, _ = _read_shard(f, ranges, doc_range)
        member, _ = _eval_node(tree, matchers)
        return int(member.size)

    if metacache.serve_locally(shards, mode, est_bytes=est):
        if len(files) <= 1:
            return sum(one(f) for f in files)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(8, len(files))) as ex:
            return sum(ex.map(one, files))

    shards_df = spark.createDataFrame([(f,) for f in files], "file string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["file"]:
                yield pd.DataFrame({"n": [one(f)]})

    rows = shards_df.mapInPandas(run, schema="n long").agg(
        F.sum("n").alias("n")
    ).collect()
    return int(rows[0]["n"] or 0)


def segment_search(
    spark: SparkSession,
    index_path: str,
    text: str,
    k: Optional[int] = None,
    with_positions: bool = False,
    mode: str = "auto",
) -> DataFrame:
    """Reference ``search`` (Match + parity score, index.rs:72-74)
    served entirely from positional segments."""
    return segment_query(
        spark, index_path, Match(text), k=k,
        with_positions=with_positions, mode=mode,
    )


def segment_phrase(
    spark: SparkSession,
    index_path: str,
    text: str,
    k: Optional[int] = None,
    with_positions: bool = True,
    mode: str = "auto",
) -> DataFrame:
    """Reference ``Phrase`` (pairwise positional intersection,
    postings.rs:66-112) served entirely from positional segments —
    rank- and position-identical to FtsEngine.results(Phrase(text))."""
    return segment_query(
        spark, index_path, Phrase(text), k=k,
        with_positions=with_positions, mode=mode,
    )


def _load_doc_texts(index_path: str, doc_ids: List[int]) -> Dict[int, str]:
    """doc_id -> text for the given ids, read in-process: the committed
    base doc store plus any un-compacted stream delta batches (later
    batches win per doc_id — the view compact_stream would fold in).
    Raises FileNotFoundError when the index has no doc store
    (store_docs=False builds)."""
    import pyarrow.parquet as pq

    from . import commitio

    dirs: List[str] = []
    base = commitio.table_path(index_path, "docs")
    if os.path.isdir(base):
        dirs.append(base)
    stream_docs = os.path.join(index_path, "stream_delta", "docs")
    if os.path.isdir(stream_docs):
        dirs.extend(
            os.path.join(stream_docs, x)
            for x in sorted(os.listdir(stream_docs))
            if x.startswith("batch=")
        )
    if not dirs:
        raise FileNotFoundError(
            f"no doc store under {index_path} (built with "
            "store_docs=False?) — pass the corpus to segment_highlight "
            "instead"
        )
    out: Dict[int, str] = {}
    want = list({int(d) for d in doc_ids})
    for d in dirs:  # later dirs overwrite: newest batch wins
        t = pq.read_table(
            d, columns=["doc_id", "text"], filters=[("doc_id", "in", want)]
        )
        out.update(
            zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        )
    return out


def segment_highlight_pandas(
    index_path: str,
    query: Query,
    before: str,
    after: str,
    k: Optional[int] = None,
) -> pd.DataFrame:
    """Query-node highlight serving: top-k + byte-range-wrapped text,
    fully in-process (cf. segment_query_pandas) — evaluate the AST from
    the pruned segment files, then fetch ONLY the k winners' documents
    from the doc store with a pushed doc_id filter and wrap each
    coalesced position's byte range (search_result.rs:54-66). Columns
    (doc_id, score, positions, highlighted), ordered
    (score desc, doc_id asc) like segment_highlight."""
    from .oracle import highlight as _hl

    res = segment_query_pandas(index_path, query, k=k, with_positions=True)
    if res.empty:
        res["highlighted"] = pd.Series([], dtype=object)
        return res
    texts = _load_doc_texts(index_path, [int(x) for x in res["doc_id"]])
    res = res.copy()
    res["highlighted"] = [
        None
        if texts.get(int(d)) is None
        else _hl(
            texts[int(d)],
            [(int(p["begin"]), int(p["end"]), int(p["pos"])) for p in poss],
            before,
            after,
        )
        for d, poss in zip(res["doc_id"], res["positions"])
    ]
    return res


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


def min_window_pandas(
    index_path: str,
    text: str,
    window: Optional[int] = None,
    doc_range=None,
    doc_ids: Optional[List[int]] = None,
) -> pd.DataFrame:
    """QUERY-NODE unordered proximity: ``FtsEngine.min_window`` served
    straight from the positional segments in this process — no
    SparkSession, no JVM, no job (row-identical, asserted in tests).

    Plan: one term range per analyzed query term, shards pruned to the
    INTERSECTION of the per-term shard sets (And semantics — a doc must
    contain every term, and all of a doc's postings live in one shard),
    then per shard: candidate docs = intersection of the ranges' doc
    sets, and the classic two-pointer minimal-cover scan runs over each
    candidate's merged (pos, term) rows. Duplicated (doc, pos) rows from
    edge-ngram dictionaries dedupe per term exactly like the relational
    plan's ``distinct()``.

    ``doc_ids`` (bounded driver-side list) restricts the computation to
    those docs: shards prune STRUCTURALLY to the ids' shard set (shards
    ARE doc ranges) and the in-kernel candidate set starts from the ids
    — the rescore path passes its top-``window`` winners here, so at
    most ids-many docs' position rows are ever scanned no matter the
    corpus size.
    """
    from .qast import And as _And
    from .qast import Match as _Match

    terms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in terms:
            terms.append(tok.term)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "span": pd.Series([], dtype="int32"),
        }
    )
    if not terms:
        return empty
    q = _And(*[_Match(t) for t in terms]) if len(terms) > 1 else _Match(
        terms[0]
    )
    ranges, tree, shards, _ = _plan_query(index_path, q, doc_range)
    if not shards:
        return empty
    ids_arr = None
    if doc_ids is not None:
        ids_arr = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        if ids_arr.size == 0:
            return empty
        sd = int(load_manifest(index_path)["shard_docs"])
        want = set((ids_arr // sd).tolist())
        shards = [s for s in shards if s["shard_id"] in want]
        if not shards:
            return empty
    # map each term to its range index in compile order: And children
    # are ("match", [idx]) nodes in term order (Match dedups per node)
    if len(terms) == 1:
        term_idxs = [tree[1][0]]
    else:
        term_idxs = [c[1][0] for c in tree[1]]
    n_terms = len(terms)
    seg_dir = os.path.join(index_path, "segments")

    def one(f):
        matchers, _docbytes = _read_shard(f, ranges, doc_range)
        per_term = []
        # seeding the intersection with the id filter prunes every
        # term's arrays before the merge work
        member = ids_arr
        for mi in term_idxs:
            d, _b, _e, p = matchers[mi]
            # dedupe (doc, pos) within the term's expansion (edge-ngram
            # dictionaries emit one row per matching ngram per position)
            key = d * _POS_SHIFT + p
            _, first = np.unique(key, return_index=True)
            d, p = d[first], p[first]
            per_term.append((d, p))
            ud = np.unique(d)
            member = ud if member is None else np.intersect1d(member, ud)
            if member.size == 0:
                return None
        out_d, out_s = [], []
        alld = np.concatenate([d for d, _ in per_term])
        allp = np.concatenate([p for _, p in per_term])
        allt = np.concatenate(
            [np.full(d.size, i, np.int64) for i, (d, _) in enumerate(per_term)]
        )
        keep = np.isin(alld, member)
        alld, allp, allt = alld[keep], allp[keep], allt[keep]
        order = np.lexsort((allp, alld))
        alld, allp, allt = alld[order], allp[order], allt[order]
        starts = np.searchsorted(alld, member, side="left")
        stops = np.searchsorted(alld, member, side="right")
        for doc, lo_i, hi_i in zip(member.tolist(), starts, stops):
            pos = allp[lo_i:hi_i]
            tid = allt[lo_i:hi_i]
            counts = np.zeros(n_terms, dtype=np.int64)
            have, lo = 0, 0
            best = np.iinfo(np.int64).max
            for hi in range(pos.size):
                t = tid[hi]
                counts[t] += 1
                if counts[t] == 1:
                    have += 1
                while have == n_terms:
                    best = min(best, pos[hi] - pos[lo] + 1)
                    tl = tid[lo]
                    counts[tl] -= 1
                    if counts[tl] == 0:
                        have -= 1
                    lo += 1
            out_d.append(doc)
            out_s.append(best)
        if not out_d:
            return None
        return pd.DataFrame(
            {
                "doc_id": np.array(out_d, dtype=np.int64),
                "span": np.array(out_s, dtype=np.int32),
            }
        )

    files = [os.path.join(seg_dir, s["file"]) for s in shards]
    parts = _map_files(one, files)
    if not parts:
        return empty
    pdf = pd.concat(parts, ignore_index=True)
    if window is not None:
        pdf = pdf[pdf["span"] <= int(window)]
    return pdf.sort_values("doc_id", ignore_index=True)
