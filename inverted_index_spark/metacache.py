"""Driver-side query-planning metadata: zero Spark jobs before the scan.

The segment-served paths (wand.py, segquery.py) need two tiny lookups
per query — term df for idf weights (termdict) and the term -> shard map
for shard pruning (term_shards). Issuing those as Spark jobs is correct
but costs two scheduler round-trips (~0.3-0.5s fixed latency) per
single query. Both tables are small parquet the DRIVER can read directly
with pyarrow predicate pushdown (term_shards is range-partitioned +
sorted by term, so row-group min/max fences prune; on a real cluster the
driver reads the same object-store files — no executor involvement), so
the metadata phase of a query becomes a local filtered read, and the
only Spark job left is the shard scan itself.

Results are memoized per index SNAPSHOT: the cache key includes the
resolved directory (catalog pointer) and its mtime, so an upsert or
compaction that publishes a new generation invalidates naturally.

The reference keeps its whole dictionary in process memory
(/root/reference/src/index.rs:15-20); this is the distributed analogue —
metadata local to the planner, postings remote.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Set, Tuple

from . import commitio

# memo: (table_dir, mtime, kind, key) -> value; bounded FIFO
_MEMO: Dict[tuple, object] = {}
_MEMO_MAX = 512

# guard: a pathological range (e.g. Prefix("a") over a huge vocabulary)
# could match millions of term_shards rows; past this many matched rows
# pruning stops paying for itself and the caller falls back to
# "all shards" for that range
MAX_MATCHED_ROWS = 2_000_000


def _snapshot(index_path: str, name: str) -> Optional[Tuple[str, float]]:
    """(resolved dir, mtime) of a table — the cache invalidation token."""
    d = commitio.table_path(index_path, name)
    if not os.path.isdir(d):
        return None
    return (d, os.path.getmtime(d))


import threading as _memo_threading

_MEMO_LOCK = _memo_threading.Lock()


def _memo_get(key: tuple):
    return _MEMO.get(key)


def _memo_put(key: tuple, value) -> None:
    # locked: request_snapshot writes here from concurrent serving
    # threads, and two evictors iterating + deleting the same keys
    # would KeyError each other
    with _MEMO_LOCK:
        if len(_MEMO) >= _MEMO_MAX:
            # drop the oldest half (insertion-ordered dict)
            for k in list(_MEMO)[: _MEMO_MAX // 2]:
                _MEMO.pop(k, None)
        _MEMO[key] = value


# ----------------------------------------------------------------------
# coordinator request cache (the Lucene/ES request-cache analog):
# memoize SERVING RESULTS per segment snapshot. The key embeds a
# CONTENT fingerprint of the manifest (request_snapshot), so a cached
# answer expires exactly when a new manifest COMMITS (refresh /
# rebuild / compact). Mutations alone do NOT expire it: invalidation
# only records the pending sidecar and leaves the manifest — the
# serving commit point — untouched, so serves stay on the last
# complete snapshot (stale-but-consistent, Lucene reader semantics)
# until the next commit. Entries are small (top-k frames), the store
# is a bounded LRU. SPARK_GRAFT_SERVE_CACHE sets the entry count
# (default 64; 0 disables).

import threading as _threading
from collections import OrderedDict

_REQ_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_REQ_LOCK = _threading.Lock()


def _req_cache_max() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_SERVE_CACHE", "64"))
    except ValueError:
        return 64


def request_snapshot(index_path: str) -> Optional[tuple]:
    """Cache-key component identifying the segment snapshot: the
    manifest path + a CONTENT fingerprint of the manifest bytes.
    Every refresh/invalidation rewrites the manifest, and fingerprinting
    the bytes — not just the mtime — closes the coarse-filesystem window
    where two rewrites land in one timestamp tick. The digest itself is
    memoized on (path, inode, mtime_ns, size) so the serving hot path
    pays one ``stat`` per call, not an O(manifest) read+hash — the
    inode is in the key because manifest rewrites go through an atomic
    replace, which swaps inodes even when timestamp and size tie. A
    manifest whose mtime is within the last ~2s is hashed WITHOUT the
    memo: on coarse-timestamp filesystems two rewrites (plus an inode
    recycle) can land in one tick with tying sizes, and only recency
    makes that alias reachable — past the tick window the stat key is
    unambiguous. None when there is no manifest (nothing safe to cache
    against)."""
    import hashlib
    import time as _time
    import zlib

    from .segments import MANIFEST_NAME

    p = os.path.join(index_path, MANIFEST_NAME)
    try:
        st = os.stat(p)
        settled = (_time.time() - st.st_mtime) > 2.0
        mkey = ("manifest_fp", p, st.st_ino, st.st_mtime_ns, st.st_size)
        fp = _memo_get(mkey) if settled else None
        if fp is None:
            with open(p, "rb") as fh:
                data = fh.read()
            try:
                # fingerprint, not security — keep working under FIPS
                fp = hashlib.md5(data, usedforsecurity=False).hexdigest()
            except TypeError:  # pre-3.9 signature lacks the kwarg
                try:
                    fp = hashlib.md5(data).hexdigest()
                except ValueError:  # ...and FIPS still rejects md5
                    fp = "%08x-%x" % (zlib.crc32(data), len(data))
            except ValueError:  # FIPS build rejecting md5 outright
                fp = "%08x-%x" % (zlib.crc32(data), len(data))
            if settled:  # an in-tick key may alias a future rewrite
                _memo_put(mkey, fp)
        return (p, fp)
    except OSError:
        return None


def _req_copy(pdf):
    """Copy a cached frame INCLUDING object-dtype cells: pandas
    copy(deep=True) copies only the array of references, and a shallow
    list(v) would still share the position DICTS inside — a caller
    rebasing offsets in place would corrupt the cached entry. Deep-copy
    every object cell (frames are top-k-bounded, so this is cheap)."""
    import copy

    out = pdf.copy()
    for col in out.columns:
        if out[col].dtype == object:
            out[col] = out[col].map(copy.deepcopy)
    return out


def request_cache_get(key: tuple):
    """Cached serving result for ``key`` (an isolated copy), or None."""
    if _req_cache_max() <= 0:
        return None
    with _REQ_LOCK:
        hit = _REQ_CACHE.get(key)
        if hit is not None:
            _REQ_CACHE.move_to_end(key)
    if hit is None:
        return None
    # copy OUTSIDE the lock: entries are immutable once inserted (put
    # stores a private copy, get hands out copies), so concurrent
    # readers of different keys don't serialize behind one deep copy
    return _req_copy(hit)


def request_cache_put(key: tuple, value) -> None:
    if _req_cache_max() <= 0:
        return
    copied = _req_copy(value)
    with _REQ_LOCK:
        _REQ_CACHE[key] = copied
        _REQ_CACHE.move_to_end(key)
        while len(_REQ_CACHE) > _req_cache_max():
            _REQ_CACHE.popitem(last=False)


def term_dfs(
    index_path: str, terms: List[str], column: str = "df_full"
) -> Dict[str, int]:
    """``term -> doc frequency`` for the given terms, read driver-side.

    ``column`` picks the termdict frequency: ``df_full`` (full-token
    doc freq, the BM25 statistic) or ``df`` (per-dictionary-entry doc
    freq — differs only on edge-ngram indexes, where prefixes carry
    tf=0 postings). Missing terms are absent from the result (df 0).
    One filtered pyarrow read of the termdict parquet — no Spark job.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None:
        return {}
    key = (snap, "df", column, tuple(sorted(terms)))
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.parquet as pq

    table = pq.read_table(
        snap[0],
        columns=["term", column],
        filters=[("term", "in", list(terms))],
    )
    out = dict(
        zip(table.column("term").to_pylist(), table.column(column).to_pylist())
    )
    _memo_put(key, out)
    return out


def docstats_total_tokens(index_path: str) -> Optional[int]:
    """Exact corpus token total (sum of doclen_tokens), read driver-side
    from the docstats parquet — the LM-Dirichlet collection statistic.
    Integer-exact, so it matches the relational path's Spark aggregate
    bit-for-bit. Memoized per docstats snapshot."""
    snap = _snapshot(index_path, "docstats")
    if snap is None:
        return None
    key = (snap, "total_tokens")
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(snap[0], columns=["doclen_tokens"])
    out = int(pc.sum(table.column("doclen_tokens")).as_py() or 0)
    _memo_put(key, out)
    return out


def range_stats_for_ranges(
    index_path: str, ranges: List[Tuple[str, Optional[str]]]
) -> Optional[List[Optional[dict]]]:
    """Per-range shard sets + cost statistics from the term->shard map.

    ``ranges[i] = (lo, hi)`` selects terms in ``[lo, hi)`` (hi None =
    unbounded). Returns one dict per range —
    ``{"shards": set[int], "n_postings": int|None,
    "n_positions": int|None}`` (counts None when any matched map row
    predates the stats columns) — or None when the map itself is absent
    (pre-v2 layout: caller scans every shard). An individual entry is
    None when the range matched more than MAX_MATCHED_ROWS map rows
    (caller treats it as "all shards", cost unknown).

    Per-range sets let compound queries prune structurally: And
    intersects its children's shard sets, Or unions them — a
    one-rare-term And opens only the rare term's shards. The counts
    bound the pruned read volume (12 B/posting + 12 B/position raw —
    encoding only shrinks), which drives the local-vs-distributed
    serving decision.
    """
    snap = _snapshot(index_path, "term_shards")
    if snap is None:
        return None
    key = (snap, "stats", tuple(ranges))
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.parquet as pq

    filters = []
    for lo, hi in ranges:
        cl = [("term", ">=", lo)]
        if hi is not None:
            cl.append(("term", "<", hi))
        filters.append(cl)
    schema_names = pq.read_schema(
        _first_parquet_file(snap[0]) or snap[0]
    ).names
    has_stats = "n_postings" in schema_names
    cols = ["term", "shard_id"] + (
        ["n_postings", "n_positions"] if has_stats else []
    )
    table = pq.read_table(snap[0], columns=cols, filters=filters)
    import numpy as np
    import pandas as pd

    terms = pd.Series(table.column("term").to_pylist(), dtype=object)
    shard_ids = table.column("shard_id").to_numpy()
    if has_stats:
        np_col = table.column("n_postings").to_pandas()
        npos_col = table.column("n_positions").to_pandas()
    out: List[Optional[dict]] = []
    for lo, hi in ranges:
        mask = terms >= lo
        if hi is not None:
            mask &= terms < hi
        m = mask.to_numpy()
        if int(m.sum()) > MAX_MATCHED_ROWS:
            out.append(None)
            continue
        entry: dict = {
            "shards": set(int(x) for x in set(shard_ids[m])),
            "n_postings": None,
            "n_positions": None,
        }
        if has_stats:
            np_m, npos_m = np_col[m], npos_col[m]
            if not (np_m.isna().any() or npos_m.isna().any()):
                entry["n_postings"] = int(np_m.sum())
                entry["n_positions"] = int(npos_m.sum())
        out.append(entry)
    _memo_put(key, out)
    return out


def fuzzy_terms(
    index_path: str, term: str, max_edits: int, max_expansions: int
) -> List[str]:
    """Expansion set for a ``Fuzzy`` node: distinct indexed full tokens
    within Levenshtein ``max_edits`` of ``term``, capped at the
    ``max_expansions`` highest-df tokens (df_full desc, term asc —
    Lucene FuzzyQuery's maxExpansions contract). Driver-side, no Spark.

    One pyarrow dataset read of the termdict restricted to the
    +-max_edits TOKEN-LENGTH BAND (an edit changes length by at most
    one, so anything outside the band is provably too far) — the exact
    distance then runs in Python over that small slice of the
    vocabulary, never the corpus. Memoized per termdict snapshot.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None:
        return []
    key = (snap, "fuzzy", term, max_edits, max_expansions)
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from .oracle import levenshtein

    n = len(term)
    band = (pc.utf8_length(ds.field("term")) >= n - max_edits) & (
        pc.utf8_length(ds.field("term")) <= n + max_edits
    )
    table = ds.dataset(snap[0], format="parquet").to_table(
        columns=["term", "df_full"], filter=band
    )
    scored = [
        (-int(df), t)
        for t, df in zip(
            table.column("term").to_pylist(), table.column("df_full").to_pylist()
        )
        if levenshtein(t, term) <= max_edits
    ]
    scored.sort()
    out = [t for _, t in scored[:max_expansions]]
    _memo_put(key, out)
    return out


def suggest_terms(
    index_path: str, term: str, max_edits: int = 2, k: int = 3
) -> List[tuple]:
    """Ranked did-you-mean candidates for one analyzed query term:
    ``[(suggestion, dist, df), ...]`` by (dist asc, df_full desc, term
    asc), top-k — the zero-Spark-job twin of ``FtsEngine.suggest`` for
    one term (same length-band + Levenshtein + ranking, served from the
    sorted termdict parquet driver-side). Memoized per snapshot.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None:
        return []
    key = (snap, "suggest", term, max_edits, k)
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from .oracle import levenshtein

    n = len(term)
    band = (
        (pc.utf8_length(ds.field("term")) >= n - max_edits)
        & (pc.utf8_length(ds.field("term")) <= n + max_edits)
        & (ds.field("df_full") > 0)
    )
    table = ds.dataset(snap[0], format="parquet").to_table(
        columns=["term", "df_full"], filter=band
    )
    scored = []
    for t, df in zip(
        table.column("term").to_pylist(), table.column("df_full").to_pylist()
    ):
        d = levenshtein(t, term)
        if d <= max_edits:
            scored.append((d, -int(df), t))
    scored.sort()
    out = [(t, d, -negdf) for d, negdf, t in scored[:k]]
    _memo_put(key, out)
    return out


def suggest_pandas(
    index_path: str, text: str, max_edits: int = 2, k: int = 3
):
    """Driver-side did-you-mean over a SAVED index — no SparkSession,
    no JVM: the coordinator-serving twin of ``FtsEngine.suggest``
    (identical rows/order, asserted in tests). Returns a pandas frame
    (qterm, suggestion, dist, df, rank) ordered qterm asc, rank asc.
    """
    import pandas as pd

    from .analysis import analyze_query

    qterms: List[str] = []
    for tok in analyze_query(text):
        if tok.term not in qterms:
            qterms.append(tok.term)
    rows = []
    for q in sorted(qterms):
        for rank, (t, d, df) in enumerate(
            suggest_terms(index_path, q, max_edits, k), 1
        ):
            rows.append((q, t, d, df, rank))
    return pd.DataFrame(
        rows, columns=["qterm", "suggestion", "dist", "df", "rank"]
    )


def wildcard_terms(index_path: str, pattern: str) -> List[str]:
    """Expansion set for a ``Wildcard`` node: every dictionary term the
    translated pattern fully matches, sorted. Driver-side, no Spark.

    The pattern's literal prefix restricts the pyarrow termdict read to
    a sargable ``[prefix, succ(prefix))`` band (row-group min/max fences
    prune — the dictionary is term-sorted); the residual match runs in
    Python over the band. A leading wildcard reads the whole dictionary
    — the query's true cost, exactly like an unbounded Prefix range.
    Memoized per termdict snapshot.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None or not pattern:
        return []
    key = (snap, "wildcard", pattern)
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import re

    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from .oracle import prefix_upper_bound
    from .qast import wildcard_literal_prefix, wildcard_regex

    pre = wildcard_literal_prefix(pattern)
    flt = None
    if pre:
        flt = pc.field("term") >= pre
        hi = prefix_upper_bound(pre)
        if hi is not None:
            flt = flt & (pc.field("term") < hi)
    table = ds.dataset(snap[0], format="parquet").to_table(
        columns=["term"], filter=flt
    )
    rx = re.compile(wildcard_regex(pattern))
    out = sorted(
        t for t in table.column("term").to_pylist() if rx.fullmatch(t)
    )
    _memo_put(key, out)
    return out


def phonetic_terms(
    index_path: str, term: str, max_expansions: int
) -> List[str]:
    """Expansion set for a ``Phonetic`` node: distinct indexed full
    tokens whose American Soundex code (oracle.soundex, Spark-parity)
    equals ``term``'s, capped at the ``max_expansions`` highest-df
    tokens (df_full desc, term asc — the Fuzzy cap contract).
    Driver-side, no Spark.

    A soundex code's first letter is the term's first letter, so the
    pyarrow termdict read is banded to that letter's sorted slice; for
    a non-letter-initial query the code is the raw string, which only
    an identical term can produce, so the read is an exact lookup.
    Memoized per termdict snapshot.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None or not term:
        return []
    key = (snap, "phonetic", term, max_expansions)
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from .oracle import soundex

    code = soundex(term)
    first = term[0]
    if ("a" <= first <= "z") or ("A" <= first <= "Z"):
        lo = first.lower()
        flt = (pc.field("term") >= lo) & (pc.field("term") < chr(ord(lo) + 1))
    else:
        flt = pc.field("term") == term
    table = ds.dataset(snap[0], format="parquet").to_table(
        columns=["term", "df_full"], filter=flt
    )
    scored = sorted(
        (-int(df), t)
        for t, df in zip(
            table.column("term").to_pylist(),
            table.column("df_full").to_pylist(),
        )
        if soundex(t) == code
    )
    out = [t for _, t in scored[:max_expansions]]
    _memo_put(key, out)
    return out


def regex_terms(index_path: str, pattern: str) -> List[str]:
    """Expansion set for a ``Regex`` node: every dictionary term the
    pattern fully matches, sorted. Driver-side, no Spark.

    Same shape as :func:`wildcard_terms`: the pattern's leading literal
    run (qast.regex_parse) restricts the pyarrow termdict read to a
    sargable ``[prefix, succ(prefix))`` band; the residual fullmatch
    runs in Python over the band — bit-identical to the relational
    anchored-``rlike`` plan and the RE2 oracle because the pattern is
    pre-validated to the dialect-stable subset. A pattern with no
    literal lead reads the whole dictionary. Memoized per termdict
    snapshot.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None or not pattern:
        return []
    key = (snap, "regex", pattern)
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import re

    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    from .oracle import prefix_upper_bound
    from .qast import regex_parse

    pre, lit = regex_parse(pattern)
    if lit is not None:  # pure literal: one exact dictionary probe
        flt = pc.field("term") == lit
        table = ds.dataset(snap[0], format="parquet").to_table(
            columns=["term"], filter=flt
        )
        out = sorted(set(table.column("term").to_pylist()))
        _memo_put(key, out)
        return out
    flt = None
    if pre:
        flt = pc.field("term") >= pre
        hi = prefix_upper_bound(pre)
        if hi is not None:
            flt = flt & (pc.field("term") < hi)
    table = ds.dataset(snap[0], format="parquet").to_table(
        columns=["term"], filter=flt
    )
    rx = re.compile(pattern)
    out = sorted(
        t for t in table.column("term").to_pylist() if rx.fullmatch(t)
    )
    _memo_put(key, out)
    return out


def _first_parquet_file(d: str) -> Optional[str]:
    try:
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                return os.path.join(d, name)
    except OSError:
        pass
    return None


def shard_sets_for_ranges(
    index_path: str, ranges: List[Tuple[str, Optional[str]]]
) -> Optional[List[Optional[Set[int]]]]:
    """Per-range shard-id sets (cost-free view of
    range_stats_for_ranges — same semantics, sets only)."""
    stats = range_stats_for_ranges(index_path, ranges)
    if stats is None:
        return None
    return [None if s is None else s["shards"] for s in stats]


# raw struct widths: 8B doc_id + 4B tf per posting, 3 x int32 per
# position — upper bounds on the encoded read (delta/varint/FOR only
# shrinks them)
BYTES_PER_POSTING = 12
BYTES_PER_POSITION = 12


def estimate_read_bytes(
    stats: Optional[List[Optional[dict]]], with_positions: bool
) -> Optional[int]:
    """Upper bound on the pruned read volume for a query's ranges, or
    None when any range lacks counts (pre-stats map / overflow)."""
    if stats is None:
        return None
    total = 0
    for s in stats:
        if s is None or s["n_postings"] is None:
            return None
        total += s["n_postings"] * BYTES_PER_POSTING
        if with_positions:
            total += s["n_positions"] * BYTES_PER_POSITION
    return total


# -- local (coordinator) serving decision ------------------------------
#
# When shard pruning leaves a handful of small files, scheduling a
# distributed job buys nothing: the dominant cost becomes Spark's fixed
# task round-trip, not the decode. A real deployment splits exactly this
# way — the query coordinator serves rare-term top-k by reading the
# O(df) pruned shard files straight from the object store with the SAME
# kernels the executors run, and fans out to the cluster only when the
# pruned byte volume says the scan is worth distributing. enc_bytes is
# the whole shard's encoded postings payload, an upper bound on what the
# term-filtered read actually touches, so the threshold is conservative.
#
# Two default tiers, picked by fork-pool availability (segquery.
# _map_files): with the process pool the decode kernels run
# one-process-per-core, so ~128 MB across up to 64 shards decodes in a
# few hundred ms — still under a Spark job's fixed dispatch latency.
# When the pool is unavailable (SPARK_GRAFT_SERVE_PROCS=0, no fork
# start method) the serve is GIL-bound to ~one core, so the old
# conservative tier applies — routing 128 MB at a thread-pool ~5-7 s
# would be strictly worse than distributing.

LOCAL_MAX_BYTES = 128 << 20
LOCAL_MAX_FILES = 64
LOCAL_MAX_BYTES_THREADED = 32 << 20
LOCAL_MAX_FILES_THREADED = 16


def _fork_serve_enabled() -> bool:
    """True when segquery._map_files would use the fork process pool."""
    if os.environ.get("SPARK_GRAFT_SERVE_PROCS", "16") == "0":
        return False
    try:
        import multiprocessing

        return "fork" in multiprocessing.get_all_start_methods()
    except Exception:
        return False


def serve_locally(
    shards: List[dict],
    mode: str = "auto",
    est_bytes: Optional[int] = None,
) -> bool:
    """True when the pruned shard set should be evaluated driver-side.

    ``mode``: "local" forces it, "spark" forbids it, "auto" decides by
    COST: ``est_bytes`` (the per-term statistics bound from
    estimate_read_bytes — what the filtered read actually touches) when
    available, else the sum of whole-shard ``enc_bytes`` (conservative:
    a rare term inside a large shard distributes unnecessarily without
    stats). Thresholds SPARK_GRAFT_LOCAL_QUERY_MAX_BYTES / _MAX_FILES
    (env-overridable; SPARK_GRAFT_LOCAL_QUERY=0 disables).
    """
    if mode == "local":
        return True
    if mode == "spark":
        return False
    if mode != "auto":
        raise ValueError(f"mode must be auto|local|spark, got {mode!r}")
    if os.environ.get("SPARK_GRAFT_LOCAL_QUERY", "1") in ("0", "false"):
        return False
    if _fork_serve_enabled():
        dflt_files, dflt_bytes = LOCAL_MAX_FILES, LOCAL_MAX_BYTES
    else:
        dflt_files = LOCAL_MAX_FILES_THREADED
        dflt_bytes = LOCAL_MAX_BYTES_THREADED
    max_files = int(
        os.environ.get("SPARK_GRAFT_LOCAL_QUERY_MAX_FILES", dflt_files)
    )
    max_bytes = int(
        os.environ.get("SPARK_GRAFT_LOCAL_QUERY_MAX_BYTES", dflt_bytes)
    )
    if len(shards) > max_files:
        return False
    if est_bytes is not None:
        return est_bytes <= max_bytes
    total = 0
    for s in shards:
        enc = s.get("enc_bytes")
        if not enc:  # unknown size (pre-v3 manifest) -> distribute
            return False
        total += int(enc)
    return total <= max_bytes


def invalidate(index_path: Optional[str] = None) -> None:
    """Drop memoized entries (tests / explicit refresh). The snapshot
    token makes this unnecessary after normal commits."""
    _MEMO.clear()
