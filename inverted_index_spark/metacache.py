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


def _memo_get(key: tuple):
    return _MEMO.get(key)


def _memo_put(key: tuple, value) -> None:
    if len(_MEMO) >= _MEMO_MAX:
        # drop the oldest half (insertion-ordered dict)
        for k in list(_MEMO)[: _MEMO_MAX // 2]:
            del _MEMO[k]
    _MEMO[key] = value


def term_dfs(index_path: str, terms: List[str]) -> Dict[str, int]:
    """``term -> df_full`` for the given terms, read driver-side.

    Missing terms are absent from the result (df 0). One filtered
    pyarrow read of the termdict parquet — no Spark job.
    """
    snap = _snapshot(index_path, "termdict")
    if snap is None:
        return {}
    key = (snap, "df", tuple(sorted(terms)))
    hit = _memo_get(key)
    if hit is not None:
        return hit  # type: ignore[return-value]
    import pyarrow.parquet as pq

    table = pq.read_table(
        snap[0],
        columns=["term", "df_full"],
        filters=[("term", "in", list(terms))],
    )
    out = dict(
        zip(table.column("term").to_pylist(), table.column("df_full").to_pylist())
    )
    _memo_put(key, out)
    return out


def shard_sets_for_ranges(
    index_path: str, ranges: List[Tuple[str, Optional[str]]]
) -> Optional[List[Optional[Set[int]]]]:
    """Per-range shard-id sets from the exact term->shard map.

    ``ranges[i] = (lo, hi)`` selects terms in ``[lo, hi)`` (hi None =
    unbounded). Returns one set per range, or None when the map is
    absent (pre-v2 layout — caller scans every shard). An individual
    range entry is None when it matched more than MAX_MATCHED_ROWS map
    rows (caller treats it as "all shards").

    Per-range sets let compound queries prune structurally: And
    intersects its children's shard sets, Or unions them — a
    one-rare-term And opens only the rare term's shards.
    """
    snap = _snapshot(index_path, "term_shards")
    if snap is None:
        return None
    key = (snap, "shards", tuple(ranges))
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
    table = pq.read_table(
        snap[0], columns=["term", "shard_id"], filters=filters
    )
    import pandas as pd

    terms = pd.Series(table.column("term").to_pylist(), dtype=object)
    shard_ids = table.column("shard_id").to_numpy()
    sets: List[Optional[Set[int]]] = []
    for lo, hi in ranges:
        mask = terms >= lo
        if hi is not None:
            mask &= terms < hi
        if int(mask.sum()) > MAX_MATCHED_ROWS:
            sets.append(None)
        else:
            sets.append(set(int(x) for x in set(shard_ids[mask.to_numpy()])))
    _memo_put(key, sets)
    return sets


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

LOCAL_MAX_BYTES = 32 << 20
LOCAL_MAX_FILES = 16


def serve_locally(shards: List[dict], mode: str = "auto") -> bool:
    """True when the pruned shard set should be evaluated driver-side.

    ``mode``: "local" forces it, "spark" forbids it, "auto" decides by
    size — every shard's manifest row must carry ``enc_bytes`` and the
    set must fit under SPARK_GRAFT_LOCAL_QUERY_MAX_BYTES /
    _MAX_FILES (env-overridable; SPARK_GRAFT_LOCAL_QUERY=0 disables).
    """
    if mode == "local":
        return True
    if mode == "spark":
        return False
    if mode != "auto":
        raise ValueError(f"mode must be auto|local|spark, got {mode!r}")
    if os.environ.get("SPARK_GRAFT_LOCAL_QUERY", "1") in ("0", "false"):
        return False
    max_files = int(
        os.environ.get("SPARK_GRAFT_LOCAL_QUERY_MAX_FILES", LOCAL_MAX_FILES)
    )
    max_bytes = int(
        os.environ.get("SPARK_GRAFT_LOCAL_QUERY_MAX_BYTES", LOCAL_MAX_BYTES)
    )
    if len(shards) > max_files:
        return False
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
