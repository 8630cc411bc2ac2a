"""Driver-side index inspection: one call, zero Spark jobs.

``describe_index(path)`` walks a saved index directory and reports the
operational state an on-call engineer asks about first: which table
generations are live (catalog-resolved), whether compressed segments
are fresh enough to serve queries (the same check ``FtsEngine`` routes
on), what the last build did per task (lineage + skew from
``build_manifest.json``), and how much un-compacted stream delta is
waiting. Everything comes from local metadata files and directory
listings — no SparkSession required, so it is safe to call from a
scheduler or a health probe.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from . import commitio

__all__ = ["describe_index"]

_TABLES = ("postings", "docstats", "termdict", "docs")


def _dir_stats(d: str) -> Optional[dict]:
    if not os.path.isdir(d):
        return None
    files = 0
    size = 0
    for name in os.listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p) and not name.startswith(("_", ".")):
            files += 1
            size += os.path.getsize(p)
    return {"dir": d, "files": files, "bytes": size}


def describe_index(path: str) -> dict:
    """Snapshot of a saved index directory (see module docstring)."""
    out: dict = {"path": path}

    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            out["meta"] = json.load(fh)
    else:
        out["meta"] = None

    tables = {}
    for name in _TABLES:
        st = _dir_stats(commitio.table_path(path, name))
        if st is not None:
            tables[name] = st
    out["tables"] = tables

    # segments: serveability is segments_fresh — the exact routing check
    from .segments import MANIFEST_NAME, _pending_path, segments_fresh

    seg: Optional[dict] = None
    manifest_path = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            m = json.load(fh)
        shards = m.get("shards", [])
        enc = sum(s.get("enc_bytes", 0) for s in shards)
        raw = sum(s.get("raw_bytes", 0) for s in shards)
        try:
            fresh = segments_fresh(path)
        except OSError:
            # half-deleted index (e.g. postings dir gone): a health
            # probe should report, not throw
            fresh = False
        seg = {
            "fresh": fresh,
            "positional": bool(m.get("positional", False)),
            "shards": len(shards),
            "enc_bytes": enc,
            "compression": round(raw / enc, 2) if enc else None,
        }
        if os.path.exists(_pending_path(path)):
            # sidecar is a sorted JSON list of shard ids
            with open(_pending_path(path)) as fh:
                seg["pending_refresh_shards"] = sorted(json.load(fh))
    out["segments"] = seg

    from .build import load_build_manifest

    bm = load_build_manifest(path)
    if bm is not None:
        out["build"] = {
            "fingerprint": bm.get("fingerprint"),
            "n_tasks": bm.get("n_tasks"),
            "resumed_tasks": bm.get("resumed_tasks"),
            "total_postings": bm.get("total_postings"),
            "total_docs": bm.get("total_docs"),
            "skew_ratio": bm.get("skew_ratio"),
        }
    else:
        out["build"] = None

    delta = {}
    for name in ("postings", "docstats", "docs"):
        d = os.path.join(path, "stream_delta", name)
        if os.path.isdir(d):
            delta[name] = sorted(
                x for x in os.listdir(d) if x.startswith("batch=")
            )
    out["stream_delta_batches"] = delta

    # un-compacted mutation generations: upsert deltas + tombstones
    # (a tombstone gen with no matching delta gen is a pure delete)
    muts = {}
    for name in ("postings_delta", "tombstones"):
        d = os.path.join(path, name)
        if os.path.isdir(d):
            muts[name] = sorted(
                x for x in os.listdir(d) if x.startswith("gen=")
            )
    out["mutation_generations"] = muts

    gens = {}
    for entry in sorted(os.listdir(path)) if os.path.isdir(path) else []:
        if ".v" in entry and os.path.isdir(os.path.join(path, entry)):
            base, _, g = entry.rpartition(".v")
            try:
                gens.setdefault(base, []).append(int(g))
            except ValueError:
                pass
    out["versioned_dirs"] = {k: sorted(v) for k, v in gens.items()}
    return out
