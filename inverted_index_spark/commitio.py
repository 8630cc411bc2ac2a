"""Object-store-safe table commits: versioned dirs + one pointer swap.

The reference mutates its in-memory maps in place
(/root/reference/src/index.rs:36-51); a distributed index on immutable
storage needs a commit protocol instead. The earlier layout swapped
directories with ``shutil.rmtree`` + ``os.replace`` — fine on a local
POSIX filesystem, broken on object stores (rename is copy+delete, and a
reader between the two calls sees a missing table).

Protocol here (the Iceberg/Delta pattern, hand-rolled over parquet):

* every rewrite of a derived table lands in a NEW versioned directory
  ``<name>.v<gen>`` — existing directories are never modified;
* readers resolve a logical table name through the active CATALOG
  (default: ``catalog.json`` in the table root), falling back to the
  bare ``<name>`` directory for gen-0 layouts written by build_and_save;
* a batch commits by swapping the pointer state once (``publish`` —
  write-temp + atomic rename locally; on a real object store this maps
  to one conditional PUT / CAS of the catalog object);
* a crash before ``publish`` leaves the old catalog pointing at intact
  old directories — half-written versions are invisible garbage;
* superseded version directories are removed only AFTER the pointer
  swap (``gc_superseded``) — production deployments would defer this by
  a grace period so in-flight readers finish.

Catalog adapter seam
--------------------
All pointer reads/writes go through one small interface
(``CatalogAdapter``: resolve + swap). The default ``JsonCatalog`` is
the sandbox implementation; a deployment with a real Iceberg/Delta/
Glue catalog registers its own adapter (``set_catalog``) that maps
``swap`` to the catalog's atomic multi-table commit (e.g. an Iceberg
transaction replacing each table's data location) and ``resolve`` to a
catalog lookup — no other engine code changes. The protocol only needs
compare-and-swap semantics from the adapter.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from contextlib import contextmanager
from typing import Dict, Optional

CATALOG = "catalog.json"


class CatalogAdapter:
    """Pointer store interface: logical table name -> directory name.

    ``resolve`` returns the directory name (relative to ``path``) the
    catalog currently maps ``name`` to, or None when unmapped.
    ``swap`` atomically updates ALL given mappings (one commit).
    """

    def resolve(self, path: str, name: str) -> Optional[str]:
        raise NotImplementedError

    def swap(self, path: str, mapping: Dict[str, str]) -> None:
        raise NotImplementedError


class JsonCatalog(CatalogAdapter):
    """Default adapter: one small JSON pointer file per table root,
    replaced atomically (locally: os.replace; object store: one CAS
    PUT of the catalog object)."""

    def _load(self, path: str) -> Dict[str, str]:
        cat = os.path.join(path, CATALOG)
        if os.path.exists(cat):
            with open(cat) as fh:
                return json.load(fh)
        return {}

    def resolve(self, path: str, name: str) -> Optional[str]:
        return self._load(path).get(name)

    def swap(self, path: str, mapping: Dict[str, str]) -> None:
        entries = self._load(path)
        entries.update(mapping)
        cat = os.path.join(path, CATALOG)
        tmp = cat + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, indent=1)
        os.replace(tmp, cat)


class DeltaLogCatalog(CatalogAdapter):
    """Delta-Lake-style transaction-log catalog (pure stdlib).

    The pointer state lives in an append-only ``_fts_log/`` directory of
    numbered commit files — the open Delta protocol's shape, hand-rolled
    over JSON:

    * commit ``N`` is ``_fts_log/<N:020d>.json`` holding only that
      commit's pointer swaps; the current state is the replay of all
      commits (later wins);
    * a writer claims version ``N`` by CREATE-IF-ABSENT: the payload is
      fully written to a temp file first, then HARD-LINKED to the
      commit name (``os.link`` fails with EEXIST exactly like
      ``O_CREAT|O_EXCL``, but the commit appears with its complete
      content in one atomic step — the local analogue of an
      ``If-None-Match`` PUT, where claim and content are one
      operation). Two racing committers cannot both win a version; the
      loser re-reads the log and retries on the next number
      (optimistic concurrency, bounded attempts);
    * every ``checkpoint_every`` commits the full replayed mapping is
      written to ``<N:020d>.checkpoint.json`` and advertised in
      ``_last_checkpoint``, so readers replay O(checkpoint_every) files
      instead of the whole history; a checkpoint attempt that finds ANY
      unreadable commit at-or-below its version aborts rather than
      finalizing past it (a checkpoint must never drop a commit);
    * nothing is ever modified in place — a crash mid-commit leaves at
      worst an unreferenced temp file, and a commit file, once visible
      under its numbered name, is always complete (the claim IS the
      publish, with content).

    Unlike ``JsonCatalog`` (last-writer-wins pointer file) this gives
    concurrent committers serialized, lossless history — the semantics
    a real Iceberg/Delta/Glue binding provides, demonstrated without
    jars.
    """

    LOG_DIR = "_fts_log"

    def __init__(self, checkpoint_every: int = 10, max_retries: int = 50):
        self.checkpoint_every = checkpoint_every
        self.max_retries = max_retries

    def _log_dir(self, path: str) -> str:
        return os.path.join(path, self.LOG_DIR)

    def _commit_versions(self, log: str):
        try:
            names = os.listdir(log)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.endswith(".json") and not n.endswith(".checkpoint.json"):
                try:
                    out.append(int(n[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def _checkpoint_start(self, log: str):
        """(first commit version to replay, starting state)."""
        lc = os.path.join(log, "_last_checkpoint")
        try:
            with open(lc) as fh:
                ver = int(json.load(fh)["version"])
            with open(os.path.join(log, f"{ver:020d}.checkpoint.json")) as fh:
                return ver + 1, json.load(fh)
        except (OSError, ValueError, KeyError, json.JSONDecodeError):
            return 0, {}

    def _state(self, path: str) -> Dict[str, str]:
        log = self._log_dir(path)
        start, state = self._checkpoint_start(log)
        for ver in self._commit_versions(log):
            if ver < start:
                continue
            try:
                with open(os.path.join(log, f"{ver:020d}.json")) as fh:
                    state.update(json.load(fh).get("swap", {}))
            except (OSError, json.JSONDecodeError):
                # a commit file exists the instant open("x") succeeds;
                # an unreadable one is a concurrent writer mid-flush —
                # treat as empty (its swap just isn't visible yet)
                pass
        return state

    def resolve(self, path: str, name: str) -> Optional[str]:
        return self._state(path).get(name)

    def latest_version(self, path: str) -> Optional[int]:
        """Highest committed log version, or None for an empty log."""
        versions = self._commit_versions(self._log_dir(path))
        return versions[-1] if versions else None

    def state_at(self, path: str, version: int) -> Dict[str, str]:
        """Snapshot of the name -> directory mapping as of log commit
        ``version`` (inclusive) — Iceberg/Delta time travel over the
        append-only log. Replays from commit 0 (checkpoints are NOT
        used: a checkpoint may compact state past ``version``).
        Raises for a version the log has never committed. Reading the
        returned directories requires them to still exist — run with
        ``SPARK_GRAFT_RETAIN_VERSIONS=1`` so gc_superseded keeps
        superseded generations (see :func:`pinned_version`)."""
        log = self._log_dir(path)
        versions = self._commit_versions(log)
        if not versions or version > versions[-1] or version < 0:
            raise ValueError(
                f"log at {path} has no commit {version} "
                f"(latest: {versions[-1] if versions else None})"
            )
        state: Dict[str, str] = {}
        for ver in versions:
            if ver > version:
                break
            try:
                with open(os.path.join(log, f"{ver:020d}.json")) as fh:
                    state.update(json.load(fh).get("swap", {}))
            except (OSError, json.JSONDecodeError) as exc:
                # unlike _state's latest-read (where an unreadable file
                # is a concurrent writer mid-flush whose swap simply
                # isn't visible yet), a historical commit the version
                # check confirmed exists is complete by protocol — an
                # unreadable one is real corruption, and silently
                # skipping it would return a WRONG snapshot
                raise ValueError(
                    f"commit {ver} in {log} is unreadable ({exc}); "
                    "refusing to synthesize a wrong snapshot"
                )
        return state

    def swap(self, path: str, mapping: Dict[str, str]) -> None:
        log = self._log_dir(path)
        os.makedirs(log, exist_ok=True)
        # payload becomes durable BEFORE any claim: the hard link below
        # publishes claim + content in one atomic step, so a numbered
        # commit file, once visible, is always complete (no reader or
        # checkpoint can observe a claimed-but-empty commit, and a
        # crash mid-commit loses nothing but an unreferenced temp file)
        tmp = os.path.join(log, f".commit-{os.getpid()}-{id(mapping)}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"swap": mapping}, fh, indent=1)
        try:
            for _ in range(self.max_retries):
                versions = self._commit_versions(log)
                ver = (versions[-1] + 1) if versions else 0
                target = os.path.join(log, f"{ver:020d}.json")
                try:
                    # atomic CREATE-IF-ABSENT with content: exactly one
                    # writer can win version `ver`
                    os.link(tmp, target)
                except FileExistsError:
                    continue  # lost the race — replay moved on, retry
                if (ver + 1) % self.checkpoint_every == 0:
                    self._write_checkpoint(log, ver)
                return
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        raise RuntimeError(
            f"could not claim a log version after {self.max_retries} "
            "attempts (log under heavy concurrent commit load?)"
        )

    def _write_checkpoint(self, log: str, ver: int) -> None:
        # best-effort: a failed/aborted checkpoint only costs replay
        # length — but it must NEVER finalize past a commit it could
        # not read (that would drop the commit's swap from every
        # checkpoint-based read), so any unreadable commit at-or-below
        # `ver` aborts the attempt; the next eligible swap retries.
        try:
            start, state = self._checkpoint_start(log)
            for v in self._commit_versions(log):
                if start <= v <= ver:
                    with open(os.path.join(log, f"{v:020d}.json")) as fh:
                        state.update(json.load(fh).get("swap", {}))
            cp = os.path.join(log, f"{ver:020d}.checkpoint.json")
            tmp = cp + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(state, fh, indent=1)
            os.replace(tmp, cp)
            lc_tmp = os.path.join(log, "_last_checkpoint.tmp")
            with open(lc_tmp, "w") as fh:
                json.dump({"version": ver}, fh)
            os.replace(lc_tmp, os.path.join(log, "_last_checkpoint"))
        except (OSError, ValueError):
            pass


_CATALOG_ADAPTER: CatalogAdapter = JsonCatalog()


def set_catalog(adapter: CatalogAdapter) -> CatalogAdapter:
    """Install a catalog adapter (returns the previous one). Pass a
    real-catalog binding here when running against Iceberg/Delta."""
    global _CATALOG_ADAPTER
    prev = _CATALOG_ADAPTER
    _CATALOG_ADAPTER = adapter
    return prev


_PINNED = threading.local()


@contextmanager
def pinned_version(path: str, version: int):
    """Time travel: inside the block, every ``table_path`` resolution
    for ``path`` uses the catalog state as of log commit ``version``
    instead of the latest — so ``load_index``/queries read the index
    exactly as it was then (Iceberg snapshot-read semantics).

    Requires a catalog with commit history (``DeltaLogCatalog``) and
    retained generation directories (``SPARK_GRAFT_RETAIN_VERSIONS=1``
    while writing — gc_superseded deletes them otherwise, exactly as
    Iceberg snapshots expire once their files are vacuumed). Pins are
    thread-local and nest (inner pin wins, outer restored on exit).

    Compressed segment files are NOT catalog-versioned — query a
    pinned index relationally (``FtsEngine(idx, use_segments=False)``).
    The pin only needs to span index LOADING: table paths resolve
    eagerly into the plan, Spark evaluates lazily, so the returned
    DataFrames keep reading the snapshot after the block exits.
    """
    if not hasattr(_CATALOG_ADAPTER, "state_at"):
        raise ValueError(
            "pinned_version needs a catalog with commit history "
            "(DeltaLogCatalog); the active adapter "
            f"{type(_CATALOG_ADAPTER).__name__} keeps none"
        )
    state = _CATALOG_ADAPTER.state_at(path, version)
    # compaction (upsert.compact_index) folds every delta generation
    # into a fresh base, resets the generation counter and removes the
    # delta/tombstone dirs — the VACUUM operation. A snapshot that
    # DEPENDS on delta generations (@delta_gen > 0) from before it is
    # physically unreconstructable (a later upsert would even reuse
    # generation numbers), so such a pin across a compaction epoch must
    # fail loudly instead of returning wrong rows — the Iceberg
    # expired-snapshot error, not a silent resurrection. Delta-free
    # snapshots (@delta_gen == 0) read only versioned base dirs, which
    # retention keeps reconstructable across compactions, so they stay
    # pinnable. Each compaction writes a fresh NONCE as its epoch
    # (never a read-modify-write counter), so two racing compactions
    # cannot collide on the same epoch value and mask each other.
    cur_epoch = _CATALOG_ADAPTER.resolve(path, "@epoch") or "0"
    if (
        int(state.get("@delta_gen", "0") or 0) > 0
        and state.get("@epoch", "0") != cur_epoch
    ):
        raise ValueError(
            f"snapshot {version} depends on delta generations from a "
            f"compaction epoch other than {cur_epoch} (compact_index "
            "is the vacuum: it physically folds the delta generations "
            "older pins depend on) — the snapshot is expired"
        )
    # without SPARK_GRAFT_RETAIN_VERSIONS, gc_superseded deletes the
    # versioned base dirs a snapshot maps to; verify they still exist
    # so a vacuumed pin fails HERE with the expired-snapshot error, not
    # later as a missing-path crash deep inside a Spark scan
    missing = [
        f"{name} -> {dirname}"
        for name, dirname in state.items()
        if not name.startswith("@")
        and not os.path.isdir(os.path.join(path, dirname))
    ]
    if missing:
        raise ValueError(
            f"snapshot {version} is expired: its table directories "
            f"were vacuumed ({', '.join(sorted(missing))}); write with "
            "SPARK_GRAFT_RETAIN_VERSIONS=1 to keep snapshots readable"
        )
    key = os.path.abspath(path)
    maps = getattr(_PINNED, "maps", None)
    if maps is None:
        maps = _PINNED.maps = {}
    prev = maps.get(key)
    maps[key] = state
    try:
        yield state
    finally:
        if prev is None:
            del maps[key]
        else:
            maps[key] = prev


def table_path(path: str, name: str) -> str:
    """Resolve a logical table name to its current directory — or, under
    an active :func:`pinned_version` block for this ``path``, to the
    directory the pinned snapshot mapped it to."""
    maps = getattr(_PINNED, "maps", None)
    if maps:
        state = maps.get(os.path.abspath(path))
        if state is not None:
            return os.path.join(path, state.get(name) or name)
    return os.path.join(path, _CATALOG_ADAPTER.resolve(path, name) or name)


def version_dir(path: str, name: str, gen: int) -> str:
    """Directory a new version of ``name`` should be written to."""
    return os.path.join(path, f"{name}.v{gen}")


def next_version(path: str, name: str) -> int:
    """Smallest unused generation number for ``name`` (scans existing
    ``<name>.v*`` directories and the catalog)."""
    import glob

    used = [0]
    for d in glob.glob(os.path.join(path, f"{name}.v*")):
        try:
            used.append(int(d.rsplit(".v", 1)[1]))
        except ValueError:
            pass
    cur = _CATALOG_ADAPTER.resolve(path, name) or ""
    if ".v" in cur:
        try:
            used.append(int(cur.rsplit(".v", 1)[1]))
        except ValueError:
            pass
    return max(used) + 1


def pinned_state(path: str) -> Optional[Dict[str, str]]:
    """The snapshot mapping pinned for ``path`` by an enclosing
    :func:`pinned_version` block, or None when reading latest."""
    maps = getattr(_PINNED, "maps", None)
    if maps:
        return maps.get(os.path.abspath(path))
    return None


def publish(
    path: str,
    updates: Dict[str, int],
    extra: Optional[Dict[str, str]] = None,
) -> Dict[str, Optional[str]]:
    """Atomically point each table at its new generation directory.

    ``updates`` maps table name -> generation written via
    ``version_dir``. ``extra`` adds raw marker entries to the same
    commit (e.g. ``@delta_gen``, the delta high-water mark a pinned
    snapshot read filters by — ``@``-prefixed keys are never table
    names, so they ride the catalog inertly). Returns the superseded
    directory per table (None when there was none) for
    ``gc_superseded``.
    """
    old: Dict[str, Optional[str]] = {}
    mapping: Dict[str, str] = dict(extra or {})
    for name, gen in updates.items():
        prev = _CATALOG_ADAPTER.resolve(path, name)
        # bare <name> dirs (gen-0 base) are also superseded targets
        if prev is None and os.path.isdir(os.path.join(path, name)):
            prev = name
        new = f"{name}.v{gen}"
        # never hand the just-published directory to gc_superseded: a
        # caller that (wrongly) re-publishes a live generation must not
        # get its only copy deleted
        old[name] = None if prev == new else prev
        mapping[name] = new
    _CATALOG_ADAPTER.swap(path, mapping)
    return old


def gc_superseded(path: str, old: Dict[str, Optional[str]]) -> None:
    """Best-effort removal of superseded version directories (call only
    after ``publish`` returned them).

    ``SPARK_GRAFT_RETAIN_VERSIONS=1`` (or any non-``0`` value) skips
    removal so historical snapshots stay readable via
    :func:`pinned_version` — the Iceberg retention analog; a real
    deployment would expire by age instead of keeping everything."""
    if os.environ.get("SPARK_GRAFT_RETAIN_VERSIONS", "0") not in ("0", ""):
        return
    for prev in old.values():
        if prev:
            shutil.rmtree(os.path.join(path, prev), ignore_errors=True)
