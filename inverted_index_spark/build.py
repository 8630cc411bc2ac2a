"""Distributed index build: documents -> postings / docstats / termdict.

Pipeline (SURVEY.md §3 write path, re-architected for Spark):

    docs(doc_id, text, ...)
      -> tokenize pandas UDF (Arrow batch, the only Python on executors)
      -> explode to (doc_id, term, begin, end, pos, full)
      -> groupBy(term, doc_id): sorted position array + tf
      -> repartition by hashed term bucket, sortWithinPartitions(term, doc_id)
      -> parquet (predicate pushdown on term prunes row-groups at query time)

Replaces the reference's per-token BTreeMap insertion loop
(/root/reference/src/index.rs:35-63) with one shuffle. Positions arrive
pre-sorted per (term, doc_id) via sort_array over (begin, end, pos) —
the same order the reference maintains via binary-search insertion
(util/coalesce.rs:64-73); no build-time merging is possible because a
term occurs at most once per token ordinal (see ARCHITECTURE.md §parity).

Skew note (10^12-turn design point): groupBy(term, doc_id) keys are
fine-grained, so Zipf-hot terms spread across reducers; partial
aggregation handles the per-term rollups (termdict). The heavy per-term
posting-list assembly for compressed segments uses explicit salting in
segments.py.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .udfs import make_tokenize_udf

POSITION_STRUCT = "struct<begin:int,end:int,pos:int>"


@dataclass
class FtsIndex:
    """Handle to the three index tables + corpus-level stats.

    postings: term, doc_id, positions (sorted array), tf (full-token
              occurrences; 0 when the term appears only as a proper
              ngram prefix of longer tokens)
    docstats: doc_id, doclen_bytes, doclen_tokens
    termdict: term, df (ngram doc freq), df_full (full-token doc freq)
    docs:     original document table (doc_id, text, ...)
    """

    postings: DataFrame
    docstats: DataFrame
    termdict: DataFrame
    docs: Optional[DataFrame]
    n_docs: int
    avgdl: float  # mean doclen_tokens (BM25 dl normalization)
    ngrams: bool = True
    # directory of the saved index (None for in-memory builds): lets
    # FtsEngine discover fresh compressed segments and route BM25 calls
    # to the WAND scale path automatically
    path: Optional[str] = None


def _validate_docs(docs: DataFrame, caller: str) -> None:
    """Fail fast with a readable message instead of a deep Catalyst
    analysis error when the corpus DataFrame has the wrong shape."""
    fields = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    missing = [c for c in ("doc_id", "text") if c not in fields]
    if missing:
        raise ValueError(
            f"{caller}: corpus is missing column(s) {missing}; "
            f"need (doc_id: bigint, text: string), got {sorted(fields)}"
        )
    if fields["doc_id"] not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"{caller}: doc_id must be an integer type, got "
            f"{fields['doc_id']} (cast it, e.g. "
            "docs.withColumn('doc_id', col('doc_id').cast('long')))"
        )
    if fields["text"] != "string":
        raise ValueError(
            f"{caller}: text must be string, got {fields['text']}"
        )


def tokenize_docs(docs: DataFrame, ngrams: bool = True) -> DataFrame:
    """doc rows -> one row per analyzed term occurrence."""
    tokenize = make_tokenize_udf(ngrams=ngrams)
    return (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("t"))
        .select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.begin").alias("begin"),
            F.col("t.end").alias("end"),
            F.col("t.pos").alias("pos"),
            F.col("t.full").alias("full"),
        )
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    ngrams: bool = True,
    term_buckets: Optional[int] = None,
) -> FtsIndex:
    """Build the index tables from a document DataFrame.

    ``docs`` must have (doc_id: long, text: string); extra columns ride
    along in the doc store. ``term_buckets`` controls the physical
    partitioning of the postings table (defaults to shuffle parallelism).
    """
    _validate_docs(docs, "build_index")
    if term_buckets is None:
        term_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    tokens = tokenize_docs(docs, ngrams=ngrams)

    postings = (
        tokens.groupBy("term", "doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("begin", "end", "pos"))
            ).alias("positions"),
            F.sum(F.when(F.col("full"), 1).otherwise(0)).cast("int").alias("tf"),
        )
        # co-locate each term's posting list; sorted (term, doc_id) within
        # files gives parquet min/max pruning for term-range scans
        .repartition(term_buckets, F.col("term"))
        .sortWithinPartitions("term", "doc_id")
    )

    docstats = docs.select(
        "doc_id",
        F.octet_length("text").alias("doclen_bytes"),
    ).join(
        tokens.filter(F.col("full"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("doclen_tokens")),
        "doc_id",
        "left",
    ).fillna({"doclen_tokens": 0})

    termdict = postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).cast("long").alias("df_full"),
        F.sum("tf").cast("long").alias("cf"),
    )

    stats = docstats.agg(
        F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl")
    ).collect()[0]

    return FtsIndex(
        postings=postings,
        docstats=docstats,
        termdict=termdict,
        docs=docs,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
        ngrams=ngrams,
    )


_BUILD_DIRS = ("postings", "docstats", "termdict_partials", "build_tasks")


def _build_fingerprint(
    docs: DataFrame, ngrams: bool, term_buckets: int, layout: str
) -> Optional[str]:
    """sha1 over the corpus input files (+ local size/mtime) and the
    build parameters. None when the corpus has no file lineage (pure
    in-memory DataFrame) — input equality across runs can't be
    certified then, so resume is disabled and the build runs in full."""
    import hashlib
    from urllib.parse import unquote, urlparse

    try:
        files = sorted(docs.inputFiles())
    except Exception:
        files = []
    if not files:
        return None
    h = hashlib.sha1()
    for f in files:
        h.update(f.encode())
        if f.startswith("file:"):
            p = unquote(urlparse(f).path)
            try:
                st = os.stat(p)
                h.update(f"|{st.st_size}|{st.st_mtime_ns}".encode())
            except OSError:
                return None
    h.update(
        json.dumps(
            [bool(ngrams), int(term_buckets), layout,
             docs.schema.simpleString()]
        ).encode()
    )
    return h.hexdigest()


def _manifest_matches(path: str, fp: str) -> bool:
    try:
        with open(os.path.join(path, "build_manifest.json")) as fh:
            return json.load(fh).get("fingerprint") == fp
    except (OSError, ValueError):
        return False


def _write_build_manifest(
    path: str,
    fp: Optional[str],
    job_start: float,
    *,
    ngrams: bool,
    term_buckets: int,
    layout: str,
) -> None:
    """Fold the per-task sidecars into ``build_manifest.json``: build
    lineage (fingerprint, params, per-task file lists) + metrics
    (postings/sec per task, bytes, skew_ratio). A sidecar older than
    this job's start was a checkpoint hit (the task skipped)."""
    task_dir = os.path.join(path, "build_tasks")
    tasks = []
    resumed = 0
    for name in sorted(os.listdir(task_dir)):
        if not name.endswith(".json"):
            continue
        p = os.path.join(task_dir, name)
        with open(p) as fh:
            t = json.load(fh)
        t["resumed"] = os.stat(p).st_mtime < job_start
        resumed += int(t["resumed"])
        tasks.append(t)
    counts = [t["n_postings"] for t in tasks if t["n_postings"] > 0]
    fresh = [t["elapsed_sec"] for t in tasks if not t["resumed"]]
    manifest = {
        "fingerprint": fp,
        "ngrams": bool(ngrams),
        "term_buckets": int(term_buckets),
        "layout": layout,
        "n_tasks": len(tasks),
        "resumed_tasks": resumed,
        "total_docs": sum(t["n_docs"] for t in tasks),
        "total_postings": sum(t["n_postings"] for t in tasks),
        "total_postings_bytes": sum(t["postings_bytes"] for t in tasks),
        "skew_ratio": (
            round(max(counts) / (sum(counts) / len(counts)), 3)
            if counts
            else 1.0
        ),
        "task_elapsed_max_sec": round(max(fresh), 4) if fresh else 0.0,
        "tasks": tasks,
    }
    tmp = os.path.join(path, "build_manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(path, "build_manifest.json"))


def load_build_manifest(path: str) -> Optional[dict]:
    """Per-task lineage + metrics of the last ``build_and_save`` at
    ``path`` (kernel-direct builds only); None when absent."""
    try:
        with open(os.path.join(path, "build_manifest.json")) as fh:
            return json.load(fh)
    except OSError:
        return None


def build_and_save(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    ngrams: bool = True,
    term_buckets: Optional[int] = None,
    salt: int = 8,
    store_docs: bool = True,
    layout: str = "doc",
    resume: bool = False,
) -> FtsIndex:
    """Build and persist the index with a SINGLE tokenize pass.

    ``build_index`` + ``save_index`` would re-run the tokenizer UDF once
    per derived table (postings, docstats, termdict all share the tokens
    lineage). At scale the tokenize pass dominates, so here the postings
    table is written first and everything else is derived from the
    written parquet:

      * termdict = groupBy(term) over postings (cheap columnar scan,
        positions column pruned away);
      * doclen_tokens = sum(tf) per doc over postings (tf counts full
        tokens in both modes, so this equals the token count);
      * doclen_bytes = the per-doc stat rows (term='') the assembly
        kernel emits into the postings files — so docstats needs NO
        second scan of the corpus.

    ``store_docs=False`` skips copying the document table into the index
    (at 10^12 turns the corpus is the lakehouse table itself — the index
    should reference, not duplicate it); the returned handle keeps the
    caller's ``docs`` DataFrame for highlight/doc-store lookups.

    Physical layout (``layout=``):

    * ``"doc"`` (default) — postings stay in their map task's doc slice
      and are only SORTED by (term, doc_id) within each file: **zero
      postings shuffle**. A query term touches every file but prunes to
      1-2 row groups per file via parquet min/max stats on the sorted
      term column. This matches the doc-range segment philosophy
      (uniform partitions regardless of term skew — a Zipf-hot term
      spreads over all files by construction) and removes the build's
      largest exchange (the assembled postings are ~4-5x the byte
      volume of the raw text).
    * ``"term"`` — an explicit ``(term, salt(doc_id))`` repartition
      co-locates each term's postings in one bucket (tighter pruning:
      a term touches 1-2 files). The salt caps a hot term's share of
      any partition at ~1/salt, so the Zipf head cannot create a
      straggler task or a giant file. Worth the shuffle when the
      postings table itself (not the compressed segments) serves
      latency-critical queries.

    ``resume=True`` restarts a failed build from its per-partition
    checkpoints (kernel-direct path only): tasks whose
    ``build_tasks/part-<pid>.json`` sidecar certifies complete output
    files skip without re-reading their slice of the corpus, so the
    re-run costs O(unfinished partitions). A corpus fingerprint
    (input files + sizes + build parameters, recorded in
    ``build_manifest.json``) guards the assumption that the input is
    unchanged — any mismatch falls back to a full rebuild. Every
    direct-write build (resumed or not) records per-task lineage and
    metrics (docs, postings, bytes, elapsed, postings/sec) plus
    aggregate throughput and skew_ratio in ``build_manifest.json``.
    """
    _validate_docs(docs, "build_and_save")
    if term_buckets is None:
        term_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # Resume decision BEFORE any write: the fingerprint certifies the
    # corpus input files (and build params) are those of the
    # checkpointed build recorded in build_manifest.json.
    fp = _build_fingerprint(docs, ngrams, term_buckets, layout)
    do_resume = resume and fp is not None and _manifest_matches(path, fp)

    # With store_docs, materialize the doc store FIRST and tokenize the
    # re-read files: if the incoming lineage contains evaluation-order
    # nondeterminism (e.g. freshly assigned doc ids), re-computing it
    # per derived table would let tables disagree on ids. Without
    # store_docs the corpus is scanned exactly once (postings write) and
    # every other table derives from that one materialization, so
    # consistency holds either way. On a certified resume the store from
    # the checkpointed run is reused as-is (its _SUCCESS marker proves
    # the overwrite committed) — rewriting it would touch every file
    # mtime and defeat the per-partition skip.
    if store_docs:
        docs_dir = os.path.join(path, "docs")
        if not (
            do_resume
            and os.path.exists(os.path.join(docs_dir, "_SUCCESS"))
        ):
            docs.write.mode("overwrite").parquet(docs_dir)
        docs = spark.read.parquet(docs_dir)

    # Tokenize AND assemble posting lists in one map pass: postings are
    # doc-local (all occurrences of a term in a doc sit in the same
    # batch), so there is nothing to shuffle before assembly — the
    # exploded-token shuffle + collect_list of the naive plan
    # (build_index) is pure overhead at scale. The only shuffle left is
    # the (term, salt) layout repartition of the assembled rows.
    # Both index flavors use the batch-vectorized mapInArrow kernel
    # (arrow_build.py, no per-token Python): ngrams=True expands edge
    # n-grams with numpy arithmetic (the reference's index-time
    # lowercase_ngrams chain, tokenizers.rs:288-293). The explicit
    # repartition before the UDF pins the tokenizer stage's
    # parallelism (file-split coalescing of a small-but-dense text
    # table must not serialize it).
    from .arrow_build import make_assemble_postings_arrow
    from .udfs import POSTINGS_ROW_SCHEMA

    src = docs.select("doc_id", "text").repartition(term_buckets, F.col("doc_id"))
    kernel_sort = layout == "doc" and os.environ.get(
        "SPARK_GRAFT_KERNEL_SORT", "1"
    ) not in ("0", "false")
    # Kernel-direct writes land files via plain pyarrow on the machine
    # the task runs on — correct only when executors and driver share
    # `path`'s filesystem. local[...] masters qualify; on a real cluster
    # set SPARK_GRAFT_SHARED_FS=1 iff `path` is on a shared mount (NFS/
    # FUSE-mounted object store), otherwise the build falls back to the
    # kernel-sort + JVM writer path, which commits through Spark's
    # driver-coordinated output protocol.
    shared_fs_env = os.environ.get("SPARK_GRAFT_SHARED_FS")
    if shared_fs_env is not None:
        shared_fs = shared_fs_env not in ("0", "false")
    else:
        shared_fs = spark.sparkContext.master.startswith("local")
    direct_write = (
        kernel_sort
        and shared_fs
        and os.environ.get("SPARK_GRAFT_DIRECT_WRITE", "1")
        not in ("0", "false")
    )
    if direct_write:
        # kernel-direct sink: the sorted-assembly kernel writes its
        # partition's postings parquet, final docstats and termdict
        # partials itself (columnar arrow -> pyarrow writer), skipping
        # arrow->JVM IPC, InternalRow conversion and the JVM parquet
        # encoder (cf. segments._write_shard); only the tiny termdict
        # partial merge remains a Spark job
        import shutil as _shutil

        from .arrow_build import make_write_index_arrow

        if not do_resume:
            for name in _BUILD_DIRS:
                _shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        for name in _BUILD_DIRS:
            os.makedirs(os.path.join(path, name), exist_ok=True)
        import time as _time

        job_start = _time.time()
        src.mapInArrow(
            make_write_index_arrow(ngrams, path, resume=do_resume),
            schema="pid int, rows long",
        ).collect()
        _write_build_manifest(
            path, fp, job_start,
            ngrams=ngrams, term_buckets=term_buckets, layout=layout,
        )
    elif kernel_sort:
        # doc layout keeps assembly output in its final partition, so
        # the (term, doc_id) sort can happen inside the kernel on
        # columnar arrow buffers (make_assemble_sorted_arrow) — the JVM
        # side becomes a straight arrow -> parquet pipeline with no row
        # sort at all
        from .arrow_build import make_assemble_sorted_arrow

        assembled = src.mapInArrow(
            make_assemble_sorted_arrow(ngrams), schema=POSTINGS_ROW_SCHEMA
        )
    else:
        assembled = src.mapInArrow(
            make_assemble_postings_arrow(ngrams), schema=POSTINGS_ROW_SCHEMA
        )
        if layout == "term":
            assembled = assembled.repartition(
                term_buckets,
                F.col("term"),
                F.pmod(F.xxhash64("doc_id"), F.lit(max(salt, 1))),
            )
        assembled = assembled.sortWithinPartitions("term", "doc_id")
    if not direct_write:
        # JVM-writer paths rewrite the tables wholesale: drop any
        # checkpoint state a previous direct-write build left behind so
        # a later resume can never trust stale sidecars
        import shutil as _shutil

        _shutil.rmtree(os.path.join(path, "build_tasks"), ignore_errors=True)
        try:
            os.remove(os.path.join(path, "build_manifest.json"))
        except OSError:
            pass
        assembled.write.mode("overwrite").parquet(
            os.path.join(path, "postings")
        )
    raw = spark.read.parquet(os.path.join(path, "postings"))
    postings = raw.filter(F.col("term") != "")

    if direct_write:
        # docstats were written final per partition by the kernel;
        # termdict only needs the partial merge (one row per distinct
        # term per partition — orders of magnitude smaller than the
        # postings scan the non-direct path aggregates over)
        tp_dir = os.path.join(path, "termdict_partials")
        has_partials = os.path.isdir(tp_dir) and any(
            f.endswith(".parquet") for f in os.listdir(tp_dir)
        )
        if has_partials:
            (
                spark.read.parquet(tp_dir)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("df_full").cast("long").alias("df_full"),
                    F.sum("cf").cast("long").alias("cf"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(path, "termdict"))
            )
            # partials stay on disk: they are the termdict's
            # per-partition checkpoint. A resume that re-runs a subset
            # of tasks (crash, or repair of lost partition files)
            # overwrites only those tasks' partial files and re-merges
            # the full set — deleting them here would make any partial
            # re-run unable to rebuild a complete termdict. Size is one
            # row per (partition, distinct term): noise next to
            # postings.
        # else: resume of an index whose partials were merged by an
        # older engine version and deleted — every task skipped
        # (sidecars complete) and the previously merged termdict is live
    else:
        postings.groupBy("term").agg(
            F.count("*").cast("long").alias("df"),
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
            .cast("long")
            .alias("df_full"),
            F.sum("tf").cast("long").alias("cf"),
        ).write.mode("overwrite").parquet(os.path.join(path, "termdict"))

        (
            raw.filter(F.col("term") == "")
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
            .parquet(os.path.join(path, "docstats"))
        )
    docstats = spark.read.parquet(os.path.join(path, "docstats"))

    stats = docstats.agg(
        F.count("*").alias("n"), F.avg("doclen_tokens").alias("avgdl")
    ).collect()[0]
    meta = {
        "n_docs": int(stats["n"]),
        "avgdl": float(stats["avgdl"] or 0.0),
        "ngrams": ngrams,
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)

    return FtsIndex(
        postings=postings,
        docstats=docstats,
        termdict=spark.read.parquet(os.path.join(path, "termdict")),
        docs=docs,
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        ngrams=ngrams,
        path=path,
    )


def save_index(index: FtsIndex, path: str) -> None:
    """Persist index tables as parquet + JSON meta (Iceberg-style layout:
    data files + a small metadata document; swap-in a real catalog by
    replacing these writes with table commits)."""
    index.postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
    index.docstats.write.mode("overwrite").parquet(os.path.join(path, "docstats"))
    index.termdict.write.mode("overwrite").parquet(os.path.join(path, "termdict"))
    index.docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))
    meta = {"n_docs": index.n_docs, "avgdl": index.avgdl, "ngrams": index.ngrams}
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_index(
    spark: SparkSession, path: str, docs: Optional[DataFrame] = None
) -> FtsIndex:
    """Load a persisted index. ``docs`` supplies the document table when
    the index was built with ``store_docs=False`` (the doc store then
    lives in the caller's lakehouse, not the index directory)."""
    from . import commitio

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    docs_dir = commitio.table_path(path, "docs")
    if docs is None and os.path.exists(docs_dir):
        docs = spark.read.parquet(docs_dir)
    if int(meta.get("generation", 0)) > 0:
        # live upsert / stream-compaction delta generations: serve the
        # generation-filtered merged view (upsert.py) so readers never
        # see superseded postings or miss appended ones
        from .upsert import merged_postings

        postings = merged_postings(spark, path).filter(F.col("term") != "")
    else:
        postings = spark.read.parquet(
            commitio.table_path(path, "postings")
        ).filter(F.col("term") != "")
    docstats_dir = commitio.table_path(path, "docstats")
    docstats = spark.read.parquet(docstats_dir)
    if commitio.pinned_state(path) is not None:
        # time travel: meta.json is live and unversioned, so its
        # n_docs/avgdl describe the CURRENT corpus — derive the
        # snapshot's statistics from the pinned docstats instead, or
        # BM25 idf/length-normalization would mix epochs. Driver-side
        # pyarrow read (docstats is one small table), no Spark job —
        # same pattern as metacache.docstats_total_tokens. Storage
        # Spark can read but pyarrow can't (custom Hadoop FS, no
        # fsspec handler) falls back to the Spark aggregate.
        try:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            t = pq.read_table(docstats_dir, columns=["doclen_tokens"])
            n_docs = int(t.num_rows)
            avgdl = (
                float(pc.mean(t.column("doclen_tokens")).as_py() or 0.0)
                if n_docs
                else 0.0
            )
        except Exception:
            stats = docstats.agg(
                F.count("*").alias("n"),
                F.avg("doclen_tokens").alias("avgdl"),
            ).collect()[0]
            n_docs = int(stats["n"])
            avgdl = float(stats["avgdl"] or 0.0)
    else:
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    return FtsIndex(
        # stat rows (term='', build_and_save) never match a real term
        # but must not surface as postings
        postings=postings,
        docstats=docstats,
        termdict=spark.read.parquet(commitio.table_path(path, "termdict")),
        docs=docs,
        n_docs=n_docs,
        avgdl=avgdl,
        ngrams=meta["ngrams"],
        path=path,
    )


def upsert_docs(spark: SparkSession, index: FtsIndex, new_docs: DataFrame) -> FtsIndex:
    """Re-index changed documents (reference upsert, index.rs:36-51).

    Removes the previous versions' postings and inserts the new ones;
    the doc store keeps exactly one row per doc_id (previous versions
    dropped via anti-join — no driver-side collect of changed ids, so
    batch size is unbounded). This in-memory variant then rebuilds the
    merged doc set, which is correct at any size but intended for
    test/interactive scale; the incremental scale path is
    ``upsert.upsert_saved`` (delta generations + tombstones, no
    rebuild).
    """
    kept_docs = index.docs.join(
        new_docs.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    merged = kept_docs.unionByName(new_docs, allowMissingColumns=True)
    return build_index(spark, merged, ngrams=index.ngrams)
