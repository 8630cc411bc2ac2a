#!/usr/bin/env python
"""Headline benchmark: index build throughput + query latency.

Reads ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), reshapes
the documents table into the canonical transcript corpus (input_hint
shape), optionally amplifies it deterministically
(``$SPARK_GRAFT_BENCH_MULT`` copies per doc, default 8), builds the
production full-token BM25 index end-to-end (tokenize UDF -> postings
shuffle -> parquet segments + termdict + docstats), then times the
headline queries against the parquet-backed index.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., plus throughput fields (postings_built_per_sec etc.)}

Scaling evidence (north rule: efficiency >= 0.8 from N to 4N executors)
is produced by scripts/scaling_bench.py, which runs this file at two
parallelism levels in fresh JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def ambient_probe() -> dict:
    """One-shot probe of the two co-tenant interference channels this VM
    exhibits (documented in BENCH/BASELINE.md): memory bandwidth (128
    MiB numpy copy — ~10+ GB/s clean, observed down to ~2 GB/s during
    neighbor bandwidth burns) and CPU steal share over 1 s. Recorded in
    the output JSON so a degraded sample is attributable to the
    environment rather than a code regression."""
    import numpy as np

    a = np.ones(2 ** 24, dtype=np.float64)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        a.copy()
        samples.append(0.25 / (time.perf_counter() - t0))
    # cold = first copy (includes fresh-page faulting — the path Spark's
    # allocations take); warm = best of the re-used-allocation copies
    bw_cold, bw_warm = samples[0], max(samples[1:])

    def snap():
        with open("/proc/stat") as fh:
            v = list(map(int, fh.readline().split()[1:]))
        return v[7], sum(v[:8])

    try:
        s0, t_0 = snap()
        time.sleep(1)
        s1, t_1 = snap()
        steal = (s1 - s0) / max(t_1 - t_0, 1)
    except OSError:
        steal = -1.0
    return {
        "mem_bw_gbps": round(bw_cold, 2),
        "mem_bw_warm_gbps": round(bw_warm, 2),
        "steal_share": round(steal, 4),
    }


_BW_FLOOR_GBPS = float(os.environ.get("SPARK_GRAFT_BW_FLOOR", "1.0"))


def _ambient_degraded(before: dict, after: dict, factor: float = 2.0) -> bool:
    """True when the co-tenant memory-bandwidth probe collapsed across a
    timed section (the r3 failure mode: 5.36 -> 0.28 GB/s mid-run turned
    every query number into noise) OR the section ran entirely inside a
    steady burn (both probes under the absolute floor — clean cold-page
    bandwidth on this VM is 5-10+ GB/s, burns measure 0.15-0.4). A
    section whose probes agree within ``factor`` and clear the floor is
    considered clean."""
    b = before.get("mem_bw_gbps", 0.0)
    a = after.get("mem_bw_gbps", 0.0)
    if b <= 0 or a <= 0:
        return False
    return (
        min(a, b) < max(a, b) / factor
        or max(a, b) < _BW_FLOOR_GBPS
    )


def _wait_for_clean_ambient(ref_bw: float, tries: int = 6, sleep_s: float = 10.0) -> dict:
    """Block (bounded) until the bandwidth probe recovers to within 2x of
    a known-clean reference, so a retried section starts in a clean
    window instead of re-measuring inside the same burn."""
    want = max(ref_bw / 2, _BW_FLOOR_GBPS)
    probe = ambient_probe()
    while tries > 0 and probe["mem_bw_gbps"] < want:
        time.sleep(sleep_s)
        tries -= 1
        probe = ambient_probe()
    return probe


def run_guarded(section_fn, ref_bw: float, max_retries: int):
    """Run one timed section with interference accounting: probe
    ambient immediately before and after, retry (bounded) in a clean
    window when the section was contaminated (mid-section collapse or
    entirely under the burn floor). Returns
    (section result, [probe_before, probe_after], attempts, degraded).
    """
    attempts = 0
    while True:
        probe0 = (
            ambient_probe() if attempts == 0
            else _wait_for_clean_ambient(ref_bw)
        )
        result = section_fn()
        probe1 = ambient_probe()
        attempts += 1
        degraded = _ambient_degraded(probe0, probe1)
        if not degraded or attempts > max_retries:
            return result, [probe0, probe1], attempts, degraded


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "8"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from pyspark.sql import functions as F

    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.qast import (
        And,
        AndNot,
        AtLeast,
        Fuzzy,
        Match,
        Near,
        Or,
        Phrase,
        Prefix,
        Regex,
        Wildcard,
    )
    from inverted_index_spark.percolate import percolate
    from inverted_index_spark.query import FtsEngine
    from inverted_index_spark.session import get_spark
    from inverted_index_spark.transcripts import (
        conversation_topk,
        transcript_docs,
        transcripts_from_documents,
    )

    probe_start = ambient_probe()
    spark = get_spark("fts-bench", cores=cores)

    # The input corpus is a MATERIALIZED table (per input_hint: the
    # engine builds over an existing transcript table) — synthesize it
    # once per (sf, mult) into a cached parquet and read it back, so
    # corpus amplification never counts as build work and every bench
    # width reads identical bytes.
    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"fts_bench_corpus_{os.path.basename(sf_dir.rstrip('/'))}_{mult}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            # deterministic amplification: `mult` distinct doc ids per
            # source row, same text — scales the corpus, no external data
            reps = spark.range(mult).select(F.col("id").alias("rep"))
            base = base.crossJoin(reps).select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
            )
        transcripts = transcripts_from_documents(base)
        transcript_docs(transcripts).select(
            "doc_id", "text", "conv_id", "turn_idx", "role", "ts"
        ).write.mode("overwrite").parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)

    idx_path = os.path.join(tempfile.gettempdir(), f"fts_bench_idx_{cores}")
    shutil.rmtree(idx_path, ignore_errors=True)

    # spawn + warm the executor Python workers (pandas UDF runtime,
    # numpy/pandas imports) before the clock starts: worker spin-up is
    # a per-JVM one-time cost, not index-build throughput
    from inverted_index_spark.session import warm_python_workers

    warm_python_workers(spark)

    # identical logical plan at every width: a fixed partition count
    # (overridable) keeps per-width work equal for scaling comparisons
    buckets = int(os.environ.get("SPARK_GRAFT_BENCH_BUCKETS", "0")) or None

    max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "1"))

    def build_section():
        shutil.rmtree(idx_path, ignore_errors=True)
        t_wall0 = time.time()
        t0 = time.perf_counter()
        # store_docs=False: at the design scale the corpus IS the
        # lakehouse table — the index references it, not duplicates it
        build_and_save(
            spark, docs, idx_path, ngrams=False, store_docs=False,
            term_buckets=buckets,
        )
        return time.perf_counter() - t0, t_wall0, time.time()

    (build_sec, t_wall0, t_wall1), build_probes, build_attempts, \
        build_degraded = run_guarded(
            build_section, probe_start["mem_bw_gbps"], max_retries
        )

    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.wand import wand_topk, wand_topk_batch

    idx = load_index(spark, idx_path, docs=docs)
    n_docs = idx.n_docs
    n_postings = idx.postings.count()
    n_tokens = int(
        idx.docstats.agg(F.sum("doclen_tokens").alias("s")).collect()[0]["s"]
    )
    # eng = the user-facing API (routes BM25 + positional queries to the
    # segment paths when fresh); eng_df pins the relational DataFrame
    # fallback so its cost stays visible/comparable across rounds
    eng = FtsEngine(idx)
    eng_df = FtsEngine(idx, use_segments=False)

    if os.environ.get("SPARK_GRAFT_BENCH_ONLY_BUILD"):
        # scaling-bench mode: the metric is build throughput; skip the
        # query/segment timing so each sample is short and comparable
        print(
            json.dumps(
                {
                    "metric": "index_build_sec",
                    "value": round(build_sec, 3),
                    "unit": "sec",
                    "queries": {},
                    "sf": sf,
                    "cores": cores,
                    "amplification": mult,
                    "n_docs": n_docs,
                    "n_tokens": n_tokens,
                    "n_postings": n_postings,
                    "build_sec": round(build_sec, 3),
                    "postings_built_per_sec": round(n_postings / build_sec, 1),
                    "tokens_indexed_per_sec": round(n_tokens / build_sec, 1),
                    "build_started_epoch_ms": int(t_wall0 * 1000),
                    "build_ended_epoch_ms": int(t_wall1 * 1000),
                    "ambient_start": probe_start,
                    "ambient_end": ambient_probe(),
                    "ambient_build": build_probes,
                    "build_attempts": build_attempts,
                    "ambient_degraded": build_degraded,
                }
            )
        )
        shutil.rmtree(idx_path, ignore_errors=True)
        return

    t0 = time.perf_counter()
    manifest = build_segments(
        spark,
        idx,
        idx_path,
        shard_docs=max(n_docs // (4 * cores), 512),
        positions=True,
    )
    seg_sec = time.perf_counter() - t0
    enc_bytes = sum(s["enc_bytes"] for s in manifest["shards"])
    raw_bytes = sum(s["raw_bytes"] for s in manifest["shards"])

    # the bench measures the ENGINE: the coordinator request cache
    # would turn every interference-retry of the serve entries into a
    # cache hit and fake an improvement
    os.environ["SPARK_GRAFT_SERVE_CACHE"] = "0"

    def timed(fn) -> float:
        t = time.perf_counter()
        fn()
        return round(time.perf_counter() - t, 4)

    def force(df) -> int:
        """Fully evaluate a DataFrame: xxhash64 over EVERY column of
        EVERY row, bit-XORed (overflow-free under ANSI). ``count()`` is NOT a valid forcing action
        for these ops — Catalyst eliminates row-preserving left joins
        to provably-unique right sides (and any column-only work) under
        a bare count, so e.g. span_dedup(...).count() was measuring an
        empty plan (no md5, no join — verified round 5). A sum of row
        hashes cannot be pruned."""
        from pyspark.sql import functions as FF

        return df.select(
            FF.bit_xor(FF.xxhash64(*df.columns)).alias("h")
        ).collect()[0]["h"]

    from inverted_index_spark.segquery import (
        segment_phrase,
        segment_query,
        segment_query_batch,
        segment_query_pandas,
        segment_search,
    )
    from inverted_index_spark.wand import wand_topk_pandas
    from inverted_index_spark.multifield import (
        bm25f_topk,
        build_multifield_index,
    )
    from inverted_index_spark.pipelines.corpus import (
        bloom_contamination,
        pack_sequences,
    )
    from inverted_index_spark.pipelines.dedup import (
        chunk_text_lines,
        dedup_corpus,
        dup_spans,
        line_dedup,
        span_dedup,
    )
    from inverted_index_spark.pipelines.similarity import kmeans, knn_join
    from inverted_index_spark.pipelines.sketches import (
        group_quantiles,
        group_quantiles_approx,
    )
    from inverted_index_spark.pipelines.textstats import cooccurrence, lm_score
    from inverted_index_spark.transcripts import conversation_having

    # multi-field index (untimed setup, like the segment build): title
    # = first 8 tokens at 2x weight, body = full text; postings cached
    # so the bm25f entry times the QUERY plan, not a rebuild
    mf = build_multifield_index(
        spark,
        docs.select(
            "doc_id",
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 8), " "
            ).alias("title"),
            F.col("text").alias("body"),
        ),
        ["title", "body"],
        term_buckets=buckets,
    )
    for _fidx in mf.fields.values():
        _fidx.postings = _fidx.postings.cache()
        _fidx.docstats = _fidx.docstats.cache()
        _fidx.termdict = _fidx.termdict.cache()
        _fidx.postings.count()

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qvec = list(
        embs.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )

    # warm all query paths once (python workers, OS page cache for the
    # segment files, parquet footers) so per-query numbers measure the
    # engine, not JVM/worker spin-up
    eng.bm25("scan", k=1).collect()
    wand_topk(spark, idx_path, "scan", k=1).collect()
    segment_search(spark, idx_path, "scan", k=1).collect()
    wand_topk_pandas(idx_path, "scan", k=1)
    segment_query_pandas(idx_path, Match("scan"), k=1, with_positions=False)

    queries = {
        # headline names measure the ROUTED production path (FtsEngine
        # auto-routes positional queries to the segment evaluator when
        # segments are fresh); the *_df twins below pin the relational
        # DataFrame fallback so its cost stays visible across rounds
        "bm25_topk": lambda: eng.bm25("scan merge join", k=10).collect(),
        "match_topk": lambda: eng.search("merge", k=10).collect(),
        "and_query": lambda: eng.results(
            And(Match("scan"), Match("merge")), k=10, with_positions=False
        ).collect(),
        "or_query": lambda: eng.results(
            Or(Match("window"), Match("stream")), k=10, with_positions=False
        ).collect(),
        "phrase_query": lambda: eng.results(Phrase("batch batch"), k=10).collect(),
        "prefix_query": lambda: eng.results(
            Prefix("mer"), k=10, with_positions=False
        ).collect(),
        "match_df": lambda: eng_df.search("merge", k=10).collect(),
        "and_df": lambda: eng_df.results(
            And(Match("scan"), Match("merge")), k=10, with_positions=False
        ).collect(),
        "or_df": lambda: eng_df.results(
            Or(Match("window"), Match("stream")), k=10, with_positions=False
        ).collect(),
        "phrase_df": lambda: eng_df.results(Phrase("batch batch"), k=10).collect(),
        "prefix_df": lambda: eng_df.results(
            Prefix("mer"), k=10, with_positions=False
        ).collect(),
        "count_query": lambda: eng.count(And(Match("scan"), Match("merge"))),
        "wand_bm25": lambda: wand_topk(
            spark, idx_path, "scan merge join", k=10, mode="spark"
        ).collect(),
        # positional-segment-served parity/phrase (scale path: the raw
        # postings parquet is not touched)
        "match_seg": lambda: segment_search(
            spark, idx_path, "merge", k=10, mode="spark"
        ).collect(),
        "phrase_seg": lambda: segment_phrase(
            spark, idx_path, "batch batch", k=10, mode="spark"
        ).collect(),
        # compound algebra served from segments (round 3): And prunes to
        # the intersection of child shard sets before opening any file
        "and_seg": lambda: segment_query(
            spark, idx_path, And(Match("scan"), Match("merge")), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        "or_seg": lambda: segment_query(
            spark, idx_path, Or(Match("window"), Match("stream")), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        "prefix_seg": lambda: segment_query(
            spark, idx_path, Prefix("mer"), k=10, with_positions=False,
            mode="spark",
        ).collect(),
        # bounded negation (engine extension): shard-local subtraction,
        # the negative never widens the pruned shard set
        "andnot_seg": lambda: segment_query(
            spark, idx_path, AndNot(Match("merge"), Match("scan")), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        # ordered proximity (engine extension): windowed positional
        # kernel, same shard pruning as phrase
        "near_seg": lambda: segment_query(
            spark, idx_path, Near("scan merge", 3), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        # fuzzy (engine extension): driver-side termdict expansion
        # (metacache, memoized) -> exact-term pruned shard scan
        "fuzzy_seg": lambda: segment_query(
            spark, idx_path, Fuzzy("part", 2), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        # wildcard (engine extension): prefix-banded dictionary
        # expansion -> exact-term pruned shard scan
        "wildcard_seg": lambda: segment_query(
            spark, idx_path, Wildcard("s?a*"), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        # regex (engine extension): validated dialect-stable pattern,
        # literal-banded dictionary expansion -> exact-term pruned scan
        "regex_seg": lambda: segment_query(
            spark, idx_path, Regex("s[cp]a(n|rk)"), k=10,
            with_positions=False, mode="spark",
        ).collect(),
        # minimum-should-match (engine extension): per-shard vote
        # counting, shard pruning keeps shards in >= m children's sets
        "atleast_seg": lambda: segment_query(
            spark, idx_path,
            AtLeast(2, Match("scan"), Match("merge"), Match("join")),
            k=10, with_positions=False, mode="spark",
        ).collect(),
        # did-you-mean: one length-banded termdict scan, vocab-sized
        "suggest": lambda: eng.suggest("mereg scann", max_edits=2, k=3)
        .collect(),
        # unordered proximity: And-pruned candidates -> one
        # applyInPandas two-pointer pass (the Python-stage cost is the
        # honest number here — candidates are most of the synthetic
        # corpus since every term spans it)
        "min_window": lambda: eng.min_window("scan merge join", window=8)
        .count(),
        # reverse search over a 512-doc slice x 4 registered queries
        # (per-doc python matcher; cost scales linearly in docs)
        "percolate512": lambda: percolate(
            docs.filter(F.col("doc_id") < 512).select("doc_id", "text"),
            {"a": Match("scan"), "b": Phrase("merge join"),
             "c": AndNot(Match("stream"), Match("batch")),
             "d": AtLeast(2, Match("scan"), Match("merge"), Match("join"))},
        ).count(),
        # metadata-filtered BM25 (filter_docs pins the relational plan
        # inside the routed engine — exact filtered top-k by contract)
        "bm25_filtered": lambda: eng.bm25(
            "scan merge join", k=10,
            filter_docs=docs.filter(F.col("doc_id") % 2 == 0).select("doc_id"),
        ).collect(),
        # conversation-level ranking over the real transcript structure
        "conv_topk": lambda: conversation_topk(
            eng, docs.select("doc_id", "conv_id"),
            "scan merge join", k=10,
        ).collect(),
        # amortized many-query paths: 64 queries, one job
        "seg_batch64": lambda: segment_query_batch(
            spark,
            idx_path,
            [Match("scan merge"), Match("window stream"),
             Match("group value"), Match("join filter")] * 16,
            k=10, mode="spark",
        ).collect(),
        "bm25_batch64": lambda: eng.bm25_batch(
            ["scan merge", "window stream", "group value", "join filter"] * 16,
            k=10,
        ).collect(),
        "wand_batch64": lambda: wand_topk_batch(
            spark,
            idx_path,
            ["scan merge", "window stream", "group value", "join filter"] * 16,
            k=10, mode="spark",
        ).collect(),
        # query-node (coordinator) serving: same kernels, zero Spark
        # jobs -- what a search frontend pays per query when pruning
        # keeps the read small
        "wand_serve": lambda: wand_topk_pandas(
            idx_path, "scan merge join", k=10
        ),
        "seg_serve": lambda: segment_query_pandas(
            idx_path, Match("merge"), k=10, with_positions=False
        ),
        # the pruned-read coordinator case: the synthetic vocabulary has
        # no rare terms (every term spans every shard), so a doc_range
        # window stands in for the structural pruning a rare term gets —
        # this is the latency a frontend pays when pruning works
        "seg_serve_pruned": lambda: segment_query_pandas(
            idx_path, Match("merge"), k=10, with_positions=False,
            doc_range=(0, max(n_docs // 16, 1)),
        ),
        # training-pipeline ops at the same amplified scale: corpus-level
        # dedup (the amplification IS a planted exact-dup cluster per
        # source doc — the exact-first pass collapses it before LSH ever
        # sees a mega-bucket) and the LSH-bucketed batch ANN join
        "dedup_corpus": lambda: force(dedup_corpus(
            docs.select("doc_id", "text"),
            num_hashes=8, rows_per_band=2, k=3, threshold=0.5,
            max_bucket_size=64,
        )),
        "knn_join64": lambda: force(knn_join(
            embs.filter(F.col("vec_id") < 64), embs,
            k=10, n_planes=8, hamming=1,
        )),
        # hybrid lexical+vector: WAND-routed BM25 top-20 + cosine
        # top-20 fused by RRF; the fusion join itself is <= 40 rows
        "hybrid_rrf": lambda: eng.hybrid(
            "scan merge join",
            embs,
            qvec,
            k=10,
        ).collect(),
        # multi-field BM25F (title = first 8 tokens, 2x weight):
        # per-field term-pruned scans + pooled-tf combine
        "bm25f": lambda: bm25f_topk(
            mf, "scan merge join", k=10, weights={"title": 2.0}
        ).collect(),
        # two-stage rescore: routed BM25 top-30 window + min-window
        # proximity bonus on window-many docs only
        "rescore": lambda: eng.rescore(
            "scan merge", k=10, window=30, weight=2.0
        ).collect(),
        # conversation-level boolean retrieval (parent-child): two
        # role-scoped must clauses + one must_not over the real
        # transcript structure
        "conv_having": lambda: conversation_having(
            eng_df,
            docs.select("doc_id", "conv_id", "role"),
            [("scan", "user"), ("merge", "assistant")],
            must_not=["dup"],
        ).count(),
        # chunked sequence packing over the full corpus: distributed
        # prefix-sum (range partition + broadcast offsets)
        "pack_seq": lambda: force(pack_sequences(
            docs.select(
                "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
            ),
            2048,
        )),
        # windowed co-occurrence + PMI: O(tokens x window) pair events
        # from in-plan array expressions, no positional self-join
        "cooccurrence": lambda: force(cooccurrence(
            docs, window=3, min_count=3
        )),
        # exact per-group quantiles over the compressed value domain
        "quantiles": lambda: force(group_quantiles(
            docs.select(
                (F.col("doc_id") % 8).alias("g"),
                F.size(F.split(F.col("text"), " ")).cast("bigint").alias("v"),
            ),
            "g",
            "v",
            qs=(0.5, 0.9, 0.99),
        )),
        # line-level boilerplate removal: the corpus re-chunked into
        # 4-token lines (manufactures cross-doc duplicates), dedup'd
        # and rebuilt — three shuffle-bounded passes
        "line_dedup": lambda: force(line_dedup(
            chunk_text_lines(
                docs.select("doc_id", "text"), tokens_per_line=4
            ),
            min_docs=2,
        )),
        # unigram-LM perplexity: model fit (vocab agg) + broadcast
        # scoring join over the compressed (doc, term, tf) table
        "lm_score": lambda: force(lm_score(docs.select("doc_id", "text"))),
        # distributed spherical k-means: 2 Lloyd iterations over the
        # full embeddings table, k=8 (each iteration one codegen
        # assignment pass + one k*dim partial agg)
        "kmeans8": lambda: force(kmeans(embs, k=8, iters=2)[1]),
        # span-level exact dedup: the amplified corpus repeats every
        # doc text mult times, so duplicate windows are corpus-wide
        # real — the op masks all but each span's canonical occurrence
        "span_dedup": lambda: force(span_dedup(
            docs.select("doc_id", "text"), window=8
        )),
        # round-5 ops at the same amplified scale:
        # maximal-span table (gaps-and-islands over the dup windows)
        "span_max": lambda: force(dup_spans(
            docs.select("doc_id", "text"), window=8
        )),
        # DDSketch approx quantiles: bin-bounded exchange vs the exact
        # entry's distinct-value domain above
        "quantiles_approx": lambda: force(group_quantiles_approx(
            docs.select(
                (F.col("doc_id") % 8).alias("g"),
                F.size(F.split(F.col("text"), " ")).cast("bigint").alias("v"),
            ),
            "g",
            "v",
            qs=(0.5, 0.9, 0.99),
        )),
        # Bloom decontamination: set-bit broadcast + 3-probe join over
        # the corpus shingles (eval = 64 source docs)
        "bloom_decon": lambda: force(bloom_contamination(
            docs.select("doc_id", "text"),
            docs.filter(F.col("doc_id") < 64).select("doc_id", "text"),
            n=8,
            m_bits=1 << 16,
            k_hashes=3,
        )),
    }
    qtimes, query_probes, query_attempts, query_degraded = run_guarded(
        lambda: {name: timed(fn) for name, fn in queries.items()},
        probe_start["mem_bw_gbps"],
        max_retries,
    )

    total = round(build_sec + seg_sec + sum(qtimes.values()), 3)
    out = {
        "metric": "index_build_plus_query_sec",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "cores": cores,
        "amplification": mult,
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "n_postings": n_postings,
        "build_sec": round(build_sec, 3),
        "segment_build_sec": round(seg_sec, 3),
        "postings_built_per_sec": round(n_postings / build_sec, 1),
        "tokens_indexed_per_sec": round(n_tokens / build_sec, 1),
        "segment_compression_ratio": round(raw_bytes / max(enc_bytes, 1), 2),
        "n_segment_shards": len(manifest["shards"]),
        "ambient_start": probe_start,
        "ambient_end": ambient_probe(),
        # interference accounting (see BENCH/BASELINE.md): each timed
        # section is probed before AND after, retried (bounded) in a
        # clean window when the probe collapsed >2x mid-section, and
        # flagged invalid when every attempt was contaminated
        "ambient_build": build_probes,
        "ambient_queries": query_probes,
        "build_attempts": build_attempts,
        "query_attempts": query_attempts,
        "ambient_degraded": bool(build_degraded or query_degraded),
    }
    shutil.rmtree(idx_path, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
