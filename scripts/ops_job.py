"""One pipeline-op scaling sample: wand_batch64 + dedup_corpus +
knn_join + percolate at one width.

Runs the BM25 batch-query path (the north rule's query metric) and the
headline training-pipeline operators (corpus-level dedup, LSH-bucketed
batch ANN join, reverse search) on a fixed pre-materialized input at a
given core count and prints ONE JSON line with per-op wall seconds and
the epoch-ms window of each op (so the caller can aggregate task time
from event logs). The caller (scripts/scaling_bench.py) pins the
process tree with taskset and compares widths.

Usage: python scripts/ops_job.py <cores> [sf_dir] [mult]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from inverted_index_spark.build import build_and_save, load_index
    from inverted_index_spark.pipelines.corpus import bloom_contamination
    from inverted_index_spark.pipelines.dedup import dedup_corpus, span_dedup
    from inverted_index_spark.pipelines.similarity import kmeans, knn_join
    from inverted_index_spark.pipelines.sketches import group_quantiles_approx
    from inverted_index_spark.pipelines.textstats import lm_score
    from inverted_index_spark.percolate import percolate
    from inverted_index_spark.qast import AndNot, AtLeast, Match, Phrase
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.session import get_spark, warm_python_workers
    from inverted_index_spark.transcripts import (
        transcript_docs,
        transcripts_from_documents,
    )
    from inverted_index_spark.wand import wand_topk_batch

    spark = get_spark("ops-scaling", cores=cores)
    warm_python_workers(spark)

    # identical bytes at every width: reuse the bench corpus cache
    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"fts_bench_corpus_{os.path.basename(sf_dir.rstrip('/'))}_{mult}",
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            reps = spark.range(mult).select(F.col("id").alias("rep"))
            base = base.crossJoin(reps).select(
                (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
                "text",
            )
        transcripts = transcripts_from_documents(base)
        transcript_docs(transcripts).select(
            "doc_id", "text", "conv_id", "turn_idx", "role", "ts"
        ).write.mode("overwrite").parquet(corpus_dir)
    # The replica-amplified corpus is tiny ON DISK (64 copies of each
    # text snappy-compress to ~5 MB), and parquet splits at file/row-
    # group granularity, so a plain read collapses to 1-2 input tasks
    # and the map-side op stages serialize at EVERY width (the x8 run
    # measured percolate at ~21 task-sec over ~20 s wall = one busy
    # core at 8 AND 32 wide). A real table at this logical size has
    # thousands of splits; a fixed 64-partition spread (identical at
    # both widths, its shuffle counted in the op) stands in for that.
    SPLITS = 64
    docs_raw = spark.read.parquet(corpus_dir).select("doc_id", "text")
    docs = docs_raw.repartition(SPLITS)

    # amplify the embedding corpus too (2k rows at sf0.1 measures job
    # overhead, not the signature equi-join): mult deterministic
    # near-copies per vector (rep-scaled epsilon keeps them distinct
    # while preserving neighborhoods), cached so every width reads
    # identical bytes; query side stays the 64 ORIGINAL vectors
    embs_dir = os.path.join(
        tempfile.gettempdir(),
        f"fts_bench_embs_{os.path.basename(sf_dir.rstrip('/'))}_{mult}",
    )
    if not os.path.exists(os.path.join(embs_dir, "_SUCCESS")):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        if mult > 1:
            reps = spark.range(mult).select(F.col("id").alias("rep"))
            e = e.crossJoin(reps).select(
                (F.col("vec_id") * mult + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + F.col("rep").cast("float") * F.lit(1e-4),
                ).alias("embedding"),
            )
        e.write.mode("overwrite").parquet(embs_dir)
    embs = spark.read.parquet(embs_dir).select(
        "vec_id", "embedding"
    ).repartition(SPLITS)
    q_side = embs.filter(
        (F.col("vec_id") < 64 * mult) & (F.col("vec_id") % mult == 0)
    )

    # saved index + block-max segments for the query-throughput op:
    # untimed setup, cached across widths (keyed by sf+mult, NOT cores),
    # and shard size FIXED at every width so the logical work of the
    # batch is identical — only the parallelism varies
    idx_dir = os.path.join(
        tempfile.gettempdir(),
        f"fts_ops_idx_{os.path.basename(sf_dir.rstrip('/'))}_{mult}",
    )
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        idx = build_and_save(
            spark, docs_raw, idx_dir, ngrams=False, store_docs=False,
        )
        n_docs = idx.n_docs
        build_segments(
            spark, idx, idx_dir,
            shard_docs=max(n_docs // 128, 512), positions=False,
        )
    else:
        load_index(spark, idx_dir)

    batch_texts = [
        "scan merge", "window stream", "group value", "join filter",
        "index token", "query phrase", "error retry", "commit read",
    ] * 8  # 64 queries

    # percolate doc count scales with mult (512*mult turns) so the
    # width comparison measures matcher work, not fixed job overhead

    def force(df) -> int:
        """Full evaluation: xxhash64 over every column of every row,
        bit-XORed (overflow-free under ANSI) — count() is NOT a valid forcing action (Catalyst prunes
        row-preserving joins / column-only work under a bare count; a
        span_dedup count measured an EMPTY plan)."""
        return df.select(
            F.bit_xor(F.xxhash64(*df.columns)).alias("h")
        ).collect()[0]["h"]

    ops = {
        # BM25 top-k batch throughput (the north rule's query metric):
        # 64 queries in one pass over the block-max segments, one task
        # per (shard), union of the batch's terms decoded once per file
        "wand_batch64": lambda: wand_topk_batch(
            spark, idx_dir, batch_texts, k=10, mode="spark",
        ).count(),
        "dedup_corpus": lambda: force(dedup_corpus(
            docs, num_hashes=8, rows_per_band=2, k=3, threshold=0.5,
            max_bucket_size=64,
        )),
        "knn_join64": lambda: force(knn_join(
            q_side, embs, k=10, n_planes=8, hamming=1,
        )),
        # unigram-LM scoring: vocab-model fit + broadcast weight join
        # over the compressed (doc, term, tf) table — the join-bearing
        # pipeline shape (vs dedup's groupBy-bearing shape)
        "lm_score": lambda: force(lm_score(docs)),
        # distributed Lloyd (2 iterations): per-iteration codegen
        # assignment pass + k*dim partial agg — the iterative-ML shape
        "kmeans8": lambda: force(kmeans(embs, k=8, iters=2)[1]),
        # span-level exact dedup: window-hash groupBy + mask + rebuild
        # over the amplified corpus (duplicate spans are real at mult>1)
        "span_dedup": lambda: force(span_dedup(docs, window=8)),
        # DDSketch approx quantiles: the bin-bounded exchange shape —
        # aggregate work is O(rows) map-side + O(groups x bins) shuffle
        "quantiles_approx": lambda: force(group_quantiles_approx(
            docs.select(
                (F.col("doc_id") % 8).alias("g"),
                F.size(F.split(F.col("text"), " "))
                .cast("bigint")
                .alias("v"),
            ),
            "g",
            "v",
        )),
        # Bloom decontamination: shingle explode + bounded set-bit
        # broadcast join — the probe-join pipeline shape
        "bloom_decon": lambda: force(bloom_contamination(
            docs,
            docs.filter(F.col("doc_id") < 64),
            n=8,
            m_bits=1 << 16,
            k_hashes=3,
        )),
        # reverse search: per-doc python matcher, embarrassingly
        # parallel over the doc axis — the width-scaling poster child
        # (filter FIRST on the raw scan so pushdown prunes, then spread)
        "percolate": lambda: percolate(
            docs_raw.filter(F.col("doc_id") < 512 * mult)
            .repartition(SPLITS),
            {"a": Match("scan"), "b": Phrase("merge join"),
             "c": AndNot(Match("stream"), Match("batch")),
             "d": AtLeast(2, Match("scan"), Match("merge"),
                          Match("join"))},
        ).count(),
    }
    # warm each path once (python workers, page cache, parquet footers)
    for fn in ops.values():
        fn()

    out = {"cores": cores, "mult": mult, "ops": {}}
    for name, fn in ops.items():
        t_wall0 = time.time()
        t0 = time.perf_counter()
        fn()
        sec = time.perf_counter() - t0
        out["ops"][name] = {
            "sec": round(sec, 3),
            "start_ms": int(t_wall0 * 1000),
            "end_ms": int(time.time() * 1000),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
