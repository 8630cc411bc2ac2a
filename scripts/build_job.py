"""spark-submit entry point: build the full-text index over a transcript table.

Cluster usage (the north-rule deployment shape):

    python -m zipfile -c /tmp/inverted_index_spark.zip inverted_index_spark/
    spark-submit --py-files /tmp/inverted_index_spark.zip \
        scripts/build_job.py \
        --input  s3://bucket/transcripts/          (parquet/Iceberg table) \
        --output s3://bucket/fts_index/ \
        --segments --no-store-docs

Locally (sandbox): python scripts/build_job.py --input <parquet> --output <dir>

The job: read transcripts (input_hint schema) -> assign stable doc ids
over (conv_id, turn_idx) -> build_and_save (postings + termdict +
docstats, single corpus scan) -> optional compressed segments with
block-max metadata + manifest. Prints one JSON line of build metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript table path")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--ngrams", action="store_true", help="parity edge-ngram index")
    ap.add_argument("--segments", action="store_true", help="also build segments")
    ap.add_argument("--no-store-docs", action="store_true")
    ap.add_argument("--shard-docs", type=int, default=4096)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from inverted_index_spark.build import build_and_save
    from inverted_index_spark.segments import build_segments
    from inverted_index_spark.session import ship_package
    from inverted_index_spark.transcripts import transcript_docs

    spark = SparkSession.builder.appName("fts-build").getOrCreate()
    ship_package(spark)

    tr = spark.read.parquet(args.input)
    if "doc_id" in tr.columns:
        docs = tr
    else:
        docs = transcript_docs(tr)

    t0 = time.perf_counter()
    idx = build_and_save(
        spark,
        docs,
        args.output,
        ngrams=args.ngrams,
        store_docs=not args.no_store_docs,
    )
    build_sec = time.perf_counter() - t0
    out = {
        "n_docs": idx.n_docs,
        "avgdl": round(idx.avgdl, 3),
        "build_sec": round(build_sec, 2),
    }
    if args.segments:
        t0 = time.perf_counter()
        manifest = build_segments(spark, idx, args.output, shard_docs=args.shard_docs)
        out["segment_sec"] = round(time.perf_counter() - t0, 2)
        out["n_shards"] = len(manifest["shards"])
        out["built_shards"] = manifest["built_shards"]
        out["resumed_shards"] = manifest["resumed_shards"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
