"""Experiment: isolate the sort/write stage cost drivers at one width.

Runs the bench build at a given core count with knobs:
  --buckets N   override term_buckets (partition count of the map stage)
  --nosort      skip sortWithinPartitions (measures the sort's share)
Prints build_sec + stage-20-equivalent aggregate run/cpu from event logs.

Usage: taskset is applied internally.
  python scripts/sort_probe.py <cores> [buckets|-] [sort|nosort]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVT_DIR = "/tmp/fts-sort-probe"


def main():
    cores = int(sys.argv[1])
    buckets = None if len(sys.argv) < 3 or sys.argv[2] == "-" else int(sys.argv[2])
    do_sort = not (len(sys.argv) > 3 and sys.argv[3] == "nosort")

    os.sched_setaffinity(0, range(cores))
    os.environ["SPARK_GRAFT_EVENTLOG"] = EVT_DIR
    shutil.rmtree(EVT_DIR, ignore_errors=True)

    import tempfile

    from pyspark.sql import functions as F

    from inverted_index_spark import build as B
    from inverted_index_spark.session import get_spark, warm_python_workers
    from inverted_index_spark.transcripts import (
        transcript_docs,
        transcripts_from_documents,
    )

    if not do_sort:
        # monkeypatch: identity instead of sortWithinPartitions
        from pyspark.sql import DataFrame

        orig = DataFrame.sortWithinPartitions
        DataFrame.sortWithinPartitions = lambda self, *a, **k: self

    spark = get_spark("sort-probe", cores=cores)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "256"))
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    base = base.crossJoin(reps).select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text"
    )
    docs = transcript_docs(transcripts_from_documents(base)).select("doc_id", "text")
    idx_path = tempfile.mkdtemp(prefix="sortprobe")
    warm_python_workers(spark)
    t0 = time.time()
    start_ms = int(t0 * 1000)
    B.build_and_save(
        spark, docs, idx_path, ngrams=False, store_docs=False,
        term_buckets=buckets,
    )
    build_sec = time.time() - t0
    spark.stop()
    time.sleep(2)

    per_stage: dict = {}
    logs = sorted(glob.glob(os.path.join(EVT_DIR, "*")), key=os.path.getmtime)
    for ln in open(logs[-1], errors="ignore"):
        if '"SparkListenerTaskEnd"' not in ln:
            continue
        try:
            e = json.loads(ln)
        except ValueError:
            continue
        if e.get("Task Info", {}).get("Launch Time", 0) < start_ms:
            continue
        m = e.get("Task Metrics") or {}
        s = per_stage.setdefault(e.get("Stage ID"), [0, 0, 0])
        s[0] += m.get("Executor Run Time", 0)
        s[1] += m.get("Executor CPU Time", 0) // 1_000_000
        s[2] += 1
    big = {k: v for k, v in per_stage.items() if v[0] > 2000}
    print(json.dumps({
        "cores": cores, "buckets": buckets, "sort": do_sort,
        "build_sec": round(build_sec, 1),
        "stages": {str(k): {"run_s": round(v[0] / 1e3, 1),
                            "cpu_s": round(v[1] / 1e3, 1), "tasks": v[2]}
                   for k, v in sorted(big.items())},
        "total_run_s": round(sum(v[0] for v in per_stage.values()) / 1e3, 1),
    }))
    shutil.rmtree(idx_path, ignore_errors=True)


if __name__ == "__main__":
    main()
