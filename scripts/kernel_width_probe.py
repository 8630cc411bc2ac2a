"""No-Spark width scaling of the sorted-assembly kernel itself.

Spawns P pinned worker processes, each running the full mapInArrow
build kernel (tokenize -> dictionary-encode -> packed-key radix sort ->
arrow assemble) over an identical private corpus slice, and reports
aggregate throughput at each width plus the N->4N efficiency on wall
and aggregate-task bases. This isolates the kernel's memory behavior
from Spark scheduling/IPC: the number that moves when bytes-per-posting
changes (see ARCHITECTURE.md "Narrow-dtype sort/assemble").

An ambient memory-bandwidth probe brackets every width sample (the
same co-tenant burn channel bench.py tracks); samples taken inside a
burn are flagged, not trusted.

Usage: python scripts/kernel_width_probe.py [amp_per_worker] [widths...]
Defaults: amp 16, widths 8 32.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(args):
    cpu, amp = args
    os.sched_setaffinity(0, {cpu})
    import pyarrow as pa
    import pyarrow.parquet as pq

    from inverted_index_spark.arrow_build import make_assemble_sorted_arrow

    tbl = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    texts = tbl.column("text").to_pylist() * amp
    ids = list(range(len(texts)))
    batches = []
    for i in range(0, len(texts), 8192):
        batches.append(
            pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids[i : i + 8192], pa.int64()),
                    "text": pa.array(texts[i : i + 8192], pa.string()),
                }
            )
        )
    kernel = make_assemble_sorted_arrow(False)
    t0 = time.perf_counter()
    out = list(kernel(iter(batches)))
    dt = time.perf_counter() - t0
    return dt, sum(len(b) for b in out)


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    widths = [int(w) for w in sys.argv[2:]] or [8, 32]
    from bench import ambient_probe

    mp.set_start_method("spawn")
    res = {}
    for p in widths:
        probe0 = ambient_probe()
        with mp.Pool(p) as pool:
            t0 = time.perf_counter()
            rets = pool.map(_worker, [(i % os.cpu_count(), amp) for i in range(p)])
            wall = time.perf_counter() - t0
        probe1 = ambient_probe()
        rows = sum(r for _, r in rets)
        task = sum(d for d, _ in rets)
        res[p] = {
            "wall_sec": round(wall, 2),
            "rows": rows,
            "agg_task_sec": round(task, 2),
            "rows_per_sec": round(rows / wall, 1),
            "ambient": [probe0, probe1],
        }
    out = {"amp_per_worker": amp, "widths": res}
    if len(widths) == 2 and widths[1] == 4 * widths[0]:
        lo, hi = widths
        out["eff_wall"] = round(
            res[hi]["rows_per_sec"] / (4 * res[lo]["rows_per_sec"]), 3
        )
        # each width runs one slice per worker: hi does 4x the work
        out["eff_task"] = round(
            4 * res[lo]["agg_task_sec"] / res[hi]["agg_task_sec"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
