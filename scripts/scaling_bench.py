"""Scaling-efficiency evidence (north rule: >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the task brief the same
job is run at two parallelism levels — ``local[8]`` and ``local[32]`` —
in fresh JVMs over the identical input, and efficiency is

    eff = throughput(local[32]) / (4 * throughput(local[8]))

with throughput = postings built per second of the end-to-end index
build (tokenize -> shuffle -> parquet postings + termdict + docstats).
Results land in BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [sf_dir] [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, sf_dir: str, mult: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_MULT=str(mult),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo, hi = 8, 32

    r_lo = run_bench(lo, sf_dir, mult)
    r_hi = run_bench(hi, sf_dir, mult)

    tp_lo = r_lo["postings_built_per_sec"]
    tp_hi = r_hi["postings_built_per_sec"]
    eff = tp_hi / (4.0 * tp_lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as fh:
        fh.write(
            f"""# BENCH baseline — measured scaling evidence

North rule: >= 0.8 throughput scaling efficiency from N to 4N
executors. Sandbox stand-in (per task brief): same job, same input, two
parallelism levels in fresh JVMs.

Input: `{sf_dir}/documents.parquet` reshaped to the transcript schema,
amplification x{mult} -> {r_hi['n_docs']} docs, {r_hi['n_tokens']}
tokens, {r_hi['n_postings']} postings.

| config | build sec | postings/sec | tokens/sec | wand_bm25 sec | bm25 (DataFrame) sec |
|---|---|---|---|---|---|
| local[{lo}] (N) | {r_lo['build_sec']} | {tp_lo} | {r_lo['tokens_indexed_per_sec']} | {r_lo['queries']['wand_bm25']} | {r_lo['queries']['bm25_topk']} |
| local[{hi}] (4N) | {r_hi['build_sec']} | {tp_hi} | {r_hi['tokens_indexed_per_sec']} | {r_hi['queries']['wand_bm25']} | {r_hi['queries']['bm25_topk']} |

**Scaling efficiency (build throughput): {eff:.3f}**
(= {tp_hi} / (4 x {tp_lo}))

Segment compression ratio (delta+varint vs raw 12B/posting):
{r_hi['segment_compression_ratio']}x over {r_hi['n_segment_shards']}
doc-range shards.

Full JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
        )
    print(json.dumps({"eff": round(eff, 3), "lo": tp_lo, "hi": tp_hi, "md": md}))


if __name__ == "__main__":
    main()
