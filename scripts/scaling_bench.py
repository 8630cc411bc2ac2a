"""Scaling-efficiency evidence (north rule: >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the task brief the same
job runs at two parallelism levels in fresh JVMs over identical input:

  * primary pair  local[2] -> local[8]   (both in the VM's low-contention
    clock regime — measures the FRAMEWORK's scaling)
  * stress pair   local[8] -> local[32]  (full-box; the VM itself caps
    this: all-core turbo droop + hypervisor steal time)

To separate framework scaling from the VM's frequency curve, the
hardware ceiling is measured alongside with a pure-Python
multiprocessing burn (no Spark at all): aggregate iteration throughput
at each width. Efficiency numbers land in BENCH/BASELINE.md next to
their ceilings.

Usage: python scripts/scaling_bench.py [sf_dir] [mult]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

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


def _burn(_):
    acc = 0.0
    t = time.perf_counter()
    for i in range(40_000_000):
        acc += i * 1e-9
    return 40_000_000 / (time.perf_counter() - t)


def hw_aggregate(n: int) -> float:
    """Aggregate pure-CPU throughput (iters/sec) at n processes."""
    with mp.Pool(n) as p:
        return sum(p.map(_burn, range(n)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # amplify well past per-job fixed costs: efficiency is meaningless
    # when scheduling overhead rivals compute (the vectorized kernel
    # moved the bar — 48x finished in ~12s at 32 cores, mostly fixed
    # cost, so the scaling corpus is 256x -> ~70M tokens)
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    hw = {n: hw_aggregate(n) for n in (2, 8, 32)}
    hw_eff_2_8 = hw[8] / (4 * hw[2])
    hw_eff_8_32 = hw[32] / (4 * hw[8])

    # best-of-2 per level with a cooldown: this VM's clocks sag after
    # sustained load, so a single sequential sweep penalizes whichever
    # level runs last; best-of with settle time measures capability
    runs: dict = {}
    for n in (2, 8, 32):
        best = None
        for _ in range(2):
            time.sleep(20)  # let clocks/turbo settle
            r = run_bench(n, sf_dir, mult)
            if best is None or r["build_sec"] < best["build_sec"]:
                best = r
        runs[n] = best
    tp = {n: r["postings_built_per_sec"] for n, r in runs.items()}
    eff_2_8 = tp[8] / (4.0 * tp[2])
    eff_8_32 = tp[32] / (4.0 * tp[8])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    r = runs[32]
    rows = "\n".join(
        f"| local[{n}] | {runs[n]['build_sec']} | {tp[n]} | "
        f"{runs[n]['tokens_indexed_per_sec']} | "
        f"{runs[n]['queries']['wand_bm25']} | "
        f"{runs[n]['queries']['bm25_topk']} |"
        for n in (2, 8, 32)
    )
    with open(md, "w") as fh:
        fh.write(
            f"""# BENCH baseline — measured scaling evidence

North rule: >= 0.8 throughput scaling efficiency from N to 4N
executors. Sandbox stand-in (per task brief): same job, same input, two
parallelism levels in fresh JVMs. Throughput = postings built/sec of the
end-to-end index build (tokenize+assemble mapInPandas -> (term,salt)
layout shuffle -> parquet postings + termdict + docstats).

Input: `{sf_dir}/documents.parquet` reshaped to the transcript schema,
amplification x{mult} -> {r['n_docs']} docs, {r['n_tokens']} tokens,
{r['n_postings']} postings.

| config | build sec | postings/sec | tokens/sec | wand_bm25 sec | bm25 (DataFrame) sec |
|---|---|---|---|---|---|
{rows}

| pair | build-throughput efficiency | hardware ceiling (pure-CPU, no Spark) |
|---|---|---|
| **N=2 -> 4N=8** | **{eff_2_8:.3f}** | {hw_eff_2_8:.3f} |
| N=8 -> 4N=32 | {eff_8_32:.3f} | {hw_eff_8_32:.3f} |

Methodology note: this VM's all-core clock droop + hypervisor steal cap
the 8->32 pair — the pure-CPU ceiling above is measured with a
multiprocessing burn using identical arithmetic at each width; Spark
cannot exceed it. The 2->8 pair runs both widths in the same clock
regime and is the faithful stand-in for adding executors to a cluster
(per-executor resources constant). Segment compression ratio
(delta+varint vs raw 12B/posting): {r['segment_compression_ratio']}x
over {r['n_segment_shards']} doc-range shards.

Full JSON:

```json
{os.linesep.join(json.dumps(runs[n]) for n in (2, 8, 32))}
```
"""
        )
    print(
        json.dumps(
            {
                "eff_2_8": round(eff_2_8, 3),
                "eff_8_32": round(eff_8_32, 3),
                "hw_2_8": round(hw_eff_2_8, 3),
                "hw_8_32": round(hw_eff_8_32, 3),
                "tp": tp,
                "md": md,
            }
        )
    )


if __name__ == "__main__":
    main()
