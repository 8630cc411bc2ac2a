"""One-off probe: per-stage aggregate task time / GC / spill for the
build at two widths (diagnosis tool for the scaling gap).

Usage: python scripts/stage_probe.py [cores ...] (default 2 8)
Env: SPARK_GRAFT_PROBE_MEM overrides driver memory per run, e.g. "16g".
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVT_DIR = "/tmp/fts-stage-probe"


def run(cores: int, mem: str | None) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_BENCH_MULT=os.environ.get("SPARK_GRAFT_BENCH_MULT", "256"),
        SPARK_GRAFT_BENCH_ONLY_BUILD="1",
        SPARK_GRAFT_EVENTLOG=EVT_DIR,
        MALLOC_ARENA_MAX="2",
    )
    if mem:
        env["SPARK_DRIVER_MEM"] = mem
    shutil.rmtree(EVT_DIR, ignore_errors=True)
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True, cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)

    stages: dict = {}
    names: dict = {}
    logs = sorted(glob.glob(os.path.join(EVT_DIR, "*")), key=os.path.getmtime)
    for ln in open(logs[-1], errors="ignore"):
        if '"SparkListenerStageCompleted"' in ln:
            try:
                e = json.loads(ln)
            except ValueError:
                continue
            si = e["Stage Info"]
            names[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:60]
        if '"SparkListenerTaskEnd"' not in ln:
            continue
        try:
            e = json.loads(ln)
        except ValueError:
            continue
        if e.get("Task Info", {}).get("Launch Time", 0) < r["build_started_epoch_ms"]:
            continue
        m = e.get("Task Metrics") or {}
        sid = e.get("Stage ID")
        s = stages.setdefault(sid, {"run": 0, "gc": 0, "memspill": 0,
                                    "diskspill": 0, "cpu": 0, "n": 0})
        s["run"] += m.get("Executor Run Time", 0)
        s["gc"] += m.get("JVM GC Time", 0)
        s["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
        s["memspill"] += m.get("Memory Bytes Spilled", 0)
        s["diskspill"] += m.get("Disk Bytes Spilled", 0)
        s["n"] += 1
    report = {
        "cores": cores, "mem": mem or "8g", "build_sec": r["build_sec"],
        "stages": {
            f"{sid}:{names.get(sid, '?')}": {
                "tasks": s["n"],
                "run_s": round(s["run"] / 1e3, 1),
                "cpu_s": round(s["cpu"] / 1e3, 1),
                "gc_s": round(s["gc"] / 1e3, 1),
                "spill_mb": round((s["memspill"]) / 1e6, 1),
                "disk_spill_mb": round(s["diskspill"] / 1e6, 1),
            }
            for sid, s in sorted(stages.items())
        },
    }
    return report


def main():
    cores_list = [int(c) for c in sys.argv[1:]] or [2, 8]
    mem = os.environ.get("SPARK_GRAFT_PROBE_MEM")
    for c in cores_list:
        rep = run(c, mem)
        print(json.dumps(rep, indent=1))
        time.sleep(20)


if __name__ == "__main__":
    main()
