"""Summarize a Spark event log: per-stage wall, summed task run/CPU/GC time.

This is the tool that isolated the round-3 schedule-cache race: the w1
fetch+extract stage showed 790 task-run-seconds / 278 JVM-CPU-seconds at
local[8] vs 166 / 37 for the identical stage at local[2] — per-task work
inflating with parallelism is redundant computation (cold-cache consumers),
not contention.

Usage:
    1. Run the job with
         extra_conf={"spark.eventLog.enabled": "true",
                     "spark.eventLog.dir": "file:///tmp/evlog"}
    2. python3 tools/stage_walls.py [/tmp/evlog] [top_n]

Reads the newest eventlog_v2 rolling directory (zstd-compressed, decoded
via pyarrow so no zstandard wheel is needed).
"""

from __future__ import annotations

import glob
import json
import sys

import pyarrow as pa


def summarize(evlog_dir: str, top_n: int = 20) -> list[str]:
    app_dirs = sorted(glob.glob(evlog_dir.rstrip("/") + "/eventlog_v2_*"))
    if not app_dirs:
        raise SystemExit(f"no eventlog_v2_* dirs under {evlog_dir}")
    files = [p for p in glob.glob(app_dirs[-1] + "/events_*") if "appstatus" not in p]
    stages: dict[int, tuple[float, int, str]] = {}
    agg: dict[int, dict[str, float]] = {}
    for fp in files:
        if fp.endswith(".zstd"):
            data = pa.CompressedInputStream(pa.OSFile(fp, "rb"), "zstd").read().decode()
        else:
            data = open(fp).read()
        for line in data.splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
                stages[si["Stage ID"]] = (dur, si["Number of Tasks"], si["Stage Name"].split("\n")[0][:60])
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                tm = e.get("Task Metrics") or {}
                a = agg.setdefault(sid, {"run": 0.0, "cpu": 0.0, "gc": 0.0, "out": 0.0})
                a["run"] += tm.get("Executor Run Time", 0) / 1000
                a["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
                a["gc"] += tm.get("JVM GC Time", 0) / 1000
                a["out"] += (tm.get("Output Metrics", {}) or {}).get("Bytes Written", 0)
    lines = [f"app {app_dirs[-1].rsplit('/', 1)[-1]}: {len(stages)} stages, "
             f"sum stage walls {sum(d for d, _, _ in stages.values()):.1f}s"]
    for sid, (dur, nt, name) in sorted(stages.items(), key=lambda kv: -kv[1][0])[:top_n]:
        a = agg.get(sid, {})
        lines.append(
            f"  stage {sid:4d} wall={dur:7.1f}s tasks={nt:4d} "
            f"runT={a.get('run', 0):7.1f}s cpuT={a.get('cpu', 0):6.1f}s "
            f"gc={a.get('gc', 0):4.1f}s out={a.get('out', 0) / 1e6:6.0f}MB  {name}"
        )
    return lines


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/evlog"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print("\n".join(summarize(d, n)))
