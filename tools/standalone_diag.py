"""One-off diagnostic for the standalone N-vs-4N floor: submit both legs
with WS_DEBUG_TIMING per-wave ticks + event logs, print the tick breakdown.

Usage: python3 tools/standalone_diag.py [sf] [lo] [hi]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import standalone_study as sa  # noqa: E402


def submit_timed(n_executors: int, sf: float, max_waves: int, pyfiles: str, evlog: str) -> tuple[dict, str]:
    home = sa._pyspark_home()
    corpus = os.path.join(REPO, ".cache", f"corpus_sf{sf}")
    env = sa._spark_env()
    env["WS_DEBUG_TIMING"] = "1"
    os.makedirs(evlog, exist_ok=True)
    cmd = [
        os.path.join(home, "bin", "spark-submit"),
        "--master", sa.MASTER_URL,
        "--py-files", pyfiles,
        "--conf", f"spark.cores.max={n_executors * 2}",
        "--conf", "spark.executor.cores=2",
        "--conf", f"spark.executor.memory={sa.EXECUTOR_MEM_GB}g",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.task.cpus=2",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{evlog}",
        "--conf", "spark.sql.shuffle.partitions=" + str(max(n_executors * 2, 8)),
        os.path.join(REPO, "tools", "standalone_crawl_driver.py"),
        str(sf), str(max_waves), corpus,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    ticks = "\n".join(l for l in (out.stderr or "").splitlines() if "[wave timing]" in l)
    for line in reversed((out.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and "sec" in d:
                return d, ticks
        except (json.JSONDecodeError, ValueError):
            continue
    raise RuntimeError(f"no JSON (rc={out.returncode}); stderr tail:\n{(out.stderr or '')[-3000:]}")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 2.5
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import bench

    bench.sweep_stale_tmpfs()
    pyfiles = sa.build_pyfiles_zip()
    sa.start_cluster(worker_cores=hi * 2, worker_mem=f"{hi * sa.EXECUTOR_MEM_GB + 4}g")
    try:
        for n_exec in (hi, lo):
            evlog = f"/tmp/evlog_sa_{n_exec}"
            r, ticks = submit_timed(n_exec, sf, 3, pyfiles, evlog)
            print(f"=== n_exec={n_exec}: {json.dumps(r)}")
            print(ticks, flush=True)
    finally:
        sa.stop_cluster()


if __name__ == "__main__":
    main()
