"""Spark-standalone N-vs-4N-executor scaling study (north-rule letter).

The north rule asks for the crawl to run "via spark-submit --py-files on a
multi-executor cluster at two cluster sizes (N and 4N executors)". This
tool instantiates exactly that inside the sandbox:

  1. zips webscraper_spark/ into a --py-files archive,
  2. starts a real Spark standalone master + one worker (separate JVMs),
  3. spark-submits tools/standalone_crawl_driver.py twice — once capped at
     N executors and once at 4N (2-core executors via spark.cores.max),
  4. prints throughput at both sizes plus the pair efficiency.

Executors here are genuinely separate JVMs behind the standalone RPC/
shuffle paths — the closest in-sandbox analog of a real cluster. The
caveat from BENCH/BASELINE.md stands: all executors still share this one
host's memory controller, and per-job RPC latency is amortized over far
less data than a production run, so the LOCAL-mode paired studies remain
the quantitative scaling evidence; this tool demonstrates the deployment
path end-to-end and gives the standalone data point.

Usage:
    python3 tools/standalone_study.py [sf] [n_exec_lo] [n_exec_hi] [reps] [out.json]
    # defaults: sf=0.4, 1 vs 4 executors (2 cores each), 1 rep,
    #           out=BENCH/standalone_sf{sf}.json
Each rep waits for an idle host window (same ex-ante membw gate as
tools/within_grant_study.py — the gate decides WHEN a rep starts, never
whether its result is kept), alternates submit order, and streams partial
results to the artifact.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MASTER_URL = "spark://127.0.0.1:7077"


def _pyspark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def build_pyfiles_zip(dest: str = "/tmp/ws_pyfiles.zip") -> str:
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "webscraper_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return dest


EXECUTOR_MEM_GB = 10  # per-executor heap; worker memory is sized from this


def _spark_env() -> dict[str, str]:
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    # executor spill/shuffle dirs on tmpfs — same posture as the local-mode
    # bench legs (cluster analog: executor-local NVMe). Worker exports it to
    # every executor it launches.
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/ws_spark_sa"
    os.makedirs("/dev/shm/ws_spark_sa", exist_ok=True)
    return env


_DAEMONS: list[subprocess.Popen] = []


def start_cluster(worker_cores: int, worker_mem: str) -> None:
    """Start a standalone master + one worker as foreground spark-class
    JVMs (pip pyspark ships no start-master.sh/start-worker.sh) — real
    separate processes, the same deploy classes a production standalone
    cluster runs."""
    home = _pyspark_home()
    env = _spark_env()
    spark_class = os.path.join(home, "bin", "spark-class")
    log = open("/tmp/standalone_cluster.log", "a")
    _DAEMONS.append(subprocess.Popen(
        [spark_class, "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8066"],
        env=env, stdout=log, stderr=subprocess.STDOUT,
    ))
    time.sleep(5)
    _DAEMONS.append(subprocess.Popen(
        [spark_class, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
         "--cores", str(worker_cores), "--memory", worker_mem,
         "--webui-port", "8067"],
        env=env, stdout=log, stderr=subprocess.STDOUT,
    ))
    time.sleep(5)
    for p in _DAEMONS:
        if p.poll() is not None:
            raise RuntimeError(
                f"standalone daemon died at startup (rc={p.returncode}); see /tmp/standalone_cluster.log"
            )


def stop_cluster() -> None:
    for p in reversed(_DAEMONS):
        if p.poll() is None:
            p.terminate()
    for p in _DAEMONS:
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()
    _DAEMONS.clear()


def submit_crawl(n_executors: int, sf: float, max_waves: int, pyfiles: str) -> dict:
    home = _pyspark_home()
    corpus = os.path.join(REPO, ".cache", f"corpus_sf{sf}")
    cmd = [
        os.path.join(home, "bin", "spark-submit"),
        "--master", MASTER_URL,
        "--py-files", pyfiles,
        "--conf", f"spark.cores.max={n_executors * 2}",
        "--conf", "spark.executor.cores=2",
        "--conf", f"spark.executor.memory={EXECUTOR_MEM_GB}g",
        # the w1 batch broadcast (millions of rows at sf>=2.5) is built on
        # the driver; 6g left it GC-bound next to a 48g local-mode driver
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.task.cpus=2",
        "--conf", "spark.sql.shuffle.partitions=" + str(max(n_executors * 2, 8)),
        os.path.join(REPO, "tools", "standalone_crawl_driver.py"),
        str(sf), str(max_waves), corpus,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=_spark_env())
    for line in reversed((out.stdout or "").strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and "sec" in d:
                return d
        except (json.JSONDecodeError, ValueError):
            continue
    raise RuntimeError(
        f"spark-submit n_exec={n_executors} produced no JSON (rc={out.returncode}); "
        f"stderr tail:\n{(out.stderr or '')[-2000:]}"
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.4
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    out_path = sys.argv[5] if len(sys.argv) > 5 else os.path.join(REPO, "BENCH", f"standalone_sf{sf}.json")
    corpus = os.path.join(REPO, ".cache", f"corpus_sf{sf}")
    if not os.path.isdir(corpus):
        raise SystemExit(f"materialize the corpus first (bench.py does): {corpus}")

    import bench  # probes + tmpfs hygiene (REPO is on sys.path)

    bench.sweep_stale_tmpfs()
    pyfiles = build_pyfiles_zip()
    # Worker owns enough cores AND memory for the BIG config; cores.max caps
    # the small one. Sizing the memory from the executor heap matters: a 32g
    # worker placing 10g executors silently caps the "4-executor" leg at
    # floor(32/10)=3 executors (found via the event log in round 4 — the
    # recorded 0.337 median ran 1-vs-3, not 1-vs-4).
    start_cluster(worker_cores=hi * 2, worker_mem=f"{hi * EXECUTOR_MEM_GB + 4}g")
    ratio = hi / lo
    per_rep: list[dict] = []
    try:
        for rep in range(reps):
            # Same ex-ante idle-window gate as tools/within_grant_study.py:
            # decides only WHEN a rep starts, never whether it is kept.
            gate_mbs = float(os.environ.get("WS_GATE_MEMBW_MBS", "18000"))
            max_wait = float(os.environ.get("WS_GATE_WAIT_S", "600"))
            t0 = time.time()
            while True:
                got = bench._membw_probe(8)
                waited = round(time.time() - t0, 1)
                if got >= gate_mbs or waited >= max_wait:
                    gate = {"gate_membw_mbs": got, "gate_waited_s": waited,
                            "gate_timed_out": got < gate_mbs}
                    break
                print(f"[standalone] membw grant {got} < gate {gate_mbs}; waiting ({waited}s)", flush=True)
                time.sleep(30)
            order = (lo, hi) if rep % 2 == 0 else (hi, lo)
            rec: dict[int, dict] = {}
            for n_exec in order:
                # Per-LEG membw probe (8s, recorded as context, never used to
                # exclude): legs are minutes long and the host grant swings
                # on a minutes timescale, so a rep-level gate can pass and a
                # single leg still land in a degraded window — wide configs
                # suffer disproportionately (round-3/4 analysis). The probe
                # timestamps the window each leg actually got.
                leg_membw = bench._membw_probe(8)
                r = submit_crawl(n_exec, sf, 3, pyfiles)
                r["urls_per_sec"] = round(r["urls"] / r["sec"], 1)
                r["leg_membw_mbs"] = leg_membw
                rec[n_exec] = r
                print(json.dumps({"rep": rep, "n_executors": n_exec, **r}), flush=True)
            per_rep.append({
                **gate,
                f"sec_{lo}exec": rec[lo]["sec"], f"sec_{hi}exec": rec[hi]["sec"],
                f"membw_before_{lo}exec": rec[lo]["leg_membw_mbs"],
                f"membw_before_{hi}exec": rec[hi]["leg_membw_mbs"],
                "n_exec_granted": [rec[lo].get("n_exec"), rec[hi].get("n_exec")],
                "urls": rec[hi]["urls"],
                "pair_eff": round((rec[lo]["sec"] / rec[hi]["sec"]) / ratio, 3),
            })
            with open(out_path, "w") as f:  # stream partials: a kill keeps finished pairs
                json.dump({"study": "standalone_pyfiles", "sf": sf, "lo": lo, "hi": hi,
                           "partial": rep + 1 < reps, "per_rep": per_rep}, f, indent=1)
        summary = {
            "study": f"standalone {lo} vs {hi} executors (2 cores each, spark-submit --py-files)",
            "sf": sf, "lo": lo, "hi": hi,
            "per_rep": per_rep,
            "pair_eff_median": bench._median([p["pair_eff"] for p in per_rep]),
        }
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary), flush=True)
    finally:
        stop_cluster()
        shutil.rmtree(os.path.join(REPO, ".cache", "standalone_tmp"), ignore_errors=True)
        shutil.rmtree("/dev/shm/ws_spark_sa", ignore_errors=True)


if __name__ == "__main__":
    main()
