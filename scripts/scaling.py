"""Scaling-evidence harness (BASELINE.json north_rule).

Runs the IDENTICAL end-to-end KG pipeline job on the same input at two
CLUSTER sizes — N = 1 executor and 4N = 4 executors (EXEC_CORES cores,
EXEC_MEM_MB each), via Spark's local-cluster master, which launches real separate
executor JVMs and ships the package with the addPyFile equivalent of
`spark-submit --py-files`. Every job parameter (input, replicas,
shuffle partitions, page partitioning) is pinned so ONLY the executor
count differs. Each run is a fresh driver process.

Why not local[8] vs local[32]: measured on this sandbox, a single Spark
JVM's throughput collapses beyond ~8 task threads (600M-row codegen
map: local[8] 27.5 s vs local[32] 39.1 s; plain 32-thread Java scales
3.9×, 32 Python processes scale 3.3×, all 32 executor threads RUNNABLE
in jstack) — a host/JVM interaction, not a property of the job. Real
separate executor processes scale (0.81 efficiency on a pure map job at
1→4 executors), so executor-count scaling is both the honest
measurement and the one the north_rule actually describes (N vs 4N
executors).

Usage: python scripts/scaling.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

EXEC_CORES = 1
EXEC_MEM_MB = 14336
SHUFFLE_PARTITIONS = 32
PAGE_PARTITIONS = 32


def run_once(sf_dir: str, n_exec: int, replicas: int) -> dict:
    # output + shuffle/checkpoint blocks go to tmpfs — the sandbox
    # stand-in for a real cluster's per-node local disks and scalable
    # object store (one shared VM disk would otherwise be a resource
    # that does NOT scale with executor count)
    out = f"/dev/shm/kg_scaling_{n_exec}"
    shutil.rmtree(out, ignore_errors=True)
    local_dirs = "/dev/shm/spark-local"
    os.makedirs(local_dirs, exist_ok=True)
    env = dict(os.environ, KG_PAGE_PARTS=str(PAGE_PARTITIONS),
               SPARK_LOCAL_DIRS=local_dirs, KG_WARM_CLUSTER="1")
    if os.environ.get("KG_SCALING_EVENTLOGS"):
        env["KG_EVENTLOG_DIR"] = f"/tmp/spark-events-{n_exec}"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "shacl_rust_spark.pipeline.run",
         "--sf-dir", sf_dir, "--out", out,
         "--master", f"local-cluster[{n_exec},{EXEC_CORES},{EXEC_MEM_MB}]",
         "--executor-mem", f"{EXEC_MEM_MB - 2048}m",
         "--shuffle-partitions", str(SHUFFLE_PARTITIONS),
         "--replicate", str(replicas)],
        capture_output=True, text=True, cwd="/root/repo", timeout=3600,
        env=env,
    )
    wall_incl_jvm = time.time() - t0
    if proc.returncode != 0:
        log = f"/tmp/kg_scaling_fail_{n_exec}.log"
        with open(log, "w") as f:
            f.write(proc.stderr)
        raise RuntimeError(
            f"n_exec={n_exec} failed (full stderr: {log}):\n"
            f"{proc.stderr[-3000:]}"
        )
    commit = json.loads(proc.stdout.strip().splitlines()[-1])
    m = commit["metrics"]
    m["wall_incl_jvm"] = round(wall_incl_jvm, 1)
    shutil.rmtree(out, ignore_errors=True)
    return m


def recent_matching(history: list, replicas: int, sf_dir: str,
                    k: int = 6) -> list:
    """The most recent k runs at exactly this (replicas, sf_dir)
    configuration. Filter FIRST, then slice — slicing the raw history
    before filtering would under-report matching runs once the file
    holds other configurations (round-2 ADVICE #4)."""
    matching = [
        h for h in history
        if h["replicas"] == replicas and h["sf_dir"] == sf_dir
    ]
    return matching[-k:]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # default = the official evidence protocol (64 replicas = 9.6M pages);
    # smaller inputs are overhead-dominated and under-report efficiency
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    results = {}
    for n_exec in (1, 4):
        m = run_once(sf_dir, n_exec, replicas)
        results[n_exec] = m
        print(f"{n_exec} executor(s) × {EXEC_CORES} cores: "
              f"wall={m['wall_secs']}s emitted={m['emitted_triples']} "
              f"tps={m['triples_per_sec']}", flush=True)

    t1, t4 = results[1]["wall_secs"], results[4]["wall_secs"]
    tp1, tp4 = results[1]["triples_per_sec"], results[4]["triples_per_sec"]
    speedup = t1 / t4
    efficiency = speedup / 4
    summary = {
        "sf_dir": sf_dir, "replicas": replicas,
        "emitted_triples": results[4]["emitted_triples"],
        "n_executors": {"N": 1, "4N": 4},
        "executor": {"cores": EXEC_CORES, "mem_mb": EXEC_MEM_MB},
        "N": {"wall_secs": t1, "triples_per_sec": tp1},
        "4N": {"wall_secs": t4, "triples_per_sec": tp4},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))

    # append to the committed run history; recent runs render into
    # BENCH.md as reproducibility evidence
    summary["ts"] = time.time()
    with open("/root/repo/BENCH_HISTORY.jsonl", "a") as f:
        f.write(json.dumps(summary) + "\n")
    with open("/root/repo/BENCH_HISTORY.jsonl") as f:
        history = [json.loads(ln) for ln in f if ln.strip()]
    hist_rows = "\n".join(
        f"| {h['N']['wall_secs']} | {h['4N']['wall_secs']} "
        f"| {h['speedup']:.2f}× | {h['scaling_efficiency']:.3f} |"
        for h in recent_matching(history, replicas, sf_dir)
    )
    # BENCH_NOTES.md (optional, committed) carries per-run analysis —
    # e.g. a diagnosed outlier — verbatim across regenerations
    run_notes = ""
    if os.path.exists("/root/repo/BENCH_NOTES.md"):
        with open("/root/repo/BENCH_NOTES.md") as f:
            run_notes = f.read().strip()

    md = f"""# BENCH — throughput & scaling evidence

## Scaling (north_rule: efficiency ≥ 0.8 from N → 4N executors)

Protocol: the identical job (`python -m shacl_rust_spark.pipeline.run`,
package shipped to executors as `spark-submit --py-files` would) on the
same deterministic input at N = 1 executor and 4N = 4 executors
({EXEC_CORES} cores / {EXEC_MEM_MB // 1024} GiB each, Spark
local-cluster = real separate executor JVMs), fresh driver process per
run, shuffle partitions pinned at {SHUFFLE_PARTITIONS} and page
partitioning at {PAGE_PARTITIONS} for both — only the executor count
differs.

- input: {sf_dir} pages ×{replicas} replicas (disjoint key spaces) =
  {results[4]['pages']:,} pages
- emitted validated triples: {results[4]['emitted_triples']:,}

| cluster | wall (s) | triples/sec |
|---|---|---|
| 1 executor (N) | {t1} | {tp1:,} |
| 4 executors (4N) | {t4} | {tp4:,} |

**Speedup N→4N: {speedup:.2f}× → scaling efficiency {efficiency:.3f}**
(criterion ≥ 0.8: {"MET" if efficiency >= 0.8 else "NOT MET"}).

Run history at this input (BENCH_HISTORY.jsonl; the sandbox host has
±5-7 % run-to-run wall-clock noise, so repeated runs are the evidence):

| N wall (s) | 4N wall (s) | speedup | efficiency |
|---|---|---|---|
{hist_rows}

{run_notes}

Stage metrics at N:  {json.dumps(results[1])}

Stage metrics at 4N: {json.dumps(results[4])}

### Why executor scaling, not thread scaling

Single-JVM thread scaling is pathological on this sandbox host —
measured with a pure 600M-row codegen map job: local[8] 27.5 s vs
local[32] 39.1 s (slower with 4× threads), while plain 32-thread Java
in one JVM scales 3.9× and 32 Python processes scale 3.3× on the same
host, and jstack shows all 32 executor threads RUNNABLE in generated
code. The degradation is a host/JVM interaction independent of this
codebase; separate executor processes (what a real cluster runs) scale
normally, so the experiment varies executor count — which is also the
literal wording of the north_rule.

Generated by scripts/scaling.py.
"""
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
