"""Spark event-log analyzer: per-stage wall / task-time / shuffle bytes.

Usage: python scripts/evlog.py /tmp/spark-events [min_wall_secs]

Prints one line per stage sorted by wall-clock duration: stage id, wall,
sum of task run time, task count, shuffle read/write MB, input MB, and
the first line of the stage's call site. Use to attribute pipeline
phases to physical stages and spot serial bottlenecks (wall >> task
time / cores ⇒ under-parallelized; task time ≈ wall × cores ⇒ CPU
bound; big shuffle bytes ⇒ exchange bound).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events"
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    path = d
    if os.path.isdir(path):
        files = sorted(
            (os.path.join(d, f) for f in os.listdir(d)
             if not f.startswith(".")),
            key=os.path.getmtime,
        )
        if not files:
            print("no event logs", file=sys.stderr)
            return 1
        path = files[-1]

    def _open(f):
        if f.endswith(".zstd") or f.endswith(".zst"):
            import io
            import subprocess
            p = subprocess.run(["zstd", "-d", "-c", f], capture_output=True)
            return io.StringIO(p.stdout.decode())
        return open(f)

    if os.path.isdir(path):
        # rolling event-log dir (eventLog v2): concatenate its parts
        inner = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if "appstatus" not in f
        )
        lines = (ln for f in inner for ln in _open(f))
    else:
        lines = _open(path)
    stages = {}
    t0 = None
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerApplicationStart":
            t0 = ev["Timestamp"]
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            s = stages.setdefault(sid, {
                "run": 0.0, "cpu": 0.0, "sr": 0.0, "sw": 0.0,
                "inp": 0.0, "spill": 0.0,
            })
            s.update({
                "wall": (com - sub) / 1e3 if sub and com else 0.0,
                "start": (sub - t0) / 1e3 if sub and t0 else 0.0,
                "tasks": si.get("Number of Tasks", 0),
                "name": si.get("Stage Name", ""),
                "details": (si.get("Details") or "").splitlines()[:1],
            })
        elif et == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            s = stages.get(sid)
            if s is None:
                stages[sid] = s = {
                    "wall": 0.0, "start": 0.0, "tasks": 0, "name": "?",
                    "details": [], "run": 0.0, "cpu": 0.0, "sr": 0.0,
                    "sw": 0.0, "inp": 0.0, "spill": 0.0, "py": 0.0,
                }
            acc = {
                a["Name"]: a.get("Update", 0)
                for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                if isinstance(a.get("Update"), (int, float))
            }
            g = lambda k: acc.get(f"internal.metrics.{k}", 0)  # noqa: E731
            s["run"] += g("executorRunTime") / 1e3
            s["cpu"] += g("executorCpuTime") / 1e9
            s["sr"] += (g("shuffle.read.localBytesRead")
                        + g("shuffle.read.remoteBytesRead")) / 1e6
            s["sw"] += g("shuffle.write.bytesWritten") / 1e6
            s["inp"] += g("input.bytesRead") / 1e6
            s["spill"] += g("diskBytesSpilled") / 1e6

    rows = [(sid, s) for sid, s in stages.items() if s["wall"] >= min_wall]
    rows.sort(key=lambda kv: -kv[1]["wall"])
    total_wall = sum(s["wall"] for _, s in stages.items())
    total_run = sum(s["run"] for _, s in stages.items())
    print(f"log: {path}")
    print(f"sum stage wall: {total_wall:.1f}s   sum task run: {total_run:.1f}s")
    print(f"{'sid':>4} {'t+':>6} {'wall':>7} {'taskrun':>8} {'cpu':>7} {'n':>4} "
          f"{'shufR':>7} {'shufW':>7} {'input':>7} {'spill':>6}  site")
    for sid, s in rows:
        site = s["details"][0] if s["details"] else s["name"][:60]
        print(f"{sid:>4} {s['start']:>6.0f} {s['wall']:>7.1f} {s['run']:>8.1f} "
              f"{s.get('cpu',0):>7.1f} "
              f"{s['tasks']:>4} {s['sr']:>7.0f} {s['sw']:>7.0f} "
              f"{s['inp']:>7.0f} {s['spill']:>6.0f}  {site[:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
