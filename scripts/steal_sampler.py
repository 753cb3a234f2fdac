"""Sample CPU steal/idle from /proc/stat while a benchmark runs.

Host contention on this sandbox shows up as hypervisor steal time —
cycles the guest's runnable vCPUs did not get. Sampling it alongside a
scaling run turns "the host was busy" from an inference into a
measurement. Usage: python scripts/steal_sampler.py <out.jsonl> &
then kill it (SIGTERM) when the run ends; each line is a 5 s window
with utilization percentages over all vCPUs.
"""

from __future__ import annotations

import json
import sys
import time


def read_stat() -> list[int]:
    with open("/proc/stat") as f:
        first = f.readline().split()
    # user nice system idle iowait irq softirq steal guest guest_nice
    return [int(x) for x in first[1:11]]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steal_samples.jsonl"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    prev = read_stat()
    with open(out, "a") as f:
        while True:
            time.sleep(interval)
            cur = read_stat()
            delta = [c - p for c, p in zip(cur, prev)]
            prev = cur
            total = sum(delta) or 1
            pct = lambda i: round(100.0 * delta[i] / total, 2)
            f.write(json.dumps({
                "ts": round(time.time(), 1),
                "user": pct(0), "system": pct(2), "idle": pct(3),
                "iowait": pct(4), "steal": pct(7),
            }) + "\n")
            f.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
