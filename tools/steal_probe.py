"""Pure-CPU vCPU-delivery control for the 8-vs-32 scaling pairing.

Spins N python processes (each a tight integer loop) for a fixed window and
records /proc/stat steal%% plus achieved per-process work rate, interleaved
ABAB for N in (8, 32) so co-tenant drift cancels. No Spark, no memory
pressure — this isolates what the hypervisor actually delivers from
everything the DAG does.

Why it exists: four full-DAG 8->32 campaigns at 1.6M pages each measured a
clean local[8] leg (0.0-0.4%% steal) and a contaminated local[32] leg
(4-16%% steal) — see BENCH/attempts.jsonl. This probe shows the pattern is
not bad luck with "windows closing": steal on this box is DEMAND-dependent.
Ask for 8 vCPUs and they arrive; ask for 32 and the host takes back 6-9%%
whenever the co-tenant is awake (plus ~10%% lower all-core frequency even
when it is not). An 8->32 pairing here therefore measures hypervisor
capacity, not the DAG — which is why the evidence of record
(BENCH/best.json) uses the 2->8 pairing, where both levels sit inside
what the box can deliver.

Usage: python tools/steal_probe.py [reps] [seconds_per_window]
Appends one JSON line per window to stdout; summary line at the end.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(q, sec: float) -> None:
    t_end = time.time() + sec
    n = 0
    while time.time() < t_end:
        for _ in range(100000):
            n += 1
    q.put(n)


def _ticks() -> tuple[int, int]:
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(v[:8]), v[7]


def run(nproc: int, sec: float) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_spin, args=(q, sec)) for _ in range(nproc)]
    t0, s0 = _ticks()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    t1, s1 = _ticks()
    work = sum(q.get() for _ in ps)
    return {
        "nproc": nproc,
        "steal_pct": round(100 * (s1 - s0) / max(t1 - t0, 1), 2),
        "mloops_per_proc_sec": round(work / nproc / sec / 1e6, 2),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    rows = []
    for _ in range(reps):
        for n in (8, 32):
            rows.append(run(n, sec))
            print(json.dumps(rows[-1]), flush=True)
    by = {8: [r for r in rows if r["nproc"] == 8],
          32: [r for r in rows if r["nproc"] == 32]}
    best8 = max(r["mloops_per_proc_sec"] for r in by[8])
    best32 = max(r["mloops_per_proc_sec"] for r in by[32])
    print(json.dumps({
        "summary": "pure-CPU 8->32",
        "steal_8": [r["steal_pct"] for r in by[8]],
        "steal_32": [r["steal_pct"] for r in by[32]],
        "best_total_scaling": round(32 * best32 / (8 * best8), 2),
        "ceiling_efficiency": round(32 * best32 / (8 * best8) / 4, 3),
    }))


if __name__ == "__main__":
    main()
