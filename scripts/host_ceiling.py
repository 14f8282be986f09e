"""Measure the HOST's scaling ceiling with a pure-CPU, zero-shared-state
workload (independent Python processes, no JVM/Spark). This bounds any
Spark job's achievable N -> 4N efficiency on this machine: the scaling
evidence pair (GEOSPARK_SCALING_N) is chosen so the hardware itself can
express >= 0.8.

Usage: python scripts/host_ceiling.py  -> writes BENCH/host_ceiling.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N = 4_000_000


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def run(workers: int, tasks: int) -> float:
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(burn, [N] * tasks)
    return time.time() - t0


def main() -> None:
    out = {"note": "pure-CPU multiprocessing scaling of this host",
           "points": {}, "pairs": {}}
    thr = {}
    for w in (1, 2, 4, 8, 16, 24, 32):
        dt = run(w, w * 4)
        thr[w] = (w * 4) / dt
        out["points"][str(w)] = {"seconds": round(dt, 2),
                                 "tasks_per_sec": round(thr[w], 2)}
    for small, big in ((2, 8), (4, 16), (8, 32)):
        eff = thr[big] / thr[small] / (big / small)
        out["pairs"][f"{small}->{big}"] = round(eff, 3)
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "host_ceiling.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
