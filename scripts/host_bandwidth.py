"""Memory-BANDWIDTH ceiling of the sandbox host at N concurrent processes.

host_ceiling.py measures the box's pure-CPU multiprocessing scaling
(cache-resident arithmetic: 0.94-0.95 efficiency at 4->16 processes). But a
Spark executor fleet is not cache-resident: scans, shuffle serialization,
hashing and join probes stream through memory. On a single-socket shared
host every executor JVM competes for ONE memory system, where a real
16-node cluster has 16 — so if the box's aggregate bandwidth saturates
below 16 streams, per-core CPU time inflates with executor count and a
faithful 4-vs-16-executor scaling measurement is physically impossible on
this box regardless of engine quality.

The probe: each worker process repeatedly streams a 256 MB numpy array
(read + write: `dst[:] = src` then `src += 1`), far beyond L3, for a fixed
wall window; aggregate GB/s is summed across workers. Usage:

    python scripts/host_bandwidth.py            # probes 1, 4, 8, 16, 32
    -> BENCH/host_bandwidth.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

ARR_MB = 256
WINDOW_S = 6.0


def worker(q: mp.Queue, barrier) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty(n, dtype=np.float64)
    dst[:] = src  # touch every page BEFORE the timed window (allocation +
    src += 1.0    # first-write page faults are not bandwidth)
    barrier.wait()  # all workers stream simultaneously or the probe
    t0 = time.time()  # measures solo bandwidth for early finishers
    t_end = t0 + WINDOW_S
    passes = 0
    while time.time() < t_end:
        dst[:] = src          # stream read + stream write
        src += 1.0            # read-modify-write
        passes += 1
    elapsed = time.time() - t0
    # bytes moved per pass: copy reads+writes ARR_MB each, += reads+writes
    # ARR_MB each -> 4 * ARR_MB per pass
    q.put(passes * 4 * ARR_MB / 1024.0 / elapsed)  # GB/s this worker


def probe(n_procs: int) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n_procs)
    procs = [mp.Process(target=worker, args=(q, barrier)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(rates)
    return {"procs": n_procs,
            "aggregate_gb_s": round(agg, 2),
            "per_proc_gb_s": round(agg / n_procs, 2)}


def main() -> None:
    load0 = round(os.getloadavg()[0], 2)
    points = [probe(n) for n in (1, 4, 8, 16, 32)]
    by_n = {p["procs"]: p for p in points}
    out = {
        "note": "streaming memory bandwidth of this host at N concurrent "
                "processes (256MB arrays, copy + increment)",
        "load_at_launch": load0,
        "points": points,
        # per-process bandwidth retention across the scaling pairs: the
        # bandwidth analogue of host_ceiling.json's CPU efficiency
        "pairs": {
            "4->16": round(by_n[16]["per_proc_gb_s"] / by_n[4]["per_proc_gb_s"], 3),
            "8->32": round(by_n[32]["per_proc_gb_s"] / by_n[8]["per_proc_gb_s"], 3),
            "1->4": round(by_n[4]["per_proc_gb_s"] / by_n[1]["per_proc_gb_s"], 3),
        },
    }
    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench, exist_ok=True)
    with open(os.path.join(bench, "host_bandwidth.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
