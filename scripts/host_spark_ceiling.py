"""Spark-native scaling ceiling of the sandbox host: a trivially-parallel,
bandwidth-bound job with ZERO engine code, run at N vs 4N executors in the
exact harness of bench_scaling.py (local-cluster[N,1,mem], fixed 64-part
layout, locality.wait=0, steady-state warmup).

The job: sum a cached ~6 GB column of random doubles, re-read 32x per
action via self-union — one wide cached scan + partial aggregation, the
memory-access shape of a page-scan pipeline with none of geospark's joins,
windows, or UDFs. Whatever efficiency THIS job loses from N to 4N
executors is the host's floor (single shared memory system + co-tenant
noise), not the engine's: a result of e.g. 0.75 here means no engine can
measure above ~0.75 on this box for scan-heavy work, and engine numbers
should be read against this ceiling, not against 1.0.

GEOSPARK_CEILING_JOB=alloc switches to an ALLOCATION-HEAVY variant (JVM
regexp_replace over cached strings + length/sum — still zero engine code):
the scan job streams with almost no object churn, while the geocode engine's
hot stages are regex mining and join probes that allocate heavily. On a
box whose aggregate memory bandwidth saturates by 16 streams
(BENCH/host_bandwidth.json), allocation traffic (young-gen zeroing +
copying collection) competes for the same bandwidth, so the measurable
ceiling for allocation-heavy work is LOWER than the scan ceiling — this
variant measures it.

Usage:
    python scripts/host_spark_ceiling.py            # N=4 vs 16, scan job
    GEOSPARK_CEILING_JOB=alloc python scripts/host_spark_ceiling.py
    GEOSPARK_CEILING_N=2 python scripts/host_spark_ceiling.py
    -> BENCH/host_spark_ceiling.json (accumulates pairs per job kind)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
N_SMALL = int(os.environ.get("GEOSPARK_CEILING_N", "4"))
N_BIG = 4 * N_SMALL
# 500M rows x 8B = ~4 GB cached: fits fully in memory even in the SMALL
# config (4 executors x 4096 MB -> ~10 GB storage) — a partially
# disk-spilled cache would measure disk, not memory bandwidth
JOB = os.environ.get("GEOSPARK_CEILING_JOB", "scan")
ROWS = int(os.environ.get(
    "GEOSPARK_CEILING_ROWS",
    str(500_000_000 if JOB == "scan" else 40_000_000)))
COPIES = 32 if JOB == "scan" else 4
RUNS = 3
EXEC_MB = int(os.environ.get("GEOSPARK_SCALING_EXEC_MB",
                             str(max(1024, min(4096, 65536 // N_BIG)))))


def worker(cpus: int) -> None:
    os.environ.setdefault("GEOSPARK_DRIVER_MEM", "16g")
    from pyspark.sql import functions as F

    from geospark.session import get_spark

    parts = 64
    spark = get_spark(
        f"ceiling-{cpus}", master=f"local-cluster[{cpus},1,{EXEC_MB}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.locality.wait": "0s",
            # single-core executors size GC/JIT/Netty pools for their ONE
            # core, as cgroup-aware container JVMs do on a real cluster —
            # without this, 16 executors run ~23 parallel GC threads each
            # (see bench_scaling.py)
            "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=1",
        })
    spark.sparkContext.setLogLevel("ERROR")
    if JOB == "scan":
        # ~8 B/row of incompressible doubles, 64 partitions — identical
        # layout at both parallelism levels, like the scaling harness
        base = (spark.range(0, ROWS, 1, parts)
                .select((F.rand(seed=7) * 2 - 1).alias("v"))
                .cache())
        action = None  # built below off `wide`
    else:
        # ~100 B/row strings; the measured action regexp-rewrites every row
        # (new string per row per op: the allocation profile of the engine's
        # regex-mining scan) and reduces to one long
        base = (spark.range(0, ROWS, 1, parts)
                .select(F.sha2(F.col("id").cast("string"), 256).alias("s"))
                .cache())
    base.count()  # materialize the cache
    wide = base
    for _ in range(COPIES - 1):
        wide = wide.union(base)
    def measured():
        # a FRESH DataFrame per run: re-collecting one DataFrame object
        # reuses its materialized AQE shuffle stages (measured 19.6 s ->
        # 0.06 s on the second collect of the same object), which would
        # time the stage cache instead of the job
        if JOB == "scan":
            return wide.agg(F.sum("v"))
        return (wide.select(
            F.length(F.regexp_replace(F.upper(F.col("s")), "[0-9]", "#"))
            .alias("n")).agg(F.sum("n")))

    measured().collect()  # steady-state warmup (JIT per executor JVM)
    samples = []
    for _ in range(RUNS):
        t0 = time.time()
        measured().collect()
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"cpus": cpus, "seconds_runs": samples}))


def main() -> None:
    samples: dict[int, list[float]] = {N_SMALL: [], N_BIG: []}
    for cpus in (N_SMALL, N_BIG, N_SMALL, N_BIG):  # symmetric interleave
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", str(cpus)],
            capture_output=True, text=True, cwd=os.path.dirname(BENCH_ROOT), check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        samples[cpus].extend(r["seconds_runs"])
        print(line)
    ratio = N_BIG / N_SMALL
    med = {c: statistics.median(v) for c, v in samples.items()}
    mn = {c: min(v) for c, v in samples.items()}
    pair = {
        "job": JOB, "rows": ROWS, "copies": COPIES, "exec_mb": EXEC_MB,
        "gb_read_per_action": round(ROWS * 8 * COPIES / 1e9, 1),
        f"local[{N_SMALL}]": {"runs": samples[N_SMALL], "median": med[N_SMALL], "min": mn[N_SMALL]},
        f"local[{N_BIG}]": {"runs": samples[N_BIG], "median": med[N_BIG], "min": mn[N_BIG]},
        "efficiency_median": round(med[N_SMALL] / med[N_BIG] / ratio, 3),
        "efficiency_min": round(mn[N_SMALL] / mn[N_BIG] / ratio, 3),
        "load_at_launch": round(os.getloadavg()[0], 2),
    }
    path = os.path.join(BENCH_ROOT, "host_spark_ceiling.json")
    doc = {"note": "scaling efficiency of a zero-engine-code bandwidth-bound "
                   "Spark job on this host; the measurable ceiling for "
                   "scan-heavy work", "pairs": {}}
    if os.path.exists(path):
        try:
            doc["pairs"] = json.load(open(path)).get("pairs", {})
        except Exception:
            pass
    key = f"{N_SMALL}->{N_BIG}" if JOB == "scan" else f"{N_SMALL}->{N_BIG} {JOB}"
    doc["pairs"][key] = pair
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({key: {
        "efficiency_median": pair["efficiency_median"],
        "efficiency_min": pair["efficiency_min"]}}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
