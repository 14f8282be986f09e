"""Stage-level scaling profile of the geocode_pages headline job.

Runs the EXACT worker protocol of bench_scaling.py (fixed 64-partition
layout, ActiveProcessorCount pinned) at one parallelism level, then pulls
per-stage wall/taskTime metrics from the live UI REST API. Comparing the
per-stage wall times between local[2] and local[8] exposes which stages
refuse to shrink with cores — the serial fraction behind a scaling-
efficiency miss.

Usage: python scripts/profile_geocode.py <cpus> [sf]

GEOSPARK_PROFILE_MODE=executors profiles `local-cluster[N,1,mem]` with the
scaling harness's exact confs (the r5 4->16 investigation); default is the
threads-mode local[N]. The job timeline (per-job spans + the gaps between
consecutive jobs) is printed alongside the stage table: gap time is pure
driver-side serial cost (planning, broadcast collect+build, Python
bookkeeping) that no executor count can shrink.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def main(cpus: int, sf: float) -> None:
    os.environ.setdefault("GEOSPARK_DRIVER_MEM", "32g")
    parts = 64
    os.environ["GEOSPARK_HOUSE_PARTS"] = str(parts)
    from geospark.session import get_spark
    from geospark import benchgen, etl, mine
    from geospark.tables import GeocoderTables

    mode = os.environ.get("GEOSPARK_PROFILE_MODE", "threads")
    if mode == "executors":
        # match the scaling harness heap (keyed to its BIG config, 4096 MB
        # for the recorded 2->8 and 4->16 pairs) so profiles see the same
        # spill behavior
        exec_mb = int(os.environ.get("GEOSPARK_SCALING_EXEC_MB",
                                     str(max(1024, min(2048, 65536 // max(16, cpus))))))
        spark = get_spark(
            f"profile-{cpus}", master=f"local-cluster[{cpus},1,{exec_mb}]",
            shuffle_partitions=parts,
            extra_conf={
                # match bench_scaling.py: executor JVM heap must be set
                # explicitly (the local-cluster master string only sizes the
                # worker's advertised capacity; executors default to 1 GB)
                "spark.executor.memory": f"{exec_mb}m",
                "spark.executorEnv.PYTHONPATH": os.path.dirname(BENCH_ROOT),
                "spark.locality.wait": "0s",
                # match bench_scaling.py: single-core executor JVMs size
                # GC/JIT/Netty pools for ONE core (cgroup-faithful), not
                # the host's 32; G1 because SerialGC ergonomics at 1 CPU
                # run multi-second pauses on multi-GB heaps
                "spark.executor.extraJavaOptions":
                    "-XX:ActiveProcessorCount=1 -XX:+UseG1GC",
            })
    else:
        os.environ["GEOSPARK_JAVA_OPTS"] = f"-XX:ActiveProcessorCount={cpus}"
        spark = get_spark(f"profile-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    world_dir = benchgen.ensure_bench_world(BENCH_ROOT, sf)

    osm = etl.load_osm_tables(spark, world_dir)
    struct = {k: v.cache() for k, v in etl.build_struct_tables(spark, osm).items()}
    for v in struct.values():
        v.count()
    tables = GeocoderTables(spark, struct, osm["osm_admin"])
    tables.houses.count(), tables.street_city.count()
    tables.street_gram_df.count(), tables.street_name_prefix.count()
    tables.hn_value_prefix.count(), tables.houses_ranked.count()
    pages = spark.read.parquet(f"{world_dir}/webpages.parquet").repartition(parts).cache()
    n_pages = pages.count()
    # Full unmeasured warmup run (whole-stage-codegen JIT-compiles per
    # executor JVM; a limit(512) warmup touches one executor and leaves the
    # fleet cold) — skipped in multi-run mode, where run 0 IS the cold probe
    # and the run-over-run trend is the point.
    if int(os.environ.get("GEOSPARK_PROFILE_RUNS", "1")) == 1:
        mine.geocode_pages(spark, tables, pages).count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.load(r)

    def jobs():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            return json.load(r)

    # GEOSPARK_PROFILE_RUNS > 1: repeat the measured job and report per-run
    # wall + executor-time + GC + host load. Run 1 of a fresh fleet is the
    # cold-JIT run; if later runs stay high the inflation is host noise or
    # memory pressure, not JIT — the separation the 4->16 investigation
    # needs on a host whose co-tenant load swings 3-10x.
    n_runs = int(os.environ.get("GEOSPARK_PROFILE_RUNS", "1"))
    run_summaries = []
    n = 0
    for run_i in range(n_runs):
        seen = {s["stageId"] for s in stages()}
        seen_jobs = {j["jobId"] for j in jobs()}
        load0 = os.getloadavg()[0]
        t0 = time.time()
        n = mine.geocode_pages(spark, tables, pages).count()
        wall = time.time() - t0
        new_stages = [s for s in stages() if s["stageId"] not in seen]
        run_summaries.append({
            "run": run_i, "wall_s": round(wall, 2),
            "sum_task_time_s": round(sum(s.get("executorRunTime", 0) for s in new_stages) / 1000, 1),
            # actual on-CPU nanoseconds: if cpu_s inflates with executor
            # count alongside run-time, the loss is memory-stall cycles
            # (cache/bandwidth contention burns CPU); if run-time inflates
            # but cpu_s doesn't, the tasks are WAITING (GC pauses, IO,
            # scheduler) — the split the 4->16 decomposition needs
            "sum_task_cpu_s": round(sum(s.get("executorCpuTime", 0) for s in new_stages) / 1e9, 1),
            "gc_s": round(sum(s.get("jvmGcTime", 0) for s in new_stages) / 1000, 1),
            "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in new_stages) / 1e6, 1),
            "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in new_stages) / 1e6, 1),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in new_stages) / 1e6, 1),
            "spill_mb": round(sum(s.get("memoryBytesSpilled", 0) for s in new_stages) / 1e6, 1),
            "load_at_launch": round(load0, 2),
        })

    # job timeline: spans + the gaps between consecutive jobs. Gap time is
    # driver-side serial cost (planning, AQE re-opt, broadcast collect+build,
    # Python-side bookkeeping) — invariant to executor count, so it bounds
    # scaling efficiency from above: eff <= (P/N_small + S) / 4(P/N_big + S)
    jrows = sorted((j for j in jobs() if j["jobId"] not in seen_jobs),
                   key=lambda j: _ts(j["submissionTime"]))
    jspans = []
    for j in jrows:
        jspans.append({"job": j["jobId"],
                       "sub": _ts(j["submissionTime"]),
                       "comp": _ts(j["completionTime"]),
                       "stages": len(j.get("stageIds", []))})
    job_busy = sum(js["comp"] - js["sub"] for js in jspans)
    gaps = [round(jspans[i + 1]["sub"] - jspans[i]["comp"], 2)
            for i in range(len(jspans) - 1)]

    def task_summary(stage_id, attempt):
        # quartiles of task duration: the max/median ratio is the skew signal
        try:
            url = (f"{ui}/api/v1/applications/{app_id}/stages/{stage_id}/"
                   f"{attempt}/taskSummary?quantiles=0.0,0.5,1.0")
            with urllib.request.urlopen(url) as r:
                d = json.load(r)
            lo, med, hi = d["executorRunTime"]
            return round(med / 1000, 2), round(hi / 1000, 2)
        except Exception:
            return None, None

    rows = []
    for s in stages():
        if s["stageId"] in seen:
            continue
        sub = s.get("submissionTime"); comp = s.get("completionTime")
        details = s.get("details", "")
        site = next((ln for ln in details.splitlines()
                     if "geospark/" in ln or "mine.py" in ln), "")[:120]
        med_task, max_task = task_summary(s["stageId"], s.get("attemptId", 0))
        rows.append({
            "stage": s["stageId"],
            "site": site.strip(),
            "task_med_s": med_task,
            "task_max_s": max_task,
            "tasks": s["numCompleteTasks"],
            "span_s": None if not (sub and comp) else round(
                (_ts(comp) - _ts(sub)), 2),
            "task_time_s": round(s.get("executorRunTime", 0) / 1000, 1),
            "gc_s": round(s.get("jvmGcTime", 0) / 1000, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
        })
    rows.sort(key=lambda r: -(r["span_s"] or 0))
    print(json.dumps({"cpus": cpus, "sf": sf, "mode": mode,
                      "pages": n_pages, "rows_out": n,
                      "runs": run_summaries,
                      "wall_s": round(wall, 2),
                      "sum_task_time_s": round(sum(r["task_time_s"] for r in rows), 1),
                      "n_stages": len(rows),
                      "n_jobs": len(jspans),
                      "job_busy_s": round(job_busy, 2),
                      "gap_total_s": round(wall - job_busy, 2),
                      "inter_job_gaps_s": gaps}))
    for r in rows[:25]:
        print(json.dumps(r))

    # SQL plan-node metrics for the measured execution: operator identity for
    # the heavy stages (stage details are useless here — every stage shares
    # the driver-side .count() callsite). Time-like metric values are strings
    # such as "total (min, med, max (stageId: taskId))\n2.1 m (60 ms, 1.2 s,
    # 41 s (stage 302.0: task 5))" — report any node whose max component
    # names a stage, keyed by that stage id.
    import re as _re
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/sql?details=true&length=200") as r:
            execs = json.load(r)
        # attribute nodes across ALL executions, then report only those
        # whose metric values name one of the measured run's hot stages —
        # picking one execution by duration grabbed a 3-node bookkeeping
        # query (the geocode job spans several executions: persist counts,
        # the checkpoint union, per-branch subqueries)
        hot = {r2["stage"] for r2 in rows[:8]}
        nodes = []
        for ex in execs:
            for node in ex.get("nodes", []):
                for m in node.get("metrics", []):
                    mm = _re.search(r"stage (\d+)", m.get("value", ""))
                    if not mm or int(mm.group(1)) not in hot:
                        continue
                    nodes.append({"exec": ex["id"],
                                  "node": node["nodeName"][:80],
                                  "metric": m["name"][:60],
                                  "value": " ".join(m["value"].split())[:140],
                                  "stage": int(mm.group(1))})
        print(json.dumps({"n_execs": len(execs),
                          "n_hot_attributed": len(nodes)}))
        for nrow in nodes:
            print(json.dumps(nrow))
    except Exception as e:  # UI quirks must not void the stage table above
        print(json.dumps({"sql_metrics_error": str(e)[:200]}))


def _ts(s: str) -> float:
    # "2026-08-17T04:20:01.123GMT"
    from datetime import datetime

    return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


if __name__ == "__main__":
    main(int(sys.argv[1]), float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
