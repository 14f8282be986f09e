"""Phase-level profile of the bench `etl_build` entry (r6 serial-floor work).

Replays EXACTLY the bench.py `build()` body (build_struct_tables + cache
counts + GeocoderTables counts) with a wall-clock timer around every phase
and the job timeline from the UI REST API, so the 20-28 s etl_build number
decomposes into named jobs + inter-job driver gaps.

Usage: python scripts/profile_etl.py [sf]   (default 0.1, local[$SPARK_GRAFT_CPUS])
Writes BENCH/etl_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def main(sf: float) -> None:
    os.environ.setdefault("GEOSPARK_DRIVER_MEM", "32g")
    os.environ["GEOSPARK_UI"] = "true"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from geospark.session import get_spark
    from geospark import benchgen, etl
    from geospark.tables import GeocoderTables

    spark = get_spark("profile-etl", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    world_dir = benchgen.ensure_bench_world(BENCH_ROOT, sf)

    phases: list[tuple[str, float]] = []
    t_all = time.time()

    def phase(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        phases.append((name, round(time.time() - t0, 3)))
        spark.sparkContext.setJobDescription(None)
        return out

    osm = phase("load_osm", lambda: etl.load_osm_tables(spark, world_dir))
    struct = phase("build_struct_tables", lambda: etl.build_struct_tables(spark, osm))
    struct = {k: v.cache() for k, v in struct.items()}
    for k, v in struct.items():
        phase(f"count_{k}", v.count)
    tables = phase("GeocoderTables_init", lambda: GeocoderTables(spark, struct, osm["osm_admin"]))
    for name in ["houses", "street_city", "street_gram_df", "street_name_prefix",
                 "hn_gram_df", "hn_value_prefix", "houses_ranked"]:
        phase(f"count_{name}", getattr(tables, name).count)
    total = round(time.time() - t_all, 3)

    # job timeline from the REST API
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = json.load(r)
    jrows = sorted(jobs, key=lambda j: j["jobId"])

    def ts(s):
        import datetime
        return datetime.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = []
    for j in jrows:
        sub, com = ts(j["submissionTime"]), ts(j.get("completionTime", j["submissionTime"]))
        spans.append({"job": j["jobId"], "desc": (j.get("description") or j["name"])[:90],
                      "wall_s": round(com - sub, 3), "sub": sub, "com": com})
    gaps = []
    for a, b in zip(spans, spans[1:]):
        gaps.append(round(b["sub"] - a["com"], 3))
    out = {
        "sf": sf, "cpus": int(cpus), "total_s": total,
        "load_at_launch": round(os.getloadavg()[0], 2),
        "phases": [{"phase": n, "wall_s": w} for n, w in phases],
        "n_jobs": len(spans),
        "sum_job_wall_s": round(sum(s["wall_s"] for s in spans), 3),
        "sum_gap_s": round(sum(gaps), 3),
        "jobs": [{k: v for k, v in s.items() if k in ("job", "desc", "wall_s")}
                 for s in spans],
        "gaps_s": gaps,
    }
    path = os.path.join(BENCH_ROOT, "etl_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"total_s": total, "n_jobs": len(spans),
                      "sum_job_wall_s": out["sum_job_wall_s"],
                      "sum_gap_s": out["sum_gap_s"]}))
    for n, w in phases:
        print(f"  {n:32s} {w:8.3f}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.1)
