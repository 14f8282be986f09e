"""Stage-level scaling profile of the geocode_pages headline job.

Runs the EXACT worker protocol of bench_scaling.py (fixed 64-partition
layout, ActiveProcessorCount pinned) at one parallelism level, then pulls
per-stage wall/taskTime metrics from the live UI REST API. Comparing the
per-stage wall times between local[2] and local[8] exposes which stages
refuse to shrink with cores — the serial fraction behind a scaling-
efficiency miss.

Usage: python scripts/profile_geocode.py <cpus> [sf]
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
    os.environ["GEOSPARK_JAVA_OPTS"] = f"-XX:ActiveProcessorCount={cpus}"
    from geospark.session import get_spark
    from geospark import benchgen, etl, mine
    from geospark.tables import GeocoderTables

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
    mine.geocode_pages(spark, tables, pages.limit(512)).count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    t0 = time.time()
    n = mine.geocode_pages(spark, tables, pages).count()
    wall = time.time() - t0

    rows = []
    for s in stages():
        if s["stageId"] in seen:
            continue
        sub = s.get("submissionTime"); comp = s.get("completionTime")
        details = s.get("details", "")
        site = next((ln for ln in details.splitlines()
                     if "geospark/" in ln or "mine.py" in ln), "")[:120]
        rows.append({
            "stage": s["stageId"],
            "site": site.strip(),
            "tasks": s["numCompleteTasks"],
            "span_s": None if not (sub and comp) else round(
                (_ts(comp) - _ts(sub)), 2),
            "task_time_s": round(s.get("executorRunTime", 0) / 1000, 1),
            "gc_s": round(s.get("jvmGcTime", 0) / 1000, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        })
    rows.sort(key=lambda r: -(r["span_s"] or 0))
    print(json.dumps({"cpus": cpus, "sf": sf, "pages": n_pages, "rows_out": n,
                      "wall_s": round(wall, 2),
                      "sum_task_time_s": round(sum(r["task_time_s"] for r in rows), 1),
                      "n_stages": len(rows)}))
    for r in rows[:25]:
        print(json.dumps(r))


def _ts(s: str) -> float:
    # "2026-08-17T04:20:01.123GMT"
    from datetime import datetime

    return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


if __name__ == "__main__":
    main(int(sys.argv[1]), float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
