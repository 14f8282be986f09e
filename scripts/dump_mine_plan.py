"""Dump the LAZY physical plan of the geocode_pages union (pre-checkpoint)
and count its heavy operators — the checkpointed plan the driver sees hides
the build behind a Scan ExistingRDD, so this is the only way to read the
mining pipeline's real plan shape.

Usage: python scripts/dump_mine_plan.py [sf] [out.txt]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

BENCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def main(sf: float, out_path: str) -> None:
    from pyspark.sql import functions as F

    from geospark import benchgen, etl, mine
    from geospark.forward import forward_geocode
    from geospark.reverse import reverse_geocode
    from geospark.session import get_spark
    from geospark.tables import GeocoderTables

    spark = get_spark("dump-mine-plan", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    world_dir = benchgen.ensure_bench_world(BENCH_ROOT, sf)

    osm = etl.load_osm_tables(spark, world_dir)
    struct = {k: v.cache() for k, v in etl.build_struct_tables(spark, osm).items()}
    tables = GeocoderTables(spark, struct, osm["osm_admin"])
    pages = spark.read.parquet(f"{world_dir}/webpages.parquet")

    # replicate mine.geocode_pages up to (but not including) the checkpoint
    scan = pages.select(
        "url",
        F.when(F.col("text").rlike(mine.ADDR_ANCHOR_RE),
               F.regexp_extract_all(F.col("text"), F.lit(mine.ADDR_RE), F.lit(0)))
         .otherwise(F.array().cast("array<string>")).alias("__am"),
        F.regexp_extract_all(F.col("text"), F.lit(mine.COORD_RE), F.lit(0)).alias("__cm"),
    ).filter((F.size("__am") > 0) | (F.size("__cm") > 0)).persist()

    addr = (scan.select("url", F.explode("__am").alias("__m"))
            .select("url",
                    F.regexp_extract("__m", mine.ADDR_RE, 1).alias("road"),
                    F.regexp_extract("__m", mine.ADDR_RE, 2).alias("house_number"),
                    F.regexp_extract("__m", mine.ADDR_RE, 3).alias("postcode"),
                    F.regexp_extract("__m", mine.ADDR_RE, 4).alias("city"))
            .filter(F.col("road") != "")
            .withColumn("query_id",
                        F.xxhash64("url", "road", "house_number", "postcode", "city")))
    fwd_q = addr.select(
        "query_id", "road", "house_number", "postcode", "city",
        F.lit(None).cast("string").alias("country"),
        F.lit(None).cast("double").alias("center_lat"),
        F.lit(None).cast("double").alias("center_lon"),
        F.lit(20000.0).alias("radius"), F.lit(1).alias("limit"),
    )
    fwd_persists: list = []
    fwd_raw = forward_geocode(spark, tables, fwd_q, batch_has_countries=False,
                              materialize=False, persist_registry=fwd_persists,
                              scalar_limit=1)
    fwd = fwd_raw.select(
        "query_id", F.lit("address").alias("kind"),
        "road", "house_number", "postcode", "city", "x", "y")
    fwd = fwd.join(addr.select("query_id", "url"), "query_id", "inner").drop("query_id")

    coords = (scan.select("url", F.explode("__cm").alias("__m"))
              .select("url",
                      F.regexp_extract("__m", mine.COORD_RE, 1).cast("double").alias("lat"),
                      F.regexp_extract("__m", mine.COORD_RE, 2).cast("double").alias("lon"))
              .filter((F.abs("lat") <= 85.06) & (F.abs("lon") <= 180.0))
              .withColumn("query_id", F.xxhash64("url", "lat", "lon")))
    rev_q = coords.select("query_id", "lat", "lon",
                          F.lit(150.0).alias("radius"), F.lit(1).alias("limit"))
    rev = reverse_geocode(spark, tables, rev_q, with_fallback=False,
                          scalar_limit=1).select(
        "query_id", F.lit("coordinate").alias("kind"),
        "road", "house_number", "postcode", "city", "x", "y")
    rev = rev.join(coords.select("query_id", "url"), "query_id", "inner").drop("query_id")

    out = fwd.unionByName(rev)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    with open(out_path, "w") as f:
        f.write(plan)
    import re

    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)
    from collections import Counter

    print({k: v for k, v in Counter(ops).most_common() if k in (
        "SortAggregate", "HashAggregate", "ObjectHashAggregate", "Exchange",
        "Sort", "Window", "ArrowEvalPython", "BroadcastHashJoin",
        "ShuffledHashJoin", "SortMergeJoin", "Generate")})
    # the interesting bit: every SortAggregate block with its aggregate exprs
    for m in re.finditer(r"^\((\d+)\) (SortAggregate|Sort)\b.*?(?=^\(\d+\) )",
                         plan, re.M | re.S):
        block = m.group(0)
        keys = re.search(r"(Keys|Sort order|Functions) ?[:\[].*", block)
        print(f"--- node ({m.group(1)}) {m.group(2)}: "
              + "; ".join(ln.strip()[:180] for ln in block.splitlines()[1:4]))
    scan.unpersist()
    for c in fwd_persists:
        c.unpersist()


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.0,
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/mine_plan.txt")
