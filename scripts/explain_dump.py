"""Dump .explain("formatted") for named driver queries into plans/<tag>/.

Usage: python scripts/explain_dump.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
set touched by the r6 optimization round). Queries run over the fixture
world exactly as the driver's correctness harness does (sf dir only matters
for the doc/embedding queries).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

DEFAULT = ["etl_struct_house", "geohash_check", "reverse_geocode",
           "forward_geocode", "geocode_pages", "predict_text",
           "forward_geocode_lazy"]


def _forward_lazy(spark, sf_dir):
    """forward_geocode with materialize=False: the REAL forward plan —
    the registered query checkpoints eagerly, so its explain() is only a
    scan of the checkpointed RDD (plan evidence would be vacuous)."""
    from pyspark.sql import functions as F

    from geospark import entry_queries as eq
    from geospark.forward import forward_geocode

    st = eq.geo_state(spark)
    fq = spark.read.parquet(f"{eq.FIX}/fwd_queries.parquet")
    reg: list = []
    return forward_geocode(spark, st["tables"], fq, materialize=False,
                           persist_registry=reg)


CUSTOM = {"forward_geocode_lazy": _forward_lazy}


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("GEOSPARK_DRIVER_MEM", "16g")
    from geospark.session import get_spark
    from geospark import entry_queries as eq

    spark = get_spark("explain-dump",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = (CUSTOM[name] if name in CUSTOM else eq.QUERIES[name])(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
