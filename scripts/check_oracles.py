"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB (views over the sf dir), compare
row count + column set + order-insensitive values. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("∅")
            elif isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, bool):
                vals.append(str(bool(v)).lower())
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from geospark.session import get_spark
    from geospark import entry_queries as eq

    spark = get_spark("oracle-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed, failed, skipped = [], [], []
    for name, fn in eq.QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR {type(e).__name__}: {str(e)[:300]}"))
            continue
        sql = eq.ORACLES.get(name)
        if sql is None:
            skipped.append((name, len(spd)))
            continue
        try:
            opd = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR {type(e).__name__}: {str(e)[:300]}"))
            continue
        scols, ocols = sorted(spd.columns), sorted(opd.columns)
        if scols != ocols:
            failed.append((name, f"SCHEMA {scols} vs {ocols}"))
            continue
        if len(spd) != len(opd):
            failed.append((name, f"ROWCOUNT {len(spd)} vs {len(opd)}"))
            continue
        sc = canon(spd.to_dict("records"), scols)
        oc = canon(opd.to_dict("records"), ocols)
        if sc != oc:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            failed.append((name, f"VALUES differ, e.g. {diff}"))
            continue
        passed.append((name, len(spd)))

    print(f"\n=== PASS ({len(passed)}) ===")
    for n, c in passed:
        print(f"  {n}: {c} rows")
    print(f"=== ROWS-ONLY / no oracle ({len(skipped)}) ===")
    for n, c in skipped:
        print(f"  {n}: {c} rows")
    print(f"=== FAIL ({len(failed)}) ===")
    for n, msg in failed:
        print(f"  {n}: {msg}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
