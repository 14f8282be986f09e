"""Local replica of the driver's correctness gate. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from geospark.session import get_spark
    from geospark import entry_queries as eq
    from geospark import parity

    spark = get_spark("oracle-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    parity.register_views(con, sf_dir)

    results = {"pass": [], "rows-only": [], "fail": []}
    for name in eq.QUERIES:
        if only and name not in only:
            continue
        try:
            status, detail = parity.compare_one(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            status, detail = "fail", f"{type(e).__name__}: {str(e)[:300]}"
        results[status].append((name, detail))

    for status in ("pass", "rows-only", "fail"):
        print(f"=== {status.upper()} ({len(results[status])}) ===")
        for n, d in results[status]:
            print(f"  {n}: {d}")
    sys.exit(1 if results["fail"] else 0)


if __name__ == "__main__":
    main()
