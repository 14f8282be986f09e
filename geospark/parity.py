"""Shared Spark-vs-DuckDB comparison used by scripts/check_oracles.py and
tests/test_oracle_parity.py — a local replica of the driver's correctness
gate (row count + column set + order-insensitive canonical values)."""

from __future__ import annotations

import math

DRIVER_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]


def canon(records: list[dict], cols: list[str]) -> list[str]:
    out = []
    for row in records:
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


def register_views(con, sf_dir: str) -> None:
    for t in DRIVER_TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def compare_one(spark, con, name: str, sf_dir: str):
    """Returns (status, detail): status in {'pass','rows-only','fail'}."""
    from . import entry_queries as eq

    spd = eq.QUERIES[name](spark, sf_dir).toPandas()
    sql = eq.ORACLES.get(name)
    if sql is None:
        return "rows-only", f"{len(spd)} rows"
    opd = con.execute(sql).fetchdf()
    scols, ocols = sorted(spd.columns), sorted(opd.columns)
    if scols != ocols:
        return "fail", f"schema {scols} vs {ocols}"
    if len(spd) != len(opd):
        return "fail", f"rowcount {len(spd)} vs {len(opd)}"
    sc = canon(spd.to_dict("records"), scols)
    oc = canon(opd.to_dict("records"), ocols)
    if sc != oc:
        diff = [(a, b) for a, b in zip(sc, oc) if a != b][:2]
        return "fail", f"values differ, e.g. {diff}"
    return "pass", f"{len(spd)} rows"
