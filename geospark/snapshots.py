"""Snapshot/manifest table layer: Iceberg-style semantics over parquet.

The north_rule requires every stage to emit per-partition lineage records and
the pipeline to resume from the last committed snapshot/checkpoint. Iceberg
jars are not available in this sandbox (SURVEY.md §7.0), so the semantics are
implemented as a thin, self-contained layer:

  * ``commit(df, table_dir, name)``: writes parquet to a versioned data dir,
    collects per-partition lineage (partition id -> row count) and file list,
    then atomically renames ``_manifest.json.tmp`` -> ``snapshot-N.json``.
    A crash mid-write leaves no committed snapshot → the stage re-runs.
  * ``latest(table_dir)``: newest committed snapshot metadata, or None.
  * ``Pipeline.stage(name, build_fn)``: runs build_fn only when no committed
    snapshot exists (resume-from-checkpoint == skip finished stages), else
    reads the snapshot back. Equality of resumed vs cold runs is tested in
    tests/test_snapshots.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _snapshot_files(table_dir: str) -> list[str]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        f for f in os.listdir(table_dir)
        if f.startswith("snapshot-") and f.endswith(".json")
    )


def latest(table_dir: str) -> dict | None:
    snaps = _snapshot_files(table_dir)
    if not snaps:
        return None
    with open(os.path.join(table_dir, snaps[-1])) as fp:
        return json.load(fp)


def commit(df: DataFrame, table_dir: str, name: str, mode: str = "error") -> dict:
    """Write df as the next snapshot of ``table_dir`` with lineage records."""
    prev = _snapshot_files(table_dir)
    version = len(prev) + 1
    # skip past orphaned data dirs from crashed (never-committed) writes —
    # only the snapshot-json rename commits a data dir
    k = version
    while os.path.exists(os.path.join(table_dir, f"data-v{k}")):
        k += 1
    data_dir = os.path.join(table_dir, f"data-v{k}")
    df.write.mode(mode).parquet(data_dir)

    # per-partition lineage of the *written* data (read back so the lineage
    # reflects committed files, not the pre-write plan)
    spark = df.sparkSession
    written = spark.read.parquet(data_dir)
    lineage = [
        {"partition": int(r["pid"]), "rows": int(r["rows"])}
        for r in written.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows")).collect()
    ]
    manifest = {
        "table": name,
        "version": version,
        "data_dir": data_dir,
        "files": sorted(f for f in os.listdir(data_dir) if f.endswith(".parquet")),
        "row_count": sum(p["rows"] for p in lineage),
        "partition_lineage": lineage,
        "schema": written.schema.jsonValue(),
        "committed_at_unix": int(time.time()),
    }
    tmp = os.path.join(table_dir, "_manifest.json.tmp")
    final = os.path.join(table_dir, f"snapshot-{version:05d}.json")
    with open(tmp, "w") as fp:
        json.dump(manifest, fp, indent=1, sort_keys=True)
    os.replace(tmp, final)  # atomic commit point
    return manifest


class Pipeline:
    """Resumable multi-stage build: each stage materializes to a committed
    snapshot; on re-run, committed stages are read back instead of rebuilt
    (optimize/001..018's file-order topology as checkpointed DataFrame
    stages, SURVEY.md §3.4)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.metrics: list[dict] = []

    def stage(self, name: str, build_fn) -> DataFrame:
        table_dir = os.path.join(self.root, name)
        snap = latest(table_dir)
        if snap is not None:
            self.metrics.append({"stage": name, "resumed": True, "rows": snap["row_count"]})
            return self.spark.read.parquet(snap["data_dir"])
        t0 = time.time()
        df = build_fn()
        manifest = commit(df, table_dir, name)
        self.metrics.append({
            "stage": name, "resumed": False, "rows": manifest["row_count"],
            "seconds": round(time.time() - t0, 3),
        })
        return self.spark.read.parquet(manifest["data_dir"])
