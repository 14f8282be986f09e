"""Snapshot/manifest layer: per-partition lineage + resume == cold run."""

import json
import os

from pyspark.sql import functions as F

from geospark import snapshots


def test_commit_manifest_and_lineage(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2).repartition(4)
    m = snapshots.commit(df, str(tmp_path / "t1"), "t1")
    assert m["row_count"] == 1000
    assert sum(p["rows"] for p in m["partition_lineage"]) == 1000
    assert len(m["partition_lineage"]) >= 1
    assert os.path.exists(os.path.join(str(tmp_path / "t1"), "snapshot-00001.json"))
    back = spark.read.parquet(m["data_dir"])
    assert back.count() == 1000


def test_pipeline_resume_equals_cold_run(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(0, 100).withColumn("v", F.sha2(F.col("id").cast("string"), 256))

    p1 = snapshots.Pipeline(spark, str(tmp_path / "pipe"))
    cold = p1.stage("stage_a", build).orderBy("id").collect()
    assert calls["n"] == 1 and p1.metrics[0]["resumed"] is False

    # resume: same root, build_fn must NOT run again, data identical
    p2 = snapshots.Pipeline(spark, str(tmp_path / "pipe"))
    resumed = p2.stage("stage_a", build).orderBy("id").collect()
    assert calls["n"] == 1 and p2.metrics[0]["resumed"] is True
    assert resumed == cold


def test_crash_before_commit_reruns(spark, tmp_path):
    """A data dir without a committed snapshot json is invisible: the stage
    re-runs (atomic rename is the commit point)."""
    root = str(tmp_path / "pipe2")
    os.makedirs(os.path.join(root, "stage_b", "data-v1"), exist_ok=True)
    assert snapshots.latest(os.path.join(root, "stage_b")) is None
    p = snapshots.Pipeline(spark, root)
    df = p.stage("stage_b", lambda: spark.range(5).withColumn("v", F.lit("x")))
    assert df.count() == 5
    snap = snapshots.latest(os.path.join(root, "stage_b"))
    assert snap is not None and snap["version"] == 1
    assert snap["data_dir"].endswith("data-v2")  # v1 dir was orphaned


def test_manifest_is_json_with_schema(spark, tmp_path):
    df = spark.range(10)
    m = snapshots.commit(df, str(tmp_path / "t2"), "t2")
    with open(os.path.join(str(tmp_path / "t2"), "snapshot-00001.json")) as fp:
        j = json.load(fp)
    assert j["schema"]["type"] == "struct"
    assert j["table"] == "t2"
