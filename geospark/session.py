"""SparkSession factory with the engine's default tuning.

Scale posture (BASELINE.json north_rule): AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (every kernel UDF is
Arrow-batched), shuffle partitions sized for the local harness but overridable
via env for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "geospark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """``extra_conf``: additional spark conf pairs (e.g. the scaling harness
    passes executor-mode settings for ``local-cluster[N,1,mem]`` masters —
    separate executor JVMs, the faithful N-vs-4N-executors emulation)."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle = shuffle_partitions or int(os.environ.get("GEOSPARK_SHUFFLE_PARTITIONS", "32"))
    b = SparkSession.builder
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return (
        b.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # conservative default; bench/scaling scripts opt into more via env
        .config("spark.driver.memory", os.environ.get("GEOSPARK_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", os.environ.get("GEOSPARK_JAVA_OPTS", ""))
        # UI off by default (driver overhead); profiling scripts opt in to
        # read per-stage metrics from the REST API
        .config("spark.ui.enabled", os.environ.get("GEOSPARK_UI", "false"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
