"""SparkSession construction with scale-appropriate defaults.

Single place where engine-level tuning lives so tests, bench.py and
spark-submit entrypoints agree:

* AQE on (runtime re-plan, skew-join splitting) — the transcripts workload
  is conv_id-skewed by construction;
* Arrow on — every Python crossing is an Arrow batch (pandas UDFs only);
* shuffle partitions sized to cores locally; on a real cluster the caller
  overrides to ~2-3× total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "neo4j-graphrag-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # scan splits: fixtures compress heavily (50k-row groups, ~1MB
        # each); default 128MB maxPartitionBytes would give single-digit
        # scan tasks and cap scan parallelism
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: executors live in the driver JVM — size it for
        # task-thread count × cached stage boundaries
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
