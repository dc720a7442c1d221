"""SparkSession factory.

The reference tunes Spark 1.3 by hand (Kryo, partition counts, executor
sizing scripts — SURVEY.md §4). On modern Spark the same goals are met
declaratively: AQE re-plans shuffles at runtime (coalesce, skew-join),
Arrow accelerates the few pandas-UDF islands, and shuffle-partition
count is sized to the environment instead of hard-coded per job
(reference: `/root/reference/src/main/resources/max-spark-default.sh:20-60`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be cluster-level settings; values here are the
# local[32] test-rig equivalents. Everything is overridable via env.
_DEFAULTS = {
    # Let AQE pick real shuffle parallelism at runtime; 32 matches the
    # local test rig (1 core : 1 partition). On a 1000-executor cluster
    # set spark.sql.shuffle.partitions ~= 2-3x total cores and let AQE
    # coalesce down.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the pandas-UDF islands (extraction, per-domain models).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast joins for dimension tables (region/nation/supplier ~KB).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # 128 MB input splits — the parquet-scan sweet spot at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(app_name: str = "htmlentityextraction-spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Master defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the master/deploy-mode comes from spark-submit and this
    factory only contributes SQL-level tuning.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
