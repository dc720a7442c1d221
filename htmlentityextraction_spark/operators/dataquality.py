"""Deequ-style data-quality constraint suite in one aggregation pass.

A 100 TB ingest needs its expectation checks (completeness,
uniqueness, bounds, pattern conformance, set membership) computed
WITHOUT one job per check: every metric here is a conditional
aggregate, so the whole suite compiles to a single partial-aggregated
scan (plus one ``count_distinct`` per uniqueness check, which Spark
executes in the same stage via expand). The output is a tall report
table (check, column, metric, threshold, passed) — the shape the
reference's operators emit for run accounting
(`analytics/UpdateProdMetrics.scala:41-55` accumulator report), made
relational.

Checks are declarative dataclasses so a pipeline can assert
``report.filter(~passed).isEmpty()`` as its admission gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def completeness(col: str) -> Column:
    return F.count(col) / F.count(F.lit(1))


def uniqueness(col: str) -> Column:
    return F.count_distinct(F.col(col)) / F.count(F.lit(1))


def pattern_rate(col: str, pattern: str) -> Column:
    return F.sum(F.col(col).rlike(pattern).cast("long")) / F.count(F.lit(1))


def in_set_rate(col: str, values: tuple) -> Column:
    return F.sum(F.col(col).isin(*values).cast("long")) / F.count(F.lit(1))


def check_suite(df: DataFrame, checks: list[tuple[str, str, Column, float]]) -> DataFrame:
    """Run ``checks`` — (check_name, column, metric_column, min_threshold)
    — in ONE aggregation. Returns (check, col_name, metric, threshold,
    passed), one row per check, built by aggregating all metrics into
    a single row then unpivoting driver-free via stack().
    """
    aggs = [m.alias(f"__m{i}") for i, (_, _, m, _) in enumerate(checks)]
    row = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, (name, col, _, thr) in enumerate(checks):
        stack_args += [
            F.lit(name),
            F.lit(col),
            F.col(f"__m{i}").cast("double"),
            F.lit(float(thr)),
        ]
    n = len(checks)
    out = row.select(
        F.stack(F.lit(n), *stack_args).alias("check", "col_name", "metric", "threshold")
    )
    return out.withColumn("passed", F.col("metric") >= F.col("threshold"))
