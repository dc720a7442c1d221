"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship price-delta + market-position query
at sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles where SQL-expressible.
Implementation lives in ``htmlentityextraction_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from htmlentityextraction_spark import registry  # noqa: E402
from htmlentityextraction_spark.plans.prod_metrics import price_delta_market_position  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return price_delta_market_position(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators → rows-only check)."""
    return registry.oracles()
