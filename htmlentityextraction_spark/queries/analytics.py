"""Analytics-family queries (SURVEY.md §2.5/§2.6, §3.3)."""

from __future__ import annotations

from htmlentityextraction_spark.plans import prod_metrics
from htmlentityextraction_spark.registry import register

register("price_delta_market_position", prod_metrics.ORACLE_SQL)(
    prod_metrics.price_delta_market_position
)
