from htmlentityextraction_spark.plans.prod_metrics import (
    price_delta_market_position,
    price_deltas,
    price_observations,
)

__all__ = ["price_delta_market_position", "price_deltas", "price_observations"]
