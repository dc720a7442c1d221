"""Calendar spine + gap fill + forward fill for keyed time series.

Reporting over event history needs one row per (key, day) even for
days with no events — the reference's daily report jobs assume a
dense calendar downstream (`analytics/Rt2ReportIndx.scala` renders
per-day rows). At scale the dense spine must be generated
DISTRIBUTEDLY: ``sequence(min_day, max_day)`` + ``explode`` runs per
key inside the same stage as the per-key bounds aggregate — no
driver-side calendar, no cross join against a date dimension.

Forward fill is ``last(value, ignorenulls=True)`` over a per-key
ordered window frame UNBOUNDED PRECEDING → CURRENT ROW — one shuffle
by key, sorted once; at 100 TB each key's history sorts locally
within its partition (keys are independent, so skew only matters for
a single pathological key, which the caller can pre-split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_spine(df: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """One row per (key, day) covering each key's [min(day), max(day)]
    span inclusive. Input must have one day granularity column."""
    bounds = df.groupBy(key_col).agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    return bounds.select(
        key_col,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(day_col),
    )


def gap_fill_forward(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify (key, day, value) onto the per-key daily spine and
    forward-fill missing values from the last observed day.

    Returns (key, day, value, filled) where ``filled`` marks spine
    rows that had no observation. Days before a key's first
    observation cannot occur (the spine starts at min(day)).
    """
    spine = daily_spine(df, key_col, day_col)
    dense = spine.join(df, on=[key_col, day_col], how="left").withColumn(
        "__filled", F.col(value_col).isNull()
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col("__filled").alias("filled"),
    )


def gap_fill_linear(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify onto the per-key daily spine and LINEARLY interpolate
    interior gaps (forward fill holds the last value; interpolation
    draws the line between the surrounding observations — the right
    choice for sampled continuous signals like prices or gauges).

    v(day) = prev + (next - prev) * (day - prev_day)/(next_day - prev_day)

    Shapes: the same one-shuffle spine join as
    :func:`gap_fill_forward`, then ONE keyed window pass computing
    both the last observation at-or-before (frame UNBOUNDED
    PRECEDING) and the first at-or-after (frame UNBOUNDED FOLLOWING)
    — no self-joins. Spine edges have both anchors by construction
    (the spine spans min..max observed day), so interior gaps always
    interpolate; observed days return their own value exactly.
    """
    spine = daily_spine(df, key_col, day_col)
    dense = spine.join(df, on=[key_col, day_col], how="left").withColumn(
        "__filled", F.col(value_col).isNull()
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs = F.when(F.col("__filled"), None).otherwise(F.col(day_col))
    with_anchors = dense.select(
        key_col,
        day_col,
        value_col,
        "__filled",
        F.last(value_col, ignorenulls=True).over(back).alias("__pv"),
        F.last(obs, ignorenulls=True).over(back).alias("__pd"),
        F.first(value_col, ignorenulls=True).over(fwd).alias("__nv"),
        F.first(obs, ignorenulls=True).over(fwd).alias("__nd"),
    )
    frac = F.datediff(F.col(day_col), F.col("__pd")) / F.datediff(
        F.col("__nd"), F.col("__pd")
    )
    interp = F.when(~F.col("__filled"), F.col(value_col)).otherwise(
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac
    )
    return with_anchors.select(
        key_col,
        day_col,
        interp.alias(value_col),
        F.col("__filled").alias("filled"),
    )
