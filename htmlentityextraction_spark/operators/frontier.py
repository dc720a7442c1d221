"""2-D Pareto frontier (skyline) as a two-level reduction.

The naive skyline is a quadratic NOT-EXISTS self-join — unusable at
100 TB. For the 2-D case (minimize ``x``, maximize ``y``) the skyline
is exactly the running-maximum frontier of ``max(y) per x`` scanned in
ascending ``x``, which Spark can compute as

1. ``groupBy(x).agg(max(y))`` — a fully parallel partial-aggregated
   shuffle that collapses the input to one row per distinct ``x``
   (bounded by the attribute's domain, not the table size), then
2. one window over that reduced set for the strict running max.

So the only non-parallel step runs on |distinct x| rows.  This is the
same spirit as the reference's extreme-picking reports
(`analytics/UpdateHotspots.scala` keeps per-level extremes, not
pairwise comparisons), generalized to dominance.

Dominance convention: q dominates p iff q.x <= p.x AND q.y >= p.y
with at least one strict. Points tied on both coordinates are
mutually non-dominating, so every (x, max-y-at-x) pair on the
frontier is kept regardless of multiplicity in the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize_col: str, maximize_col: str) -> DataFrame:
    """Distinct non-dominated (minimize_col, maximize_col) pairs.

    Returns one row per frontier point with the original column
    names. A point survives iff its y is strictly greater than every
    y seen at strictly smaller x — computed as ``max(y) OVER
    (ORDER BY x ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`` on the
    per-x maxima, which is safe because after the groupBy there is
    exactly one row per x (ties on x were already folded into the
    max), so "previous rows" == "strictly smaller x".
    """
    x, y = minimize_col, maximize_col
    per_x = df.groupBy(x).agg(F.max(y).alias(y))
    w = Window.orderBy(x).rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_x.withColumn("__prev_max", F.max(y).over(w))
        .filter(F.col("__prev_max").isNull() | (F.col(y) > F.col("__prev_max")))
        .drop("__prev_max")
    )
