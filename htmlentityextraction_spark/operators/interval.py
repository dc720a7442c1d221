"""Interval (range) join — match point events to validity windows
without the nested-loop plan Spark produces for non-equi join
conditions.

A condition like ``p.ts BETWEEN i.start AND i.end`` with only an
equality on the entity key is planned as BroadcastNestedLoopJoin /
CartesianProduct once the inequality dominates — O(|points| ×
|intervals|) per key. The scale-correct shape (used by Flink interval
joins and range-join optimizations in warehouse engines) is GRAIN
BUCKETING: quantize time into fixed-width grains, explode each
interval to the grains it overlaps, map each point to its single
grain, equi-join on (key, grain) — co-partitioned, shuffle-once —
then apply the exact predicate to discard same-grain near-misses.
Each interval lands in ceil(len/grain)+1 buckets, so candidate
fan-out is bounded by construction; pick the grain near the typical
interval length to keep the blow-up ~2x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    grain_seconds: int = 3600,
    inclusive_end: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row (same key)
    whose ``[start_ts, end_ts)`` contains ``point_ts`` (closed end
    with ``inclusive_end``). Output: all point columns + all interval
    columns (caller aliases collisions away beforehand).

    Implementation: one equi shuffle on (key, time-grain) + exact
    filter — no non-equi join in the plan (contract-tested)."""
    keys = [on] if isinstance(on, str) else list(on)
    g = int(grain_seconds) * 1_000_000

    def us(col: str):  # NTZ-safe epoch micros under a pinned-UTC session
        return F.unix_micros(F.col(col).cast("timestamp_ltz"))

    p = points.withColumn("__g", (us(point_ts) / g).cast("long"))
    # malformed (end < start) intervals match nothing; dropping them
    # here also guards sequence(), which would otherwise yield a
    # DESCENDING grain range rather than an empty one
    intervals = intervals.filter(F.col(start_ts) <= F.col(end_ts))
    i = intervals.withColumn(
        "__g",
        F.explode(F.sequence((us(start_ts) / g).cast("long"), (us(end_ts) / g).cast("long"))),
    )
    end_pred = (
        F.col(point_ts) <= F.col(end_ts)
        if inclusive_end
        else F.col(point_ts) < F.col(end_ts)
    )
    return (
        p.join(i, [*keys, "__g"])
        .filter((F.col(point_ts) >= F.col(start_ts)) & end_pred)
        .drop("__g")
    )
