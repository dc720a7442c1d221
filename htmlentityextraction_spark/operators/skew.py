"""Skew-mitigation operators for 100 TB runs.

AQE's skew-join splitting handles JOIN skew automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py), but
aggregation skew on low-cardinality hot keys still serializes into a
few reducer tasks. The classic fix is salted two-phase aggregation:
shuffle once on (key, salt) so the hot key spreads over N partial
groups, then merge the N partials per key — algebraic aggregates
(count/sum/min/max, and avg as sum/count) recombine exactly.

This is also how the flagship pipeline should aggregate per-domain
stats at 100 TB when a handful of mega-domains dominate the corpus
(the reference's per-domain coalesce(10) was the same instinct,
hand-rolled — `GBTDomainSuperParSelectCandid.scala:46`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.temporal import (
    assert_timestamp_col,
    epoch_seconds,
)


def salted_group_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase (salted) count/sum/avg/min/max per key group.

    Phase 1 groups by (keys, salt) — salt derived from a high-
    cardinality column (or random-ish row hash) so a hot key fans out
    over salt_buckets reducers; phase 2 merges partials per key. The
    result is exactly the plain groupBy (asserted by the DuckDB
    oracle of `salted_skew_group_stats`)."""
    salt = (
        F.pmod(salt_on, F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(value_col).alias("__n"),
            F.sum(value_col).alias("__s"),
            F.min(value_col).alias("__mn"),
            F.max(value_col).alias("__mx"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        # floor(x*100+0.5)/100, not round(): the total is ~1e9, where
        # Spark's HALF_UP decimal round and DuckDB's binary round pick
        # different nearest doubles; floor at cent precision is exact
        # in both engines (sum*100 is integral and < 2^53)
        # NaN-transparent: Spark's floor(NaN) is 0, DuckDB's is NaN —
        # a NaN sum must stay NaN on both engines
        F.when(F.isnan(F.sum("__s")), F.sum("__s"))
        .otherwise(F.floor(F.sum("__s") * 100 + 0.5) / 100)
        .alias("total"),
        F.round((F.sum("__s") / F.sum("__n")) + 1e-9, 6).alias("mean"),
        F.min("__mn").alias("vmin"),
        F.max("__mx").alias("vmax"),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event of the same user exceeds gap_minutes.
    Batch form of the custom stateful operator (the streaming twin is
    streaming/pipeline.sessionize_stream). One window shuffle on
    user; session ids are (user, running count of gap-breaks)."""
    from pyspark.sql import Window

    # ts_col must be a timestamp type: epoch_seconds' timestamp_ltz
    # cast would silently reinterpret a raw epoch long as seconds
    assert_timestamp_col(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ep = epoch_seconds(ts_col)
    gap = ep - F.lag(ep).over(w)
    is_new = (gap.isNull() | (gap > gap_minutes * 60)).cast("long")
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w)
    )
    return (
        with_sess.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            epoch_seconds("session_end") - epoch_seconds("session_start"),
        )
    )
