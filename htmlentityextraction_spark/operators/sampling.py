"""Deterministic weighted sampling without replacement
(Efraimidis–Spirakis A-Res), engine-portable.

Training-data curation constantly needs "sample k documents with
probability proportional to weight" (quality score, token count,
source priority). A-Res turns that into a plain top-k: each row draws
u ~ Uniform(0,1] and keys on u^(1/w) — the k largest keys ARE a
weighted sample without replacement (Efraimidis & Spirakis 2006,
"Weighted random sampling with a reservoir").

Determinism and portability: u is derived from md5 of the row id —
identical bytes in Spark and DuckDB (unlike each engine's native
hash), the same trick `stratified_sample_by_lang` uses. We maximize
log(u)/w instead of u^(1/w) for numerical stability (monotone
transform, same ordering).

Scale shape: a global top-k is ``orderBy(...).limit(k)``, which Spark
executes as TakeOrderedAndProject — per-partition heaps merged at the
driver, no global sort shuffle. Per-stratum variants use one window
over one shuffle by stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _uniform_from_id(id_col: Column) -> Column:
    """u in (0, 1]: 8 md5 hex chars -> 32-bit int -> (i+1)/2^32."""
    i = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("double")
    return (i + F.lit(1.0)) / F.lit(4294967296.0)


def ares_key(id_col: Column, weight_col: Column) -> Column:
    """log(u)/w — maximize this for weight-proportional sampling.
    Rows with weight <= 0 get -infinity as defense in depth, but
    callers must EXCLUDE them before ranking: -inf only means "never
    sampled" while the sample is full — under top-k with spare
    capacity (a stratum smaller than k, a corpus with < k eligible
    docs) a -inf row still fills a slot. The intedge×mixed
    interaction fuzz caught exactly that: a -2^62 n_chars doc
    sampled into a 2-doc stratum (r11)."""
    u = _uniform_from_id(id_col)
    return F.when(
        weight_col > 0, F.log(u) / weight_col
    ).otherwise(F.lit(float("-inf")))


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Top-k rows by the A-Res key: a deterministic weighted sample
    without replacement. Ties (impossible for distinct ids under md5
    short of a collision) break on id for full determinism."""
    key = ares_key(F.col(id_col), F.col(weight_col))
    return (
        # weight <= 0 (or NULL) means NOT IN THE POPULATION, not
        # lowest-priority: without this filter such rows pad the
        # sample whenever fewer than k eligible rows exist
        df.filter(F.col(weight_col) > 0)
        .withColumn("__ares", key)
        .orderBy(F.desc("__ares"), F.col(id_col))
        .limit(k)
        .drop("__ares")
    )


def weighted_sample_per_stratum(
    df: DataFrame, id_col: str, weight_col: str, stratum_col: str, k: int
) -> DataFrame:
    """k-per-stratum weighted sample: one window over one shuffle."""
    key = ares_key(F.col(id_col), F.col(weight_col))
    w = Window.partitionBy(stratum_col).orderBy(F.desc("__ares"), F.col(id_col))
    return (
        # same population boundary as weighted_sample: a stratum with
        # spare capacity must not absorb weight<=0 rows (the
        # intedge×mixed interaction finding, r11)
        df.filter(F.col(weight_col) > 0)
        .withColumn("__ares", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__ares", "__rn")
    )
