"""Tests for scheduler math (F17/T8), RNG sampling (P8), and
observe() pipeline counters (A11)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.sched import gcd_all, lcm_all, scheduler_period


def test_gcd_lcm():
    assert gcd_all([4, 6, 8]) == 2
    assert lcm_all([4, 6, 8]) == 24
    assert scheduler_period([2, 4, 8]) == (2, 8)
    assert scheduler_period([5]) == (5, 5)


def test_rng_sampling_statistical(spark):
    # P8: seeded sample() — reproducible within an engine, fraction
    # lands near the target
    df = spark.range(20_000)
    s1 = df.sample(False, 0.1, seed=42).count()
    s2 = df.sample(False, 0.1, seed=42).count()
    assert s1 == s2, "same seed must reproduce"
    assert 1600 <= s1 <= 2400
    tr, te = df.randomSplit([0.7, 0.3], seed=123)
    assert tr.count() + te.count() == 20_000


def test_observe_counters(spark):
    # A11: the reference used accumulators for per-stage counters
    # (streaming/Htmls2PredsPipe.scala:74-84); observe() is the
    # DataFrame-native replacement
    obs = Observation("pipeline")
    df = spark.range(1000).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("id") % 2 == 0).cast("long")).alias("n_even"),
    )
    assert df.filter(F.col("id") < 10).count() == 10
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["n_even"] == 500
