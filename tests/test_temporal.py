"""Edge-case tests for the as-of and range join operators."""

from __future__ import annotations

import datetime as dt

from htmlentityextraction_spark.operators import temporal as tp


def _d(s):
    return dt.date.fromisoformat(s)


def test_asof_join_semantics(spark):
    build = spark.createDataFrame(
        [
            (1, _d("2024-01-10"), 100.0),
            (1, _d("2024-01-20"), 110.0),
            (2, _d("2024-02-01"), 50.0),
        ],
        "k long, bts date, price double",
    )
    probe = spark.createDataFrame(
        [
            (1, _d("2024-01-05"), "before-any"),   # -> null
            (1, _d("2024-01-10"), "exact-match"),  # -> 100 (at-or-before)
            (1, _d("2024-01-15"), "between"),      # -> 100
            (1, _d("2024-03-01"), "after-all"),    # -> 110
            (2, _d("2024-02-02"), "other-key"),    # -> 50
            (3, _d("2024-01-01"), "no-build"),     # -> null
        ],
        "k long, pts date, tag string",
    )
    out = {r.tag: r.asof_price for r in tp.asof_join(
        probe, build, "k", "pts", "bts", ["price"]).collect()}
    assert out == {
        "before-any": None,
        "exact-match": 100.0,
        "between": 100.0,
        "after-all": 110.0,
        "other-key": 50.0,
        "no-build": None,
    }


def test_range_join_inclusive_and_overlapping(spark):
    probe = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 35.0)], "id long, v double")
    ivals = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 20.0, 30.0)], "band string, lo double, hi double"
    )
    rows = {(r.id, r.band) for r in tp.range_join(probe, ivals, "v", "lo", "hi").collect()}
    # 20.0 is inclusive on both bands; 35 matches none
    assert rows == {(1, "a"), (2, "a"), (2, "b")}
