"""Wave-8 tests: incremental variance matview, Kaplan-Meier."""

from __future__ import annotations


def test_variance_matview_stats_are_consistent(spark, sf_dir):
    from htmlentityextraction_spark.queries.merge_q import matview_variance_incremental

    rows = matview_variance_incremental(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Cauchy-Schwarz: n·Σx² ≥ (Σx)² — exact in Python ints, the
        # invariant any correct (n, Σx, Σx²) triple satisfies
        assert r["n_orders"] * r["sum_sq_cents"] >= r["sum_cents"] ** 2
        assert r["n_orders"] > 0


def test_kaplan_meier_curve_shape(spark, sf_dir):
    from htmlentityextraction_spark.queries.behavior_q import (
        kaplan_meier_signup_to_purchase,
    )

    rows = sorted(
        kaplan_meier_signup_to_purchase(spark, sf_dir).collect(),
        key=lambda r: r["t_days"],
    )
    assert rows
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-9, "survival must be non-increasing"
        assert 0 < r["d_events"] <= r["at_risk"]
        last = r["survival"]
    # risk set shrinks over time
    risks = [r["at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
