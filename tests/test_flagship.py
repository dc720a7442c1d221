from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sys_prod_id" in df.columns
    assert "var_level" in df.columns


def test_flagship_levels_in_range(spark, sf_dir):
    from htmlentityextraction_spark.plans.prod_metrics import price_delta_market_position

    df = price_delta_market_position(spark, sf_dir)
    rows = df.limit(500).collect()
    for r in rows:
        assert 1 <= r["var_level"] <= 5
        assert r["position_level"] in {5, 10, 20, 30, 40, 50, 60, 70, 80, 90, 95, 100}
        assert 1 <= r["max_rel_delta_level"] <= 6
        assert 0 < r["relative_position"] <= 1.0


def test_registry_oracle_keys_subset():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert "price_delta_market_position" in qs
