"""Physical-plan regression contracts for headline queries: the
properties that make these plans scale (pushdown, pruning, broadcast
choice, no stray cartesian) must not silently regress."""

from __future__ import annotations

import re

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_project_pushes_filters(spark):
    plan = _plan(spark, "scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    # projection pruned: tax/shipdate are unused and must not be read
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("l_tax" not in s and "l_shipdate" not in s for s in schemas)


def test_broadcast_dim_join_broadcasts_dims(spark):
    plan = _plan(spark, "broadcast_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_no_cartesian_and_pruned(spark):
    plan = _plan(spark, "price_delta_market_position")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    # only the 6 observation columns are read from lineitem
    assert schemas and all("l_tax" not in s for s in schemas)


def test_semi_and_anti_joins_planned_as_such(spark):
    semi = _plan(spark, "join_semi_customers_with_open_orders")
    anti = _plan(spark, "join_anti_customers_without_orders")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_dau_wau_trailing_window_is_equi_not_nlj(spark):
    # the trailing-7-day membership must be the explode+equi-groupBy
    # shape; a non-equi range join would plan as BroadcastNestedLoopJoin
    # (O(|days| x |user_days|) at scale)
    plan = _plan(spark, "daily_weekly_active_users")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Explode" in plan or "Generate" in plan


def test_whole_stage_codegen_present(spark):
    # the relational core must stay inside codegen (no interpreted
    # projections in the hot path)
    plan = _plan(spark, "scan_filter_project")
    assert "*(1)" in plan  # WholeStageCodegen stage marker
