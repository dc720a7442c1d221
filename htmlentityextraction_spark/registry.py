"""Query registry backing ``__spark_entry__.py``.

Each implemented operator from SURVEY.md §2 registers
(name → (spark, sf_dir) -> DataFrame) and, when SQL-expressible, a
DuckDB oracle string. Column names/types are aligned between both
sides (driver hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Queries with NO full-green driver verdict yet (registry minus the
# rows+schema+hash-green union of CORRECTNESS_r01..rN.json). The
# driver samples ~50 queries per round in dict order without repeats,
# so these are surfaced FIRST. As of CORRECTNESS_r05.json the
# cumulative driver-green union covers ALL 222 registered queries —
# the round-4 evidence gap is closed and this list is empty. Any new
# query added from round 6 onward goes here until its first driver
# verdict lands.
_DRIVER_UNCONFIRMED: tuple[str, ...] = (
    # round-12: no new queries, but these changed SEMANTICS this
    # round (the keyfuzz classes: C0-strip escape-helper boundary,
    # pmod oracle twins, valid_id gates on ordering/identity axes,
    # merge-key and corpus-identity dedup via keep_one_per_id,
    # try_divide/NULLIF on degenerate-group divisions, the asof
    # NULL-key join semantics, and the zorder clamp) — front-loaded
    # so the driver re-verifies the changed behavior. The r11 list
    # got full-green verdicts in CORRECTNESS_r11.json rows 1-17 and
    # rotates out.
    "whois_contact_extraction",
    "bad_domain_analysis",
    "modulo_group_assignment",
    "did_aa_experiment_check",
    "cuped_adjusted_experiment",
    "srm_sample_ratio_mismatch",
    "merge_incremental_orders",
    "mergetable_cdc_changes",
    "mergetable_pruned_range_read",
    "incremental_rollup_maintenance",
    "matview_variance_incremental",
    "mergetable_history_rows",
    "mergetable_schema_evolution",
    "mergetable_schema_drop_widen",
    "matview_join_incremental",
    "lag_delta_per_observation",
    "last_change_walkback",
    "rolling_median_price",
    "collect_sorted_parts_per_order",
    "prod_metrics_delta_extremes",
    "prod_metrics_top2_extremes",
    "pivot_store_price_matrix",
    "scd2_price_dimension",
    "golden_user_record",
    "rfm_customer_segments",
    "basket_brand_lift",
    "fpgrowth_brand_itemsets",
    "model_registry_stats",
    "model_score_pick_price",
    "model_submodel_curve",
    "model_url_level_eval",
    "candidate_labeling",
    "price_candidate_extraction",
    "stream_serve_pipeline",
    "stream_sessionize_stateful",
    "stream_merge_upsert_per_user",
    "multimodal_metadata_profile",
    "multimodal_byte_features",
    "multimodal_resize_images",
    "multimodal_sample_frames",
    "rendezvous_shard_assignment",
    "segment_dedup_keep_first",
    "sequence_packing_bins",
    "table_diff_reconciliation",
    "semantic_dedup_keep_best",
    "semantic_dedup_scale_pipeline",
    "fuzzy_entity_match",
    "asof_last_view_before_purchase",
    "asof_next_error_within_tolerance",
    "zorder_pruning_report",
    "mergetable_zorder_read",
    "bfs_order_part_neighborhood",
    "corr_covar_qty_price",
    "ols_trend_qty_price",
    "price_zscore_outliers",
    "select_corpus_to_token_budget",
    "xml_field_extraction",
    "variant_semistructured_extraction",
    "exact_price_percentiles",
)


def queries() -> dict[str, QueryFn]:
    _load_all()
    first = [n for n in _DRIVER_UNCONFIRMED if n in _QUERIES]
    rest = [n for n in _QUERIES if n not in set(first)]
    return {n: _QUERIES[n] for n in first + rest}


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import-for-effect)."""
    global _LOADED
    if _LOADED:
        return
    from htmlentityextraction_spark import queries as _q  # noqa: F401

    _LOADED = True
