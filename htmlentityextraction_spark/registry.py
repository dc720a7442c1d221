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


# Names that already hold a hard correctness verdict from the round-1
# driver run (CORRECTNESS_r01.json). The driver evaluates queries() in
# dict order and round 1 stopped after 50 entries, leaving the rest
# with no hard signal — so entries WITHOUT a verdict are ordered first
# and previously-verified ones after them.
_R1_VERIFIED = frozenset(
    {
        "price_delta_market_position", "bad_domain_analysis", "hotspots_hot_level",
        "automatcher_composite_join", "rt2report_competitor_summary",
        "merge_upsert_with_deletes", "corpus_build_pipeline",
        "price_candidate_extraction", "candidate_labeling", "dedup_exact_documents",
        "ngram_jaccard_pairs", "dedup_minhash_lsh", "dedup_simhash",
        "embedding_neardup_pairs", "similarity_cosine_topk", "similarity_ann_ivf",
        "similarity_ann_lsh", "text_quality_profile", "doc_rolling_fingerprint",
        "embedding_normalize_quantize", "document_token_chunks",
        "dataset_split_assignment", "weighted_source_mix", "model_registry_stats",
        "model_score_pick_price", "model_url_level_eval", "ml_random_forest_eval",
        "ml_linear_svc_eval", "ml_lda_topics", "ml_pca_projection",
        "multimodal_metadata_profile", "multimodal_byte_features",
        "multimodal_resize_images", "multimodal_sample_frames",
        "prod_metrics_delta_extremes", "pivot_store_price_matrix",
        "corrupt_json_handling", "delta_day_windows", "scan_filter_project",
        "distinct_pairs", "dedup_latest_order_per_customer",
        "join_lineitem_orders_customer", "join_semi_customers_with_open_orders",
        "join_anti_customers_without_orders", "broadcast_dim_join",
        "join_of_aggregates", "groupby_count_having", "group_stats_per_part",
        "argmax_supplier_per_part", "global_agg",
    }
)


def queries() -> dict[str, QueryFn]:
    _load_all()
    unverified = [n for n in _QUERIES if n not in _R1_VERIFIED]
    verified = [n for n in _QUERIES if n in _R1_VERIFIED]
    return {n: _QUERIES[n] for n in unverified + verified}


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
