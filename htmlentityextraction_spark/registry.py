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
    # round-11: no new queries, but these changed SEMANTICS this round
    # (fold-shape finite_measure gates; textuni class fixes: java-lower
    # oracles, explicit whitespace classes, control-char stripping in
    # the XML/JSON feed templates, ASCII-normalized fuzzy keys) —
    # front-loaded so the driver re-verifies the changed behavior.
    # The r10 entry (semantic_dedup_scale_pipeline) got its full-green
    # driver verdict in CORRECTNESS_r10.json row 1 and rotates out.
    "daily_value_autocorrelation",
    "did_aa_experiment_check",
    "gap_fill_user_purchase_value",
    "text_quality_profile",
    "lm_unigram_doc_scores",
    "lm_bigram_doc_scores",
    "sorted_neighborhood_doc_pairs",
    "pmi_collocations",
    "bm25_doc_ranking",
    "xml_field_extraction",
    "variant_semistructured_extraction",
    "fuzzy_entity_match",
    "setsim_prefix_join_docs",
    # later r11 waves: int-axis + interaction findings
    "quantile_normalize_chars_by_source",
    "weighted_sample_per_lang",
    "weighted_doc_sample",
    "approx_percentile_accuracy",
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
