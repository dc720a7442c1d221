"""Per-domain model queries (SURVEY.md §2.9, §3.2 — M1-M15).

Oracle strategy: the pages are constructed so that a planted token
('sale') PERFECTLY separates positive from negative candidates within
every domain. A correct featurize→train→score pipeline must recover
that separation exactly (first tree split), which makes the model's
end-to-end output — picked price per url, url-level accuracy per
domain, registry stats — expressible in closed-form SQL. The GBT
internals are additionally unit-tested in tests/test_models.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.text import get_domain
from htmlentityextraction_spark.operators import extraction as ex
from htmlentityextraction_spark.operators import models as md
from htmlentityextraction_spark.functions.pricing import finite_measure
from htmlentityextraction_spark.functions.keys import valid_id
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table

_N_DOMAINS = 8
_FIT = dict(n_estimators=10, max_depth=3, min_doc_freq=5, top_k=100)
_FIT_CURVE = dict(n_estimators=10, max_depth=3, min_doc_freq=5, top_k=100)

# Cross-query materialization: five registered queries (registry
# stats, score+pick, url eval, submodel curve, serve pipeline) share
# the same extraction corpus and four share the same trained registry.
# The reference packages models ONCE and every consumer loads the
# package (`emr/BuildModels.scala`, `streaming/Htmls2PredsPipe.scala:
# 89-90`); mirroring that, the labeled-candidate extraction (the
# pandas-UDF heavy step) is persisted once per (session, sf_dir) and
# the collected registry rows are memoized per sf_dir (training is
# deterministic — seeded, sorted input — so the rows are a pure
# function of the data). Queries stay independently correct: a cache
# miss just retrains.
_LABELED_CACHE: dict[str, tuple[SparkSession, DataFrame]] = {}
_REG_CACHE: dict[str, list] = {}


def _labeled_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    ent = _LABELED_CACHE.get(sf_dir)
    if ent is None or ent[0] is not spark:
        df = _labeled_candidates(spark, sf_dir).persist()
        _LABELED_CACHE[sf_dir] = (spark, df)
    return _LABELED_CACHE[sf_dir][1]


def fit_once(spark: SparkSession, sf_dir: str) -> list:
    """Explicit one-time train of the per-domain registry (the
    reference's BuildModels job: package once, every consumer loads —
    `emr/BuildModels.scala`). Idempotent; all registry consumers
    (stats, score+pick, url eval, serve) call through here, so
    whichever runs first pays the fit and the rest reuse it. Call it
    up front to amortize explicitly (e.g. a pipeline warm-up step);
    otherwise first-query-pays, which bench.py documents.

    Scale ceiling: the registry is a driver-side list broadcast to
    every scorer — fine at the reference's scale (~hundreds of
    domains × a few KB of GBT trees each; the fixture has 8). It
    stops being fine around ~100k domains / multi-GB of models: past
    that, swap in ``operators/models.score_candidates_cogrouped`` —
    the registry stays a DataFrame cogrouped with candidates on
    domain (no collect, no broadcast), equivalence-tested against
    this broadcast path in tests/test_models.py."""
    if sf_dir not in _REG_CACHE:
        feats = md.featurize_candidates(_labeled_cached(spark, sf_dir))
        _REG_CACHE[sf_dir] = md.train_per_domain(feats, **_FIT).collect()
    return _REG_CACHE[sf_dir]


def _registry_rows(spark: SparkSession, sf_dir: str) -> list:
    return fit_once(spark, sf_dir)


def _labeled_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed corpus: url carries a domain (k % 8); price marker
    alternates cost-$ / Price:; pages with flip==0 carry the 'sale'
    token AND a matching truth price (positive), flip==1 pages carry
    neither (negative). k % 3 == 1 pages have no currency/price marker
    at all → zero candidates (the allFalseCandids path). NULL
    o_totalprice orders template a NULL page — dropped on both
    engines (null-fuzz hardened)."""
    # keyfuzz r12: the page corpus is keyed by o_orderkey (it IS the
    # url), so the key is an identity — duplicate source rows (the
    # at-least-once delivery shape) would mint two pages with the
    # same url and CONFLICTING truth prices, poisoning the label join
    # on both engines differently. Same boundary as the merge family:
    # drop NULL keys, keep max(o_totalprice) per key; oracle mirrors.
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(valid_id("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.max("o_totalprice").alias("o_totalprice"))
        .filter(finite_measure("o_totalprice"))
    )
    k = F.col("o_orderkey")
    ks = k.cast("string")
    p2 = F.concat(F.floor("o_totalprice").cast("bigint").cast("string"), F.lit(".99"))
    # domain/flip/bucket must be INDEPENDENT modulo fields of k —
    # k%8 and k%2 would make flip constant per domain (single-class)
    bucket = F.pmod(F.floor(k / F.lit(16)).cast("bigint"), F.lit(3))
    flip = F.pmod(F.floor(k / F.lit(8)).cast("bigint"), F.lit(2))
    url = F.concat(
        F.lit("http://d"), F.pmod(k, F.lit(_N_DOMAINS)).cast("string"),
        F.lit(".example.com/p/"), ks,
    )
    marker = F.when(bucket == 0, F.lit(" cost $")).otherwise(F.lit(" Price: "))
    tail = F.when(flip == 0, F.lit(" sale today")).otherwise(F.lit(" today"))
    html = F.when(bucket == 1, F.concat(F.lit("id "), ks, F.lit(" value "), p2, tail)).otherwise(
        F.concat(F.lit("id "), ks, marker, p2, tail)
    )
    pages = orders.select(url.alias("url"), html.alias("html"))
    truth_price = p2.try_cast("double")
    truth = orders.select(
        url.alias("url"),
        F.when(flip == 0, truth_price).otherwise(truth_price + 1.0).alias("price"),
        F.when(flip == 0, truth_price).otherwise(truth_price + 1.0).alias("updated_price"),
    )
    cand = ex.extract_candidates(pages, snippet_size=150)
    labeled = ex.label_candidates(cand, truth)
    return labeled.withColumn("domain", get_domain(F.col("url")))


_ORACLE_BASE = """
    WITH o AS (
        SELECT o_orderkey AS k,
               'http://d' || (o_orderkey % 8) || '.example.com/p/' || o_orderkey AS url,
               'd' || (o_orderkey % 8) || '.example.com' AS domain,
               CAST(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || '.99' AS DOUBLE) AS p2,
               (o_orderkey // 16) % 3 AS bucket, (o_orderkey // 8) % 2 AS flip
        FROM (SELECT o_orderkey, max(o_totalprice) AS o_totalprice
              FROM orders WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
        WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice) AND o_totalprice > -1e10 AND o_totalprice < 1e10
    ), pages AS (SELECT * FROM o WHERE bucket <> 1)
"""


@register(
    "model_registry_stats",
    _ORACLE_BASE
    + """
    SELECT domain,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN flip = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(1.0 AS DOUBLE) AS train_f1
    FROM pages GROUP BY domain
    """,
)
def model_registry_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain registry after applyInPandas training. train_f1 must
    be exactly 1.0: the planted token separates the classes, so any
    correct GBT fit reaches a perfect training F1."""
    from htmlentityextraction_spark.operators.models import REGISTRY_SCHEMA

    reg = spark.createDataFrame(_registry_rows(spark, sf_dir), REGISTRY_SCHEMA)
    return reg.select("domain", "n_rows", "n_pos", "train_f1")


@register(
    "model_score_pick_price",
    _ORACLE_BASE
    + """
    SELECT url, domain,
           CASE WHEN flip = 0 THEN p2 ELSE -1.0 END AS model_price
    FROM pages
    """,
)
def model_score_pick_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end serve path: featurize → mapInPandas score with the
    broadcast registry → per-url argmax-positive price with the
    -1/-2 sentinels (`streaming/Htmls2PredsPipe.scala:104-159`)."""
    feats = md.featurize_candidates(_labeled_cached(spark, sf_dir))
    scored = md.score_candidates(feats, _registry_rows(spark, sf_dir))
    return md.pick_model_price(scored)


@register(
    "model_submodel_curve",
    _ORACLE_BASE
    + """
    , domains AS (SELECT DISTINCT domain FROM pages)
    SELECT d.domain AS domain,
           CAST(t.k AS BIGINT) AS n_trees,
           CAST(1.0 AS DOUBLE) AS f1,
           t.k = 1 AS selected
    FROM domains d, generate_series(1, 10) t(k)
    """,
)
def model_submodel_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11/M13 (`emr/BuildModels.scala:45-55`): per-domain tree-prefix
    F-score curve + model-size selection. Closed form on the planted
    corpus: the first tree already splits on the planted token, so
    every prefix scores F1=1.0 and the tie-break selects the 1-tree
    model — any curve row below 1.0 or a larger selected model is a
    pipeline regression."""
    feats = md.featurize_candidates(_labeled_cached(spark, sf_dir))
    return md.submodel_curve_per_domain(feats, **_FIT_CURVE)


@register(
    "model_url_level_eval",
    _ORACLE_BASE
    + """
    SELECT domain,
           count(*) AS n_urls,
           CAST(sum(CASE WHEN flip = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(avg(CASE WHEN flip = 0 THEN 1.0 ELSE 0.0 END) + 1e-9, 6) AS url_accuracy
    FROM pages GROUP BY domain
    """,
)
def model_url_level_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level selected-candidate eval (`transform/Transformer.scala:
    322-337`): positives are recovered exactly, negatives yield the
    -1 sentinel (counted incorrect)."""
    labeled = _labeled_cached(spark, sf_dir)
    feats = md.featurize_candidates(labeled)
    truth = labeled.select("url", "domain", "price")
    scored = md.score_candidates(
        feats.join(truth.dropDuplicates(["url", "domain"]), ["url", "domain"]),
        _registry_rows(spark, sf_dir),
    )
    return md.eval_url_level(scored)
