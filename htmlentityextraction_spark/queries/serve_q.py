"""End-to-end streaming serve query (SURVEY.md §3.1): train the
per-domain registry in batch, then run the FULL streaming path —
json parse → extraction UDTF → broadcast-registry scoring → argmax
price → status → multiplexed sinks — and return the historical sink.
The planted-token construction keeps the output closed-form SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htmlentityextraction_spark.queries.ml import _registry_rows
from htmlentityextraction_spark.functions.pricing import finite_measure
from htmlentityextraction_spark.functions.keys import valid_id
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table
from htmlentityextraction_spark.streaming import serve


def _page_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw JSON page messages (the Kafka payload shape) from the same
    construction as the ML corpus — including the zero-candidate
    bucket==1 pages the batch ML queries exclude. NULL o_totalprice
    orders template no page message (same contract as the batch page
    fixtures — null-fuzz aligned)."""
    # keyfuzz r12: the url is keyed by o_orderkey — dedupe duplicate
    # source rows deterministically (same boundary as the ML corpus)
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
    bucket = F.pmod(F.floor(k / F.lit(16)).cast("bigint"), F.lit(3))
    flip = F.pmod(F.floor(k / F.lit(8)).cast("bigint"), F.lit(2))
    url = F.concat(
        F.lit("http://d"), F.pmod(k, F.lit(8)).cast("string"), F.lit(".example.com/p/"), ks
    )
    marker = F.when(bucket == 0, F.lit(" cost $")).otherwise(F.lit(" Price: "))
    tail = F.when(flip == 0, F.lit(" sale today")).otherwise(F.lit(" today"))
    html = F.when(bucket == 1, F.concat(F.lit("id "), ks, F.lit(" value "), p2, tail)).otherwise(
        F.concat(F.lit("id "), ks, marker, p2, tail)
    )
    truth = p2.try_cast("double")
    price = F.when(flip == 0, truth).otherwise(truth + 1.0)
    msg = F.to_json(
        F.struct(
            url.alias("url"),
            html.alias("html"),
            price.alias("price"),
            price.alias("updatedPrice"),
        )
    )
    return orders.select(msg.alias("value"))


@register(
    "stream_serve_pipeline",
    """
    WITH o AS (
        SELECT 'http://d' || (o_orderkey % 8) || '.example.com/p/' || o_orderkey AS url,
               'd' || (o_orderkey % 8) || '.example.com' AS domain,
               CAST(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) || '.99' AS DOUBLE) AS p2,
               (o_orderkey // 16) % 3 AS bucket, (o_orderkey // 8) % 2 AS flip
        FROM (SELECT o_orderkey, max(o_totalprice) AS o_totalprice
              FROM orders WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
        WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice) AND o_totalprice > -1e10 AND o_totalprice < 1e10
    )
    , m AS (
        SELECT url, domain,
               CASE WHEN bucket <> 1 AND flip = 0 THEN p2 ELSE -1.0 END AS model_price,
               CASE WHEN flip = 0 THEN p2 ELSE p2 + 1.0 END AS pattern_price
        FROM o
    ), s AS (
        -- full price_status truth table (functions/pricing.py):
        -- a planted price inside (-1, 1) (floor(-0.0/subnormal).99
        -- = 0.99) hits the reference's toInt==0 patternFailed branch
        SELECT url, domain, model_price, pattern_price,
               CASE WHEN NOT (model_price = -1.0) AND NOT (model_price = -2.0)
                         AND NOT (isnan(pattern_price) OR (pattern_price > -1.0 AND pattern_price < 1.0))
                         AND abs(model_price - pattern_price) < 0.009 THEN 'modeledPatternEquals'
                    WHEN NOT (model_price = -1.0) AND NOT (model_price = -2.0)
                         AND NOT (isnan(pattern_price) OR (pattern_price > -1.0 AND pattern_price < 1.0))
                         AND abs(pattern_price - model_price) / greatest(pattern_price, model_price) <= 0.1
                         THEN 'minorModelPatternConflict'
                    WHEN NOT (model_price = -1.0) AND NOT (model_price = -2.0)
                         AND NOT (isnan(pattern_price) OR (pattern_price > -1.0 AND pattern_price < 1.0))
                         THEN 'majorModelPatternConflict'
                    WHEN (model_price = -1.0 OR model_price = -2.0)
                         AND (isnan(pattern_price) OR (pattern_price > -1.0 AND pattern_price < 1.0))
                         THEN 'bothFailed'
                    WHEN isnan(pattern_price) OR (pattern_price > -1.0 AND pattern_price < 1.0)
                         THEN 'patternFailed'
                    WHEN model_price = -2.0 THEN 'missingModel'
                    ELSE 'allFalseCandids' END AS status
        FROM m
    )
    SELECT url, domain, model_price, pattern_price, status,
           CASE WHEN status IN ('modeledPatternEquals', 'minorModelPatternConflict',
                                'patternFailed') THEN model_price
                WHEN status IN ('majorModelPatternConflict', 'missingModel',
                                'allFalseCandids') THEN pattern_price
                ELSE 0.0 END AS final_price
    FROM s
    """,
)
def stream_serve_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive pages recover their planted price through the whole
    streaming path (modeledPatternEquals); negative and zero-candidate
    pages fall to the -1 sentinel → allFalseCandids → pattern price."""
    registry = _registry_rows(spark, sf_dir)

    src = tempfile.mkdtemp(prefix="serve_src_")
    out = tempfile.mkdtemp(prefix="serve_out_")
    # NOT repartitioned to defaultParallelism before the write: moving
    # the batch_fn parallelism guard's shuffle upstream (source files
    # >= cores, the documented 100 TB posture) was ABBA-measured in
    # r13 and tied-to-worse (3.79 vs 4.04 s) — 32 file commits on the
    # fixture write cost what the single in-batch repartition costs
    # (OPTIMIZATION_r13.md).
    _page_messages(spark, sf_dir).write.mode("overwrite").parquet(src)
    raw = spark.readStream.schema("value string").parquet(src)
    serve.serve_stream(spark, raw, registry, out).await_done()
    return spark.read.parquet(os.path.join(out, "historical"))
