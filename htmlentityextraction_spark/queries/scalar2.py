"""Second scalar/relational odds-and-ends batch: deterministic
sampling (P8), top-k% (O3), exact percentiles (A9's modern form),
XML field extraction (S11/F23), and the polling-scheduler due-product
selection (T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table


@register(
    "sample_mod_10pct",
    """
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 3
    """,
)
def sample_mod_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 sampling, made reproducible: key-modulo sampling instead of
    RNG (`sample(false, 0.1, seed)` is engine-specific; modulo-on-key
    is stable across engines AND across reruns at 100 TB — the
    property production samplers actually need). RNG sampling is
    covered by a statistical pytest."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.pmod("o_orderkey", F.lit(10)) == 3).select("o_orderkey", "o_totalprice")


@register(
    "topk_percent_suppliers",
    """
    WITH counts AS (
        SELECT l_suppkey AS domain, count(*) AS n FROM lineitem GROUP BY l_suppkey
    ), ranked AS (
        SELECT domain, n, percent_rank() OVER (ORDER BY n DESC, domain) AS pr
        FROM counts
    )
    SELECT domain, n FROM ranked WHERE pr <= 0.1
    """,
)
def topk_percent_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 top-K%: the reference sorted counts and took
    count*K/100 on the DRIVER (`analysis/DomAnalysis.scala:39-44`);
    a percent_rank window keeps it distributed."""
    counts = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_suppkey").alias("domain")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("domain"))
    return (
        counts.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.1)
        .select("domain", "n")
    )


@register(
    "exact_price_percentiles",
    """
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) + 1e-9, 6) AS p25,
           round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE) + 1e-9, 6) AS p50,
           round(CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) + 1e-9, 6) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9's modern form: exact interpolated percentiles per group
    (Spark `percentile`; the reference collected counts to the driver
    for its percentile cut). For 100 TB use approx_percentile with a
    bounded error instead — same plan shape, sketch-mergeable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)) + 1e-9, 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)) + 1e-9, 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)) + 1e-9, 6).alias("p95"),
    )


@register(
    "xml_field_extraction",
    """
    WITH x AS (
        SELECT p_partkey,
               '<item><gtin>G' || p_partkey || '</gtin><brand>' || p_brand ||
               '</brand><price>' || CAST(floor(p_retailprice) AS BIGINT) || '.00</price>' ||
               CASE WHEN p_partkey % 4 = 0
                    THEN '<sale_price>' ||
                         CAST(floor(p_retailprice * 0.9) AS BIGINT) || '.00</sale_price>'
                    ELSE '' END || '</item>' AS xml
        FROM part
    )
    SELECT p_partkey,
           regexp_extract(xml, '<gtin>([^<]*)</gtin>', 1) AS gtin,
           regexp_extract(xml, '<brand>([^<]*)</brand>', 1) AS brand,
           CASE WHEN xml LIKE '%<sale_price>%'
                THEN regexp_extract(xml, '<sale_price>([^<]*)</sale_price>', 1)
                ELSE regexp_extract(xml, '<price>([^<]*)</price>', 1) END AS effective_price
    FROM x
    """,
)
def xml_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/F23 (`emr/ParseGglXML.scala:13-37`): XML item feeds with
    xpath field pulls and the sale-price-preference fallback. Spark
    side uses real xpath_string; the oracle mirrors it with regex on
    the same constructed XML."""
    p = load_table(spark, sf_dir, "part")
    price = F.concat(F.floor("p_retailprice").cast("bigint").cast("string"), F.lit(".00"))
    sale = F.concat(
        F.floor(F.col("p_retailprice") * 0.9).cast("bigint").cast("string"), F.lit(".00")
    )
    xml = F.concat(
        F.lit("<item><gtin>G"), F.col("p_partkey").cast("string"), F.lit("</gtin><brand>"),
        F.col("p_brand"), F.lit("</brand><price>"), price, F.lit("</price>"),
        F.when(
            F.pmod("p_partkey", F.lit(4)) == 0,
            F.concat(F.lit("<sale_price>"), sale, F.lit("</sale_price>")),
        ).otherwise(F.lit("")),
        F.lit("</item>"),
    )
    x = p.select("p_partkey", xml.alias("xml"))
    sale_x = F.expr("xpath_string(xml, '/item/sale_price')")
    return x.select(
        "p_partkey",
        F.expr("xpath_string(xml, '/item/gtin')").alias("gtin"),
        F.expr("xpath_string(xml, '/item/brand')").alias("brand"),
        F.when(sale_x != "", sale_x)
        .otherwise(F.expr("xpath_string(xml, '/item/price')"))
        .alias("effective_price"),
    )


@register(
    "scheduler_due_products",
    """
    WITH rates AS (
        SELECT p_partkey, CAST(2 * power(2, p_partkey % 3) AS BIGINT) AS update_window
        FROM part
    )
    SELECT p_partkey, update_window FROM rates WHERE 4 % update_window = 0
    """,
)
def scheduler_due_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 polling scheduler (`streaming/FillSeedsByProdFreq.scala:
    38-71`): products carry update windows {2,4,8}; at tick = 4 the
    due set is the window-2 and window-4 products (window-8 waits). The
    gcd/lcm tick derivation itself is functions.sched (driver-side)."""
    p = load_table(spark, sf_dir, "part")
    rates = p.select(
        "p_partkey",
        (F.lit(2) * F.pow(F.lit(2), F.pmod("p_partkey", F.lit(3)))).cast("bigint").alias(
            "update_window"
        ),
    )
    tick = F.lit(4)
    return rates.filter(F.pmod(tick, F.col("update_window")) == 0)


@register(
    "hll_distinct_parts_per_supplier",
    """
    SELECT l_suppkey AS supplier,
           count(DISTINCT l_partkey) AS exact_parts,
           true AS within_5pct
    FROM lineitem GROUP BY l_suppkey
    """,
)
def hll_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch aggregation (Spark 3.5+ datasketches): per-supplier
    distinct-part estimates from mergeable sketches — the shuffle-
    friendly form of count(distinct) at 100 TB (partial sketches merge
    map-side; the exact form must shuffle every key pair). DuckDB has
    no compatible HLL, so the gated contract is the ACCURACY: the
    estimate must land within ±5% of the exact count for every
    supplier (within_5pct must hash as all-true). The raw estimate is
    additionally tolerance-tested in tests/test_bucketing.py."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_suppkey").alias("supplier")).agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= F.col("exact_parts") * 0.05
    )
    return agg.select("supplier", "exact_parts", within.alias("within_5pct"))


@register(
    "approx_percentile_accuracy",
    """
    SELECT l_returnflag AS flag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
           true AS ok_p25, true AS ok_p50, true AS ok_p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch aggregation: per-flag approx_percentile (the
    mergeable KLL-style sketch — partial sketches combine map-side, so
    a 100 TB percentile costs one narrow shuffle, vs exact percentile
    which must co-locate every value of a group). DuckDB has no
    compatible sketch, so the gated contract is the ACCURACY
    guarantee: with accuracy=1000 the rank error is <= 1/1000, so each
    approx quantile must land between the exact quantiles at
    q +/- 2/1000 (ok_* must hash as all-true). exact_p50 is
    additionally value-gated against DuckDB's quantile_cont (Spark's
    exact `percentile` uses the same linear interpolation)."""
    li = load_table(spark, sf_dir, "lineitem")
    eps = 2.0 / 1000.0
    aggs = [
        F.expr(f"approx_percentile(l_extendedprice, {q}, 1000)").alias(f"ap_{n}")
        for q, n in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90"))
    ] + [
        F.expr(f"percentile(l_extendedprice, {q})").alias(f"ex_{n}")
        for q, n in ((0.25 - eps, "p25_lo"), (0.25 + eps, "p25_hi"),
                     (0.5 - eps, "p50_lo"), (0.5 + eps, "p50_hi"),
                     (0.9 - eps, "p90_lo"), (0.9 + eps, "p90_hi"),
                     (0.5, "p50"))
    ]
    agg = li.groupBy(F.col("l_returnflag").alias("flag")).agg(*aggs)
    ok = lambda n: (F.col(f"ap_{n}") >= F.col(f"ex_{n}_lo")) & (  # noqa: E731
        F.col(f"ap_{n}") <= F.col(f"ex_{n}_hi")
    )
    return agg.select(
        "flag",
        F.round("ex_p50", 6).alias("exact_p50"),
        ok("p25").alias("ok_p25"), ok("p50").alias("ok_p50"), ok("p90").alias("ok_p90"),
    )
