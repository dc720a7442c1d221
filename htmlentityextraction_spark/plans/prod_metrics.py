"""Flagship analytics plan: price deltas + market position.

Re-expresses the reference's CalcIndices / UrlPositionAndVar pipeline
(`analytics/CalcIndices.scala:68-203`,
`analytics/UrlPositionAndVar.scala:55-95`) Spark-first:

- reference: ``groupByKey`` → collect group to a list → sort →
  hand-walk for previous price, extremes, position, variance.
- rebuild: ``lag``/``row_number`` windows + ``groupBy().agg`` — all
  inside Catalyst/codegen, no per-group materialization, no skew from
  giant groups.

Scale notes (100 TB): the two window families and the final join all
share the same hash partitioning on sys_prod_id, so AQE reuses one
shuffle layout; there is exactly one wide shuffle over the
observations table (window over (prod, store) then re-window over
prod), and the delta aggregate joined back is tiny relative to detail
— broadcastable when products ≪ observations.

The driver's `lineitem` fixture stands in for `historical_prices`
(TESTDATA.md mapping): part=product, supplier=store,
shipdate=observation time, extendedprice=price.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.pricing import (
    cv_rank,
    descretize,
    finite_measure,
    finite_measure_sql,
    rel_place_rank,
)
from htmlentityextraction_spark.sources.tables import load_table


def price_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → (sys_prod_id, store_id, tmsp, price) history with
    deterministic tie-break columns. NULL/NaN/out-of-range price
    observations are corrupt input (the reference's Double parse →
    cents cast would never have produced a usable row) and are
    dropped — NULLs would also rank at opposite ends of the two
    engines' position windows, and ±inf/±1e308 overflow the cents
    domain (null/NaN/extreme fuzz aligned)."""
    return load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice")
    ).select(
        F.col("l_partkey").alias("sys_prod_id"),
        F.col("l_suppkey").alias("store_id"),
        F.col("l_shipdate").alias("tmsp"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_orderkey").alias("obs_key"),
        F.col("l_linenumber").alias("obs_line"),
    )


def price_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest price per (product, store) with delta vs the previous
    observation — the reference's sort-group-walk
    (`analytics/CalcIndices.scala:75-95`) as one ``lead`` window.
    Single-observation groups get delta 0.0 (reference parity)."""
    obs = price_observations(spark, sf_dir)
    w = Window.partitionBy("sys_prod_id", "store_id").orderBy(
        F.desc("tmsp"), F.desc("obs_key"), F.desc("obs_line")
    )
    return (
        obs.withColumn("rn", F.row_number().over(w))
        .withColumn("prev_price", F.lead("price").over(w))
        .filter(F.col("rn") == 1)
        .select(
            "sys_prod_id",
            "store_id",
            "price",
            F.when(F.col("prev_price").isNull(), F.lit(0.0))
            .otherwise(F.col("price") - F.col("prev_price"))
            .alias("delta"),
            F.when(F.col("prev_price").isNull(), F.lit(0.0))
            .otherwise(F.try_divide(F.col("price") - F.col("prev_price"), F.col("prev_price")))
            .alias("relative_change"),
        )
    )


def price_delta_market_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full prod_metrics row: per-product delta extremes + per-store
    market position / variance ranks, joined back to detail
    (`analytics/CalcIndices.scala:96-203`)."""
    latest = price_deltas(spark, sf_dir)

    # The per-product delta extremes (the reference's separate
    # aggregate-and-join) ride the SAME whole-partition window as the
    # market stats: max/min over w_all ≡ the groupBy("sys_prod_id")
    # max/min joined back (every pos row's product exists in the
    # aggregate, so the inner join was a no-op filter). Optimization
    # r12 (guide §2.4 "remove shuffles outright"): the join form
    # scanned lineitem twice and cost two extra exchanges plus a
    # broadcast; this form is one scan → one (prod,store) window →
    # one (prod) window. Oracle SQL below still spells the
    # aggregate-join form — the hash equality IS the equivalence
    # proof.
    w_pos = Window.partitionBy("sys_prod_id").orderBy("price", "store_id")
    w_all = Window.partitionBy("sys_prod_id")
    pos = (
        latest
        .withColumn("abs_position", F.row_number().over(w_pos).cast("long"))
        .withColumn("num_stores", F.count(F.lit(1)).over(w_all))
        .withColumn("relative_position", F.col("abs_position") / F.col("num_stores"))
        .withColumn(
            "var_val",
            F.round(F.try_divide(F.stddev_pop("price").over(w_all), F.avg("price").over(w_all)) + 1e-9, 6),
        )
        .withColumn("max_abs_delta_val", F.max("delta").over(w_all))
        .withColumn("min_abs_delta_val", F.min("delta").over(w_all))
        .withColumn("max_rel_delta_val", F.max("relative_change").over(w_all))
        .withColumn("min_rel_delta_val", F.min("relative_change").over(w_all))
    )

    out = pos.select(
        "sys_prod_id",
        "store_id",
        "price",
        "abs_position",
        "num_stores",
        F.round(F.col("relative_position") + 1e-9, 6).alias("relative_position"),
        rel_place_rank(F.col("relative_position")).alias("position_level"),
        "var_val",
        cv_rank(F.col("var_val")).alias("var_level"),
        F.round(F.col("max_abs_delta_val") + 1e-9, 6).alias("max_abs_delta_val"),
        F.round(F.col("max_rel_delta_val") + 1e-9, 6).alias("max_rel_delta_val"),
        descretize(F.col("max_rel_delta_val")).alias("max_rel_delta_level"),
        F.round(F.col("min_abs_delta_val") + 1e-9, 6).alias("min_abs_delta_val"),
        F.round(F.col("min_rel_delta_val") + 1e-9, 6).alias("min_rel_delta_val"),
        descretize(F.col("min_rel_delta_val")).alias("min_rel_delta_level"),
    )
    return out


ORACLE_SQL = """
WITH obs AS (
    SELECT l_partkey AS sys_prod_id,
           l_suppkey AS store_id,
           l_extendedprice AS price,
           row_number() OVER w AS rn,
           lead(l_extendedprice) OVER w AS prev_price
    FROM lineitem
    WHERE {finite_price}
    WINDOW w AS (PARTITION BY l_partkey, l_suppkey
                 ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC)
), latest AS (
    SELECT sys_prod_id, store_id, price,
           CASE WHEN prev_price IS NULL THEN 0.0 ELSE price - prev_price END AS delta,
           CASE WHEN prev_price IS NULL THEN 0.0
                ELSE (price - prev_price) / prev_price END AS relative_change
    FROM obs WHERE rn = 1
), delta_agg AS (
    SELECT sys_prod_id,
           max(delta) AS max_abs_delta_val,
           min(delta) AS min_abs_delta_val,
           max(relative_change) AS max_rel_delta_val,
           min(relative_change) AS min_rel_delta_val
    FROM latest GROUP BY sys_prod_id
), pos AS (
    SELECT sys_prod_id, store_id, price,
           row_number() OVER (PARTITION BY sys_prod_id ORDER BY price, store_id) AS abs_position,
           count(*) OVER (PARTITION BY sys_prod_id) AS num_stores,
           avg(price) OVER (PARTITION BY sys_prod_id) AS mean_price,
           stddev_pop(price) OVER (PARTITION BY sys_prod_id) AS std_price
    FROM latest
)
SELECT p.sys_prod_id,
       p.store_id,
       p.price,
       p.abs_position,
       p.num_stores,
       round(p.abs_position / CAST(p.num_stores AS DOUBLE) + 1e-9, 6) AS relative_position,
       CASE WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.05 THEN 5
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.1 THEN 10
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.2 THEN 20
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.3 THEN 30
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.4 THEN 40
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.5 THEN 50
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.6 THEN 60
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.7 THEN 70
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.8 THEN 80
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.9 THEN 90
            WHEN p.abs_position / CAST(p.num_stores AS DOUBLE) <= 0.95 THEN 95
            ELSE 100 END AS position_level,
       round(p.std_price / p.mean_price + 1e-9, 6) AS var_val,
       CASE WHEN round(p.std_price / p.mean_price + 1e-9, 6) <= 0.2 THEN 1
            WHEN round(p.std_price / p.mean_price + 1e-9, 6) <= 0.4 THEN 2
            WHEN round(p.std_price / p.mean_price + 1e-9, 6) <= 0.6 THEN 3
            WHEN round(p.std_price / p.mean_price + 1e-9, 6) <= 0.85 THEN 4
            ELSE 5 END AS var_level,
       round(d.max_abs_delta_val + 1e-9, 6) AS max_abs_delta_val,
       round(d.max_rel_delta_val + 1e-9, 6) AS max_rel_delta_val,
       CASE WHEN abs(d.max_rel_delta_val) <= 0.2 THEN 1
            WHEN abs(d.max_rel_delta_val) <= 0.4 THEN 2
            WHEN abs(d.max_rel_delta_val) <= 0.6 THEN 3
            WHEN abs(d.max_rel_delta_val) <= 0.8 THEN 4
            WHEN abs(d.max_rel_delta_val) <= 1.0 THEN 5
            ELSE 6 END AS max_rel_delta_level,
       round(d.min_abs_delta_val + 1e-9, 6) AS min_abs_delta_val,
       round(d.min_rel_delta_val + 1e-9, 6) AS min_rel_delta_val,
       CASE WHEN abs(d.min_rel_delta_val) <= 0.2 THEN 1
            WHEN abs(d.min_rel_delta_val) <= 0.4 THEN 2
            WHEN abs(d.min_rel_delta_val) <= 0.6 THEN 3
            WHEN abs(d.min_rel_delta_val) <= 0.8 THEN 4
            WHEN abs(d.min_rel_delta_val) <= 1.0 THEN 5
            ELSE 6 END AS min_rel_delta_level
FROM pos p JOIN delta_agg d USING (sys_prod_id)
""".format(finite_price=finite_measure_sql("l_extendedprice"))
