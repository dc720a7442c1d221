"""Relational-core queries (SURVEY.md §2.3 P*, §2.4 J*, §2.5 A*,
§2.6 O*, §2.7 U*) over the driver fixture tables, each with a DuckDB
oracle.

Scale stance: every query is a declarative DataFrame plan — predicate
pushdown/column pruning reach the parquet scan, dimension joins are
broadcast, aggregations get map-side partials, and windows/joins that
share keys reuse one shuffle. No collect-loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.relational import dedup_keep_latest, top_k
from htmlentityextraction_spark.functions.keys import pmod_sql
from htmlentityextraction_spark.functions.pricing import finite_measure, finite_measure_sql
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table


# --- P1/P2/P3: scan + filter + project (pushdown reaches the scan) ---
@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_partkey, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 25
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: string/column filters `models/GBTDomainBySchema.scala:23`,
    `analysis/BadDomAnal.scala:50-57`; projection `emr/Es2S3ESMapping.scala:19-31`."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25)).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# --- P5: distinct ---
@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: `.distinct` `emr/FilterSeeds.scala:26`, `light/SeedsESLight.scala:27`."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --- P7: dedup keep-latest-per-key (window, not self-join) ---
@register(
    "dedup_latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
    """,
)
def dedup_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: groupBy+max(ts)+self-join `analysis/BadDomAnalVer4.scala:66,109-119`
    → single window (one shuffle, no join)."""
    orders = load_table(spark, sf_dir, "orders")
    return dedup_keep_latest(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_orderdate"), F.desc("o_orderkey")],
    )


# --- J1/J3: multi-table equi join with filters ---
@register(
    "join_lineitem_orders_customer",
    """
    SELECT c.c_mktsegment, o.o_orderpriority,
           count(*) AS n_items,
           round(sum(l.l_extendedprice) + 1e-9, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F' AND {fp}
    GROUP BY c.c_mktsegment, o.o_orderpriority
    """.format(fp=finite_measure_sql("l.l_extendedprice")),
)
def join_lineitem_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: RDD equi joins `emr/Seeds2S3.scala:31-35`, DF joins
    `analysis/BadDomAnal.scala:85`. Catalyst broadcast-joins customer
    (small side) and shuffle-joins lineitem⋈orders on the shared key.
    Corrupt measurements drop at ingestion (finite_measure, both
    engines — the 2^53-scale ulp-order class, see join_of_aggregates)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice") + 1e-9, 2).alias("revenue"),
        )
    )


# --- U3/J1-as-filter: semi + anti joins ---
@register(
    "join_semi_customers_with_open_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: filter-by-list joins `emr/FilterSeeds.scala:34-40` are
    semantically left_semi — expressed as such so Catalyst skips
    materializing the right side's payload."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: `filterNot` membership `emr/SwapIDs.scala:100-114` → left_anti."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- J5: broadcast dimension chain ---
@register(
    "broadcast_dim_join",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_suppliers,
           round(sum(s.s_acctbal) + 1e-9, 2) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE {fp}
    GROUP BY r.r_name, n.n_name
    """.format(fp=finite_measure_sql("s.s_acctbal")),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: broadcast dMap/model-registry lookups
    (`domain/models/GBTDomainSuperPar.scala:23`,
    `streaming/Htmls2PredsPipe.scala:89-90`) → explicit broadcast()
    hints; at 100 TB the fact side streams map-side with zero shuffle.
    Corrupt measurements drop at ingestion (finite_measure, both
    engines — the 2^53-scale ulp-order class, see join_of_aggregates)."""
    sup = load_table(spark, sf_dir, "supplier").filter(
        finite_measure("s_acctbal")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal") + 1e-9, 2).alias("total_acctbal"),
        )
    )


# --- J4: join of two aggregate streams on the shared key ---
@register(
    "join_of_aggregates",
    """
    WITH src AS (SELECT * FROM orders WHERE {fp}),
    ord AS (
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice) + 1e-9, 2) AS total_spent
        FROM src GROUP BY o_custkey
    ), latest AS (
        SELECT o_custkey, max(o_orderdate) AS last_order
        FROM src GROUP BY o_custkey
    )
    SELECT ord.o_custkey AS custkey, ord.n_orders, ord.total_spent, latest.last_order
    FROM ord JOIN latest ON ord.o_custkey = latest.o_custkey
    """.format(fp=finite_measure_sql("o_totalprice")),
)
def join_of_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: deltaData ⋈ varPosData `analytics/CalcIndices.scala:195-198`.
    Both aggregates hash-partition on the same key → AQE reuses the
    exchange; no extra shuffle for the join. Corrupt order rows drop
    at ingestion (finite_measure, both engines): a 2^53-scale extreme
    in one customer's orders pushed their sum to 2.7e16, where the
    last ulp (4.0 — far coarser than the 2-dp rounding) depends on
    engine summation order (fresh-seed-353 extreme fuzz at sf0.1)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        finite_measure("o_totalprice")
    )
    ord_agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice") + 1e-9, 2).alias("total_spent"),
    )
    latest = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_order"))
    return ord_agg.join(latest, "o_custkey").select(
        F.col("o_custkey").alias("custkey"), "n_orders", "total_spent", "last_order"
    )


# --- A1/A6/A7: groupBy + count + HAVING ---
@register(
    "groupby_count_having",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 5
    """,
)
def groupby_count_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: domain frequency + min-candidates threshold
    `utils/Utils.scala:344-357`, `light/SeedsESLight.scala:28-30`."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
    )


# --- A5: per-group stats (stddev/avg/min/max/count) ---
@register(
    "group_stats_per_part",
    """
    SELECT l_partkey,
           count(*) AS n_obs,
           round(sum(l_extendedprice) / count(*) + 1e-9, 4) AS mean_price,
           round(sqrt(greatest(sum(l_extendedprice * l_extendedprice) / count(*)
                               - (sum(l_extendedprice) / count(*)) ^ 2, 0)), 4) AS std_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem WHERE {fp} GROUP BY l_partkey
    """.format(fp=finite_measure_sql("l_extendedprice")),
)
def group_stats_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: StatCounter variance/mean per group
    `analytics/CalcIndices.scala:145-192` → one hash aggregate with
    map-side partials (the reference materialized each group as a list).

    std is computed from raw moments (sum, sum-of-squares) rather than
    stddev_pop: engines disagree on Welford merge order at ~1e-9
    relative, while moment sums agree to ~1e-15 — keeps the oracle
    hash stable under rounding."""
    li = load_table(spark, sf_dir, "lineitem").filter(finite_measure("l_extendedprice"))
    n = F.count(F.lit(1))
    s1 = F.sum("l_extendedprice")
    s2 = F.sum(F.col("l_extendedprice") * F.col("l_extendedprice"))
    mean = s1 / n
    return li.groupBy("l_partkey").agg(
        n.alias("n_obs"),
        F.round(mean + 1e-9, 4).alias("mean_price"),
        F.round(F.sqrt(F.greatest(s2 / n - mean * mean, F.lit(0.0))), 4).alias("std_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --- A3/O4: per-group argmax ---
@register(
    "argmax_supplier_per_part",
    """
    SELECT l_partkey, l_suppkey AS best_suppkey, l_extendedprice AS best_price
    FROM (SELECT l_partkey, l_suppkey, l_extendedprice,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY l_extendedprice DESC, l_suppkey) AS rn
          FROM lineitem) WHERE rn = 1
    """,
)
def argmax_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: max-increase-with-endpoints sort-group-head
    `analytics/ProdMetricsV7.scala:116-151`; in-group top-1
    `streaming/Htmls2PredsPipe.scala:134-141`. Deterministic tie-break
    on suppkey (the reference's `.sorted.reverse.head` was not)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    w = Window.partitionBy("l_partkey").orderBy(F.desc("l_extendedprice"), F.asc("l_suppkey"))
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("best_suppkey"),
            F.col("l_extendedprice").alias("best_price"),
        )
    )


# --- A8: global aggregate scalar ---
@register(
    "global_agg",
    """
    SELECT count(*) AS n_rows,
           max(l_shipdate) AS max_shipdate,
           round(sum(l_extendedprice) + 1e-9, 2) AS total_price,
           round(avg(l_discount) + 1e-9, 6) AS avg_discount
    FROM lineitem WHERE {fp} AND {fd}
    """.format(fp=finite_measure_sql("l_extendedprice"),
               fd=finite_measure_sql("l_discount")),
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: `agg(max(lastupdatedtime))` scalar-to-driver
    `analysis/BadDomAnal.scala:77`. Corrupt measurements drop at
    ingestion (finite_measure on both used measures, both engines —
    the 2^53-scale ulp-order class, see join_of_aggregates)."""
    return load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice") & finite_measure("l_discount")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.round(F.sum("l_extendedprice") + 1e-9, 2).alias("total_price"),
        F.round(F.avg("l_discount") + 1e-9, 6).alias("avg_discount"),
    )


# --- A10/F18: histogram buckets via when/otherwise ladder ---
@register(
    "histogram_discount_buckets",
    """
    SELECT CASE WHEN l_discount >= 0.08 THEN 'high'
                WHEN l_discount >= 0.04 THEN 'mid'
                WHEN l_discount > 0.0 THEN 'low'
                ELSE 'none' END AS bucket,
           count(*) AS n,
           round(sum(l_extendedprice) + 1e-9, 2) AS revenue
    FROM lineitem WHERE {fp} GROUP BY 1
    """.format(fp=finite_measure_sql("l_extendedprice")),
)
def histogram_discount_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: price-change-count buckets `analytics/Hotspots.scala:50-54,110-123`
    — four filtered passes there, one when-chain + single agg here.
    The summed measure drops corrupt values at ingestion (ulp-order
    class, see join_of_aggregates); the bucketed discount keeps its
    raw domain — extreme/NaN discounts bucket identically cross-engine
    (both treat NaN/inf as greatest in comparisons)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice")
    )
    bucket = (
        F.when(F.col("l_discount") >= 0.08, "high")
        .when(F.col("l_discount") >= 0.04, "mid")
        .when(F.col("l_discount") > 0.0, "low")
        .otherwise("none")
    )
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice") + 1e-9, 2).alias("revenue"),
    )


# --- O1/O3: deterministic global top-k ---
@register(
    "topk_orders_by_totalprice",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: sort-desc + driver take `analysis/DomAnalysis.scala:39-44`
    → TakeOrderedAndProject (per-partition top-k, no global sort)."""
    return top_k(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        25,
    )


# --- U1/U2: set operations ---
@register(
    "set_ops_union_except",
    """
    WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
         urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT DISTINCT o_custkey, 'big_or_urgent' AS tag
    FROM (SELECT * FROM big UNION SELECT * FROM urgent)
    EXCEPT
    SELECT DISTINCT o_custkey, 'big_or_urgent' AS tag
    FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
    """,
)
def set_ops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: union `emr/RT2Report.scala:123-125`, set-minus
    `models/ModelR.scala:62-68`. Symmetric difference via
    union/intersect/except."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    union = big.union(urgent).distinct().withColumn("tag", F.lit("big_or_urgent"))
    both = big.intersect(urgent).withColumn("tag", F.lit("big_or_urgent"))
    return union.exceptAll(both)


# --- A14: pivot ---
@register(
    "pivot_returnflag_by_status",
    """
    SELECT l_linestatus,
           round(coalesce(sum(l_extendedprice) FILTER (l_returnflag = 'A'), 0) + 1e-9, 2) AS flag_a,
           round(coalesce(sum(l_extendedprice) FILTER (l_returnflag = 'N'), 0) + 1e-9, 2) AS flag_n,
           round(coalesce(sum(l_extendedprice) FILTER (l_returnflag = 'R'), 0) + 1e-9, 2) AS flag_r
    FROM lineitem WHERE {fp} GROUP BY l_linestatus
    """.format(fp=finite_measure_sql("l_extendedprice")),
)
def pivot_returnflag_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: manual per-user × store pivot with getOrElse("NA")
    `analytics/Kafka2ProdXStoreReport.scala:103-122` → groupBy().pivot()
    with an explicit value list (avoids the distinct-values scan).
    Two hardenings from the fresh-seed-313 mixed fuzz at sf0.001:
    Spark's pivot emits NULL for an ABSENT (group, pivot-value) cell
    WITHOUT evaluating the agg expression — so an empty-cell default
    must coalesce on the pivot OUTPUT, never inside agg() (the fuzz
    produced a (NULL-status, 'A') combination with zero rows; the
    clean fixture fills all six cells, which kept this latent) — and
    corrupt measurements drop at ingestion (finite_measure, both
    engines), which itself can empty a cell the output coalesce now
    covers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice")
    )
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) + 1e-9, 2))
    )
    # the coalesce INSIDE agg never runs for an ABSENT pivot cell —
    # pivot emits NULL without evaluating the expression (the
    # reference's getOrElse("NA") default, same fuzz finding) — so
    # the empty-cell → 0 default must sit on the pivot OUTPUT
    return p.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0.0)).alias("flag_a"),
        F.coalesce(F.col("N"), F.lit(0.0)).alias("flag_n"),
        F.coalesce(F.col("R"), F.lit(0.0)).alias("flag_r"),
    )


# --- A13: collect_set + sort + concat ---
@register(
    "collect_sorted_parts_per_order",
    """
    SELECT l_orderkey,
           -- FILTER + coalesce: a NULL member is not a member —
           -- Spark's collect_set drops NULLs while duck's list()
           -- keeps them, and duck renders an empty/NULL list as NULL
           -- where Spark's concat_ws gives '' (keyfuzz finding, r12)
           coalesce(array_to_string(
               list_sort(list(DISTINCT l_partkey)
                         FILTER (WHERE l_partkey IS NOT NULL)), ','), '') AS parts
    FROM lineitem GROUP BY l_orderkey
    """,
)
def collect_sorted_parts_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: stores-per-user sorted set `analytics/Kafka2CompPerUser.scala:67-79`."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("l_partkey"))).alias("parts")
        )
    )


# --- P9: broadcast-dict ID remap with missing-key side route ---
@register(
    "id_remap_broadcast",
    """
    WITH mapping(old_id, new_id) AS (VALUES (1, 101), (2, 102), (3, 103), (4, 104), (5, 105))
    SELECT s.s_suppkey,
           coalesce(CAST(m.new_id AS BIGINT), -1) AS mapped_id,
           CASE WHEN m.new_id IS NULL THEN 'missingMapping' ELSE 'ok' END AS map_status
    FROM supplier s LEFT JOIN mapping m ON s.s_suppkey = m.old_id
    """,
)
def id_remap_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: broadcast Map[old→new] rewrite with missing-key side
    output `emr/Mapping.scala:39-70`, `emr/SwapIDs.scala:76-118` —
    broadcast left join + when(isNull) instead of a driver dict."""
    sup = load_table(spark, sf_dir, "supplier")
    mapping = spark.createDataFrame(
        [(1, 101), (2, 102), (3, 103), (4, 104), (5, 105)], ["old_id", "new_id"]
    )
    joined = sup.join(F.broadcast(mapping), sup.s_suppkey == mapping.old_id, "left")
    return joined.select(
        "s_suppkey",
        F.coalesce(F.col("new_id").cast("long"), F.lit(-1).cast("long")).alias("mapped_id"),
        F.when(F.col("new_id").isNull(), "missingMapping").otherwise("ok").alias("map_status"),
    )


# --- A12: stable ids (row_number over deterministic order) ---
@register(
    "stable_ids_for_domains",
    """
    SELECT p_brand, row_number() OVER (ORDER BY p_brand) AS brand_id
    FROM (SELECT DISTINCT p_brand FROM part WHERE p_brand IS NOT NULL)
    """,
)
def stable_ids_for_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: zipWithIndex domain codes `utils/Utils.scala:349-356`.
    row_number over sorted distinct keys — deterministic, unlike
    monotonically_increasing_id. Single-partition window is fine: the
    distinct key set is tiny relative to the fact table. A NULL key
    gets no id (it would also sort to opposite ends of the two
    engines' orderings — null-fuzz aligned)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.orderBy("p_brand")
    return (
        part.select("p_brand").filter(F.col("p_brand").isNotNull()).distinct()
        .withColumn("brand_id", F.row_number().over(w).cast("long"))
    )


# --- F19: modulo group assignment ---
@register(
    "modulo_group_assignment",
    """
    SELECT {grp} AS grp, count(*) AS n,
           round(sum(l_quantity) + 1e-9, 2) AS total_qty
    FROM lineitem WHERE {fp} GROUP BY 1
    """.format(
        fp=finite_measure_sql("l_quantity"),
        grp=pmod_sql("l_orderkey", 8),
    ),
)
def modulo_group_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: `index % domainGrp` sharding `utils/Utils.scala:351-353`,
    `domain/models/GBTPerDomainPar.scala:34-36`. Corrupt quantities
    drop at ingestion (ulp-order class, see join_of_aggregates)."""
    return (
        load_table(spark, sf_dir, "lineitem").filter(finite_measure("l_quantity"))
        .groupBy(F.pmod(F.col("l_orderkey"), F.lit(8)).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity") + 1e-9, 2).alias("total_qty"))
    )


# --- star join: the Q5-shaped five-table pattern ---
@register(
    "star_join_revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 6) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND o.o_orderstatus <> 'F'
      AND {fp} AND {fd}
    GROUP BY n.n_name
    """.format(fp=finite_measure_sql("l.l_extendedprice"),
               fd=finite_measure_sql("l.l_discount")),
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: two fact tables + three broadcast
    dims with the local-supplier correlation predicate. Catalyst
    broadcasts nation/region/supplier and AQE sizes the two fact
    shuffles — the canonical shape for revenue rollups at 100 TB.
    Corrupt measurements drop at ingestion (both factors of the
    revenue product, both engines — ulp-order class, see
    join_of_aggregates)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice") & finite_measure("l_discount")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-9, 6
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )
