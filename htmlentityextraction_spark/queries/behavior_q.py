"""Behavioral / product-analytics queries over the events stream:
funnel progression, cohort retention, and statistical anomaly
flagging. The standard session-and-user analytics a production event
pipeline serves next to the price analytics (no direct reference
equivalent — the events table is the driver fixture's clickstream).

Scale shapes: funnel and retention are per-user min-aggregations
(one shuffle on user_id) followed by tiny date/cohort aggregates;
the z-score pass reuses the exact-integer co-moment technique from
corr_covar_qty_price so outlier flags are reproducible across runs
and partitionings (float mean/std drift can flip a borderline |z|
comparison — exact moments cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.temporal import epoch_micros
from htmlentityextraction_spark.functions.pricing import finite_measure, finite_measure_sql
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table


@register(
    "funnel_stage_per_user",
    """
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_buy,
           CAST(CASE WHEN p.t_buy IS NOT NULL THEN 3
                     WHEN c.t_click IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
            LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_stage_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase): per
    user, the first event of each stage that happens strictly after
    the previous stage's first event, and the deepest stage reached.
    Three min-aggregates sharing one user_id partitioning; the stage
    ordering constraint is in the join predicate, so 'clicked before
    ever viewing' correctly does not advance the funnel."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    stage = (
        F.when(F.col("t_buy").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
        .cast("long")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_buy", stage.alias("stage"))
    )


@register(
    "retention_cohort_matrix",
    """
    WITH first AS (
        SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
                   AS day_offset
        FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           count(*) AS n_active
    FROM activity GROUP BY cohort_day, day_offset
    """,
)
def retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    on each later day-offset they were active (distinct user-day).
    The classic triangle matrix — per-user min shuffle, then a
    distinct + small aggregate; cohort dates stringified so both
    engines hash the same representation."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
    ).agg(F.count("*").alias("n_active"))


@register(
    "price_zscore_outliers",
    """
    WITH b AS (
        SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
               l_extendedprice AS price,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
        WHERE {fp}
    ), m AS (
        SELECT flag, count(*)::BIGINT AS n, sum(y) AS sy,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM b GROUP BY flag
    ), stats AS (
        SELECT flag,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               sqrt(CAST(n * syy - sy * sy AS DOUBLE)) / CAST(n AS DOUBLE) AS sigma
        FROM m
    )
    -- NULLIF: a zero-variance group (one row / constant price) has
    -- no outliers — z is undefined -> NULL, filtered here on both
    -- engines (0/0 is duck NaN vs Spark-ANSI crash; matrix-fuzz r12)
    SELECT b.l_orderkey, b.l_linenumber, b.flag, b.price,
           round((CAST(b.y AS DOUBLE) - s.mu) / NULLIF(s.sigma, 0) + 1e-9, 6) AS z
    FROM b JOIN stats s ON b.flag = s.flag
    WHERE abs((CAST(b.y AS DOUBLE) - s.mu) / NULLIF(s.sigma, 0)) > 1.5
    """.format(fp=finite_measure_sql("l_extendedprice")),
)
def price_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly flags: line items whose price sits more
    than 1.5 sigma from their return-flag group mean (the fixture's
    near-uniform prices bound |z| below sqrt(3), so a 2-sigma gate
    would be vacuous). Mean and sigma
    come from EXACT integer co-moments (price cents), floats enter
    only in the final per-row expression — so the boundary comparison
    |z| > 1.5 is identical on every engine, run, and partitioning. One
    aggregate (3 rows, broadcast back) + one scan. NaN prices are
    excluded — not outliers, corrupt (NaN-fuzz aligned)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        finite_measure("l_extendedprice")
    )
    dec = "decimal(38,0)"
    b = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("y"),
    )
    m = b.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        # cast BEFORE multiplying: at the admitted domain bound
        # (|v| < 1e10 -> y <= 1e12 cents) y*y overflows a long
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    ndec = F.col("n").cast(dec)
    stats = m.select(
        "flag",
        (F.col("sy").cast("double") / nd).alias("mu"),
        (F.sqrt((ndec * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")) / nd).alias(
            "sigma"
        ),
    )
    z = F.try_divide(F.col("y").cast("double") - F.col("mu"), F.col("sigma"))
    return (
        b.join(F.broadcast(stats), "flag")
        .filter(F.abs(z) > 1.5)
        .select(
            "l_orderkey",
            "l_linenumber",
            "flag",
            "price",
            F.round(z + 1e-9, 6).alias("z"),
        )
    )


@register(
    "daily_weekly_active_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), days AS (SELECT DISTINCT day FROM ud),
    wau AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM days d JOIN ud u
          ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
        GROUP BY d.day
    ), dau AS (
        SELECT day, count(*) AS dau FROM ud GROUP BY day
    )
    SELECT CAST(d.day AS VARCHAR) AS day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) + 1e-9, 6)
               AS stickiness
    FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
    """,
)
def daily_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. Windowed
    COUNT(DISTINCT) is not expressible as a window aggregate in
    Spark, so each DISTINCT user-day is EXPLODED to the 7 trailing
    window days it contributes to (``explode(sequence(uday,
    uday+6))``) and the window membership becomes an equi groupBy —
    O(7·|user_days|) rows and ONE shuffle, versus the non-equi range
    join Spark would execute as a BroadcastNestedLoopJoin
    (O(|days|·|user_days|): ~150x the necessary work on 3 years of
    history). Window days with no observed events are dropped by the
    inner join with the observed-day list, matching the trailing-set
    semantics exactly; the raw event table is touched once."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    u = ud.select(F.col("user_id").alias("uid"), F.col("day").alias("uday"))
    wau = (
        u.select(
            "uid",
            F.explode(
                F.sequence(F.col("uday"), F.date_add(F.col("uday"), 6))
            ).alias("day"),
        )
        .join(days, "day")  # only observed days carry a WAU row
        .groupBy("day")
        .agg(F.countDistinct("uid").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double") + 1e-9, 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "kaplan_meier_signup_to_purchase",
    """
    WITH su AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), pu AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'purchase' AND e.ts > su.s_ts
        GROUP BY e.user_id
    ), mx AS (SELECT max(ts) AS m FROM events),
    obs AS (
        SELECT su.user_id,
               CASE WHEN pu.p_ts IS NOT NULL
                    THEN date_diff('day', su.s_ts, pu.p_ts)
                    ELSE date_diff('day', su.s_ts, mx.m) END AS t,
               pu.p_ts IS NOT NULL AS ev
        FROM su LEFT JOIN pu ON su.user_id = pu.user_id CROSS JOIN mx
    ), allt AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY t
    ), r AS (
        SELECT t, CAST(sum(c) OVER (ORDER BY t DESC) AS BIGINT) AS at_risk FROM allt
    ), dt AS (
        SELECT t, CAST(count(*) AS BIGINT) AS d FROM obs WHERE ev GROUP BY t
    )
    SELECT CAST(dt.t AS BIGINT) AS t_days, dt.d AS d_events, r.at_risk,
           round(CASE WHEN max(CASE WHEN dt.d >= r.at_risk THEN 1 ELSE 0 END)
                          OVER (ORDER BY dt.t) = 1 THEN 0.0
                 ELSE exp(sum(CASE WHEN dt.d < r.at_risk
                                   THEN ln(1 - CAST(dt.d AS DOUBLE) / r.at_risk)
                                   ELSE 0.0 END)
                          OVER (ORDER BY dt.t)) END + 1e-9, 6) AS survival
    FROM dt JOIN r ON dt.t = r.t
    """,
)
def kaplan_meier_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of signup→first-purchase time
    with right-censoring at the observation horizon: users who never
    purchase contribute risk-set mass up to their censor time instead
    of being dropped (the bias naive conversion-lag metrics have —
    conversion_lag_quantiles reports the uncensored view). S(t) is
    the running product of (1 − dᵢ/rᵢ), computed as exp(Σ ln ·) so it
    is one ordered window over the DISTINCT event-time domain — all
    heavy lifting is two groupBys over users; the survival curve
    itself is duration-domain-sized."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("s_ts")
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    mx = ev.agg(F.max("ts").alias("m"))
    obs = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("p_ts").isNotNull(), F.datediff(F.col("p_ts"), F.col("s_ts"))
            )
            .otherwise(F.datediff(F.col("m"), F.col("s_ts")))
            .alias("t"),
            F.col("p_ts").isNotNull().alias("ev"),
        )
    )
    from pyspark.sql import Window

    allt = obs.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    r = allt.select(
        "t",
        F.sum("c")
        .over(Window.orderBy(F.desc("t")).rangeBetween(Window.unboundedPreceding, 0))
        .alias("at_risk"),
    )
    dt = obs.where(F.col("ev")).groupBy("t").agg(F.count(F.lit(1)).alias("d"))
    km = dt.join(r, "t")
    w = Window.orderBy("t").rangeBetween(Window.unboundedPreceding, 0)
    # the terminal point can have d == at_risk (everyone left fails)
    # — survival hits exactly 0 there and stays 0: carry it as a flag
    # instead of ln(0), identically on both engines
    dead = F.max(F.when(F.col("d") >= F.col("at_risk"), 1).otherwise(0)).over(w)
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.when(
                    F.col("d") < F.col("at_risk"),
                    F.log(1 - F.col("d").cast("double") / F.col("at_risk")),
                ).otherwise(F.lit(0.0))
            ).over(w)
        )
    )
    return km.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").alias("d_events"),
        F.col("at_risk"),
        F.round(surv + F.lit(1e-9), 6).alias("survival"),
    )
