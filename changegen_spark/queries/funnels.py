"""Ordered-sequence funnel analysis over the event stream.

The product-analytics staple the reference world runs on events: how many
users progress view -> click -> purchase, where each step must occur
STRICTLY AFTER the previous one and the whole funnel must complete within
a conversion window of the first step.  Strict ordering uses the
(ts, event_id) pair — event_id breaks timestamp ties identically in both
engines, and the window arithmetic is microsecond-exact (``unix_micros`` /
``epoch_us``), so the oracle hash-matches bit for bit.

Scale design: each step is a type-filtered scan aggregated to ONE row per
user (min of a (ts, id) struct — map-side combinable), then a per-user
equi-join to gate the next step.  Join inputs are |users|-sized on one
side and a type-filtered fraction of events on the other; nothing is ever
ordered globally and no window function spans a user's full history (the
sessionize query covers that shape).  At 100 TB the same plan holds with
the user-id shuffle as the only data movement; a funnel of K steps is K
such join-aggregate rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from changegen_spark.sources.tables import load_table

CONVERSION_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h, microsecond-exact
_FMT = "yyyy-MM-dd HH:mm:ss"


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user view -> click -> purchase funnel: first view, first click
    strictly after it, first purchase strictly after that and within 24 h
    of the view.  One row per user with a view; step timestamps formatted,
    nulls where the funnel stalled; steps_completed in 1..3."""
    ev = load_table(spark, sf_dir, "events")

    def step(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id").alias("id")).alias("s"),
        )

    v = step("view").groupBy("user_id").agg(F.min("s").alias("s1"))
    c = (
        step("click")
        .join(v, "user_id")
        .filter(F.col("s") > F.col("s1"))
        .groupBy("user_id")
        .agg(F.min("s").alias("s2"), F.min("s1").alias("s1c"))
    )
    p = (
        step("purchase")
        .join(c, "user_id")
        .filter(
            (F.col("s") > F.col("s2"))
            & (
                F.unix_micros(F.col("s.ts")) - F.unix_micros(F.col("s1c.ts"))
                <= CONVERSION_WINDOW_US
            )
        )
        .groupBy("user_id")
        .agg(F.min("s").alias("s3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.date_format("s1.ts", _FMT).alias("t_view"),
            F.date_format("s2.ts", _FMT).alias("t_click"),
            F.date_format("s3.ts", _FMT).alias("t_purchase"),
            (
                F.lit(1)
                + F.col("s2").isNotNull().cast("int")
                + F.col("s3").isNotNull().cast("int")
            ).alias("steps_completed"),
        )
        .orderBy("user_id")
    )


Q_FUNNEL_SQL = f"""
WITH st AS (
  SELECT user_id, event_type, {{'ts': ts, 'id': event_id}} AS s FROM events
), v AS (
  SELECT user_id, min(s) AS s1 FROM st WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT st.user_id, min(st.s) AS s2, min(v.s1) AS s1c
  FROM st JOIN v USING (user_id)
  WHERE st.event_type = 'click' AND st.s > v.s1
  GROUP BY st.user_id
), p AS (
  SELECT st.user_id, min(st.s) AS s3
  FROM st JOIN c USING (user_id)
  WHERE st.event_type = 'purchase' AND st.s > c.s2
    AND epoch_us(st.s.ts) - epoch_us(c.s1c.ts) <= {CONVERSION_WINDOW_US}
  GROUP BY st.user_id
)
SELECT v.user_id,
       strftime(v.s1.ts, '%Y-%m-%d %H:%M:%S') AS t_view,
       strftime(c.s2.ts, '%Y-%m-%d %H:%M:%S') AS t_click,
       strftime(p.s3.ts, '%Y-%m-%d %H:%M:%S') AS t_purchase,
       CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
         AS steps_completed
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the Monday-start week of
    their FIRST event; for each (cohort_week, week_offset) the count of
    cohort members active that week.  The activity set is distinct
    (user, week) pairs, so the plan is two map-side-combinable aggregates
    and one per-user equi-join — the cohort frame is |users|-sized."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    activity = ev.select("user_id", wk.alias("week")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


Q_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST((a.week - c.cohort_week) // 7 AS INT) AS week_offset,
       count(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active-user decomposition: per day, distinct actives, users
    seen for the FIRST time that day, returning users, and the running
    distinct-user total — the other standard product-analytics lens next
    to cohort retention (q_retention slices by signup cohort; this slices
    by calendar day).

    Exact integers throughout: first-seen day is a per-user min (one
    user-keyed shuffle with map-side combine), daily counts a day-keyed
    count, and the cumulative total a window over the ~|days| aggregate —
    never over raw events.  At 100 TB the only corpus-scale exchanges are
    the two counting aggregations.
    """
    from changegen_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    active = (
        ev.select(day.alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n_active"))
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(day).alias("first_day")
    )
    new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
            (F.col("n_active") - F.coalesce(F.col("n_new"), F.lit(0))).alias(
                "n_returning"
            ),
        )
        .withColumn("cum_users", F.sum("n_new").over(w))
        .orderBy("day")
    )


Q_NEW_VS_RETURNING_SQL = """
WITH active AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS n_active
  FROM events GROUP BY 1
), first_seen AS (
  SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS first_day
  FROM events GROUP BY 1
), new AS (
  SELECT first_day AS day, count(*) AS n_new FROM first_seen GROUP BY 1
)
SELECT a.day, a.n_active, coalesce(n.n_new, 0) AS n_new,
       a.n_active - coalesce(n.n_new, 0) AS n_returning,
       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.day) AS BIGINT) AS cum_users
FROM active a LEFT JOIN new n ON n.day = a.day
ORDER BY a.day
"""


AB_WINDOW_US = 2 * 3600 * 1_000_000  # conversion window: 2 h after first view


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: deterministic 50/50 hash-bucketing of users
    into variants, view→purchase conversion rate per variant, and the
    pooled two-proportion z statistic — the readout every growth team
    runs, as one Spark plan.

    Variant assignment is the stable md5 idiom (first 8 hex < '80000000'
    → A): a pure function of user_id, so exposure is reproducible across
    engines, runs, and retries — the property that makes the experiment
    auditable.  Conversion = a purchase within AB_WINDOW_US after the
    user's first view (unbounded conversion saturates at 100% on this
    fixture's month-long histories — a window is also what real
    experiments measure).  Counts are exact integers; the z statistic is
    one closed-form float expression over four exact counts, identical
    on both engines, rounded to 4 dp, and NULL when a variant is empty
    or the pooled rate is degenerate (0% / 100%).

    Scale: two user-keyed aggregations (first view, any-purchase-after)
    and a 2-row variant rollup; the z stat is computed over the 2-row
    frame.
    """
    from changegen_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8) < "80000000",
        F.lit("A"),
    ).otherwise(F.lit("B"))
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    in_window = (F.col("pts") > F.col("first_view_ts")) & (
        F.unix_micros(F.col("pts")) - F.unix_micros(F.col("first_view_ts"))
        <= AB_WINDOW_US
    )
    conv = (
        first_view.join(purchases, "user_id", "left")
        .groupBy("user_id")
        .agg(F.max(in_window.cast("int")).alias("converted"))
        .select(
            "user_id", F.coalesce(F.col("converted"), F.lit(0)).alias("converted")
        )
    )
    per_variant = (
        conv.select(variant.alias("variant"), "converted")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_exposed"),
            F.sum("converted").alias("n_converted"),
        )
    )
    w = Window.partitionBy()
    n1 = F.max(F.when(F.col("variant") == "A", F.col("n_exposed"))).over(w)
    c1 = F.max(F.when(F.col("variant") == "A", F.col("n_converted"))).over(w)
    n2 = F.max(F.when(F.col("variant") == "B", F.col("n_exposed"))).over(w)
    c2 = F.max(F.when(F.col("variant") == "B", F.col("n_converted"))).over(w)
    p1 = c1.cast("double") / n1.cast("double")
    p2 = c2.cast("double") / n2.cast("double")
    pp = (c1 + c2).cast("double") / (n1 + n2).cast("double")
    denom = F.sqrt(
        pp * (1.0 - pp) * (1.0 / n1.cast("double") + 1.0 / n2.cast("double"))
    )
    z = F.when(denom > 0, (p1 - p2) / denom)
    return (
        per_variant.select(
            "variant",
            "n_exposed",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_exposed").cast("double")
                * 1e6
            )
            .cast("long")
            .alias("cr_e6"),
            F.round(z, 4).alias("z_stat"),
        )
        .orderBy("variant")
    )


Q_AB_TEST_SQL = f"""
WITH first_view AS (
  SELECT user_id, min(ts) AS first_view_ts
  FROM events WHERE event_type = 'view' GROUP BY 1
), conv AS (
  SELECT f.user_id,
         coalesce(max(CAST(p.ts > f.first_view_ts
                           AND epoch_us(p.ts) - epoch_us(f.first_view_ts)
                               <= {AB_WINDOW_US} AS INT)), 0) AS converted
  FROM first_view f
  LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    ON p.user_id = f.user_id
  GROUP BY 1
), pv AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8) < '80000000'
              THEN 'A' ELSE 'B' END AS variant,
         count(*) AS n_exposed, CAST(sum(converted) AS BIGINT) AS n_converted
  FROM conv GROUP BY 1
), stats AS (
  SELECT max(CASE WHEN variant = 'A' THEN n_exposed END) AS n1,
         max(CASE WHEN variant = 'A' THEN n_converted END) AS c1,
         max(CASE WHEN variant = 'B' THEN n_exposed END) AS n2,
         max(CASE WHEN variant = 'B' THEN n_converted END) AS c2
  FROM pv
)
SELECT pv.variant, pv.n_exposed, pv.n_converted,
       CAST(round(CAST(pv.n_converted AS DOUBLE)
                  / CAST(pv.n_exposed AS DOUBLE) * 1e6) AS BIGINT) AS cr_e6,
       round(CASE WHEN sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 - CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                            * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) > 0
                  THEN (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                       / sqrt((CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                              * (1.0 - CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
             END, 4) AS z_stat
FROM pv CROSS JOIN stats
ORDER BY pv.variant
"""


CUPED_CUTOFF = "2024-01-16 00:00:00"


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust the experiment
    metric Y (post-cutoff purchase cents) with the pre-period covariate X
    (pre-cutoff purchase cents), a_u = y_u − θ(x_u − μ_x) with the pooled
    θ = cov(X,Y)/var(X) — the industry-standard way to shrink A/B
    confidence intervals without touching the treatment effect.

    Determinism contract: every moment is assembled from EXACT BIGINT
    sums of cents (Σx, Σy, Σx², Σxy per variant and pooled), and only
    the final algebra runs in doubles — identical correctly-rounded IEEE
    ops on identical integers in both engines, rounded e6 on emission.
    One groupBy over users; the θ/μ_x scalars ride a broadcast
    cross-join, so at 100 TB this is a single aggregate pass."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    cents = F.round(F.col("value") * 100).cast("long")
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cutoff, cents).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("ts") >= cutoff, cents).otherwise(0)).alias("y"),
        )
    )
    pu = users.join(pur, "user_id", "left").select(
        "user_id",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8) < "80000000",
        "A",
    ).otherwise("B")
    tagged = pu.select(variant.alias("variant"), "x", "y")

    def sums(df, extra_key=None):
        keys = [extra_key] if extra_key else []
        return df.groupBy(*keys).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    g = sums(tagged).select(
        F.col("n").alias("gn"),
        F.col("sx").alias("gsx"),
        F.col("sy").alias("gsy"),
        F.col("sxx").alias("gsxx"),
        F.col("sxy").alias("gsxy"),
    )
    pv = sums(tagged, "variant")
    j = pv.crossJoin(F.broadcast(g))
    den = (F.col("gn") * F.col("gsxx") - F.col("gsx") * F.col("gsx")).cast(
        "double"
    )
    theta = F.when(
        den > 0,
        (F.col("gn") * F.col("gsxy") - F.col("gsx") * F.col("gsy")).cast(
            "double"
        )
        / den,
    ).otherwise(F.lit(0.0))
    mu = F.col("gsx").cast("double") / F.col("gn").cast("double")
    nv = F.col("n").cast("double")
    mean_y = F.col("sy").cast("double") / nv
    mean_adj = mean_y - theta * (F.col("sx").cast("double") / nv - mu)
    var_y = F.col("syy").cast("double") / nv - mean_y * mean_y
    e_a2 = (
        F.col("syy").cast("double")
        - 2.0 * theta * (F.col("sxy").cast("double") - mu * F.col("sy").cast("double"))
        + theta
        * theta
        * (
            F.col("sxx").cast("double")
            - 2.0 * mu * F.col("sx").cast("double")
            + nv * mu * mu
        )
    ) / nv
    var_adj = e_a2 - mean_adj * mean_adj
    red = F.when(var_y > 0, 1.0 - var_adj / var_y).otherwise(F.lit(0.0))
    e6 = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    return j.select(
        "variant",
        "n",
        e6(theta).alias("theta_e6"),
        e6(mean_y).alias("mean_y_e6"),
        e6(mean_adj).alias("mean_cuped_e6"),
        e6(var_y).alias("var_y_e6"),
        e6(var_adj).alias("var_cuped_e6"),
        e6(red).alias("var_reduction_e6"),
    ).orderBy("variant")


Q_CUPED_SQL = f"""
WITH pu AS (
  SELECT u.user_id,
         coalesce(p.x, 0) AS x, coalesce(p.y, 0) AS y
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN (
    SELECT user_id,
           CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_CUTOFF}'
                         THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
  ) p USING (user_id)
), tagged AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8) < '80000000'
              THEN 'A' ELSE 'B' END AS variant, x, y
  FROM pu
), pv AS (
  SELECT variant, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
         CAST(sum(y*y) AS BIGINT) AS syy
  FROM tagged GROUP BY variant
), g AS (
  SELECT count(*) AS gn,
         CAST(sum(x) AS BIGINT) AS gsx, CAST(sum(y) AS BIGINT) AS gsy,
         CAST(sum(x*x) AS BIGINT) AS gsxx, CAST(sum(x*y) AS BIGINT) AS gsxy
  FROM tagged
), fin AS (
  SELECT variant, n,
         CASE WHEN CAST(gn * gsxx - gsx * gsx AS DOUBLE) > 0
              THEN CAST(gn * gsxy - gsx * gsy AS DOUBLE)
                   / CAST(gn * gsxx - gsx * gsx AS DOUBLE)
              ELSE 0.0 END AS theta,
         CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS mu,
         CAST(n AS DOUBLE) AS nv,
         sx, sy, sxx, sxy, syy
  FROM pv CROSS JOIN g
)
SELECT variant, CAST(n AS BIGINT) AS n,
       CAST(round(theta * 1e6) AS BIGINT) AS theta_e6,
       CAST(round(CAST(sy AS DOUBLE) / nv * 1e6) AS BIGINT) AS mean_y_e6,
       CAST(round((CAST(sy AS DOUBLE) / nv - theta * (CAST(sx AS DOUBLE) / nv - mu)) * 1e6) AS BIGINT) AS mean_cuped_e6,
       CAST(round((CAST(syy AS DOUBLE) / nv - (CAST(sy AS DOUBLE) / nv) * (CAST(sy AS DOUBLE) / nv)) * 1e6) AS BIGINT) AS var_y_e6,
       CAST(round(((CAST(syy AS DOUBLE)
                    - 2.0 * theta * (CAST(sxy AS DOUBLE) - mu * CAST(sy AS DOUBLE))
                    + theta * theta * (CAST(sxx AS DOUBLE) - 2.0 * mu * CAST(sx AS DOUBLE) + nv * mu * mu)) / nv
                   - (CAST(sy AS DOUBLE) / nv - theta * (CAST(sx AS DOUBLE) / nv - mu))
                     * (CAST(sy AS DOUBLE) / nv - theta * (CAST(sx AS DOUBLE) / nv - mu))) * 1e6) AS BIGINT) AS var_cuped_e6,
       CAST(round(CASE WHEN (CAST(syy AS DOUBLE) / nv - (CAST(sy AS DOUBLE) / nv) * (CAST(sy AS DOUBLE) / nv)) > 0
                       THEN (1.0 - ((CAST(syy AS DOUBLE)
                                     - 2.0 * theta * (CAST(sxy AS DOUBLE) - mu * CAST(sy AS DOUBLE))
                                     + theta * theta * (CAST(sxx AS DOUBLE) - 2.0 * mu * CAST(sx AS DOUBLE) + nv * mu * mu)) / nv
                                    - (CAST(sy AS DOUBLE) / nv - theta * (CAST(sx AS DOUBLE) / nv - mu))
                                      * (CAST(sy AS DOUBLE) / nv - theta * (CAST(sx AS DOUBLE) / nv - mu)))
                                   / (CAST(syy AS DOUBLE) / nv - (CAST(sy AS DOUBLE) / nv) * (CAST(sy AS DOUBLE) / nv)))
                       ELSE 0.0 END * 1e6) AS BIGINT) AS var_reduction_e6
FROM fin
ORDER BY variant
"""


QUERIES = {
    "q_funnel": q_funnel,
    "q_retention": q_retention,
    "q_new_vs_returning": q_new_vs_returning,
    "q_ab_test": q_ab_test,
    "q_cuped": q_cuped,
}
ORACLES = {
    "q_funnel": Q_FUNNEL_SQL,
    "q_retention": Q_RETENTION_SQL,
    "q_new_vs_returning": Q_NEW_VS_RETURNING_SQL,
    "q_ab_test": Q_AB_TEST_SQL,
    "q_cuped": Q_CUPED_SQL,
}
