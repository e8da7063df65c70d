"""§2.4.K extensions — time-series & behavioral analytics over `events`.

The reference's serving layer is a time-indexed ledger (rewards by
block/time, migrations/V1__create_rewards.sql:11-12); these operators
are the analytics its schema+indexes exist to serve, re-expressed as
distributed plans: gap-fill/interpolation (the "missing blocks" shape,
src/follower.rs:86-99 catch-up), SCD2 interval tracking (the
follower_info height ledger, migrations/V2), cohort/funnel rollups, and
statistical outlier detection.

Float discipline (registry docstring): every money-like aggregate runs
over integral cents (`CAST(round(value*100) AS BIGINT)`) so sums are
exact in any addition order; divisions/sqrt happen row-level AFTER
aggregation with an identical expression tree on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

# Integral cents: exact under reordered addition, unlike raw doubles.
# Built lazily — Column construction needs an active SparkContext, and
# this module is imported by registry.load_all() before any session
# exists (a module-level Column breaks the driver's entry import).
def _cents():
    return F.round(F.col("value") * 100, 0).cast("long")


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    spans AS (
      SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM hourly GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      FROM spans),
    j AS (
      SELECT g.user_id, g.hr, h.cents FROM grid g
      LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr)
    SELECT user_id, hr,
           ROUND(last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hr
                   ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS hourly_value,
           cents IS NULL AS is_gap
    FROM j
    """,
)
def ts_gapfill_locf(spark, sf_dir):
    # Time-series gap fill, last-observation-carried-forward: hourly
    # per-user totals → a dense hour grid per user (sequence+explode,
    # no driver loop) → left join → last(ignorenulls) window. One
    # shuffle on user_id serves the grid join AND the LOCF window; the
    # grid is generated, never materialized driver-side, so a 100 TB
    # events table with a year of hours per key stays distributed.
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.sum(_cents()).alias("cents"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.expr("sequence(mn, mx, interval 1 hour)")
            ).alias("hr"),
        )
    )
    j = grid.join(hourly, ["user_id", "hr"], "left")
    locf = W.partitionBy("user_id").orderBy("hr").rowsBetween(
        W.unboundedPreceding, 0
    )
    return j.select(
        "user_id",
        "hr",
        F.round(
            F.last("cents", ignorenulls=True).over(locf) / 100.0, 2
        ).alias("hourly_value"),
        F.col("cents").isNull().alias("is_gap"),
    )


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    spans AS (
      SELECT user_id, min(hr) AS mn, max(hr) AS mx FROM hourly GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      FROM spans),
    j AS (
      SELECT g.user_id, g.hr, h.cents FROM grid g
      LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr),
    ctx AS (
      SELECT user_id, hr, cents,
             last_value(cents IGNORE NULLS) OVER wb AS prev_c,
             last_value(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
               OVER wb AS prev_hr,
             first_value(cents IGNORE NULLS) OVER wf AS next_c,
             first_value(CASE WHEN cents IS NOT NULL THEN hr END IGNORE NULLS)
               OVER wf AS next_hr
      FROM j
      WINDOW wb AS (PARTITION BY user_id ORDER BY hr ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hr,
           CAST(floor((CAST(prev_c AS DOUBLE)
                       + (next_c - prev_c)
                         * (CAST(date_diff('hour', prev_hr, hr) AS DOUBLE)
                            / CAST(date_diff('hour', prev_hr, next_hr)
                                   AS DOUBLE)))
                      * 100.0 + 0.5) AS DOUBLE)
             / 10000.0 AS interp_value
    FROM ctx WHERE cents IS NULL
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    # Linear interpolation of the gaps the LOCF query fills flatly:
    # for each missing hour, the straddling known points come from one
    # backward and one forward window pass (same user_id shuffle), and
    # the interpolated value is pure row arithmetic — integral cents
    # and integral hour offsets in, one double expression out, so the
    # oracle matches bit-for-bit without tolerances.
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.sum(_cents()).alias("cents"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    j = grid.join(hourly, ["user_id", "hr"], "left")
    wb = W.partitionBy("user_id").orderBy("hr").rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = W.partitionBy("user_id").orderBy("hr").rowsBetween(
        0, W.unboundedFollowing
    )
    known_hr = F.when(F.col("cents").isNotNull(), F.col("hr"))
    ctx = j.select(
        "user_id",
        "hr",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(known_hr, ignorenulls=True).over(wb).alias("prev_hr"),
        F.first("cents", ignorenulls=True).over(wf).alias("next_c"),
        F.first(known_hr, ignorenulls=True).over(wf).alias("next_hr"),
    )
    hours = lambda a, b: (  # noqa: E731 — integral hour offset
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / 3600
    ).cast("long")
    interp = (
        F.col("prev_c").cast("double")
        + (F.col("next_c") - F.col("prev_c"))
        * (
            hours(F.col("prev_hr"), F.col("hr")).cast("double")
            / hours(F.col("prev_hr"), F.col("next_hr")).cast("double")
        )
    )
    # ROUND(x, 4) is NOT portable at ties: Spark rounds half-up, DuckDB
    # half-to-even, and h1/h2 fractions land exactly on .00005 ties
    # (e.g. 1/8 of a cent). floor(x*1e4 + 0.5)/1e4 is the same IEEE
    # expression on both engines, so oracle hashes match regardless.
    # Caveat: for NEGATIVE x this floors halves toward +inf, not
    # away-from-zero like SQL half-up — fine here because interp is a
    # convex combination of non-negative cents, but a data change that
    # admits negative values would silently shift tie semantics.
    interp_e4 = F.floor(interp * 100.0 + 0.5).cast("double")
    return ctx.where(F.col("cents").isNull()).select(
        "user_id", "hr", (interp_e4 / 10000.0).alias("interp_value")
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH c AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    r AS (
      SELECT user_id, hr, cents,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id, hr) AS n
      FROM c
      WINDOW w AS (PARTITION BY user_id, hr ORDER BY ts, event_id)),
    g AS (
      SELECT user_id, hr,
             CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS o,
             CAST(MAX(cents) AS BIGINT) AS h,
             CAST(MIN(cents) AS BIGINT) AS l,
             CAST(MAX(CASE WHEN rn = n THEN cents END) AS BIGINT) AS cl,
             CAST(SUM(cents) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM r GROUP BY 1, 2)
    SELECT user_id, hr,
           ROUND(o / 100.0, 2) AS open,
           ROUND(h / 100.0, 2) AS high,
           ROUND(l / 100.0, 2) AS low,
           ROUND(cl / 100.0, 2) AS close,
           ROUND(v / 100.0, 2) AS volume,
           n_events
    FROM g
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    # OHLC bar resampling — the hypertable downsampling shape (the
    # reference's time-indexed rewards ledger feeding a charting
    # rollup). Open/close are the values at the extreme (ts, event_id)
    # positions — event_id breaks timestamp ties, so the result is
    # partition-invariant. ONE exchange total: the row_number window
    # partitions by (user_id, hr) and the aggregation groups by the
    # same keys, so the agg rides the window's shuffle. All arithmetic
    # on integral cents; /100 rounding happens row-level after the agg
    # with the identical expression on both engines.
    t = Tables(spark, sf_dir)
    c = t.events.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "ts",
        "event_id",
        _cents().alias("cents"),
    )
    w = W.partitionBy("user_id", "hr").orderBy("ts", "event_id")
    wp = W.partitionBy("user_id", "hr")
    r = c.select(
        "user_id",
        "hr",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    g = r.groupBy("user_id", "hr").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("o"),
        F.max("cents").alias("h"),
        F.min("cents").alias("l"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("cents"))).alias("cl"),
        F.sum("cents").alias("v"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return g.select(
        "user_id",
        "hr",
        F.round(F.col("o") / 100.0, 2).alias("open"),
        F.round(F.col("h") / 100.0, 2).alias("high"),
        F.round(F.col("l") / 100.0, 2).alias("low"),
        F.round(F.col("cl") / 100.0, 2).alias("close"),
        F.round(F.col("v") / 100.0, 2).alias("volume"),
        "n_events",
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL AS is_current
    FROM starts
    """,
)
def scd2_intervals(spark, sf_dir):
    # Slowly-changing-dimension type 2 from an event stream: collapse
    # consecutive same-type runs per user into [valid_from, valid_to)
    # intervals, open-ended for the current state. The follower_info
    # height ledger (reference migrations/V2) is the degenerate
    # single-key case. Both window passes share the user_id shuffle.
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        t.events.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    wl = W.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(wl)
    return starts.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(cents * cents) AS BIGINT) AS s2
      FROM c GROUP BY 1)
    SELECT event_id, c.event_type, value,
           ROUND((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        / CAST(n - 1 AS DOUBLE)), 3) AS zscore
    FROM c JOIN stats ON c.event_type = stats.event_type
    WHERE abs((CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(s2 AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE))
                     / CAST(n - 1 AS DOUBLE))) > 2.5
    """,
)
def anomaly_zscore(spark, sf_dir):
    # Per-type z-score outliers from exactly-aggregable moments: n,
    # Σcents, Σcents² are integral sums (order-independent), the mean/
    # variance/z arithmetic is row-level double math with the SAME
    # expression tree as the oracle — so even sqrt matches bit-for-bit
    # (IEEE 754 sqrt is correctly rounded on both engines). One hash
    # agg over 5 groups, broadcast back; no window, no second shuffle.
    t = Tables(spark, sf_dir)
    c = t.events.select(
        "event_id", "event_type", "value", _cents().alias("cents")
    )
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n").cast("double")
        )
        / (F.col("n") - 1).cast("double")
    )
    z = (F.col("cents").cast("double") - mean) / sd
    return (
        c.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 2.5)
        .select("event_id", "event_type", "value", F.round(z, 3).alias("zscore"))
    )


@query(
    "retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY 1),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohort(spark, sf_dir):
    # Cohort retention triangle: users keyed by first-seen day, counted
    # distinct per (cohort, days-since). The firsts side is one row PER
    # USER — unbounded at corpus scale, so no broadcast hint (forcing
    # it would OOM the driver at 100 TB): firsts arrives hash-
    # partitioned on user_id from its aggregation and the sort-merge /
    # shuffled-hash join reuses that exchange; AQE still demotes to
    # broadcast when the run is genuinely small. All-integer output —
    # no float discipline needed.
    t = Tables(spark, sf_dir)
    firsts = t.events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    activity = t.events.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
    s3 AS (
      SELECT e.user_id, min(ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE), 4)
             AS click_rate,
           ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM s2) AS DOUBLE), 4)
             AS purchase_rate
    """,
)
def funnel_conversion(spark, sf_dir):
    # Ordered funnel (signup → later click → later purchase): each
    # stage is a per-user min-timestamp agg joined against the
    # previous stage, so ordering is enforced with timestamps, not
    # per-user sequence scans. Stage tables are one-row-per-user —
    # UNBOUNDED at corpus scale, so no broadcast hint: each stage agg
    # hash-partitions on user_id and the next stage's equi-join rides
    # that exchange (AQE broadcasts only when a stage is measured
    # small). The final counts reduce to one row each; the crossJoins
    # glue three 1-row frames — constant-size by construction.
    t = Tables(spark, sf_dir)
    ev = t.events
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n_signup"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n_click"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        n1.crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_signup",
            "n_click",
            "n_purchase",
            F.round(
                F.col("n_click").cast("double")
                / F.col("n_signup").cast("double"),
                4,
            ).alias("click_rate"),
            F.round(
                F.col("n_purchase").cast("double")
                / F.col("n_click").cast("double"),
                4,
            ).alias("purchase_rate"),
        )
    )


@query(
    "scd2_point_in_time",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    intervals AS (
      SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM starts)
    SELECT user_id, event_type, valid_from, valid_to
    FROM intervals
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to > TIMESTAMP '2024-01-15 00:00:00' OR valid_to IS NULL)
    """,
)
def scd2_point_in_time(spark, sf_dir):
    # "As of 2024-01-15, what state was each user in?" — the
    # point-in-time lookup every SCD2 dimension exists to answer
    # (training-data equivalent: reconstruct the corpus exactly as a
    # past training run saw it). Builds on scd2_intervals and filters
    # to the version covering the probe timestamp; at scale the filter
    # prunes before the lead() materializes nothing extra — both
    # windows and the filter share the one user_id exchange.
    probe = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        t.events.select(
            "user_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    wl = W.partitionBy("user_id").orderBy("valid_from")
    intervals = starts.withColumn(
        "valid_to", F.lead("valid_from").over(wl)
    )
    return intervals.where(
        (F.col("valid_from") <= probe)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > probe))
    ).select("user_id", "event_type", "valid_from", "valid_to")


_EWMA_SQL_ORACLE = """
SELECT user_id,
       list_reduce(list(CAST(round(value * 100) AS BIGINT)
                        ORDER BY ts, event_id),
                   (acc, x) -> (x + 3 * acc) // 4) AS ewma_c,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("ts_ewma_portable", oracle=_EWMA_SQL_ORACLE)
def ts_ewma_portable(spark, sf_dir):
    """Per-user exponentially-weighted moving average, hash-exact
    cross-engine — the RECURRENCE class of time-series smoothing
    (r_t = alpha*x_t + (1-alpha)*r_{t-1}) that no window frame can
    express (each output depends on the previous OUTPUT, not previous
    inputs). Two ideas make it both portable and scale-safe:

    (1) integer recurrence: alpha = 1/4 on cents gives
        r' = (x + 3*r) div 4 — BIGINT ops both engines compute
        identically for ANY sign: Spark `div` and DuckDB `//` BOTH
        truncate toward zero (-7 div 2 == -7 // 2 == -3, measured;
        r8 ADVICE suspected DuckDB floor-divides — it does not), and
        `%` is sign-of-dividend in both. Negative cents (refunds)
        therefore fold identically; tests/test_properties.py pins the
        cross-engine fold on a negative-valued fixture.
    (2) per-key sequential fold, not a driver loop: each user's series
        collects into ONE array (bounded: max events/user is small —
        the same per-entity-bounded contract as sessionize/funnel) and
        folds left with Spark's `aggregate` higher-order function /
        DuckDB's `list_reduce`, both left-to-right by definition. The
        plan is one hash agg + a row-local fold — map-side combinable
        collect, zero extra shuffles, no UDF.

    At 100 TB: state-machine recurrences over unbounded streams ride
    applyInPandasWithState instead (stream_stateful_running_count);
    this form is the batch/backfill twin for bounded per-entity
    series. Ordering ties break on (ts, event_id) — total order, so
    the fold is deterministic."""
    t = Tables(spark, sf_dir)
    t.register_views()
    return spark.sql(
        """
        SELECT user_id,
          aggregate(slice(xs, 2, size(xs) - 1), xs[0],
                    (acc, x) -> (x + 3L * acc) div 4L) AS ewma_c,
          CAST(size(xs) AS BIGINT) AS n_events
        FROM (
          SELECT user_id,
                 transform(array_sort(collect_list(struct(ts, event_id,
                           CAST(round(value * 100) AS BIGINT) AS xc))),
                           s -> s.xc) AS xs
          FROM events GROUP BY user_id)
        ORDER BY user_id
        """
    )


_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS BIGINT)
         AS n_from_prev
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
"""


@query("ts_event_transitions", oracle=_TRANSITIONS_ORACLE)
def ts_event_transitions(spark, sf_dir):
    """EVENT-TRANSITION (Markov) matrix — for every ordered pair of
    event types, how often one follows the other within a user's
    stream — the sequence-analysis primitive under next-event
    prediction, anomaly detection on behavior drift, and CEP-style
    adjacent-pattern counting (funnel_conversion counts stage
    PROGRESS; this counts every adjacency). One lag window per user
    (ties broken (ts, event_id) — total order), then a hash agg on the
    (prev, next) pair plus a row-count window over the tiny result to
    attach per-source totals (the denominator for transition
    probabilities, kept as exact integers rather than a float ratio).
    Plan: one user_id Exchange for the lag, one pair agg — both
    map-side combinable; the totals window partitions a
    #event_types^2-row control table, never the fact stream."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    wt = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.sum("n_transitions").over(wt).cast("long").alias("n_from_prev"),
    ).orderBy("prev_type", "next_type")
