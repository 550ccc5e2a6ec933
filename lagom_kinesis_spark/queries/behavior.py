"""Behavioral / product-analytics operators over the event stream:
cohort retention, ordered funnel conversion, and statistical anomaly
detection on bucketed series.

The reference transports user-event streams (SURVEY.md §2A payloads);
this module is the canonical read-side workload a consumer of those
topics runs — the retention/funnel/anomaly triad every event-analytics
engine (Amplitude/Mixpanel-class, or a Kinesis Analytics application)
ships as first-class queries.

Scale notes:
- cohort retention is two user-keyed hash aggregates plus one join on
  user_id — every stage partitions on the same key, so at 100 TB the
  plan is scan → one exchange on user_id reused across the join and
  both aggregations (AQE coalesces), then a tiny (cohort, offset) agg;
- the funnel's step timestamps are unordered-window MIN-CASE expressions
  over ``PARTITION BY user_id`` — all four window nodes share ONE
  exchange (same partitioning, no ORDER BY ⇒ no sort), then a per-user
  aggregate collapses to one row per user before the global count;
- anomaly detection aggregates raw events to (series, bucket) first
  (~1000× reduction, map-side partial combine), and only then computes
  per-series moments with an unordered window — the window input is
  bucket-cardinality, never raw-event-cardinality.

Float discipline (functions/helpers.py): bucket sums accumulate in
DECIMAL; z-scores and shares are small-magnitude doubles rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import (
    events_cte,
    money_sum_units,
    r6,
    units,
)
from lagom_kinesis_spark.registry import register


@register(
    "behavior_cohort_retention",
    oracle=events_cte(
        """
    , firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
    )
    SELECT f.cohort_week,
           CAST((a.activity_week - f.cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """
    ),
    tags=("behavior", "agg", "join"),
)
def behavior_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users bucketed by first-seen week,
    counted in every subsequent week they were active.

    Both the cohort derivation and the activity set aggregate on
    user_id, and the join is user_id-keyed too — one partitioning
    serves the whole plan; the final (cohort, offset) aggregate is
    time-range-bounded, not user-bounded.
    """
    e = load(spark, sf_dir, "events")
    week = lambda c: F.to_date(F.date_trunc("week", c))  # noqa: E731
    firsts = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", week(F.col("ts")).alias("activity_week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "behavior_funnel_conversion",
    oracle=events_cte(
        """
    , u1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    u2 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2 FROM u1
    ),
    u3 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3 FROM u2
    ),
    u4 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
                  OVER (PARTITION BY user_id) AS t4 FROM u3
    ),
    per_user AS (
      SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
      FROM u4 GROUP BY user_id
    )
    SELECT COUNT(user_id) AS n_users,
           COUNT(t1) AS step_signup,
           COUNT(t2) AS step_view,
           COUNT(t3) AS step_click,
           COUNT(t4) AS step_purchase
    FROM per_user
    """
    ),
    tags=("behavior", "window", "agg"),
)
def behavior_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel signup → view → click → purchase: a user
    reaches step k only via an event AFTER their step-(k-1) timestamp.

    The four step timestamps are MIN-CASE over the same unordered
    user_id window — Catalyst plans ONE exchange and four window nodes
    with no sort (no ORDER BY), then one user-keyed aggregate on the
    already-partitioned rows. No per-user event list is ever
    materialized, so arbitrarily chatty users don't skew memory.
    """
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    et, ts = F.col("event_type"), F.col("ts")
    d = e.withColumn("t1", F.min(F.when(et == "signup", ts)).over(w))
    d = d.withColumn(
        "t2", F.min(F.when((et == "view") & (ts > F.col("t1")), ts)).over(w)
    )
    d = d.withColumn(
        "t3", F.min(F.when((et == "click") & (ts > F.col("t2")), ts)).over(w)
    )
    d = d.withColumn(
        "t4", F.min(F.when((et == "purchase") & (ts > F.col("t3")), ts)).over(w)
    )
    per_user = d.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
        F.max("t4").alias("t4"),
    )
    return per_user.agg(
        F.count("user_id").alias("n_users"),
        F.count("t1").alias("step_signup"),
        F.count("t2").alias("step_view"),
        F.count("t3").alias("step_click"),
        F.count("t4").alias("step_purchase"),
    )


@register(
    "behavior_anomaly_zscore",
    oracle=events_cte(
        """
    , b AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT *, avg(bucket_sum) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(bucket_sum) OVER (PARTITION BY event_type) AS sd
      FROM b
    )
    SELECT event_type, bucket, bucket_sum,
           round((bucket_sum - mu) / sd, 6) AS z
    FROM s WHERE abs(bucket_sum - mu) > 2 * sd
    """
    ),
    tags=("behavior", "timeseries", "window"),
)
def behavior_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series anomaly flags: hourly bucket sums more than 2 sample
    standard deviations from their series mean, with the z-score.

    Raw events reduce to (series, bucket) via one hash aggregate BEFORE
    any window runs — the moment computation sees bucket-cardinality
    input (time-range-bounded), and the unordered per-series window
    needs no sort. Series count is the parallelism unit; the fixture's
    5 event_types are the degenerate case, not the design (real
    deployments partition over millions of series).
    """
    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type", F.window("ts", "1 hour").start.alias("bucket")
    ).agg(money_sum_units(units("value"), 2).alias("bucket_sum"))
    w = W.partitionBy("event_type")
    s = b.withColumn("mu", F.avg("bucket_sum").over(w)).withColumn(
        "sd", F.stddev_samp("bucket_sum").over(w)
    )
    x = F.col("bucket_sum")
    return s.filter(F.abs(x - F.col("mu")) > 2 * F.col("sd")).select(
        "event_type",
        "bucket",
        "bucket_sum",
        r6((x - F.col("mu")) / F.col("sd")).alias("z"),
    )


@register(
    "behavior_running_distinct_users",
    oracle=events_cte(
        """
    , firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily
    """
    ),
    tags=("behavior", "window", "agg"),
)
def behavior_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the running COUNT(DISTINCT)
    that has no incremental window form, REWRITTEN scalably: a user
    contributes only on their FIRST day (user-keyed min aggregate), so
    the cumulative distinct collapses to a running SUM over per-day
    new-user counts.

    The only ordered window runs over day-cardinality rows
    (time-range-bounded — 365 rows/year no matter how many raw events),
    never over users or events; both aggregates are partial-combine
    hash aggs. The naive formulation (distinct over an expanding
    window) is quadratic and unshardable — this is the standard
    first-occurrence trick every warehouse uses.
    """
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "behavior_markov_transitions",
    oracle=events_cte(
        """
    , seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
      FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.event_type, p.n,
           round(CAST(p.n AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6) AS prob
    FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
    """
    ),
    tags=("behavior", "window", "agg"),
)
def behavior_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event journeys:
    P(next event type | current), from lag pairs within each user's
    time-ordered stream.

    The only window is per-user lag (partitioned, one exchange on
    user_id); pair counting and row-normalization are hash aggregates
    over type² ≤ tiny cardinality. Tie order pinned by (ts, event_id)
    so the pair sequence is deterministic.
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(tot, "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        r6(F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
            "prob"
        ),
    )


@register(
    "behavior_rfm_scores",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
           ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
    FROM base
    """,
    tags=("behavior", "window", "agg"),
)
def behavior_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: recency/frequency/monetary per customer,
    each bucketed into quartiles — the classic segmentation every
    commerce analytics stack ships.

    The per-customer aggregate reduces the fact table first; the ntile
    windows run over customer-cardinality rows. They are global-ordered
    windows BY DESIGN (quartiles are global statements) — at true scale
    the same scores come from approx_percentile boundaries + a map-side
    bucket join; ties pinned by custkey keep both engines identical.
    """
    o = load(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        money_sum_units(units("o_totalprice"), 2).alias("monetary"),
    )
    return base.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4).over(W.orderBy("last_order", "o_custkey")).alias("r_quartile"),
        F.ntile(4).over(W.orderBy("frequency", "o_custkey")).alias("f_quartile"),
        F.ntile(4).over(W.orderBy("monetary", "o_custkey")).alias("m_quartile"),
    )


#: Last-touch attribution contract, shared verbatim by the batch window
#: form (below) and the streaming ValueState form
#: (streaming_ops.stream_attribution_last_touch) — ONE definition so the
#: lookback/tie-break can never silently diverge between the two.
ATTRIBUTION_ORACLE = events_cte(
    """
    , ev AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), o AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS lc_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER w AS lc_ts
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id,
           CASE WHEN lc_ts >= ts - INTERVAL 1 HOUR THEN lc_id END AS click_id
    FROM o WHERE event_type = 'purchase'
    """
)


@register(
    "behavior_attribution_last_touch",
    oracle=ATTRIBUTION_ORACLE,
    tags=("behavior", "attribution"),
)
def behavior_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click within a 1-hour lookback, NULL when organic.
    The classic per-user as-of shape, computed without a join: clicks and
    purchases share ONE user-keyed ordered window, and a running
    last(click, ignore nulls) over the preceding frame carries the
    candidate; the lookback is a residual filter. Ties at identical ts
    order by event_id (unique), so 'before' is total on both engines.

    Scale: one exchange on user_id + per-user sort — the same partitioning
    every behavior query reuses; no self-join, no fan-out, output exactly
    one row per purchase."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    lc_id = F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w)
    lc_ts = F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w)
    return (
        e.select(
            "event_id",
            "event_type",
            "ts",
            lc_id.alias("lc_id"),
            lc_ts.alias("lc_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.when(
                F.col("lc_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"),
                F.col("lc_id"),
            ).alias("click_id"),
        )
    )


@register(
    "behavior_decayed_engagement",
    oracle=events_cte(
        """
    , ref AS (SELECT MAX(ts) AS now FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           round(SUM(value * pow(0.5,
               (epoch_us(now) - epoch_us(ts)) / 86400000000.0 / 7.0)), 6)
             AS engagement
    FROM events CROSS JOIN ref
    GROUP BY user_id
    """
    ),
    # "scalar": the only NLJ is the broadcast 1-row reference timestamp.
    tags=("behavior", "scalar"),
)
def behavior_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed engagement score (7-day half-life) per user —
    the recency-weighted activity metric ranking/churn models consume:
    yesterday's purchase counts ~10× one from five weeks ago, with no
    arbitrary cutoff window. Closed form (each event's weight depends
    only on its own age), so unlike an EWMA there is NO sequential
    recursion — one map-side expression + one user-keyed agg at any
    scale. The reference 'now' is the corpus max ts (broadcast 1-row),
    making the result replayable. pow() may differ by ~1 ulp between
    engines; summed magnitudes sit far inside the round-6 quantum."""
    e = load(spark, sf_dir, "events")
    ref = e.agg(F.max("ts").alias("now"))
    age_days = (
        F.unix_micros(F.col("now").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / F.lit(86400000000.0)
    return (
        e.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            r6(
                F.sum(F.col("value") * F.pow(F.lit(0.5), age_days / 7.0))
            ).alias("engagement"),
        )
    )


@register(
    "behavior_dau_wau_stickiness",
    oracle=events_cte(
        """
    , ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), dau AS (
      SELECT d, COUNT(*) AS dau FROM ud GROUP BY d
    ), fan AS (
      SELECT user_id, d + CAST(x AS INT) AS target_d
      FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS x)
    ), wau AS (
      SELECT target_d AS d, COUNT(DISTINCT user_id) AS wau
      FROM fan GROUP BY target_d
    )
    SELECT dau.d, dau.dau, wau.wau,
           round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau USING (d)
    """
    ),
    # "cross": the 7-row constant fan-out relation is a bounded NLJ.
    tags=("behavior", "cross"),
)
def behavior_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness — the canonical engagement ratio (what share of
    the weekly actives show up on a given day). Exact rolling 7-day
    distinct users WITHOUT a window-over-sets: each distinct (user, day)
    fans out to the 7 future days whose trailing week it belongs to
    (a constant ×7 map-side explode), then one distinct-count per target
    day — turning 'distinct over a sliding window' into plain hash
    aggregation, the standard exact-WAU rewrite at scale. Days with no
    activity simply have no DAU row (inner join keeps reported days)."""
    e = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("x"),
        "d",
    ).select("user_id", F.date_add("d", F.col("x")).alias("d"))
    wau = fan.groupBy("d").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(wau, "d").select(
        "d",
        "dau",
        "wau",
        r6(F.col("dau") / F.col("wau").cast("double")).alias("stickiness"),
    )


@register(
    "behavior_attribution_first_touch",
    oracle=events_cte(
        """
    , ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
      WHERE event_type IN ('click', 'purchase')
    ), marked AS (
      SELECT event_id, event_type,
             MIN(CASE WHEN event_type = 'click'
                      THEN CAST(us AS HUGEINT) * 100000000 + event_id
                 END) OVER w AS packed
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id,
           CAST(packed % 100000000 AS BIGINT) AS click_id
    FROM marked WHERE event_type = 'purchase'
    """
    ),
    tags=("behavior", "attribution"),
)
def behavior_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution — the other canonical credit model next to
    `behavior_attribution_last_touch`: each purchase is credited to the
    EARLIEST click inside its 1-hour lookback (NULL when organic). Last
    touch is a running-last over a growing frame; first touch needs the
    earliest event after a MOVING boundary, which is exactly a
    RANGE-interval frame: one window, `RANGE 1 hour PRECEDING`, min over
    the frame. Same-microsecond clicks are included (peer rows) on both
    engines by RANGE semantics, and determinism among tied-earliest
    clicks comes from packing (µs, event_id) into ONE wide-integer min:
    epoch-µs × 1e8 + event_id overflows int64 (~1.7e23), so the pack is
    DECIMAL(38,0) on the Spark side and HUGEINT in the oracle — exact
    integers both ways, compared identically; event_id < 1e8 by fixture
    contract keeps the two fields disjoint.

    Scale: identical envelope to every behavior query — one user-keyed
    exchange + sort, zero joins, one output row per purchase."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    us = F.unix_micros(F.col("ts"))
    is_click = F.col("event_type") == "click"
    packed = F.when(
        is_click,
        us.cast("decimal(38,0)") * F.lit(100000000).cast("decimal(38,0)")
        + F.col("event_id").cast("decimal(38,0)"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "event_type",
            F.min(packed).over(w).alias("packed"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            (F.col("packed") % F.lit(100000000).cast("decimal(38,0)"))
            .cast("long")
            .alias("click_id"),
        )
    )


@register(
    "behavior_session_entry_exit",
    oracle=events_cte(
        """
    , flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
                  AS session_seq
      FROM flagged
    ),
    bounded AS (
      SELECT user_id, session_seq,
             arg_min(event_type,
                     CAST(epoch_us(ts) AS HUGEINT) * 100000000 + event_id)
               AS entry_type,
             arg_max(event_type,
                     CAST(epoch_us(ts) AS HUGEINT) * 100000000 + event_id)
               AS exit_type,
             COUNT(*) AS n_events
      FROM sessions GROUP BY 1, 2
    )
    SELECT entry_type, exit_type,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM bounded GROUP BY entry_type, exit_type
    """
    ),
    tags=("behavior", "window"),
)
def behavior_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit-action matrix — 'what do sessions start and end
    with' (landing vs exit pages in web analytics; the drop-off report
    funnels summarize away). Composes the 30-min gap sessionization with
    per-session min_by/max_by over the (ts, event_id) order, then a
    |event_types|²-bounded aggregate — the output never grows with the
    corpus.

    Same plan envelope as every sessionization: two window passes over
    ONE user-keyed exchange, a (user, session) aggregate whose keys
    contain the partition key, then the tiny matrix rollup. The
    (ts, event_id) argmin/argmax tiebreak makes entry/exit total orders
    on both engines."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_seq", F.sum("is_new").over(run))
    order_key = F.struct("ts", "event_id")
    bounded = sessions.groupBy("user_id", "session_seq").agg(
        F.min_by("event_type", order_key).alias("entry_type"),
        F.max_by("event_type", order_key).alias("exit_type"),
        F.count("*").alias("n_events"),
    )
    return bounded.groupBy("entry_type", "exit_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
    )
