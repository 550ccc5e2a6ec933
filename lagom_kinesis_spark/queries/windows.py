"""Window functions + as-of / interval joins (SURVEY.md §2B "Window
functions" + the two non-native join rows).

Window ops shuffle once on the partition key then sort within partitions —
the plan shape survives scale as long as no partition key is pathologically
hot. Ties are pinned by unique keys wherever row order affects the result
(row_number, ntile, lag/lead, frames) per FIXTURES.md harness rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import (
    dec,
    events_cte,
    money,
    money_sum_units,
    r6,
    units,
)
from lagom_kinesis_spark.operators import asof_join
from lagom_kinesis_spark.registry import register


@register(
    "win_rank_family",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROW_NUMBER() OVER w_pin AS rn,
           RANK() OVER w_val AS rnk,
           DENSE_RANK() OVER w_val AS drnk
    FROM lineitem
    WHERE l_quantity >= 48
    WINDOW
      w_val AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC),
      w_pin AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
    """,
    tags=("window",),
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number (pinned ties) + rank/dense_rank (tie-stable by definition)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    w_val = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    w_pin = W.partitionBy("l_returnflag").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.row_number().over(w_pin).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
    )


@register(
    "win_ntile_dist",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w_pin AS quartile,
           round(PERCENT_RANK() OVER w_val, 6) AS pct_rank,
           round(CUME_DIST() OVER w_val, 6) AS cdist
    FROM orders
    WHERE o_custkey <= 300
    WINDOW
      w_val AS (PARTITION BY o_orderpriority ORDER BY o_totalprice),
      w_pin AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window",),
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile (pinned) + percent_rank / cume_dist (tie-stable)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w_val = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_pin = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w_pin).alias("quartile"),
        r6(F.percent_rank().over(w_val)).alias("pct_rank"),
        r6(F.cume_dist().over(w_val)).alias("cdist"),
    )


@register(
    "win_lag_lead",
    oracle=events_cte(
        """
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
    ),
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead with explicit default, pinned ordering."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@register(
    "win_running_total",
    oracle=events_cte(
        """
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             / 100.0 AS running_value,
           COUNT(*) OVER w AS running_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    ),
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total (cumulative frame) — accumulated in exact int64
    hundredths (events.value is 2-decimal by fixture contract, pinned in
    tests/test_fixtures.py): the long window sum stays in whole-stage
    codegen's primitive path and the float-sum's per-row
    ``round(…, 6)`` finalize — a BigDecimal allocation per output row
    inside Spark's Round — disappears entirely (interleaved A/B at
    sf10, 10M rows: 4.6 → 4.1 s; the exchange+sort under the window is
    the remaining floor at ~3.2 s). Exactness without the
    decimal/VARCHAR finalization hop (helpers.money_sum_units): running
    sums top out ~5.6e12 units even at sf100 — far below 2^53 — so the
    long→double conversion is exact and the /100.0 is one correctly
    rounded IEEE division on BOTH engines, bit-identical by
    construction. It is also order-independent, which the float
    accumulation it replaces was not."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum(units("value")).over(w).cast("double") / F.lit(100.0)).alias(
            "running_value"
        ),
        F.count("*").over(w).alias("running_n"),
    )


@register(
    "win_moving_avg",
    oracle=events_cte(
        """
    SELECT event_id, user_id,
           round(AVG(value) OVER w, 6) AS mavg3,
           MAX(value) OVER w AS mmax3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """
    ),
    tags=("window",),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row trailing frame."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        r6(F.avg("value").over(w)).alias("mavg3"),
        F.max("value").over(w).alias("mmax3"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER w AS n_in_band,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE)
             AS sum_in_band
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (tie-safe: peers share frames);
    exact-decimal sum keeps the float compare bit-identical."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
        money(F.sum(dec("o_totalprice")).over(w)).alias("sum_in_band"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with the frame pinned to the whole partition."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable distributed top-k idiom."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# As-of + interval joins (non-native operators, SURVEY.md §4.3)
# ---------------------------------------------------------------------------


@register(
    "join_asof",
    oracle=events_cte(
        """
    , purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
      -- DuckDB's ASOF JOIN picks an ARBITRARY row among right-side ts ties;
      -- the engine's tie contract (asof_join(tie=...): greatest click_id
      -- wins) is applied by deduping to that winner per (user_id, ts)
      -- BEFORE the asof — caught by the sf1 sweep, where fixture
      -- replication duplicates every click ts 10x.
      clicks    AS (
        SELECT click_id, user_id, ts, click_value FROM (
          SELECT event_id AS click_id, user_id, ts, value AS click_value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS trn
          FROM events WHERE event_type = 'click'
        ) WHERE trn = 1
      )
    SELECT p.event_id, p.user_id, p.value, c.click_id, c.click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """
    ),
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest prior (<=) click of the same user —
    operators/asof.py rewrite vs DuckDB's native ASOF JOIN."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        ts="ts",
        by=["user_id"],
        right_payload=["click_id", "click_value"],
        tie="click_id",
    ).select("event_id", "user_id", "value", "click_id", "click_value")


@register(
    "join_interval_overlap",
    oracle=events_cte(
        """
    , purchases AS (SELECT event_id, user_id, ts AS start_ts,
                           ts + INTERVAL 30 MINUTE AS end_ts
                    FROM events WHERE event_type = 'purchase'),
      errors AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT p.event_id, COUNT(e.ts) AS n_errors
    FROM purchases p
    LEFT JOIN errors e
      ON p.user_id = e.user_id AND e.ts >= p.start_ts AND e.ts < p.end_ts
    GROUP BY p.event_id
    """
    ),
    tags=("join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: errors falling inside each purchase's 30-min window
    (equi on user_id keeps it a hash join with a range residual)."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    return (
        purchases.join(
            errors,
            (purchases.p_user == errors.e_user)
            & (errors.e_ts >= purchases.start_ts)
            & (errors.e_ts < purchases.end_ts),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("e_ts").alias("n_errors"))
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_cheapest,
           nth_value(o_orderkey, 3) OVER w AS third_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with a pinned whole-partition frame and key-pinned order."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_cheapest"),
    )


@register(
    "win_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, c.c_nationkey AS nationkey,
             CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS nation_rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT regionkey, nationkey, nation_rev,
           round(nation_rev / SUM(nation_rev) OVER (PARTITION BY regionkey), 6)
             AS region_share
    FROM nat
    """,
    tags=("window", "agg"),
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue — the
    percent-of-total idiom (unordered partition window over PRE-AGGREGATED
    rows, so the window input is nation-cardinality, never fact rows).
    Share divides two already-rounded doubles, then rounds — identical
    arithmetic on both engines."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(money_sum_units(units("o_totalprice"), 2).alias("nation_rev"))
    )
    w = W.partitionBy("regionkey")
    return nat.select(
        "regionkey",
        "nationkey",
        "nation_rev",
        r6(F.col("nation_rev") / F.sum("nation_rev").over(w)).alias(
            "region_share"
        ),
    )


@register(
    "join_asof_tolerance",
    oracle=events_cte(
        """
    , purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
      -- DuckDB's ASOF JOIN picks an ARBITRARY row among right-side ts ties;
      -- the engine's tie contract (asof_join(tie=...): greatest click_id
      -- wins) is applied by deduping to that winner per (user_id, ts)
      -- BEFORE the asof — caught by the sf1 sweep, where fixture
      -- replication duplicates every click ts 10x.
      clicks    AS (
        SELECT click_id, user_id, ts, click_value FROM (
          SELECT event_id AS click_id, user_id, ts, value AS click_value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS trn
          FROM events WHERE event_type = 'click'
        ) WHERE trn = 1
      )
    SELECT p.event_id, p.user_id, p.value,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.click_id END
             AS click_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.click_value END
             AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """
    ),
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics): the latest prior click of
    the same user counts only if it happened within the last hour —
    older matches null out rather than attributing a purchase to a
    conversion path that went cold. Same single-shuffle union rewrite as
    join_asof (operators/asof.py) with the matched timestamp carried
    through so the tolerance is one null-out projection, not a second
    join."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        ts="ts",
        by=["user_id"],
        right_payload=["click_id", "click_value", "click_ts"],
        tie="click_id",
    )
    fresh = F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.when(fresh, F.col("click_id")).alias("click_id"),
        F.when(fresh, F.col("click_value")).alias("click_value"),
    )


@register(
    "win_range_interval",
    oracle=events_cte(
        """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_10m,
           round(SUM(value) OVER w, 6) AS val_last_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
    """
    ),
    tags=("window", "interval"),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-INTERVAL range frame: per user, the trailing-10-minute event
    count and value sum — the event-time sibling of win_range_frame's
    numeric band, and the window-function phrasing of a sliding window
    (vs stream_sliding_window's bucketed one). RANGE frames are
    value-defined, so duplicate timestamps are peers sharing one frame —
    tie-safe by construction (the property the sf1 replicated fixture
    stresses). SUM(value) is a ≤10-minute window of O(1)-magnitude
    doubles: float error ≪ the round-6 quantum, the small-float
    discipline. Scale: one shuffle on user_id + a per-partition
    sort — the standard window envelope."""
    from lagom_kinesis_spark.catalog import register_views

    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_last_10m,
               round(SUM(value) OVER w, 6) AS val_last_10m
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "join_asof_nearest",
    oracle=events_cte(
        """
    , ev AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), o AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER wb AS b_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER wb AS b_ts,
             first_value(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS) OVER wf AS f_id,
             first_value(CASE WHEN event_type = 'click' THEN ts END
                         IGNORE NULLS) OVER wf AS f_ts
      FROM ev
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ), d AS (
      SELECT event_id AS purchase_id,
             CASE WHEN b_ts IS NULL THEN NULL
                  ELSE epoch_us(ts) - epoch_us(b_ts) END AS b_us,
             CASE WHEN f_ts IS NULL THEN NULL
                  ELSE epoch_us(f_ts) - epoch_us(ts) END AS f_us,
             b_id, f_id
      FROM o WHERE event_type = 'purchase'
    )
    SELECT purchase_id,
           CASE WHEN b_us IS NOT NULL AND (f_us IS NULL OR b_us <= f_us)
                     AND b_us <= 1800000000 THEN b_id
                WHEN f_us IS NOT NULL AND f_us <= 1800000000 THEN f_id
           END AS click_id,
           CASE WHEN b_us IS NOT NULL AND (f_us IS NULL OR b_us <= f_us)
                     AND b_us <= 1800000000 THEN 'backward'
                WHEN f_us IS NOT NULL AND f_us <= 1800000000 THEN 'forward'
           END AS direction
    FROM d
    """
    ),
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (asof_join(direction='nearest',
    tolerance=30min)): each purchase matches the closest same-user click
    in EITHER time direction, ties preferring backward — the pandas
    merge_asof / QuestDB semantics Spark lacks natively. Computed with
    zero joins: one user-keyed ordered window carries the backward
    candidate (running last) and the forward candidate (running first);
    the winner is an exact integer-microsecond distance compare, and the
    30-min tolerance a residual filter. Ties at identical ts order by
    event_id, so 'before'/'after' is total on both engines.

    Scale: same single-exchange shape as every as-of in this engine —
    no range self-join, output exactly one row per left row."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    is_click = F.col("event_type") == "click"
    c_id = F.when(is_click, F.col("event_id"))
    c_ts = F.when(is_click, F.col("ts"))
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    d = (
        e.select(
            "event_id",
            "event_type",
            "ts",
            F.last(c_id, ignorenulls=True).over(wb).alias("b_id"),
            F.last(c_ts, ignorenulls=True).over(wb).alias("b_ts"),
            F.first(c_id, ignorenulls=True).over(wf).alias("f_id"),
            F.first(c_ts, ignorenulls=True).over(wf).alias("f_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            (us(F.col("ts")) - us(F.col("b_ts"))).alias("b_us"),
            (us(F.col("f_ts")) - us(F.col("ts"))).alias("f_us"),
            "b_id",
            "f_id",
        )
    )
    tol = 1_800_000_000  # 30 min in µs
    b_wins = (
        F.col("b_us").isNotNull()
        & (F.col("f_us").isNull() | (F.col("b_us") <= F.col("f_us")))
        & (F.col("b_us") <= tol)
    )
    f_wins = F.col("f_us").isNotNull() & (F.col("f_us") <= tol)
    return d.select(
        "purchase_id",
        F.when(b_wins, F.col("b_id"))
        .when(f_wins, F.col("f_id"))
        .alias("click_id"),
        F.when(b_wins, F.lit("backward"))
        .when(f_wins, F.lit("forward"))
        .alias("direction"),
    )


@register(
    "join_asof_forward",
    oracle=events_cte(
        """
    , ev AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c
      FROM events WHERE event_type IN ('click', 'purchase')
    ), o AS (
      SELECT *,
             first_value(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS) OVER wf AS click_id,
             first_value(CASE WHEN event_type = 'click' THEN ts END
                         IGNORE NULLS) OVER wf AS click_ts
      FROM ev
      WINDOW wf AS (PARTITION BY user_id ORDER BY ts, is_c, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS purchase_id, click_id,
           CASE WHEN click_ts IS NULL THEN NULL
                ELSE epoch_us(click_ts) - epoch_us(ts) END AS gap_us
    FROM o WHERE event_type = 'purchase'
    """
    ),
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (pandas merge_asof
    direction='forward', allow_exact_matches=True): each purchase matches
    the FIRST same-user click at-or-after its timestamp — the
    'next-action after conversion' shape (post-purchase click, next
    quote after an order). Completes the direction trio next to
    join_asof (backward) and join_asof_nearest.

    Same join-free single-exchange plan as the rest of the as-of family:
    one user-keyed ordered window carries the running FIRST forward
    click. Exact-match inclusion is encoded in the sort key — at equal
    ts, purchases order BEFORE clicks (is_click secondary key), so a
    same-microsecond click lands in the purchase's following frame on
    both engines; ties among same-ts clicks resolve by event_id."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", is_click.cast("int"), "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    return (
        e.select(
            "event_id",
            "event_type",
            "ts",
            F.first(F.when(is_click, F.col("event_id")), ignorenulls=True)
            .over(wf)
            .alias("click_id"),
            F.first(F.when(is_click, F.col("ts")), ignorenulls=True)
            .over(wf)
            .alias("click_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "click_id",
            (us(F.col("click_ts")) - us(F.col("ts"))).alias("gap_us"),
        )
    )


@register(
    "win_distinct_count",
    oracle=events_cte(
        """
    SELECT event_id,
           CAST(COUNT(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS INT)
             AS distinct_users_10
    FROM events
    """
    ),
    tags=("window",),
)
def win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a moving window — the 'unique actors in the
    last N events' signal fraud/abuse monitors watch. Spark has no
    DISTINCT window aggregate; the engine bridge is
    ``size(collect_set(...))`` over the same frame — set semantics in a
    mergeable window buffer. Oracle: DuckDB's native windowed
    COUNT(DISTINCT). Bounded 10-row frames keep the per-row set
    buffer constant-size; at true scale the HLL-register variant
    (stream_hll_windowed_distinct) is the unbounded-frame answer."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    return e.select(
        "event_id",
        F.size(F.collect_set("user_id").over(w)).alias("distinct_users_10"),
    )


@register(
    "win_conditional_streak",
    oracle=events_cte(
        """
    , marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = lag(event_type) OVER w THEN 0 ELSE 1 END
               AS new_island
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS island_id
      FROM marked
    ), streaks AS (
      SELECT user_id, island_id, COUNT(*) AS len
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id
    """
    ),
    tags=("window",),
)
def win_conditional_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive same-value run per key (value-change
    gaps-and-islands) — the streak metric behind habit/engagement
    features ('longest run of the same action'). The CONDITION-change
    variant of sessionization's time-gap islands: island boundaries are
    value transitions, not silent gaps.

    Plan shape: the island marking and numbering ride ONE user-keyed
    exchange+sort (two window expressions over the same spec), then two
    shrinking aggregates whose keys contain user_id — partial-agg
    friendly at any key cardinality. Ties at identical ts are pinned by
    event_id so the lag comparison is a total order on both engines."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == F.lag("event_type").over(w), 0
        )
        .otherwise(1)
        .alias("new_island"),
    )
    islands = marked.select(
        "user_id", F.sum("new_island").over(wrun).alias("island_id")
    )
    streaks = islands.groupBy("user_id", "island_id").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )
