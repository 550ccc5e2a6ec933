"""Time-series operators: hypertable-style bucket rollups, gap-fill with
LOCF interpolation, OHLC resampling, and gap-based sessionization.

The reference is a stream transport (SURVEY.md §2A) whose payloads are
time-ordered event streams; this module is the *at-rest* analytical
counterpart a consumer of those streams needs — the continuous-aggregate /
time_bucket surface popularized by TimescaleDB and KDB-style resamplers,
re-expressed as Catalyst-friendly DataFrame plans.

Scale notes:
- every bucket aggregation is a hash aggregate keyed on
  (series, bucket) — map-side partial combine, one shuffle, no windows
  over raw rows;
- the gap-fill grid is generated per-series from its [min, max] bucket
  bounds (`sequence` + `explode`), so grid size is bounded by the time
  range — never by row count — and joins back on the (series, bucket)
  key it was aggregated on;
- LOCF uses a running window over *bucketed* rows (cardinality =
  series × buckets, already reduced ~1000× from raw events); partitioning
  is per-series so a 100 TB corpus with millions of series spreads evenly
  (the fixture's 5 event_types are the worst case, not the design);
- OHLC open/close use `min_by`/`max_by` over a (ts, tiebreak) struct —
  single-pass partial aggregation, not a row_number sort;
- sessionization is the classic lag-gap-cumsum plan: two window passes
  over per-user partitions, then one hash aggregate. No global ordering
  anywhere.

Money/float discipline per ``functions/helpers.py``: events.value is
exact at 2 decimals, so sums accumulate in DECIMAL(18,2) on both engines.
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
from lagom_kinesis_spark.registry import register

#: 5-minute bucket — Spark `window(ts, '5 minutes').start` and DuckDB
#: `time_bucket(INTERVAL '5 minutes', ts)` both align to the Unix epoch
#: (DuckDB's 2000-01-01 origin is a multiple of 300 s past the epoch),
#: so bucket boundaries are bit-identical across engines.
_BUCKET_5M = "time_bucket(INTERVAL '5 minutes', ts)"
_BUCKET_15M = "time_bucket(INTERVAL '15 minutes', ts)"


@register(
    "ts_gapfill_locf",
    oracle=events_cte(
        f"""
    , agg AS (
      SELECT event_type, {_BUCKET_5M} AS bucket,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.event_type, g.bucket, a.bucket_sum
      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.bucket = a.bucket
    )
    SELECT event_type, bucket,
           (bucket_sum IS NOT NULL) AS observed,
           last_value(bucket_sum IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM j
    """
    ),
    tags=("timeseries", "window"),
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 5-minute rollup with last-observation-carried-forward:
    aggregate per (event_type, bucket), densify each series over its own
    [min, max] bucket range, and fill holes with the previous observed
    value — the TimescaleDB ``time_bucket_gapfill`` + ``locf`` contract.

    The grid is generated from per-series *bounds* (one row per series),
    so its size is time-range-bound; LOCF runs over bucketed rows only.
    """
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        "event_type", F.window("ts", "5 minutes").start.alias("bucket")
    ).agg(money_sum_units(units("value"), 2).alias("bucket_sum"))
    bounds = agg.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 5 minutes"))
        ).alias("bucket"),
    )
    j = grid.join(agg, ["event_type", "bucket"], "left")
    locf = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        F.col("bucket_sum").isNotNull().alias("observed"),
        F.last("bucket_sum", ignorenulls=True).over(locf).alias("value_locf"),
    )


@register(
    "ts_interpolate_linear",
    oracle=events_cte(
        f"""
    , agg AS (
      SELECT event_type, {_BUCKET_5M} AS bucket,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM agg GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket
      FROM bounds
    ),
    j AS (
      SELECT g.event_type, g.bucket, a.bucket_sum
      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.bucket = a.bucket
    ),
    anchored AS (
      SELECT event_type, bucket, bucket_sum,
             last_value(bucket_sum IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN bucket_sum IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER w_prev AS pb,
             first_value(bucket_sum IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN bucket_sum IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER w_next AS nb
      FROM j
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket,
           (bucket_sum IS NOT NULL) AS observed,
           CASE
             WHEN bucket_sum IS NOT NULL THEN bucket_sum
             WHEN pv IS NULL OR nv IS NULL THEN NULL
             ELSE pv + (nv - pv) *
                  (CAST(date_part('epoch', bucket) - date_part('epoch', pb) AS DOUBLE)
                   / CAST(date_part('epoch', nb) - date_part('epoch', pb) AS DOUBLE))
           END AS value_interp
    FROM anchored
    """
    ),
    tags=("timeseries", "window"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 5-minute rollup with LINEAR interpolation — the
    TimescaleDB ``time_bucket_gapfill`` + ``interpolate`` contract next to
    ``ts_gapfill_locf``'s locf: each hole gets the straight-line value
    between its previous and next observed buckets, weighted by bucket
    time. The grid spans each series' own [min, max] OBSERVED buckets, so
    every gap has both anchors by construction (no edge extrapolation).

    Scale shape: identical to the locf query — per-series bounds generate
    a time-range-bound grid; the anchor carry is two RUNNING window
    passes over opposite sort directions of the same partitioning (one
    exchange, two in-partition sorts — see the w_next comment for why a
    following-unbounded frame is avoided). The value is emitted UNROUNDED: both
    engines evaluate the bit-identical IEEE expression tree over exact
    inputs (decimal-sum anchors via the VARCHAR hop, whole-second epoch
    integers), so the raw doubles hash-match — while round(x, 6) would
    DIVERGE on exact 10⁻⁷ halves (a 64-step gap makes denominator 6400:
    Spark HALF_UP vs DuckDB's rounding disagree on e.g. 32.1678125)."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        "event_type", F.window("ts", "5 minutes").start.alias("bucket")
    ).agg(money_sum_units(units("value"), 2).alias("bucket_sum"))
    bounds = agg.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 5 minutes"))
        ).alias("bucket"),
    )
    j = grid.join(agg, ["event_type", "bucket"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Next-anchor carry runs on the REVERSED order with a running
    # (unbounded-preceding) frame instead of CURRENT ROW..UNBOUNDED
    # FOLLOWING: Spark evaluates following-unbounded frames by
    # recomputing the aggregate from scratch per row — O(n²) per
    # partition (measured 2.3× on the whole query at sf0.01) — while
    # running frames are incremental O(n). last(ignore nulls) over the
    # desc prefix ≡ first(ignore nulls) over the asc suffix.
    w_next = (
        W.partitionBy("event_type")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    anchor_bucket = F.when(
        F.col("bucket_sum").isNotNull(), F.col("bucket")
    )
    pv = F.last("bucket_sum", ignorenulls=True).over(w_prev)
    pb = F.last(anchor_bucket, ignorenulls=True).over(w_prev)
    nv = F.last("bucket_sum", ignorenulls=True).over(w_next)
    nb = F.last(anchor_bucket, ignorenulls=True).over(w_next)
    frac = (
        (F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(pb)).cast("double")
        / (F.unix_timestamp(nb) - F.unix_timestamp(pb)).cast("double")
    )
    val = (
        F.when(F.col("bucket_sum").isNotNull(), F.col("bucket_sum"))
        .when(pv.isNull() | nv.isNull(), F.lit(None).cast("double"))
        .otherwise(pv + (nv - pv) * frac)
    )
    return j.select(
        "event_type",
        "bucket",
        F.col("bucket_sum").isNotNull().alias("observed"),
        val.alias("value_interp"),
    )


@register(
    "ts_ohlc_resample",
    oracle=events_cte(
        f"""
    , b AS (
      SELECT event_type, {_BUCKET_15M} AS bucket, ts, event_id, value FROM events
    ),
    ordered AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_first,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM b
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS volume
    FROM ordered GROUP BY 1, 2
    """
    ),
    tags=("timeseries", "agg"),
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick resample (KDB/TimescaleDB staple): per
    (event_type, 15-minute bucket) — first/last value by (ts, event_id)
    order plus high/low/count/volume.

    open/close use ``min_by``/``max_by`` over a (ts, event_id) struct:
    a single-pass hash aggregate with partial combine — no per-bucket
    sort, no window over raw rows (the oracle's row_number formulation is
    the *verification* device, not the plan). Raw values pass through
    untouched, so cross-engine equality is exact.
    """
    e = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.window("ts", "15 minutes").start.alias("bucket")
    ).agg(
        F.min_by("value", order_key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order_key).alias("close"),
        F.count("*").alias("n_ticks"),
        money_sum_units(units("value"), 2).alias("volume"),
    )


@register(
    "ts_sessionize_gap",
    oracle=events_cte(
        """
    , flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS session_value
    FROM sessions GROUP BY 1, 2
    """
    ),
    tags=("timeseries", "window"),
)
def ts_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min) — the batch twin of
    the streaming ``session_window`` operator (streaming_ops.py): lag to
    flag session starts, running sum to assign session ids, then one hash
    aggregate per (user, session).

    Two window passes over per-user partitions and one shuffle on the
    (user, session) key; at 100 TB the user-id partitioning spreads the
    windows evenly (no global ordering).
    """
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_seq", F.sum("is_new").over(run))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000)
        .cast("bigint")
        .alias("duration_sec"),
        money_sum_units(units("value"), 2).alias("session_value"),
    )


@register(
    "ts_hierarchical_rollup",
    oracle=events_cte(
        f"""
    , fine AS (
      SELECT event_type, {_BUCKET_5M} AS bucket_5m,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS s,
             MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, date_trunc('hour', bucket_5m) AS bucket_1h,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) AS total_value,
           MIN(lo) AS min_value, MAX(hi) AS max_value,
           COUNT(*) AS n_populated_5m
    FROM fine GROUP BY 1, 2
    """
    ),
    tags=("timeseries", "agg"),
)
def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (continuous-aggregate) rollup: aggregate once at
    5-minute grain, then derive the 1-hour grain *from the 5-minute
    partials* — count/sum/min/max are re-aggregable, so the coarse level
    reads series × buckets rows instead of raw events.

    This is the hypertable continuous-aggregate contract: at 100 TB the
    hourly/daily levels never rescan the fact table, and the decimal sum
    stays exact through both levels (cast to double only at the end).
    """
    e = load(spark, sf_dir, "events")
    fine = e.groupBy(
        "event_type", F.window("ts", "5 minutes").start.alias("bucket_5m")
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).alias("s"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return fine.groupBy(
        "event_type", F.date_trunc("hour", "bucket_5m").alias("bucket_1h")
    ).agg(
        F.sum("n").alias("n_events"),
        money(F.sum("s")).alias("total_value"),
        F.min("lo").alias("min_value"),
        F.max("hi").alias("max_value"),
        F.count("*").alias("n_populated_5m"),
    )


@register(
    "ts_rolling_hour_sum",
    oracle=events_cte(
        """
    SELECT event_id, event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY event_type
             ORDER BY epoch_us(ts) // 1000000
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS VARCHAR) AS DOUBLE) AS rolling_1h
    FROM events
    """
    ),
    tags=("timeseries", "window"),
)
def ts_rolling_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregate: per-series sum of the trailing hour
    at EVERY event (not bucketed) — the true sliding-window statistic,
    via a RANGE frame over epoch seconds (Spark's RANGE frames are
    numeric, so both engines order by the identical integer).

    RANGE (not ROWS) makes same-second ties frame-stable, so the result
    is deterministic under any shuffle order. Partitioned per series;
    the frame is time-bounded, so executor memory tracks event rate ×
    1 hour, never total history. Decimal accumulation end to end.
    """
    e = load(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) div 1000000")
    w = (
        W.partitionBy("event_type")
        .orderBy(sec.alias("sec"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        money(F.sum(dec("value")).over(w)).alias("rolling_1h"),
    )


@register(
    "ts_ewma_trailing",
    oracle=events_cte(
        """
    , rn AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.event_id, a.event_type,
           round(SUM(t.value / CAST(1::BIGINT << (a.rn - t.rn) AS DOUBLE)), 6)
             AS ewma_32
    FROM rn a JOIN rn t
      ON t.event_type = a.event_type
     AND t.rn BETWEEN a.rn - 31 AND a.rn
    GROUP BY a.event_id, a.event_type
    """
    ),
    tags=("timeseries", "window", "join"),
)
def ts_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) over the trailing
    32 events of each series — the smoothing statistic behind anomaly
    baselines and rate limiters.

    Determinism is why α is 1/2 and the window is 32: every weight is
    exactly 1/2^k with k ≤ 31, an integer shift cast to double — no libm
    pow, both engines produce identical weights, and the round-6 sum of
    32 bounded terms absorbs summation-order ulps (the truncated tail
    contributes < 2^-31 of one value, far below the rounding quantum
    only when series values are bounded — on this fixture |value| ≤ ~560).

    Scale shape: the trailing window is a BUCKETED band self-join, not a
    per-series quadratic — rows key on (series, rn div 32), each anchor
    probes its own and the previous bucket (fan-out ≤ 64 candidates,
    then the exact rn-band filter), so the join is linear in events with
    a constant factor, co-partitioned by the bucket key. The naive
    band join the oracle runs would be per-series quadratic at scale
    (here event_type has only 5 values — an equi-join on the series key
    alone would be a 2k x 2k per-type cross product even at sf0.01).
    """
    e = load(spark, sf_dir, "events")
    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy("ts", "event_id")
    )
    base = e.select("event_id", "event_type", "value", rn.alias("rn"))
    t = base.select(
        F.col("event_type").alias("t_type"),
        (F.col("rn") / 32).cast("long").alias("bkt"),
        F.col("rn").alias("t_rn"),
        F.col("value").alias("t_value"),
    )
    a = base.select(
        "event_id",
        "event_type",
        F.col("rn").alias("a_rn"),
        F.explode(
            F.array((F.col("rn") / 32).cast("long"), (F.col("rn") / 32).cast("long") - 1)
        ).alias("bkt"),
    )
    # pyspark's shiftleft() only takes a literal bit count; the SQL form
    # accepts a column expression.
    weight = F.lit(1.0) / F.expr(
        "CAST(shiftleft(1L, CAST(a_rn - t_rn AS INT)) AS DOUBLE)"
    )
    return (
        a.join(t, (a.event_type == t.t_type) & (a.bkt == t.bkt))
        .filter(
            (F.col("t_rn") >= F.col("a_rn") - 31) & (F.col("t_rn") <= F.col("a_rn"))
        )
        .groupBy("event_id", "event_type")
        .agg(r6(F.sum(F.col("t_value") * weight)).alias("ewma_32"))
    )


@register(
    "ts_cusum_drift",
    oracle=events_cte(
        f"""
    , b AS (
      SELECT event_type, {_BUCKET_15M} AS bucket,
             SUM(CAST(value AS DECIMAL(18,2))) AS bsum_dec
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, bucket,
             CAST(CAST(bsum_dec AS VARCHAR) AS DOUBLE) AS bucket_sum,
             CAST(CAST(SUM(bsum_dec) OVER (PARTITION BY event_type ORDER BY bucket
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS VARCHAR) AS DOUBLE) AS run_sum,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket)
                  AS BIGINT) AS t,
             CAST(CAST(SUM(bsum_dec) OVER (PARTITION BY event_type)
                       AS VARCHAR) AS DOUBLE) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type, bucket, bucket_sum,
           round(run_sum - t * (total / n), 6) + 0.0 AS cusum,
           (abs(run_sum - t * (total / n)) > 2 * (total / n)) AS drift
    FROM w
    """
    ),
    tags=("timeseries", "anomaly"),
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift chart (Page's cumulative-sum control chart, the
    non-resetting form): per series, the running sum of bucket deviations
    from the series mean; |CUSUM| exceeding 2 mean-buckets flags drift.

    Exactness discipline: deviations are never summed as floats — the
    running quantity is an exact DECIMAL window sum (same addition is
    exact on both engines), and the mean enters once as ``t·(total/n)``
    in identical double arithmetic, so even the boolean flag is
    deterministic. Plan: one (series, bucket) hash aggregate, then
    windows over the ~1000×-reduced bucket rows partitioned per series —
    the same shape that spreads millions of series at 100 TB."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type", F.window("ts", "15 minutes").start.alias("bucket")
    ).agg(F.sum(dec("value")).alias("bsum_dec"))
    ws = W.partitionBy("event_type")
    w_run = ws.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    run_sum = F.sum("bsum_dec").over(w_run).cast("double")
    t = F.row_number().over(ws.orderBy("bucket")).cast("long")
    total = F.sum("bsum_dec").over(ws).cast("double")
    n = F.count("*").over(ws)
    cusum = run_sum - t * (total / n)
    return b.select(
        "event_type",
        "bucket",
        money(F.col("bsum_dec")).alias("bucket_sum"),
        # + 0.0 canonicalizes IEEE -0.0 (the final bucket's CUSUM is exactly
        # zero by construction; engines may round to differently-signed zero).
        (r6(cusum) + F.lit(0.0)).alias("cusum"),
        (F.abs(cusum) > 2 * (total / n)).alias("drift"),
    )


@register(
    "ts_autocorr_lag1",
    oracle=events_cte(
        f"""
    , agg AS (
      SELECT event_type, {_BUCKET_15M} AS bucket,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               AS x
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT event_type, x,
             lead(x) OVER w AS y,
             lead(bucket) OVER w AS nb,
             bucket + INTERVAL 15 MINUTE AS eb
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ), s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs WHERE nb = eb GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS autocorr_lag1
    FROM s
    """
    ),
    tags=("timeseries", "window"),
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the 15-minute bucket-sum series per event
    type — the first statistic a forecasting/seasonality pass computes
    (near 0 ⇒ white noise, don't bother modeling; near 1 ⇒ strong
    persistence). Adjacency is exact: a pair exists only when the NEXT
    observed bucket is exactly +15 min (gaps contribute no pair, rather
    than silently correlating across holes).

    Plan: raw events collapse to (type, bucket) decimal sums first
    (map-side combine, ~1000x reduction), the lag pairs come from one
    bucket-ordered window over that small series, and Pearson r is
    computed from the five explicit double sums with the SAME formula on
    both engines (engine-internal corr() implementations differ in
    summation order — the explicit form keeps the difference inside the
    round-6 quantum)."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        "event_type", F.window("ts", "15 minutes").start.alias("bucket")
    ).agg(F.sum(dec("value")).cast("double").alias("x"))
    w = W.partitionBy("event_type").orderBy("bucket")
    pairs = agg.select(
        "event_type",
        "x",
        F.lead("x").over(w).alias("y"),
        F.lead("bucket").over(w).alias("nb"),
        (F.col("bucket") + F.expr("INTERVAL 15 MINUTES")).alias("eb"),
    ).filter(F.col("nb") == F.col("eb"))
    s = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n_pairs"),
        r6(r).alias("autocorr_lag1"),
    )


@register(
    "ts_dow_seasonality",
    oracle=events_cte(
        f"""
    , daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(dayofweek(ts) + 1 AS INT) AS dow,
             SUM(CAST(value AS DECIMAL(18,2))) AS day_sum
      FROM events GROUP BY 1, 2, 3
    ), per_dow AS (
      SELECT event_type, dow,
             COUNT(*) AS n_days,
             SUM(day_sum) AS dow_sum
      FROM daily GROUP BY 1, 2
    ), tot AS (
      SELECT event_type,
             SUM(dow_sum) AS all_sum, SUM(n_days) AS all_days
      FROM per_dow GROUP BY 1
    )
    SELECT p.event_type, p.dow, CAST(p.n_days AS BIGINT) AS n_days,
           round((CAST(CAST(p.dow_sum AS VARCHAR) AS DOUBLE) / p.n_days)
                 / (CAST(CAST(t.all_sum AS VARCHAR) AS DOUBLE) / t.all_days),
                 6) AS seasonality_index
    FROM per_dow p JOIN tot t USING (event_type)
    """
    ),
    tags=("timeseries",),
)
def ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: (average daily value
    for that weekday) / (overall average daily value) — the calendar-effect
    profile that decides whether a forecast needs weekly seasonality and
    that flags day-skewed ingest feeds. Index 1.0 = flat week.

    Plan: raw events collapse to (type, date) decimal day-sums first
    (map-side combine), then a 7-key rollup and a per-type total join —
    everything after the first agg is calendar-bounded, never row-bounded.
    Sums stay exact DECIMAL until the final VARCHAR-hop double cast; the
    dow arithmetic is integer (Spark dayofweek = DuckDB dayofweek + 1)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
    ).agg(F.sum(dec("value")).alias("day_sum"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.count("*").alias("n_days"), F.sum("day_sum").alias("dow_sum")
    )
    tot = per_dow.groupBy("event_type").agg(
        F.sum("dow_sum").alias("all_sum"), F.sum("n_days").alias("all_days")
    )
    return per_dow.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        F.col("n_days").cast("long").alias("n_days"),
        r6(
            (F.col("dow_sum").cast("double") / F.col("n_days"))
            / (F.col("all_sum").cast("double") / F.col("all_days"))
        ).alias("seasonality_index"),
    )
