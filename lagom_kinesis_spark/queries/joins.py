"""Join operators (SURVEY.md §2B "Joins").

The reference has no joins (SURVEY.md §2A: "no relational operators") — this
whole family is engine-defined surface. Strategy notes for 100 TB:

- Fact⋈fact joins (lineitem⋈orders) shuffle on the join key; Catalyst plans
  sort-merge, AQE converts to broadcast/skew-split at runtime when profitable.
- Dimension joins are explicitly ``F.broadcast`` so the 100 TB fact side never
  shuffles for them.
- Theta/band joins always carry an equi predicate (the key) so Spark plans a
  hash/merge join with a residual condition — never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import (
    events_cte,
    hash_build,
    money,
    money_sum_units,
    revenue_sql,
    revenue_units,
    units,
)
from lagom_kinesis_spark.registry import register


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, planner-chosen strategy."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r_name AS region, COUNT(*) AS n_items,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join on the dimension chain, DENORMALIZED first: the
    supplier→nation→region snowflake is collapsed into one
    (s_suppkey, r_name) broadcast before the fact side ever sees it, so
    each of the 100 TB side's rows pays ONE hash probe instead of three.
    The dim⋈dim pre-join is itself broadcast (supplier-sized) and its
    cost is fixed, not data-scaled. Measured r8 at sf10: 1.92 s (three
    chained probes) → 1.49 s. Inner-join FK semantics are unchanged —
    collapsing the chain drops exactly the rows the chain would drop."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dim = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "r_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_items"),
            money_sum_units(revenue_units(), 4).alias("revenue"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'P'
    WHERE c_custkey <= 100
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join; non-matching right rows carry null order keys."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "P"), "right"
    ).select("o_orderkey", "c_custkey", "c_mktsegment")


@register(
    "join_full_outer",
    oracle="""
    SELECT a.key AS a_key, b.key AS b_key
    FROM (SELECT c_custkey AS key FROM customer WHERE c_custkey BETWEEN 1 AND 100) a
    FULL JOIN (SELECT DISTINCT o_custkey AS key FROM orders
               WHERE o_custkey BETWEEN 51 AND 150) b
      ON a.key = b.key
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over partially-overlapping key sets."""
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").between(1, 100))
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").between(51, 150))
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    return a.join(b, a.key == b.key, "full").select(
        a.key.alias("a_key"), b.key.alias("b_key")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS; emits left columns only, no duplication."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    """,
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS. The orders side is date-filtered so the
    result is a real subset on the driver fixtures (unfiltered, every
    customer has at least one order and the compare is vacuously empty)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (small dims only)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_band",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
    """,
    tags=("join", "theta"),
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: equi key + date-range residual. The equi component keeps
    the plan a hash/merge join at scale; the band is a post-join filter."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@register(
    "join_theta_pure",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
    FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
    """,
    tags=("join", "theta"),
)
def join_theta_pure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality join (nested-loop; only ever on small inputs —
    at scale an inequality join must be banded/bucketized first)."""
    a = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s1"), F.col("s_acctbal").alias("bal1")
    )
    b = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s2"), F.col("s_acctbal").alias("bal2")
    )
    return a.join(b, a.bal1 < b.bal2).select("s1", "s2")


@register(
    "join_self_pairs",
    oracle="""
    SELECT a.o_custkey AS custkey, COUNT(*) AS n_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
    GROUP BY a.o_custkey
    """,
    tags=("join", "self"),
)
def join_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join: pairs of orders per customer (key-grouped, so the
    quadratic blowup is bounded per key, not global)."""
    o = load(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("k1"))
    b = o.select(F.col("o_custkey").alias("custkey2"), F.col("o_orderkey").alias("k2"))
    return (
        a.join(b, (a.custkey == b.custkey2) & (a.k1 < b.k2))
        .groupBy("custkey")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "join_multiway",
    oracle=f"""
    SELECT p_brand, n_name AS supp_nation, COUNT(*) AS n_items,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND p_size <= 20
    GROUP BY p_brand, n_name
    """,
    tags=("join", "agg"),
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table join: one fact shuffle (orders), broadcast part and the
    supplier→nation chain DENORMALIZED to (s_suppkey, n_name) — the fact
    side pays two hash probes instead of three; the dim⋈dim pre-join is
    supplier-sized, fixed cost at any fact scale."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1997-01-01")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    return (
        li.join(hash_build(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("p_brand", F.col("n_name").alias("supp_nation"))
        .agg(
            F.count("*").alias("n_items"),
            money_sum_units(revenue_units(), 4).alias("revenue"),
        )
    )


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "tpch"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped BUILDING orders by revenue —
    selective dim filter, fact join, agg, ordered limit (ties key-pinned)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    # orders is the build side: on the driver fixtures both filters keep
    # ~half their table (shipdates are spread, not TPC-H's trailing tail),
    # so filtered orders (15M/2) is 4x smaller than filtered lineitem (60M/2).
    o = hash_build(
        load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum_units(revenue_units(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "join_multiway_bucketed",
    oracle=f"""
    SELECT p_brand, n_name AS supp_nation, COUNT(*) AS n_items,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND p_size <= 20
    GROUP BY p_brand, n_name
    """,
    tags=("join", "agg", "bucketed", "scale"),
)
def join_multiway_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_multiway over the SHARED bucketed fact layout (same oracle —
    the layout must not change a single result row): the lineitem⋈orders
    fact join becomes an exchange-free, sort-free SortMergeJoin over
    co-bucketed sorted scans, the three dimensions stay broadcast. The
    one shuffle left in the whole plan is the final p_brand×nation
    rollup, whose input is already partial-aggregated map-side — the
    shape you want at 100 TB, where re-shuffling 60M+ fact rows per
    query is the bottleneck the layout exists to delete."""
    from lagom_kinesis_spark.queries.relational import fact_bucketed_layout

    bo, bl = fact_bucketed_layout(spark, sf_dir)
    li = spark.table(bl)
    o = spark.table(bo).filter(F.col("o_orderdate") >= "1997-01-01")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    sn = s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("p_brand", F.col("n_name").alias("supp_nation"))
        .agg(
            F.count("*").alias("n_items"),
            money_sum_units(revenue_units(), 4).alias("revenue"),
        )
    )


@register(
    "q_shipping_priority_bucketed",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "tpch", "bucketed", "scale"),
)
def q_shipping_priority_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q3 shape over the SHARED bucketed fact layout (same
    oracle as q_shipping_priority). Twice exchange-free: the
    lineitem⋈orders SortMergeJoin reads co-bucketed sorted scans (no
    Exchange, no Sort), and the groupBy that follows needs no shuffle
    either — its grouping keys CONTAIN the bucket key (l_orderkey), so
    the existing hash partitioning already clusters every group into one
    partition and Catalyst elides the aggregate Exchange. Only the final
    ordered top-10 (a TakeOrdered over per-partition top-10s) crosses
    partitions — on 100 TB that is kilobytes."""
    from lagom_kinesis_spark.queries.relational import fact_bucketed_layout

    bo, bl = fact_bucketed_layout(spark, sf_dir)
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table(bo).filter(F.col("o_orderdate") < "1998-03-15")
    li = spark.table(bl).filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum_units(revenue_units(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS lost_revenue,
           n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "tpch"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in 1999.

    Revenue is aggregated by o_custkey BEFORE the customer join: c_custkey
    is the customer PK, so grouping by (c_custkey, c_name, nation) after
    the join is the same aggregation — but doing it first means the
    customer join runs on a customer-cardinality relation instead of the
    fact-sized join output, and c_name/n_name never travel through a fact
    shuffle. The previous shape sort-merge-joined the full customer
    dimension against fact-sized rows at sf10 — exactly the extra
    exchange this module's header says dimension joins must never pay."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "2000-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    per_cust = (
        li.join(hash_build(o), li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(money_sum_units(revenue_units(), 4).alias("lost_revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "lost_revenue",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN l_partkey % 4 = 0 THEN 1 ELSE l_partkey END AS sk,
             l_quantity
      FROM lineitem
    )
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_qty
    FROM fact JOIN part ON sk = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (the join-side twin of
    ``agg_salted_skew``): the fact side's foreign key is deliberately
    skewed (~25% of rows collapse onto key 1 — one viral part), which in a
    plain shuffle join sends every hot-key row to ONE reducer. Salting
    scatters them: the fact side gets a deterministic salt in [0, 8), the
    dim side replicates each row 8× via ``explode(sequence(...))``, and the
    join key becomes (key, salt) — the hot key now spreads over 8 tasks.

    The salt hashes a unique column (never rand()) so reruns reproduce;
    the oracle is the UNSALTED plain join — equality proves salting is
    semantics-preserving. Dim replication cost is |dim|×8 rows, paid only
    for the skewed-join pattern where |dim| ≪ |fact| (AQE skew-split
    covers sort-merge spills; salting is the shape that also works for
    hash-partitioned state at 100 TB)."""
    n_salts = 8
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    fact = li.select(
        F.when(F.col("l_partkey") % 4 == 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("sk"),
        "l_quantity",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salts)).alias(
            "salt"
        ),
    )
    dim = p.select(
        "p_partkey",
        "p_brand",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt"),
    ).withColumn("salt", F.col("salt").cast("bigint"))
    return (
        fact.join(dim, (fact.sk == dim.p_partkey) & (fact.salt == dim.salt))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).alias(
                "total_qty"
            ),
        )
    )


@register(
    "join_range_binned",
    oracle=events_cte(
        """
    , iv AS (
      SELECT event_id AS err_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events WHERE event_type = 'error'
    ), pts AS (
      SELECT ts AS p_ts FROM events WHERE event_type = 'click'
    )
    SELECT err_id, COUNT(p_ts) AS n_clicks
    FROM iv LEFT JOIN pts ON p_ts >= s AND p_ts < e
    GROUP BY err_id
    """
    ),
    tags=("join", "interval", "binned"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join with NO equi key — clicks (any user) falling inside
    each error's 30-minute window — executed by TIME-BINNING both sides:
    each interval explodes to the ≤2 fixed 30-min bins it overlaps, each
    point hashes to exactly 1 bin, and the join becomes bin-equi + range
    residual. Without this, Spark plans a broadcast nested loop (O(n·m)
    comparisons); with it, cost is one hash join whose per-bin fan-out is
    the local event density — the standard interval-bin rewrite for range
    joins at scale (each point lives in one bin, so no pair dedup is
    needed). The bin width equals the interval length, bounding the
    explode at 2 rows per interval. Oracle: the plain declarative range
    join, which DuckDB executes natively (IEJoin)."""
    e = load(spark, sf_dir, "events")
    half_h = 1800
    iv = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    s_sec = F.col("s").cast("long")
    # end is exclusive: the last covered bin is the one holding e - 1µs.
    e_sec = F.col("e").cast("long") - F.when(
        F.col("e") == F.date_trunc("second", F.col("e")), 1
    ).otherwise(0)
    iv_binned = iv.withColumn(
        "bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(s_sec / half_h), F.floor(e_sec / half_h)
                )
            )
        ),
    )
    pts = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("p_ts"),
        F.floor(F.col("ts").cast("long") / half_h).alias("bin"),
    )
    return (
        iv_binned.join(
            pts,
            (iv_binned.bin == pts.bin)
            & (pts.p_ts >= iv_binned.s)
            & (pts.p_ts < iv_binned.e),
            "left",
        )
        .groupBy("err_id")
        .agg(F.count("p_ts").alias("n_clicks"))
    )
