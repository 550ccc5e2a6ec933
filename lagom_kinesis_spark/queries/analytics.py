"""TPC-H-adapted decision-support suite over the fixture schema.

The reference has no relational surface at all (it is a message broker —
SURVEY.md §2A), so this module is engine-defined coverage: the classic
TPC-H query *shapes* (Q4/Q6/Q7/Q8/Q9/Q13/Q14/Q15/Q17/Q18/Q19/Q21/Q22)
re-expressed over the driver's tables. The fixtures carry no ``partsupp``
and no ship-mode/commit-date columns, so each query keeps the original's
plan shape (the part that matters for a 100 TB engine: which joins
broadcast, where the shuffles land, what aggregates pre-combine) while
adapting predicates to the columns that exist.

Scale notes (applies to every query here):
- fact-to-fact joins (lineitem⋈orders) shuffle on the join key once;
  every dimension (part, supplier, customer, nation, region) is broadcast.
- aggregates are hash aggregates with map-side partial combine;
  no query materializes an unpartitioned global window over fact rows —
  global scalars (max revenue, avg acctbal) reduce to one row and
  broadcast back.
- money arithmetic follows the exact-DECIMAL discipline of
  ``functions/helpers.py`` so results hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import (
    dec,
    hash_build,
    money,
    money_sum_units,
    r6,
    revenue_expr,
    revenue_sql,
    revenue_units,
    units,
)
from lagom_kinesis_spark.registry import register


@register(
    "q_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("analytics", "agg"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — pure scan+filter+agg.
    Filters push to the parquet scan; the aggregate is a map-side partial
    reduce to one row (no shuffle of fact rows at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum_units(units("l_extendedprice") * units("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "semi-join"),
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking. The fixture has no
    commit/receipt dates, so "late" = a lineitem shipped >60 days after
    the order date. EXISTS = left-semi join on the orderkey (one shuffle;
    the semi join never duplicates order rows)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "q_order_priority_bucketed",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("analytics", "semi-join", "scale"),
)
def q_order_priority_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape over the SHARED bucketed fact layout (same oracle
    as q_order_priority): the EXISTS left-semi join reads co-bucketed
    sorted scans, so it plans with NO Exchange and NO Sort on either
    60M-row side — the non-equi lateness predicate (shipped >60 days
    after the order date) rides along as the SortMergeJoin's residual
    condition, which a semi join evaluates per matching key pair without
    ever duplicating order rows. The fourth reuse of the one write-side
    layout shuffle (flagship, multiway, Q3, now Q4) — at 100 TB this is
    why the layout exists: every orderkey-shaped question afterwards is
    exchange-free. Only the 5-row priority rollup crosses partitions."""
    from lagom_kinesis_spark.queries.relational import fact_bucketed_layout

    bo, bl = fact_bucketed_layout(spark, sf_dir)
    orders = spark.table(bo).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = spark.table(bl).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li.hint("merge"),
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "q_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(o_orderdate) AS o_year,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, o_year
    """,
    tags=("analytics", "join", "agg"),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    lineitem⋈orders is the only fact-fact shuffle; customer/supplier/
    nation broadcast, and the nation filters prune before the fact join."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(hash_build(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("o_year"))
        .agg(money_sum_units(revenue_units(), 4).alias("revenue"))
    )


@register(
    "q_market_share",
    oracle=f"""
    WITH volume AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                           THEN {revenue_sql} ELSE CAST(0 AS DECIMAL(18,2)) END)
                  AS VARCHAR) AS DOUBLE) AS nation_vol,
             CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS total_vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation n1 ON c_nationkey  = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN part      ON l_partkey   = p_partkey
      JOIN supplier  ON l_suppkey   = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      GROUP BY o_year
    )
    SELECT o_year, round(nation_vol / total_vol, 6) AS mkt_share
    FROM volume
    """,
    tags=("analytics", "join", "agg"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share within a region for one part
    type. Both sums accumulate in exact decimal inside ONE aggregate pass
    (conditional agg), then the share divides as double — the ratio is a
    post-aggregation scalar op on a handful of year rows."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("s_nname")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast("decimal(18,2)")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(hash_build(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("s_nname") == "NATION_3", revenue_expr()).otherwise(zero))
            .cast("double")
            .alias("nation_vol"),
            F.sum(revenue_expr()).cast("double").alias("total_vol"),
        )
    )
    return vol.select(
        "o_year", F.round(F.col("nation_vol") / F.col("total_vol"), 6).alias("mkt_share")
    )


@register(
    "q_product_type_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                          - CAST(0.5 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("analytics", "join", "agg"),
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year. The fixture has
    no partsupp.ps_supplycost, so cost is modeled as half the part's retail
    price per unit — same plan: fact⋈orders shuffle, part/supplier/nation
    broadcast, exact-decimal arithmetic throughout."""
    li = load(spark, sf_dir, "lineitem")
    # '%widget%' selects ~13% of parts on the driver fixtures (p_name is
    # "<adj> <noun>"); the previous '%part_1%' pattern matched nothing,
    # making the gate row a vacuous 0-row compare.
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    half = F.lit(0.5).cast("decimal(18,2)")
    amount = revenue_expr() - half * dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(hash_build(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money(F.sum(amount)).alias("profit"))
    )


@register(
    "q_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("analytics", "outer-join", "agg"),
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count —
    left outer join (customers with zero orders count as 0) then a
    two-level aggregation. Both aggregations partial-combine; the second
    runs over at most |distinct counts| groups."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT round(100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {revenue_sql}
                                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("analytics", "join", "agg"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month. part broadcasts;
    one conditional aggregate pass; the division happens on the single
    result row."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", revenue_expr()).otherwise(zero))
            .cast("double")
            .alias("promo"),
            F.sum(revenue_expr()).cast("double").alias("total"),
        )
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({revenue_sql}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(CAST(CAST(total_rev AS VARCHAR) AS DOUBLE), 6) AS total_rev
    FROM revenue JOIN supplier ON supplier_no = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    tags=("analytics", "join", "agg"),
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue. The global max
    reduces the per-supplier aggregate to ONE row and joins back by cross
    broadcast — no global sort, no single-partition window, so the plan
    survives a supplier table of any size."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_expr()).alias("total_rev_d")
    )
    mx = rev.agg(F.max("total_rev_d").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_rev_d == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            money(F.col("total_rev_d")).alias("total_rev"),
        )
    )


@register(
    "q_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.5 * (
        SELECT AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    tags=("analytics", "join", "correlated"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue. The correlated
    per-part average decorrelates to a groupBy(l_partkey) aggregate joined
    back on the part key — one extra shuffle over the filtered fact, never
    a nested loop."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


@register(
    "q_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 6) AS o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    tags=("analytics", "join", "having"),
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers. The HAVING filter runs on
    the per-order aggregate BEFORE the joins, so only qualifying orders
    (a small fraction) reach the orders/customer joins."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_d"))
        .filter(F.col("sum_qty_d") > 150)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(dec("o_totalprice").cast("double"), 6).alias("o_totalprice"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q_discounted_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("analytics", "join", "predicate"),
)
def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs multi-attribute predicate across the
    join (brand/size from part, quantity from lineitem). Catalyst extracts
    the common l_quantity bounds below the join; part broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(16, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(31, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        money_sum_units(revenue_units(), 4).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q_blocking_supplier",
    oracle="""
    WITH f_items AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ), order_stats AS (
      SELECT l_orderkey,
             MAX(l_shipdate) AS last_ship,
             COUNT(DISTINCT l_suppkey) AS n_supps
      FROM f_items GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(DISTINCT f.l_orderkey) AS n_blocked
    FROM f_items f
    JOIN order_stats os ON f.l_orderkey = os.l_orderkey
    JOIN supplier ON f.l_suppkey = s_suppkey
    WHERE os.n_supps >= 2 AND f.l_shipdate = os.last_ship
    GROUP BY s_name
    HAVING COUNT(DISTINCT f.l_orderkey) >= 5
    """,
    tags=("analytics", "join", "agg"),
)
def q_blocking_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier who shipped LAST in multi-supplier
    finished orders (the "waiting blamed on you" query; the fixture has no
    commit/receipt dates, so lateness = owning the order's max shipdate).
    Per-order stats come from one groupBy re-joined on the orderkey — the
    same decorrelation as Q17, no correlated subquery at runtime."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    f_items = li.join(
        hash_build(orders.select("o_orderkey")), li.l_orderkey == F.col("o_orderkey")
    ).drop("o_orderkey")
    stats = f_items.groupBy(F.col("l_orderkey").alias("os_key")).agg(
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        f_items.join(
            stats,
            (f_items.l_orderkey == F.col("os_key"))
            & (f_items.l_shipdate == F.col("last_ship")),
        )
        .filter(F.col("n_supps") >= 2)
        .join(F.broadcast(supp), f_items.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_blocked"))
        .filter(F.col("n_blocked") >= 5)
    )


@register(
    "q_sales_opportunity",
    oracle="""
    WITH threshold AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name AS nation, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg_bal FROM threshold)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY n_name
    """,
    tags=("analytics", "anti-join", "agg", "theta"),
)
def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone quiet — above-average
    balance and no orders since 1999 (every fixture customer has SOME
    order, so strict never-ordered is vacuous; the fixture also has no
    phone column, so grouping is by nation). The global average reduces to
    one broadcast row; NOT EXISTS = left-anti join whose probe side is
    pre-filtered by the pushed-down date predicate. The threshold divides
    exact-decimal sum by exact count so both engines compute the identical
    double."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(avg_bal), cust.c_acctbal > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            money_sum_units(units("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_cost
      FROM lineitem
    ), best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           round(c.unit_cost, 6) AS unit_cost
    FROM costs c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size >= 40
    """,
    tags=("analytics", "join", "subquery"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): the correlated-scalar-subquery
    pattern `WHERE cost = (SELECT MIN(cost) ... same part)` — expressed
    Spark-first as a per-part MIN aggregate joined back on (part, cost),
    which is exactly how Catalyst de-correlates Q2. No partsupp in the
    fixture, so unit cost comes from observed lineitems. All suppliers
    tied at the minimum are returned (no arbitrary pick — deterministic
    without a tiebreak). Scale: one shuffle on l_partkey for the MIN, one
    for the join-back; part/supplier/nation broadcast; IEEE division is
    bit-identical on both engines so the equality join cannot diverge."""
    li = load(spark, sf_dir, "lineitem")
    costs = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        costs.join(
            best,
            (costs.l_partkey == best.l_partkey)
            & (costs.unit_cost == best.min_cost),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            r6(F.col("unit_cost")).alias("unit_cost"),
        )
    )


@register(
    "q_part_value_share",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(CAST(s AS VARCHAR) AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(CAST(s AS VARCHAR) AS DOUBLE) * (SELECT COUNT(*) FROM pv) >
          1.1 * (SELECT CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) FROM pv)
    """,
    tags=("analytics", "agg", "subquery", "scalar"),
)
def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value filtered against
    a GLOBAL scalar threshold — `HAVING value > fraction * SUM(value)` — here 1.1x the AVERAGE
    part share, so the cut is scale-relative (a fixed fraction went
    vacuous at sf>=0.01: more parts means smaller shares).
    Adapted to lineitem value (no partsupp). Scale: ONE shuffle builds
    the per-part aggregate; the global total re-aggregates the per-part
    partials (never rescans the fact) and broadcasts back as a 1-row
    frame. Both engines derive the compared doubles from identical exact
    decimals via the correctly-rounded VARCHAR-hop, so the threshold
    cut is bit-deterministic."""
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("s")
    )
    pv = pv.persist()
    total = pv.agg(
        money(F.sum("s")).alias("total"), F.count("*").alias("n_parts")
    )
    return (
        pv.select("l_partkey", money(F.col("s")).alias("part_value"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value") * F.col("n_parts") > F.lit(1.1) * F.col("total")
        )
        .select("l_partkey", "part_value")
    )


@register(
    "q_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_priority,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_priority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
    tags=("analytics", "join", "agg"),
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): conditional counts of
    high- vs low-priority orders among late shipments (shipped > 90 days
    after ordering — the fixture has no commit/receipt dates). The theta
    residual (shipdate vs orderdate arithmetic) rides on the equi-join;
    the CASE counts combine map-side. One fact shuffle, tiny output."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(hash_build(o), li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_priority"),
            F.count(F.when(~high, 1)).alias("low_priority"),
        )
    )


@register(
    "q_supplier_part_variety",
    oracle="""
    WITH excluded AS (
      SELECT s_suppkey FROM supplier
      WHERE CAST(s_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM supplier)
            < (SELECT SUM(CAST(s_acctbal AS DECIMAL(18,2))) FROM supplier)
    )
    SELECT p_brand, p_type,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p_brand, p_type
    """,
    tags=("analytics", "agg", "subquery", "scalar"),
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type), excluding below-average-balance suppliers —
    the NOT IN correlated-exclusion pattern, expressed as a broadcast
    anti-join. The below-average test multiplies by COUNT instead of
    dividing by it so the comparison stays in the EXACT decimal domain
    (a double AVG is summation-order-dependent and could flip a
    borderline supplier between engines). Scale: exclusion set and part
    dim broadcast; one shuffle for the distinct-count aggregate."""
    s = load(spark, sf_dir, "supplier")
    stats = s.agg(
        F.sum(dec("s_acctbal")).alias("bal_total"),
        F.count("*").alias("n_sup"),
    )
    excluded = (
        s.crossJoin(F.broadcast(stats))
        .filter(dec("s_acctbal") * F.col("n_sup") < F.col("bal_total"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_heavy_part_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 50
    )
    """,
    tags=("analytics", "join", "subquery"),
)
def q_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): suppliers who moved heavy
    volume of a part family in a year — the nested semi-join chain
    (supplier IN (agg over lineitem⋈part)). Spark-first: the inner
    aggregate is its own frame, then a LEFT SEMI join; part dim
    broadcast into the fact scan, one shuffle for the per-supplier SUM,
    and the qualified-supplier set (tiny) broadcasts into the semi
    join. Quantities are exact decimals on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )
