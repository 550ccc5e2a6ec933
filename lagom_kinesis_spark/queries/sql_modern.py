"""Modern SQL-API surface (Spark 4.x): pipe syntax, GROUP BY ALL,
parameterized queries.

The reference exposes its query surface through a typed DSL only; a Spark
user additionally gets the SQL front door, and Spark 4 grew three
ergonomics features worth pinning as first-class engine surface (each is
pure Catalyst sugar — identical logical plans to the classic phrasing, so
they inherit every optimization and the exact-oracle discipline):

- **SQL pipe syntax** (`FROM t |> WHERE ... |> AGGREGATE ...`,
  SPARK-49555): linear dataflow phrasing of the classic SELECT.
- **GROUP BY ALL**: grouping keys inferred from the non-aggregate select
  list.
- **Parameterized SQL** (`spark.sql(query, args=...)`): named-parameter
  binding server-side — no string interpolation, injection-safe.

Money columns follow the exact-decimal accumulation discipline
(CAST AS DECIMAL(18,2) before SUM) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lagom_kinesis_spark.catalog import register_views
from lagom_kinesis_spark.registry import register


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS gross
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag
    HAVING COUNT(*) > 10
    """,
    tags=("sql", "modern"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe-operator phrasing (Spark 4 `|>`): scan → filter →
    aggregate → post-aggregate filter as a linear pipeline. Catalyst
    resolves it to the identical plan as the classic SELECT (filter
    pushdown, partial aggregation and all), which is exactly why the
    classic-SQL oracle is the right check."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS gross
           GROUP BY l_returnflag
        |> WHERE n_items > 10
        |> SELECT l_returnflag, n_items, gross
        """
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS spend
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("sql", "modern"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: grouping keys inferred from the select list's
    non-aggregate columns — resolves to the explicit GROUP BY the oracle
    spells out."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS spend
        FROM orders
        GROUP BY ALL
        """
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderdate < DATE '1997-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "modern"),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (`spark.sql(query, args=...)`): literals bound
    server-side as typed parameters, not interpolated text — the
    injection-safe production phrasing. The oracle inlines the same
    constants."""
    import datetime

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :lo AND o_orderdate < :cutoff
        GROUP BY o_orderpriority
        """,
        args={"lo": 150000.0, "cutoff": datetime.date(1997, 1, 1)},
    )
