"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the lagom_kinesis_spark query registry: every operator from
SURVEY.md §2B is registered in ``lagom_kinesis_spark/queries/*`` with a PySpark
callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lagom_kinesis_spark.registry import all_queries

    return all_queries()["flagship_revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lagom_kinesis_spark.registry import queries_dict

    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    from lagom_kinesis_spark.registry import oracle_dict

    return oracle_dict()
