"""Fixture catalog: named tables → DataFrames.

Plays the role of the reference's topic-registration sweep
(``ScaladslRegisterTopicProducers.scala:33-101`` — reflect over descriptors,
wire a named topic to its serde and transport): here a *catalog* maps table
names to schema-bearing parquet scans, the engine's at-rest topic form
(SURVEY.md §1.1: a topic at rest is a partitioned parquet table).

Scans stay fully declarative (``spark.read.parquet``) so Catalyst gets
predicate pushdown, column pruning and partition pruning for free.

The single physical quirk lives here: ``events.parquet`` encodings have
varied across fixture generations (nanosecond int64 under
``spark.sql.legacy.parquet.nanosAsLong=true``, later ``timestamp[us]`` which
Spark reads as TIMESTAMP_NTZ). :func:`normalize_event_ts` branches on the
*loaded* dtype so every consumer — batch and streaming — sees one canonical
``TimestampType`` µs column regardless of the file encoding. The DuckDB
oracle's ``make_timestamp(epoch_ns(ts)//1000)`` (helpers.EVENTS_US_SQL) is
exact for both encodings, so the two engines can never diverge on ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from lagom_kinesis_spark.session import tune

#: Every driver-provided fixture table (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def path_of(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to TimestampType µs, whatever the file held.

    - int64 (legacy ns fixture under nanosAsLong): floor-divide to µs —
      matches DuckDB's ``epoch_ns(ts)//1000``.
    - TIMESTAMP_NTZ (timestamp[us] fixture): cast to TimestampType; the
      session timezone is pinned to UTC (session.RUNTIME_CONFS) so the cast
      is instant-preserving and matches DuckDB's naive-UTC timestamps.
    - TimestampType: already canonical.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; canonicalizes events.ts (normalize_event_ts)."""
    tune(spark)
    df = spark.read.parquet(path_of(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def stream_dir(sf_dir: str, name: str) -> str:
    """Directory view of one fixture file for the file-streaming source
    (which requires a directory, not a file): a temp dir holding a symlink
    to the parquet. Idempotent per (sf_dir, name)."""
    import os

    d = f"/tmp/lagom_kinesis_spark/stream_src/{abs(hash(sf_dir)) % 10**8}_{name}"
    link = f"{d}/{name}.parquet"
    if not os.path.islink(link):
        os.makedirs(d, exist_ok=True)
        try:
            os.symlink(path_of(sf_dir, name), link)
        except FileExistsError:
            pass
    return d


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Temp view per table, for spark.sql-expressed queries."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
