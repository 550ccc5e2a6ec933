"""Query registry: the t2 contract surface.

Every operator from SURVEY.md §2B is exposed as a named :class:`Query`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py`` simply
re-exports this registry; tests iterate it differentially against DuckDB.

Determinism rules enforced by convention here (FIXTURES.md harness rules):
- alias every computed/aggregate column identically in Spark and SQL;
- round float outputs to 6 decimals on both engines (``helpers.r6``);
- large money sums go through exact decimal accumulation on both engines
  (``helpers`` money discipline) so the round-trip is bit-identical;
- pin sort ties with unique keys.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from lagom_kinesis_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

#: Queries executed since the last driver-side JVM GC nudge (see wrapped()).
_calls_since_gc = 0
_last_gc_at = 0.0


def _periodic_gc(spark: SparkSession, every: int = 16, min_interval_s: float = 45.0) -> None:
    """Nudge the JVM GC every ``every`` queries in a long single-session
    sweep. Spark's ContextCleaner only reclaims dead broadcasts / shuffle
    files / accumulators after a driver GC discovers the dead references —
    with a large heap and mostly-small queries, organic GCs are rare and
    JVM-side state accumulates across a 100+ query run (the round-1
    mid-suite degradation). Cost: ~0.1-0.3 s per nudge, amortized — the
    ``min_interval_s`` floor keeps fast back-to-back sweeps (the bench's
    best-of-2 loop) from paying it when nothing has had time to accumulate."""
    global _calls_since_gc, _last_gc_at
    import time as _time

    _calls_since_gc += 1
    now = _time.monotonic()
    if _calls_since_gc >= every and now - _last_gc_at >= min_interval_s:
        _calls_since_gc = 0
        _last_gc_at = now
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            # Operators may persist() intermediates (LSH shingles/buckets);
            # drop leftovers from earlier queries so sequential runs don't
            # accumulate executor-memory pressure.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            _periodic_gc(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name, wrapped, oracle, tuple(tags), doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return them."""
    import lagom_kinesis_spark.queries  # noqa: F401  (registers everything)

    return dict(_REGISTRY)


def queries_dict() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_dict() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
