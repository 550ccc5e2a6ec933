"""lagom-kinesis-spark: a PySpark-native analytics engine.

A brand-new engine (NOT a port) providing the stream-transport semantics of
StreetContxt/lagom-kinesis (topics, consumer groups, partition keys, three
delivery guarantees, offset checkpointing, backoff restart — see SURVEY.md §2A)
realized on Spark Structured Streaming, plus a declarative relational /
LLM-data-pipeline query surface (SURVEY.md §2B) expressed entirely through the
DataFrame / SQL API so Catalyst + Tungsten own the physical plan.

Design stance (SURVEY.md §7): DataFrame-first, no bespoke execution engine.
Everything is partition-parallel and shuffle-conscious so the same code runs on
local[32] for tests and a 1000-executor cluster at 100 TB.
"""

__version__ = "0.1.0"

from lagom_kinesis_spark import catalog, registry, session  # noqa: F401
