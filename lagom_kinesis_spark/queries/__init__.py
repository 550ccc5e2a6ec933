"""Import every query module so its @register side-effects run.

Import order IS registration order IS the order a budget-limited
correctness harness walks the registry — so families whose rows have not
yet been driver-verified register first (round 1 covered only the
aggregates → functions_scalar → joins prefix; see CORRECTNESS_r01.json),
with the streaming family (highest per-query spin-up cost) last within the
unverified block."""

from lagom_kinesis_spark.queries import (  # noqa: F401
    behavior,
    graph,
    timeseries,
    analytics,
    llm_pipeline,
    windows,
    relational,
    udf_ops,
    llm_ops,
    streaming_ops,
    joins,
    aggregates,
    functions_scalar,
)
