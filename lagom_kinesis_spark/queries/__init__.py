"""Import every query module so its @register side-effects run."""

from lagom_kinesis_spark.queries import (  # noqa: F401
    aggregates,
    functions_scalar,
    joins,
    llm_ops,
    relational,
    streaming_ops,
    udf_ops,
    windows,
)
