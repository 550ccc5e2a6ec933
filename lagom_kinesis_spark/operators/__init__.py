from lagom_kinesis_spark.operators.asof import asof_join  # noqa: F401
