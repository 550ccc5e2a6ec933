from lagom_kinesis_spark.functions.helpers import (  # noqa: F401
    EVENTS_US_SQL,
    dec,
    events_cte,
    fan_out,
    hash_build,
    money,
    money_sum_sql,
    r6,
    revenue_expr,
    revenue_sql,
)
