from lagom_kinesis_spark.streaming.topics import (  # noqa: F401
    BackoffConfig,
    Subscriber,
    TaggedProducer,
    Topic,
    run_with_backoff,
)
