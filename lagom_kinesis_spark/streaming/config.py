"""Connector configuration with the reference's validation semantics (R19).

The reference validates config invariants at construction time:
- kinesis⊕dynamo endpoints must be set together (`KinesisConfig.scala:37-40`)
- endpoint⊕region must be set together (`Producer.scala:218-219`)
- accessKey⊕secretKey must be set together (`Producer.scala:221-222`)
- absent credentials fall back to the default provider chain
  (`KinesisSubscriberActor.scala:235-245`, `Producer.scala:224-228`)

Here the same invariants guard the option dict handed to a Spark Kinesis
connector (`spark.readStream.format("kinesis")`). Nothing here talks to
AWS — it is pure config shaping + validation, which is all the runtime
analogue Spark needs (SURVEY.md §2A R18/R19).
"""

from __future__ import annotations

from dataclasses import dataclass


class ConfigError(ValueError):
    pass


def _xor_invalid(a: str | None, b: str | None) -> bool:
    return (a is None) != (b is None)


@dataclass(frozen=True)
class KinesisSourceConfig:
    """Config for a Kinesis-backed Topic; mirrors the reference's knobs.

    Defaults follow reference.conf: TRIM_HORIZON start (hardcoded,
    KinesisSubscriberActor.scala:193), batch size 10 (reference.conf:40).
    """

    stream_name: str
    region: str | None = None
    kinesis_endpoint: str | None = None
    dynamo_endpoint: str | None = None  # lease/checkpoint analogue
    access_key: str | None = None
    secret_key: str | None = None
    starting_position: str = "TRIM_HORIZON"
    max_records_per_fetch: int = 10

    def __post_init__(self) -> None:
        if not self.stream_name:
            raise ConfigError("stream_name is required")
        if _xor_invalid(self.kinesis_endpoint, self.dynamo_endpoint):
            # KinesisConfig.scala:37-40 — endpoints are all-or-nothing.
            raise ConfigError(
                "kinesis_endpoint and dynamo_endpoint must be set together"
            )
        if self.kinesis_endpoint is not None and self.region is not None:
            # Producer.scala:218-219 — endpoint XOR region.
            raise ConfigError("set either an explicit endpoint or a region, not both")
        if self.kinesis_endpoint is None and self.region is None:
            raise ConfigError("one of endpoint or region is required")
        if _xor_invalid(self.access_key, self.secret_key):
            # Producer.scala:221-222 — credentials all-or-nothing; both
            # absent ⇒ default provider chain.
            raise ConfigError("access_key and secret_key must be set together")
        if self.starting_position not in ("TRIM_HORIZON", "LATEST"):
            raise ConfigError(f"bad starting_position: {self.starting_position}")
        if self.max_records_per_fetch <= 0:
            raise ConfigError("max_records_per_fetch must be positive")

    def source_options(self) -> dict[str, str]:
        """Options dict for spark.readStream.format('kinesis')."""
        opts = {
            "streamName": self.stream_name,
            "startingPosition": self.starting_position,
            "maxRecordsPerFetch": str(self.max_records_per_fetch),
        }
        if self.region:
            opts["region"] = self.region
        if self.kinesis_endpoint:
            opts["endpointUrl"] = self.kinesis_endpoint
        if self.access_key:
            opts["awsAccessKeyId"] = self.access_key
            opts["awsSecretKey"] = self.secret_key or ""
        return opts
