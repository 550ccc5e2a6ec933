"""R19 config-validation parity tests (SURVEY.md §2A R19)."""

from __future__ import annotations

import pytest

from lagom_kinesis_spark.streaming.config import ConfigError, KinesisSourceConfig


def test_valid_region_only():
    c = KinesisSourceConfig(stream_name="events", region="us-east-1")
    opts = c.source_options()
    assert opts["streamName"] == "events"
    assert opts["startingPosition"] == "TRIM_HORIZON"
    assert opts["maxRecordsPerFetch"] == "10"
    assert "endpointUrl" not in opts


def test_valid_local_endpoints():
    c = KinesisSourceConfig(
        stream_name="events",
        kinesis_endpoint="http://localhost:4567",
        dynamo_endpoint="http://localhost:4568",
    )
    assert c.source_options()["endpointUrl"] == "http://localhost:4567"


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(stream_name=""),  # missing stream
        dict(stream_name="s"),  # neither endpoint nor region
        dict(stream_name="s", kinesis_endpoint="http://x"),  # endpoint xor dynamo
        dict(  # endpoint xor region
            stream_name="s",
            region="us-east-1",
            kinesis_endpoint="http://x",
            dynamo_endpoint="http://y",
        ),
        dict(stream_name="s", region="r", access_key="a"),  # key xor secret
        dict(stream_name="s", region="r", starting_position="MIDDLE"),
        dict(stream_name="s", region="r", max_records_per_fetch=0),
    ],
)
def test_invalid_configs_rejected(kwargs):
    with pytest.raises(ConfigError):
        KinesisSourceConfig(**kwargs)


def test_credential_chain_fallback():
    """Both credentials absent ⇒ default provider chain (no keys in opts)."""
    c = KinesisSourceConfig(stream_name="s", region="us-east-1")
    assert "awsAccessKeyId" not in c.source_options()
