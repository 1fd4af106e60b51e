"""Source builders (S1/S2/S3/K3): option translation + availability gates.

No broker or connector jar exists in this environment, so these pin the
config surface (the part that is ours) and the availability probes; the
streaming semantics are exercised through the file source in
tests/test_streaming.py, which shares the whole downstream pipeline.
"""

from __future__ import annotations

import pytest

from rakam_api_collector_spark.sources import kafka as K
from rakam_api_collector_spark.sources import kinesis as KS


def test_kafka_not_available_here(spark):
    assert K.kafka_available(spark) is False


def test_kafka_realtime_reader_options(spark):
    opts = K.realtime_reader_options(["b1:9092", "b2:9092"],
                                     ["proj.events", "proj.clicks"],
                                     offset="earliest")
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "proj.events,proj.clicks"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == str(K.MAX_POLL_RECORDS)
    assert opts["kafka.group.id"] == "presto_streaming"
    assert opts["failOnDataLoss"] == "false"
    # builder applies without a connector jar (fails only at .load())
    K.realtime_reader(spark, ["b1:9092"], ["t"], offset="earliest")


def test_kafka_historical_reader_options(spark):
    opts = K.historical_reader_options(["b:9092"], "proj_historical")
    assert opts["subscribe"] == "proj_historical"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == str(K.HISTORICAL_MAX_RECORDS)


def test_kafka_producer_options():
    assert K.historical_producer_options(["b:9092"], "hist") == {
        "kafka.bootstrap.servers": "b:9092", "topic": "hist"}


def test_kinesis_gate_raises_without_connector(spark):
    assert KS.kinesis_available(spark) is False
    with pytest.raises(RuntimeError, match="Kinesis connector"):
        KS.kinesis_reader(spark, "s", "us-east-1", "app")


def test_kinesis_option_translation():
    opts = KS.kinesis_reader_options("events", "eu-west-1", "ingest-app")
    assert opts["initialPosition"] == "TRIM_HORIZON"
    assert opts["consumerName"] == "ingest-app"
