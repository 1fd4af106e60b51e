"""Kafka sources & historical producer (S1/S2/K3).

Maps the reference's consumer loop config (KafkaConfig.java:25-46:
``kafka.offset`` latest-default, ``max.poll.records`` 300k,
``session.timeout.ms`` 12s, ``request.timeout.ms`` 15s, group id
``presto_streaming``) onto the Spark Kafka connector's option names.
The hand-rolled poll/pause/commit loop itself (KafkaRealTimeWorker.java:
145-222) intentionally has NO equivalent: trigger cadence replaces
poll cadence, `maxOffsetsPerTrigger` replaces max.poll.records,
checkpointLocation replaces commitSync (ST7), and Spark's memory
manager replaces pause/resume backpressure (ST8).

Requires the ``spark-sql-kafka-0-10`` connector jar on the cluster
(not shipped in this environment — ``kafka_available`` probes for it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

MAX_POLL_RECORDS = 300_000       # KafkaConfig.java:33
DEFAULT_GROUP_ID = "presto_streaming"   # KafkaConfig.java:31
HISTORICAL_MAX_RECORDS = 500_000  # HistoricalDataConfig.java:14
HISTORICAL_CADENCE = "30 minutes"  # HistoricalDataConfig.java:15


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka SQL connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def realtime_reader_options(brokers: list[str], topics: list[str],
                            offset: str = "latest",
                            group_id: str = DEFAULT_GROUP_ID,
                            max_records_per_trigger: int = MAX_POLL_RECORDS,
                            session_timeout_ms: int = 12_000,
                            request_timeout_ms: int = 15_000
                            ) -> dict[str, str]:
    """S1 option set. ``offset`` is the reference's ``kafka.offset``
    knob ('latest'|'earliest')."""
    return {
        "kafka.bootstrap.servers": ",".join(brokers),
        "subscribe": ",".join(topics),
        "startingOffsets": offset,
        "kafka.group.id": group_id,
        "maxOffsetsPerTrigger": str(max_records_per_trigger),
        "kafka.session.timeout.ms": str(session_timeout_ms),
        "kafka.request.timeout.ms": str(request_timeout_ms),
        # poison-pill parity (ST11/ST12): skip silently-expired offsets
        "failOnDataLoss": "false",
    }


def realtime_reader(spark: SparkSession, brokers: list[str],
                    topics: list[str], **kwargs) -> DataStreamReader:
    """S1: the real-time consumer stream."""
    return (spark.readStream.format("kafka")
            .options(**realtime_reader_options(brokers, topics, **kwargs)))


def historical_reader_options(brokers: list[str], historical_topic: str,
                              max_records_per_trigger: int =
                              HISTORICAL_MAX_RECORDS) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": ",".join(brokers),
        "subscribe": historical_topic,
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": str(max_records_per_trigger),
        "failOnDataLoss": "false",
    }


def historical_reader(spark: SparkSession, brokers: list[str],
                      historical_topic: str, **kwargs) -> DataStreamReader:
    """S2: the slow-cadence historical drain — pair with
    ``.trigger(processingTime=HISTORICAL_CADENCE)`` to mirror the 30-min
    / 500k-lag gate (KafkaHistoricalWorker.java:214-219)."""
    return (spark.readStream.format("kafka")
            .options(**historical_reader_options(brokers, historical_topic,
                                                 **kwargs)))


def historical_producer_options(brokers: list[str],
                                historical_topic: str) -> dict[str, str]:
    """K3: options for re-publishing late records
    (KafkaHistoricalDataHandler.java:41-69):
    ``df.select(value).write.format('kafka').options(**these).save()``."""
    return {"kafka.bootstrap.servers": ",".join(brokers),
            "topic": historical_topic}
