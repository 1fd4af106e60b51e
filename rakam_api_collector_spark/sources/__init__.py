"""Stream sources (SURVEY §2.1): Kafka real-time/historical, Kinesis.

Kafka ships as connector option translation: no broker or jar lives in
this environment, and the first-party Spark connector IS the right
production integration — the modules translate the reference's source
configs onto its option surface so a cluster deployment swaps sources
without touching the pipeline (every builder returns a configured
``DataStreamReader`` whose output contract — key binary, value
binary/string, topic, partition, offset — the pipeline consumes).

Kinesis additionally ships a jar-less PySpark DataSource,
``format("kinesis_py")`` (kinesis.KinesisPyDataSource): the public
ListShards/GetShardIterator/GetRecords protocol over any boto3-shaped
client, with per-shard sequence-number offsets checkpointed by Spark
and KCL parent-before-child reshard ordering. ``kinesis_local``
provides the file-backed wire-model emulator (the kinesalite role)
that the protocol tests — and local development — run against; the
tested source in this environment is that pair plus the file source
(streaming/pipeline.py).
"""

from rakam_api_collector_spark.sources.kinesis import (
    KinesisPyDataSource,
    kinesis_reader,
    kinesis_reader_options,
)

__all__ = ["KinesisPyDataSource", "kinesis_reader",
           "kinesis_reader_options"]
