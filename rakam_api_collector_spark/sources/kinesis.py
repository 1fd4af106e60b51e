"""Kinesis source (S3): KCL semantics on Spark's Kinesis connectors.

The reference runs one KCL ``IRecordProcessor`` per shard with a
DynamoDB lease table, TRIM_HORIZON start, and per-shard checkpointing
(KinesisRecordProcessor.java:77-133, KinesisWorkerManager.java:85-116).
OSS Spark has no first-party Kinesis source; the two maintained
connectors (``spark-sql-kinesis`` qubole/ASF fork lineage, and the
AWS Kinesis EFO connector) both accept the option set produced here.

Shard-level parallelism maps to source partitions, the lease table to
the connector's DynamoDB metadata table, and ``checkpointer.checkpoint()``
to Spark's checkpointLocation (ST7) — there is deliberately no
per-shard processor class to port.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

TRIM_HORIZON = "TRIM_HORIZON"    # KinesisUtil default in the reference


def kinesis_available(spark: SparkSession) -> bool:
    for cls in ("org.apache.spark.sql.kinesis.KinesisSourceProvider",
                "org.apache.spark.sql.connector.kinesis.KinesisTable"):
        try:
            spark._jvm.java.lang.Class.forName(cls)
            return True
        except Exception:
            continue
    return False


def kinesis_reader_options(stream_name: str, region: str,
                           app_name: str,
                           position: str = TRIM_HORIZON) -> dict[str, str]:
    """Connector-agnostic option set (S3). ``app_name`` becomes the
    DynamoDB lease/metadata table name, as in the KCL."""
    return {
        "streamName": stream_name,
        "region": region,
        "initialPosition": position,
        "consumerName": app_name,
        # KCL CloudWatch metrics (KinesisWorkerManager.java:101-108) are
        # Spark streaming metrics; no option needed.
    }


def kinesis_reader(spark: SparkSession, stream_name: str, region: str,
                   app_name: str,
                   position: str = TRIM_HORIZON) -> DataStreamReader:
    if not kinesis_available(spark):
        raise RuntimeError(
            "no Kinesis connector on the classpath; add spark-sql-kinesis "
            "or the AWS EFO connector jar (see module docstring)")
    reader = spark.readStream.format("kinesis")
    for k, v in kinesis_reader_options(stream_name, region, app_name,
                                       position).items():
        reader = reader.option(k, v)
    return reader
