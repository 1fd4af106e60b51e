"""Stream sources (SURVEY §2.1): Kafka real-time/historical, Kinesis.

The tested source in this environment is the file source
(streaming/pipeline.py) — no broker or connector jar ships here. These
modules translate the reference's source configs onto Spark's connector
option surface so a cluster deployment swaps sources without touching
the pipeline: every builder returns a configured ``DataStreamReader``
whose output contract is the same (key binary, value binary/string,
topic, partition, offset) that the pipeline consumes.
"""
