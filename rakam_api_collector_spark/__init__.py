"""rakam_api_collector_spark — a PySpark-native analytics/ingestion engine.

A ground-up re-expression of the capabilities of
rakam-io/rakam-api-collector (a Kafka/Kinesis → Presto/S3 streaming
ingestion engine) on Apache Spark:

- ingestion semantics (type inference, add-only schema evolution, safe
  casts, envelope parsing, late-data splitting, dedup) as declarative
  DataFrame transforms driven by Structured Streaming,
- a full relational query surface (joins/aggregations/windows/set ops)
  supplied natively by Spark SQL and pinned by a DuckDB oracle,
- LLM-data-pipeline operators (near-dup dedup, embedding similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from rakam_api_collector_spark.session import get_spark  # noqa: F401
from rakam_api_collector_spark.tables import TABLES, load_table, register_views  # noqa: F401
