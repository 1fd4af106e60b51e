"""Ingestion core: envelope parse → type inference → schema evolution →
typed per-collection tables (SURVEY.md §1.3, §2.2, §2.4).
"""

from rakam_api_collector_spark.ingest.batch import FORMATS, HIDDEN, ingest_batch
from rakam_api_collector_spark.ingest.catalog import Catalog
from rakam_api_collector_spark.ingest.rules import conversion_expr, infer_type

__all__ = ["Catalog", "FORMATS", "HIDDEN", "conversion_expr",
           "infer_type", "ingest_batch"]
