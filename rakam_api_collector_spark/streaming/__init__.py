"""Streaming lifecycle: micro-batch ingestion, late split, historical
replay, stateful dedup (SURVEY.md §2.11).
"""

from rakam_api_collector_spark.streaming.annindex import \
    start_ann_index_stream
from rakam_api_collector_spark.streaming.dedupstream import \
    start_corpus_dedup_stream
from rakam_api_collector_spark.streaming.latesplit import split_late
from rakam_api_collector_spark.streaming.pipeline import (
    start_avro_historical_stream,
    start_avro_ingest_stream,
    start_historical_stream,
    start_ingest_stream,
)

__all__ = ["split_late", "start_ann_index_stream",
           "start_avro_historical_stream",
           "start_avro_ingest_stream", "start_corpus_dedup_stream",
           "start_historical_stream", "start_ingest_stream"]
