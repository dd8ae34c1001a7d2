"""Structured Streaming layer (SURVEY.md §2.13).

The reference's streaming surface — Kafka source, schema-validation
DLQ split, checkpointed append sinks, multi-sink fan-out, foreachBatch
upsert, query monitoring — re-expressed as composable operators. All
transformations are plain DataFrame lineage, so each operator works
identically on a batch frame (tests, backfills) and a stream.
"""

from hr_moderndatapipeline_spark.streaming.validate import parse_with_dlq
from hr_moderndatapipeline_spark.streaming.sinks import (
    build_kafka_dlq_writer,
    dlq_kafka_payload,
    foreach_batch_scd2,
    foreach_batch_upsert,
    start_append_sink,
    start_console_sink,
    start_json_dlq_sink,
    start_kafka_dlq_sink,
)
from hr_moderndatapipeline_spark.streaming.joins import enrich_stream, stream_stream_join
from hr_moderndatapipeline_spark.streaming.sources import file_json_stream, kafka_stream
from hr_moderndatapipeline_spark.streaming.stateful import dedup_stream, running_totals
from hr_moderndatapipeline_spark.streaming.windows import (
    sessionized_counts,
    windowed_agg,
)
from hr_moderndatapipeline_spark.streaming.monitor import progress_summary

__all__ = [
    "parse_with_dlq",
    "build_kafka_dlq_writer",
    "dlq_kafka_payload",
    "foreach_batch_scd2",
    "foreach_batch_upsert",
    "start_append_sink",
    "start_console_sink",
    "start_json_dlq_sink",
    "start_kafka_dlq_sink",
    "enrich_stream",
    "stream_stream_join",
    "file_json_stream",
    "kafka_stream",
    "dedup_stream",
    "running_totals",
    "windowed_agg",
    "sessionized_counts",
    "progress_summary",
]
