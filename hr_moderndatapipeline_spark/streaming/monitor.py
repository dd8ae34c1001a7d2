"""Streaming query monitoring (SURVEY.md §2.13 T5).

The reference polls ``spark.streams.active`` printing status and
lastProgress in a loop (kafka/consumer/
kafka_consumer_contract_signing_events_DLQ.py:143-157). Engine form:
a structured snapshot suitable for logging/alerting instead of
prints."""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def progress_summary(query: StreamingQuery) -> dict[str, Any]:
    """Compact progress snapshot of one streaming query."""
    p = query.lastProgress or {}
    return {
        "id": str(query.id),
        "name": query.name,
        "is_active": query.isActive,
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "process_rows_per_second": p.get("processedRowsPerSecond"),
        # sum over EVERY stateful operator: a dedup + windowed-agg
        # chain reports several entries, and the unbounded-growth
        # culprit is as likely the second as the first
        "state_rows": sum(
            op.get("numRowsTotal") or 0 for op in p.get("stateOperators") or []
        )
        if p.get("stateOperators")
        else None,
    }


def all_progress(spark: SparkSession) -> list[dict[str, Any]]:
    return [progress_summary(q) for q in spark.streams.active]
