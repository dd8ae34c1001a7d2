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


def write_with_metrics(
    df,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    metrics: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Write ``df`` and return observed metrics from THE SAME pass —
    row count plus any named aggregate expressions (``metrics`` maps
    name -> Column). The reference accounts pipeline row counts by
    re-counting after the write (jobs/bronze/bronze_builder.py logs
    ``df.count()`` — a second full scan); Spark's ``Observation`` API
    rides the write job itself, so at 100 TB the accounting is free.

    Returns e.g. ``{"n_rows": 123, "null_keys": 0}`` — feed it to the
    same logging/alerting sink as ``progress_summary``.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = dict(metrics or {})
    obs = Observation()
    named = [F.count(F.lit(1)).alias("n_rows")] + [
        c.alias(name) for name, c in metrics.items()
    ]
    df.observe(obs, *named).write.format(fmt).mode(mode).save(path)
    return dict(obs.get)
