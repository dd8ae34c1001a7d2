"""Streaming sinks: checkpointed appends, JSON DLQ files, and
foreachBatch merge applies (SURVEY.md §2.13 T1/K4/K6/K8).

The reference appends validated events to Delta with a checkpoint
(kafka/consumer/kafka_DLQ.py:59-63), writes DLQ rows as JSON-lines
files (kafka_DLQ.py:81-90), and sketches — but never finishes — a
``foreachBatch`` streaming upsert (util/verify_spark.py:106-114 is
syntactically broken). Here:

- ``start_append_sink`` / ``start_json_dlq_sink`` — checkpointed
  exactly-once-per-sink appends (parquet stands in for Delta in this
  environment; the option surface is identical).
- ``foreach_batch_upsert`` / ``foreach_batch_scd2`` — K8 done right:
  each micro-batch merges into a versioned parquet snapshot of the
  target via the engine's batch operators (operators/cdc.upsert_apply,
  operators/scd2.scd2_apply). With Delta available the same callback
  body becomes a MERGE; the versioned-directory commit protocol
  (write v{n+1}, then atomically publish a _LATEST pointer) is the
  no-transaction-log fallback and is idempotent under micro-batch
  replay because the batch id is folded into the version path.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def start_append_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = False,
    query_name: str | None = None,
) -> StreamingQuery:
    """Checkpointed streaming append (K4). ``available_now=True``
    processes the current backlog then stops — the batch-style
    incremental trigger used by tests and scheduled micro-batch
    jobs."""
    w = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", path)
    )
    if query_name:
        w = w.queryName(query_name)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_json_dlq_sink(
    dlq: DataFrame, path: str, checkpoint: str, available_now: bool = False
) -> StreamingQuery:
    """JSON-lines DLQ file sink (K6, kafka_DLQ.py:81-90). In a
    Kafka deployment the same frame goes to ``format("kafka")``
    with a topic option (K5)."""
    return start_append_sink(
        dlq, path, checkpoint, fmt="json", available_now=available_now
    )


# ── versioned-snapshot target for foreachBatch merges ──

LATEST_MARKER = "_LATEST"


def read_snapshot(spark: SparkSession, target: str) -> DataFrame | None:
    """Current published version of a versioned-snapshot table, or
    None before the first publish."""
    marker = os.path.join(target, LATEST_MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(target, version))


def publish_snapshot(df: DataFrame, target: str, version: str) -> None:
    out = os.path.join(target, version)
    df.write.mode("overwrite").parquet(out)
    tmp = os.path.join(target, f".{LATEST_MARKER}.tmp")
    os.makedirs(target, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(target, LATEST_MARKER))  # atomic publish


def foreach_batch_upsert(
    stream: DataFrame,
    target: str,
    checkpoint: str,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming latest-row-wins upsert: every micro-batch merges
    into the published snapshot with the batch upsert operator and
    publishes the next version (K8 corrected; outputMode update
    semantics via explicit merge)."""
    from hr_moderndatapipeline_spark.operators.cdc import upsert_apply

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = read_snapshot(spark, target)
        merged = batch if current is None else upsert_apply(
            current, batch, keys, order_by
        )
        # De-dup within the batch as well (a batch can carry several
        # versions of one key).
        from hr_moderndatapipeline_spark.operators.relational import latest_per_key

        ob = [order_by] if isinstance(order_by, str) else list(order_by)
        merged = latest_per_key(merged, list(keys), ob)
        publish_snapshot(merged, target, f"v{batch_id}")

    return _start_foreach_batch(stream, _apply, checkpoint, available_now)


def foreach_batch_scd2(
    stream: DataFrame,
    target: str,
    checkpoint: str,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming SCD2 apply: each micro-batch runs the two-phase
    close-and-insert against the published dimension snapshot
    (operators/scd2.scd2_apply — the corrected K3/K8 semantics)."""
    from hr_moderndatapipeline_spark.operators.scd2 import scd2_apply, scd2_from_history

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = read_snapshot(spark, target)
        if current is None:
            merged = scd2_from_history(batch, keys, ts_col)
        else:
            merged = scd2_apply(current, batch, keys, tracked, ts_col)
        publish_snapshot(merged, target, f"v{batch_id}")

    return _start_foreach_batch(stream, _apply, checkpoint, available_now)


def _start_foreach_batch(
    stream: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool,
) -> StreamingQuery:
    w = (
        stream.writeStream.foreachBatch(fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
