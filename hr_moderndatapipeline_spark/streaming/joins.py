"""Streaming joins (SURVEY.md §2.13 uplift): stream-static dimension
enrichment and watermarked stream-stream joins.

The reference enriches streams only batch-side (consumer scripts join
after landing); a credible streaming engine does it in-flight:

- ``enrich_stream`` — per-micro-batch join against the CURRENT
  dimension snapshot. The static side is broadcast by default: at
  scale the stream never shuffles for the join, and dimension
  updates are picked up on the next micro-batch without a restart
  (Spark re-plans the static side per batch for file sources).
- ``stream_stream_join`` — inner join of two streams on equi-keys
  plus an event-time bound (``right_ts`` within ``[left_ts,
  left_ts + within]``). Both sides carry watermarks so the join
  state store is bounded: rows older than the watermark are evicted,
  which is what makes the operator runnable forever at 100 TB/day.
  Runs identically on batch frames (watermarks skipped) — how the
  unit oracle checks it.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with dimension
    attributes. ``how`` is 'left' (keep unmatched stream rows) or
    'inner' (drop them)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, list(keys), how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: equi-join on ``keys`` where
    ``left_ts <= right_ts <= left_ts + within``. Column names
    outside ``keys`` must be disjoint between the two sides; the
    right side's key columns are dropped from the output.

    ``how="leftOuter"`` additionally emits the null-padded left row
    once the watermark passes ``left_ts + within`` (state eviction
    proves no match can still arrive) — the "error with no follow-up
    click" shape. The time bound + watermark are exactly what Spark
    requires to make streaming outer joins finite-state."""
    if how not in ("inner", "leftOuter", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = reduce(
        lambda a, b: a & b, [left[k] == right[k] for k in keys]
    )
    cond = (
        cond
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    out = left.join(right, cond, how)
    for k in keys:
        out = out.drop(right[k])
    return out
