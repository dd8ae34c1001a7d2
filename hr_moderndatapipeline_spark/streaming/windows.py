"""Event-time windowed aggregation and sessionization (SURVEY.md
§2.13 T7 — capability uplift, absent from the reference).

The reference's streams carry event-time columns but never use
Spark's event-time machinery (its "watermark" is always the batch
high-water-mark file). A credible streaming engine needs late-data
handling: these operators wrap ``withWatermark`` + ``window`` /
``session_window`` and run identically on batch frames (where the
watermark is a no-op) — which is how the oracle checks them.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: Mapping[str, Column],
    group_by: list[str] | None = None,
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time window
    aggregate. On a stream, ``watermark`` (e.g. "2 hours") bounds
    state and drops late rows; on a batch frame it is skipped.
    Output: window_start, window_end, group keys, aggregates."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    keys = [win.alias("_w")] + [F.col(c) for c in (group_by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *(group_by or []),
        *aggs.keys(),
    )


def sessionized_counts(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with inactivity ``gap`` (e.g. "30 minutes")
    per group key — the native stateful form of the batch
    lag-gap-cumsum sessionization (queries/core.q_user_sessions)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("_w"), *group_by).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *group_by,
        "n_events",
    )
