"""Job metrics without extra scans (``Dataset.observe``).

The reference logs row counts by re-counting frames (an extra full
scan per metric — the SURVEY.md §4 double-scan anti-pattern). Spark's
observation API accumulates aggregate metrics AS the action runs:
attach counters/sums to the frame, run the write, read the metrics
afterwards — zero additional jobs, exact values, works identically
under streaming ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; after the next
    action on the returned frame, ``observation.get`` yields them
    without re-scanning. Example::

        frame, obs = observed(batch, "bronze",
                              rows=F.count(F.lit(1)),
                              nulls=F.sum(F.col("k").isNull().cast("int")))
        frame.write.parquet(path)
        log(obs.get)   # {'rows': ..., 'nulls': ...}
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs
