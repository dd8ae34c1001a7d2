"""Bucketed table storage — the co-located join primitive.

SCALING.md's fact×fact row says "for repeated co-located joins,
bucket both tables on the key at write time"; this module is that
write path. Two tables bucketed (and sorted) on the same keys with
the same bucket count join with ZERO exchanges — each task reads
bucket i of both sides — and with ``sort_by`` the sort-merge join
skips its per-task sort too. At 100 TB this turns every recurring
key-join (fact×fact, incremental MERGE probes) from a full shuffle
of both sides into a metadata lookup.

The layout registers through the session catalog (``saveAsTable``);
pass ``path`` to keep the data external (catalog holds only
metadata). Bucket pruning: equality filters on the bucket key scan
a single bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` into ``num_buckets``
    files per partition, optionally sorted within buckets. Joins and
    aggregations on ``keys`` between tables sharing this layout plan
    without exchanges."""
    # Pre-shuffle on the bucket keys: without it every input task
    # writes a file for each bucket it touches (tasks x num_buckets
    # small files at scale); after it each task owns whole buckets.
    df = df.repartition(num_buckets, *[str(k) for k in keys])
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; the bucket spec travels with the table metadata,
    so downstream joins see the layout automatically."""
    return spark.table(table)
