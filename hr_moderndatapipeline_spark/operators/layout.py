"""Z-order (Morton-curve) multi-column clustering — file skipping on
EVERY clustered column, not just the leading one.

``publish_snapshot(cluster_by=[a, b])`` range-clusters
lexicographically: files are tight on ``a`` but each file spans
``b``'s whole domain, so a predicate on ``b`` alone skips nothing.
Interleaving the bits of the columns' scaled values (the Morton key)
makes every file cover a small HYPER-RECTANGLE of the combined key
space — Delta's OPTIMIZE ZORDER and Iceberg's z-ordering do exactly
this — so parquet footer min/max stats prune files for predicates on
any clustered column. At 100 TB this is the difference between "fast
only when you filter on the partition key" and "fast on each of the
2-3 columns dashboards actually filter by".

Everything is public-API column arithmetic in whole-stage codegen:
one aggregate job collects each column's [min, max] (O(cols) scalars
to the driver, same contract as the watermark read), values scale to
``bits``-bit integers, and the interleave is a fixed sum of
shift/mask terms. The write itself is ``repartitionByRange`` on the
Morton key + an in-partition sort, identical machinery to the
lexical clustering path.

Scaling is linear min/max by default — a heavily skewed column
concentrates most rows in few tiles (outliers stretch the domain);
for those, pre-bucket the column (e.g. log transform) before
clustering, as the Delta docs recommend for ZORDER on skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map values linearly onto [0, 2^bits), clamped; nulls sort
    first (tile 0); constant columns contribute zero bits."""
    max_v = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    frac = (F.coalesce(col.cast("double"), F.lit(float(lo))) - float(lo)) / (
        float(hi) - float(lo)
    )
    return F.least(
        F.lit(max_v).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(frac * max_v).cast("long")),
    )


def morton_key(scaled: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each scaled column into one
    Morton key: bit j of column i lands at position j*n_cols + i.
    Fixed-size expression (n_cols·bits shift/mask terms), all codegen."""
    n = len(scaled)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits; must be <= 63 "
            "(lower bits= or cluster fewer columns)"
        )
    z = F.lit(0).cast("long")
    for i, s in enumerate(scaled):
        for j in range(bits):
            z = z + F.shiftleft(F.shiftright(s, j).bitwiseAND(F.lit(1).cast("long")), j * n + i)
    return z


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Rewrite ``df``'s layout so each of ``n_files`` output files
    covers a compact tile of the ``cols`` key space. Pass the result
    straight to ``publish_snapshot`` / ``.write.parquet`` — the
    range-partition + sort IS the layout; no extra column survives.

    One extra job (the min/max aggregate) before the single layout
    shuffle."""
    if not cols:
        raise ValueError("cols must name at least one column")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    for i, c in enumerate(cols):
        if (bounds[f"_lo{i}"] is None) != (bounds[f"_hi{i}"] is None):
            raise AssertionError(f"inconsistent bounds for {c}")
    bad = [c for i, c in enumerate(cols) if bounds[f"_lo{i}"] is None]
    if bad:
        raise ValueError(
            f"z-order columns must be numeric and not all-null; got {bad} "
            "(cast or bucket non-numeric keys first)"
        )
    scaled = [
        _scaled(F.col(c), bounds[f"_lo{i}"], bounds[f"_hi{i}"], bits)
        for i, c in enumerate(cols)
    ]
    return (
        df.withColumn("_zkey", morton_key(scaled, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def publish_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: Sequence[str] = (),
) -> None:
    """Publish ``df`` as a hash-BUCKETED (and optionally
    bucket-sorted) catalog table — the write-time half of the
    co-located join: two facts bucketed on their join key with the
    SAME bucket count are read back already partitioned by that key,
    so their join plans with ZERO Exchange on either side (gated by
    tests/test_zorder.py). At 100 TB this converts every repeated
    fact×fact join on the key (the daily orders×lineitem pattern)
    from two full shuffles per run into none — the shuffle is paid
    ONCE at publish time and amortized over every subsequent join,
    which is why warehouses bucket their largest co-joined tables
    (SCALING.md "joins fact×fact" row).

    Uses ``bucketBy`` + ``saveAsTable``: bucket metadata lives in
    the session catalog (parquet files alone carry no bucket spec —
    a plain ``.parquet(path)`` read of the same files joins WITH
    shuffles). The table is dropped first so republish is
    idempotent."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*list(sort_cols))
    w.saveAsTable(table)
