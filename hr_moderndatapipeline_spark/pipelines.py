"""Medallion pipeline composition: bronze → silver → gold (SURVEY.md
§3.1's end-to-end lifecycle as engine operators).

The reference's batch flow per table run: read the watermark file,
pull rows with ``updated_at > wm`` via a pushed-down JDBC subquery,
MERGE into bronze, advance the watermark (jobs/bronze/
bronze_builder.py:78-137); then the same watermark pattern reading
bronze and SCD2-merging into silver (jobs/silver/
silver_builder.py:69-138); gold models re-aggregate silver via SQL
(dbt). Here the same lifecycle is a composition of the engine's
tested operators over any DataFrame source — JDBC, parquet, or a
stream's foreachBatch — with storage behind the versioned-snapshot
publisher (Delta MERGE replaces it transparently where Delta jars
exist).

Incremental invariants (tested end-to-end in
tests/test_pipeline_e2e.py):
- re-running with no new source rows changes nothing (watermark
  short-circuit, A2-style ``isEmpty`` instead of the reference's
  double count());
- bronze holds exactly the latest version per key (K2);
- silver is a valid SCD2 history (one current row per live key,
  contiguous ranges) after any number of incremental runs;
- ``--full-refresh`` rebuilds bronze from scratch and resets the
  watermark (§2.11.5).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from hr_moderndatapipeline_spark.operators.cdc import upsert_apply
from hr_moderndatapipeline_spark.operators.scd2 import scd2_apply, scd2_from_history
from hr_moderndatapipeline_spark.sources.watermark import (
    WatermarkStore,
    incremental_read,
)
from hr_moderndatapipeline_spark.streaming.sinks import publish_snapshot, read_snapshot


#: Derived partition column added to published snapshots.
PARTITION_COL = "p_month"


@dataclass
class TableSpec:
    name: str
    keys: Sequence[str]
    tracked: Sequence[str]      # columns whose change opens a new SCD2 version
    watermark_col: str
    #: Partition bronze/silver snapshots by month(watermark_col).
    #: The reference writes flat ("partitionBy":"[]"); month
    #: partitioning is the SURVEY.md §4 uplift — downstream reads
    #: filtered on recency prune to a few directories instead of
    #: scanning the full table (the dominant access pattern for a
    #: mirror whose hot queries are "what changed lately").
    partition_months: bool = True


class MedallionPipeline:
    """Bronze (latest-per-key mirror) + silver (SCD2 history) for one
    table, incrementally maintained from any batch source."""

    def __init__(self, spark: SparkSession, root: str, spec: TableSpec, store: WatermarkStore):
        self.spark = spark
        self.root = root
        self.spec = spec
        self.store = store

    def _path(self, zone: str) -> str:
        return f"{self.root}/{zone}/{self.spec.name}"

    def bronze(self) -> DataFrame | None:
        return self._strip_partition(read_snapshot(self.spark, self._path("bronze")))

    def silver(self) -> DataFrame | None:
        return self._strip_partition(read_snapshot(self.spark, self._path("silver")))

    @staticmethod
    def _strip_partition(df: DataFrame | None) -> DataFrame | None:
        """Logical view without the derived partition column — merge
        operators see the same schema the source produced. Dropping
        the column does NOT disable pruning: filters on the remaining
        columns still prune via the directory layout, and
        recency-pruned physical reads go through ``read_snapshot``
        directly (see tests/test_pipeline_e2e.py pruning gate)."""
        return None if df is None else df.drop(PARTITION_COL)

    def _publish(self, df: DataFrame, zone: str, batch_tag: str | None) -> None:
        """Marker-deduplicated publish into the next FREE version —
        the same protocol as the streaming foreachBatch sinks: a
        replayed batch (crash after publish, before the watermark
        advanced) is a no-op instead of overwriting the directory its
        own merge lineage is reading, and version numbering can never
        collide with compact_snapshot/forget_keys (all allocate via
        _next_free_version). An in-memory run counter (the previous
        scheme) reused version paths across process restarts."""
        from hr_moderndatapipeline_spark.streaming.sinks import _publish_batch_snapshot

        from hr_moderndatapipeline_spark.streaming.sinks import (
            _next_free_version,
        )

        kwargs = {}
        if self.spec.partition_months:
            from pyspark.sql import functions as F

            df = df.withColumn(
                PARTITION_COL, F.date_format(F.col(self.spec.watermark_col), "yyyy-MM")
            )
            kwargs["partition_by"] = [PARTITION_COL]
        target = self._path(zone)
        if batch_tag is None:  # full refresh: rebuild unconditionally
            publish_snapshot(df, target, f"v{_next_free_version(target)}", **kwargs)
        else:
            _publish_batch_snapshot(df, target, batch_tag, **kwargs)

    def run_increment(self, source: DataFrame, full_refresh: bool = False) -> dict:
        """One incremental run: extract new rows past the watermark,
        upsert bronze, SCD2-apply silver, advance the watermark.
        Returns row metrics. The watermark read/advance moves one
        scalar through the driver — the single sanctioned collect."""
        from pyspark import StorageLevel

        s = self.spec
        wm_key = s.name
        batch = incremental_read(source, s.watermark_col, self.store, wm_key, full_refresh)
        # ONE source scan per run: the extraction feeds the empty
        # check, bronze upsert, silver apply, row metric, and the
        # watermark advance — uncached each consumer re-runs it (the
        # reference's double-count() anti-pattern, SURVEY.md §4,
        # times five).
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if batch.isEmpty():
                return {"extracted": 0, "skipped": True}

            # Batch identity for replay dedup: the (old → new)
            # watermark pair names this batch's content — a rerun
            # after a crash-before-advance extracts the same rows and
            # computes the same tag, so the publishes below no-op.
            # The max() scalar doubles as the watermark advance.
            from pyspark.sql import functions as F

            new_wm = batch.agg(F.max(s.watermark_col)).collect()[0][0]
            # full refresh always rebuilds (tag None bypasses dedup)
            tag = None if full_refresh else f"{self.store.get(wm_key)}->{new_wm}"

            # bronze: latest-row-wins mirror (K2)
            current = None if full_refresh else self.bronze()
            if current is None:
                # first load: dedup within the batch — on the batch
                from hr_moderndatapipeline_spark.operators.relational import (
                    latest_per_key,
                )

                bronze = latest_per_key(batch, list(s.keys), [s.watermark_col])
            else:
                # upsert_apply already keeps exactly one row per key
                # (intra-batch dups included); a second latest_per_key
                # over the merged MIRROR would re-shuffle the whole
                # table per run for nothing
                bronze = upsert_apply(current, batch, s.keys, [s.watermark_col])
            self._publish(bronze, "bronze", tag)

            # silver: two-phase SCD2 apply (K3 fixed)
            dim = None if full_refresh else self.silver()
            if dim is None:
                silver = scd2_from_history(batch, s.keys, s.watermark_col)
            else:
                silver = scd2_apply(dim, batch, s.keys, s.tracked, s.watermark_col)
            self._publish(silver, "silver", tag)

            if new_wm is not None:  # all-NULL watermark col: no advance
                self.store.set(wm_key, str(new_wm))
            n = batch.count()  # served from cache, no extra source scan
            return {"extracted": n, "skipped": False}
        finally:
            batch.unpersist()
