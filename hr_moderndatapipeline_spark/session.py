"""SparkSession factory.

The reference builds one session per job script with Delta extensions,
JDBC jars and stability tuning (reference: jobs/bronze/bronze_builder.py:57-71,
config/config.yaml:19). Here a single factory owns the session policy:

- AQE on (runtime partition coalescing + skew-join handling) — at 100 TB
  the static shuffle-partition guess is always wrong somewhere; AQE
  re-plans per stage.
- ``spark.sql.session.timeZone=UTC`` — the reference uses TIMESTAMPTZ
  watermark columns; pinning UTC keeps watermark comparisons and
  cross-engine (DuckDB oracle) results stable.
- Arrow enabled for any pandas interchange (Pandas UDFs, toPandas).
- shuffle partitions sized to local cores for tests; a real cluster
  deployment overrides via ``extra_conf`` (or spark-defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hr_mdp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 1)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
    )
    try:
        # Delta's MERGE/overwrite paths (sinks.delta_available gates on
        # jar presence) require the session extension + catalog confs —
        # the reference sets both (jobs/bronze/bronze_builder.py:57-71).
        # Without them a jars-equipped deployment would pass the
        # delta_available gate and then fail at runtime.
        import delta  # noqa: F401

        builder = builder.config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    except ImportError:
        pass
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Partition-sizing lesson from the sf10 spill frontier
        # (SCALING.md r8): the salted big-big SMJ spilled 4.0 GiB at
        # 32 shuffle partitions (~80 MiB compressed each — the SMJ
        # sort of the deserialized rows blows past per-task execution
        # memory) and 0 at ~20 MiB each. AQE can only COALESCE from
        # ``initialPartitionNum`` downward — it never splits a
        # too-big reducer partition outside skew-join handling — so
        # the cores-sized shuffle.partitions default silently CAPS
        # every shuffle at 32 reducers no matter the data. Raising the
        # initial count to 512 and stating the advisory target
        # explicitly (20 MiB compressed ≈ the measured zero-spill
        # regime) lets AQE pick the reducer count by
        # size at every scale; at test SFs it coalesces right back,
        # so plan skeletons are unchanged.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20m")
        # Without this, every shuffle UNDER a persist() boundary runs
        # at the static 512-partition initial count — AQE won't
        # re-plan inside a cached plan if that could change its output
        # partitioning, and the pinned index/probe lifecycles put
        # groupBy/join shuffles under pins. r12 A/B evidence: MinHash
        # probe driver query execution 17.2s → 9.1s (bench-warm 14.0s
        # → ~6s), asof_purchase_state 1.21s → 0.64s, 21-query anchor
        # subset 18.2s → 15.7s; identical results, ZERO plan
        # fingerprint changes, and run-to-run deltas on cache-free
        # queries sat inside host noise in both directions — the conf
        # is mechanically inert for uncached plans.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: the engine follows the reference's permissive SQL
        # semantics (NULL on bad cast / div-by-zero feeds the DLQ and
        # DQ paths instead of failing the job).
        .config("spark.sql.ansi.enabled", "false")
        # Read parquet TIMESTAMP(NANOS) columns (written by pandas/
        # Arrow ns-precision writers) as raw long; sources.readers
        # converts them to micros timestamps explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet Timestamp(isAdjustedToUTC=false) columns would read
        # as TIMESTAMP_NTZ and break unix_micros/window(); with the
        # session zone pinned to UTC the types are value-identical, so
        # keep the classic TIMESTAMP read.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # The generated-class cache defaults to 100 entries; a session
        # running many distinct wide plans (the 60-query driver sweep,
        # bench) evicts and re-compiles large generated classes on
        # every revisit — the wide dedup aggregates re-pay multi-second
        # Janino+JIT warmup each time. Cache is global and classes are
        # small; 1000 entries removes the churn.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
