"""AQE engagement proofs: these pin that the runtime re-planning the
100 TB posture leans on (SCALING.md) actually fires on this build —
skewed shuffle partitions get split, and undersized ones coalesced.
Thresholds are lowered to make local data 'big'; the assertions read
the FINAL adaptive plan, not the initial one."""

from __future__ import annotations

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only on execution
    return df._jdf.queryExecution().executedPlan().toString()


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    old = _with_confs(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # hermetic vs the session factory's 512 initial partitions
            # (r9): at 512-way the hot key's partition no longer trips
            # the demo's thresholds the same way; this test pins the
            # classic 1-shuffle-partition-per-core geometry it was
            # written for
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "4",
            # keep the join a real shuffle join, not a broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        # one hot key carrying ~90% of rows, with a wide payload
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 20_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        joined = left.join(right, "k").groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
        plan = _final_plan(joined)
        assert "skew=true" in plan, plan
    finally:
        _restore(spark, old)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    old = _with_confs(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.shuffle.partitions": "64",
        },
    )
    try:
        # 64 configured shuffle partitions for a few KB of data:
        # the final plan must read a coalesced shuffle
        df = (
            spark.range(1000)
            .groupBy((F.col("id") % 7).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _final_plan(df)
        assert "AQEShuffleRead coalesced" in plan, plan
    finally:
        _restore(spark, old)


def test_dynamic_partition_pruning_engages(spark, tmp_path):
    """Partition-pruned fact reads driven by a dim filter at RUNTIME
    (the fact-side predicate doesn't exist statically) — the scan
    must carry a dynamicpruning subquery, the mechanism that turns
    a 100 TB date-partitioned scan into a few partitions."""
    fact_dir = str(tmp_path / "fact_parts")
    spark.range(50_000).select(
        F.col("id"), (F.col("id") % 20).alias("pt")
    ).write.partitionBy("pt").parquet(fact_dir)
    dim = spark.range(20).select(
        F.col("id").alias("pt"), F.when(F.col("id") < 3, "hot").otherwise("cold").alias("cls")
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim.filter(F.col("cls") == "hot"), "pt").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert joined.first()["n"] == sum(1 for i in range(50_000) if i % 20 < 3)
