"""Skew/partition diagnostics: detection of a planted hot key,
join worst-case sizing, and partition balance accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.diagnostics import (
    join_skew_report,
    key_skew_report,
    partition_size_report,
)


def _skewed(spark, hot_rows=5000, cold_keys=100):
    hot = spark.range(hot_rows).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(cold_keys).select(
        (F.col("id") + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionAll(cold)


def test_key_skew_report_finds_hot_key(spark):
    rep = key_skew_report(_skewed(spark), "k", top=3, target_rows_per_task=1000)
    assert rep["n_keys"] == 101
    assert rep["total_rows"] == 5100
    assert rep["max_count"] == 5000
    assert rep["top_keys"][0] == {"k": 0, "count": 5000}
    assert rep["skew_factor"] > 50
    # 5000 rows at 1000/task -> salt 5
    assert rep["recommended_salt"] == 5
    # cold keys dominate the percentiles
    assert rep["p50_count"] == 1


def test_key_skew_report_uniform_is_calm(spark):
    df = spark.range(1000).select((F.col("id") % 10).alias("k"))
    rep = key_skew_report(df, ["k"])
    assert rep["n_keys"] == 10
    assert rep["max_count"] == 100
    assert abs(rep["skew_factor"] - 1.0) < 1e-9
    assert rep["recommended_salt"] == 1


def test_join_skew_report_worst_task(spark):
    left = _skewed(spark, hot_rows=300, cold_keys=10)
    right = _skewed(spark, hot_rows=400, cold_keys=10)
    rep = join_skew_report(left, right, "k", top=5)
    assert rep["hot_join_keys"][0]["k"] == 0
    assert rep["hot_join_keys"][0]["output_rows"] == 300 * 400
    assert rep["max_task_output_rows"] == 120_000


def test_partition_size_report(spark):
    df = spark.range(0, 1000).repartition(8)
    rep = partition_size_report(df)
    assert rep["total_rows"] == 1000
    assert rep["rdd_partitions"] == 8
    assert 1 <= rep["n_partitions"] <= 8
    assert rep["max_rows"] >= rep["min_rows"] > 0
    assert rep["imbalance"] >= 1.0
