"""Cost-based optimizer wiring: ANALYZE TABLE statistics reach the
optimizer, filters shrink estimates (CBO selectivity), and the
stats-informed size estimate flips a join to broadcast.

At 100 TB the difference between a stats-blind and a stats-informed
plan is an 8-byte rowCount: without ANALYZE, Spark falls back to
file-size guessing for every build-side decision."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def cbo_tables(spark):
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.range(10_000).select(
        F.col("id").alias("okey"),
        (F.col("id") % 100).alias("ckey"),
        (F.col("id") % 7 == 0).alias("flag"),
    ).write.mode("overwrite").saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    old = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    yield
    spark.conf.set("spark.sql.cbo.enabled", old)
    spark.sql("DROP TABLE IF EXISTS cbo_orders")


def _row_estimate(df):
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    if not rc.isDefined():
        return None
    got = rc.get()
    return int(got.longValue() if hasattr(got, "longValue") else str(got))


def test_analyze_gives_exact_rowcount(spark, cbo_tables):
    assert _row_estimate(spark.table("cbo_orders")) == 10_000


def test_filter_shrinks_estimate(spark, cbo_tables):
    base = _row_estimate(spark.table("cbo_orders"))
    filtered = _row_estimate(
        spark.table("cbo_orders").filter(F.col("ckey") < 10)
    )
    assert filtered is not None and 0 < filtered < base
    # equality on a 100-distinct-value column: ~1% selectivity
    eq = _row_estimate(spark.table("cbo_orders").filter(F.col("ckey") == 3))
    assert eq is not None and eq <= base // 50


def test_stats_flip_join_to_broadcast(spark, cbo_tables):
    """A filtered slice is far under the broadcast threshold even
    though the TABLE is over it — only column stats can know that
    at planning time."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "40KB")
    try:
        big = spark.table("cbo_orders")
        small = spark.table("cbo_orders").filter(F.col("ckey") == 3).select(
            "okey", "flag"
        )
        plan = (
            big.join(small.withColumnRenamed("flag", "f2"), "okey")
            ._jdf.queryExecution()
            .sparkPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
