"""Executed-plan metrics: shuffle accounting matches plan shape —
a shuffle join moves bytes, a broadcast join moves none."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.execmetrics import executed_metrics

SF = "/root/testdata/sf0.001"


def test_shuffle_join_reports_shuffle_traffic(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        df.collect()
        m = executed_metrics(df)
        assert m["shuffle_bytes"] > 0
        # both join inputs shuffle: at least one record per input row
        assert m["shuffle_records"] >= li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_broadcast_join_reports_no_join_shuffle(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.sum("o_totalprice").alias("s")
    )
    df.collect()
    m = executed_metrics(df)
    # a single scalar aggregate: the only exchange is the final
    # 1-row SinglePartition gather
    assert m["shuffle_records"] <= 64  # one partial row per task
    assert m["spill_bytes"] == 0


def test_metrics_zero_before_showing_nonzero_after(spark):
    df = spark.range(100_000).groupBy((F.col("id") % 100).alias("g")).agg(
        F.count(F.lit(1)).alias("n")
    )
    before = executed_metrics(df)
    assert before["shuffle_records"] == 0  # not executed yet
    df.collect()
    after = executed_metrics(df)
    assert after["shuffle_records"] > 0
