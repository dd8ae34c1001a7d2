"""Column lineage: projection/aggregate/join/window tracing on real
queries, literal detection, and the positional-op refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.plans.lineage import (
    UnsupportedPlanError,
    column_lineage,
    lineage_report,
)

SF = "/root/testdata/sf0.001"


def test_lineage_through_aggregate(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    df = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend"),
        F.count(F.lit(1)).alias("n"),
    )
    lin = column_lineage(df)
    assert lin["o_custkey"] == {"orders.o_custkey"}
    assert lin["spend"] == {"orders.o_totalprice"}
    assert lin["n"] == set()  # count(lit) touches no source column


def test_lineage_through_join_and_expression(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    df = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.col("o_totalprice") * (1 - F.lit(0.1))).alias("disc_price"),
        )
    )
    lin = column_lineage(df)
    assert lin["segment"] == {"customer.c_mktsegment"}
    assert lin["disc_price"] == {"orders.o_totalprice"}


def test_lineage_through_window(spark):
    from pyspark.sql import Window

    o = spark.read.parquet(f"{SF}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    df = o.select(
        "o_orderkey", F.sum("o_totalprice").over(w).alias("running")
    )
    lin = column_lineage(df)
    assert lin["o_orderkey"] == {"orders.o_orderkey"}
    # the window sum depends on the measure AND its partition/order keys
    assert "orders.o_totalprice" in lin["running"]
    assert "orders.o_custkey" in lin["running"]


def test_lineage_multi_hop_alias_chain(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    df = (
        o.select((F.col("o_totalprice") * 100).alias("cents"))
        .select((F.col("cents") + 1).alias("cents_plus"))
    )
    assert column_lineage(df)["cents_plus"] == {"orders.o_totalprice"}


def test_lineage_refuses_union(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    with pytest.raises(UnsupportedPlanError):
        column_lineage(o.unionAll(o))


def test_lineage_report_renders(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    rep = lineage_report(o.select("o_orderkey", F.lit(1).alias("one")))
    assert "o_orderkey <- orders.o_orderkey" in rep
    assert "one <- (literal)" in rep
