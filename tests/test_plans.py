"""SQL model runner tests (the dbt-replacement, SURVEY.md §3.3)."""

from __future__ import annotations

import os

from hr_moderndatapipeline_spark.plans import GOLD_MODELS, Model, ModelRunner
from hr_moderndatapipeline_spark.sources.readers import register_views


def test_order_is_topological(spark):
    runner = ModelRunner(spark, GOLD_MODELS)
    names = [m.name for m in runner.order()]
    assert names.index("gold_status_monthly") < names.index("gold_status_summary")


def test_gold_models_run_and_chain(spark, sf_dir):
    register_views(spark, sf_dir, ("orders", "customer"))
    out = ModelRunner(spark, GOLD_MODELS).run()
    assert set(out) == {"gold_status_monthly", "gold_status_by_segment", "gold_status_summary"}
    monthly = out["gold_status_monthly"]
    summary = out["gold_status_summary"]
    # summary is an exact rollup of monthly
    m = monthly.groupBy("year").sum("total_orders").collect()
    s = {r["year"]: r["total_orders"] for r in summary.collect()}
    for r in m:
        assert s[r["year"]] == r["sum(total_orders)"]


def test_table_materialization_partitioned(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir, ("orders",))
    model = Model(
        name="orders_by_year",
        sql="SELECT CAST(year(o_orderdate) AS INT) AS year, o_orderkey FROM orders",
        depends_on=("orders",),
        materialization="table",
        partition_by=("year",),
    )
    out = ModelRunner(spark, [model], table_root=str(tmp_path)).run()
    # physically partitioned by year (the 100 TB posture: facts
    # partitioned on the date key, SURVEY.md §4)
    parts = [d for d in os.listdir(tmp_path / "orders_by_year") if d.startswith("year=")]
    assert len(parts) > 1
    # registered as a queryable view
    assert spark.sql("SELECT count(*) AS n FROM orders_by_year").collect()[0]["n"] == out[
        "orders_by_year"
    ].count()


def test_freshness_skip_and_upstream_cascade(spark, tmp_path):
    """freshness_skip: an unchanged table model is NOT rewritten on
    rerun; rewriting its upstream input flips the key and forces the
    rebuild (the dbt state:modified contract, engine-side)."""
    import os
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    ).write.mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("fresh_src")
    model = Model(
        name="fresh_agg",
        sql="SELECT g, count(*) AS n FROM fresh_src GROUP BY g",
        materialization="table",
    )
    root = str(tmp_path / "tables")
    r1 = ModelRunner(spark, [model], table_root=root, freshness_skip=True)
    r1.run()
    assert r1.skipped == []
    files1 = {
        f: os.path.getmtime(os.path.join(root, "fresh_agg", f))
        for f in os.listdir(os.path.join(root, "fresh_agg"))
        if f.endswith(".parquet")
    }

    r2 = ModelRunner(spark, [model], table_root=root, freshness_skip=True)
    out = r2.run()
    assert r2.skipped == ["fresh_agg"]
    assert out["fresh_agg"].count() == 5
    files2 = {
        f: os.path.getmtime(os.path.join(root, "fresh_agg", f))
        for f in os.listdir(os.path.join(root, "fresh_agg"))
        if f.endswith(".parquet")
    }
    assert files1 == files2  # untouched on disk

    # upstream rewrite -> key flips -> model rebuilds
    time.sleep(1.1)
    spark.range(200).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    ).write.mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("fresh_src")
    r3 = ModelRunner(spark, [model], table_root=root, freshness_skip=True)
    out3 = r3.run()
    assert r3.skipped == []
    assert out3["fresh_agg"].agg(F.sum("n")).first()[0] == 200
