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
