"""Plan fingerprints (VERDICT r5 task 5): stable across identical
plans, different across strategy changes — the property bench.py
relies on to surface plan regressions as token diffs."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.plans.fingerprint import (
    fingerprint_counts,
    plan_fingerprint,
    plan_of,
    plan_skeleton,
)
from hr_moderndatapipeline_spark.sources.readers import load_table


def test_fingerprint_stable_for_identical_plans(spark, sf_dir):
    def build():
        o = load_table(spark, sf_dir, "orders")
        return o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s"))

    assert plan_fingerprint(build()) == plan_fingerprint(build())


def test_fingerprint_changes_with_plan_shape(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    agg = o.groupBy("o_orderstatus").count()
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
        "o_orderstatus"
    ).count()
    assert plan_fingerprint(agg) != plan_fingerprint(joined)


def test_skeleton_and_counts_see_the_join_strategy(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    plan = plan_of(o.join(F.broadcast(c), o.o_custkey == c.c_custkey))
    # formatted explain names the node in the tree AND its detail
    # heading; the count is of pattern occurrences, not nodes
    assert fingerprint_counts(plan)["broadcast_joins"] >= 1
    nodes = plan_skeleton(plan)
    assert any(n.startswith("BroadcastHashJoin") for n in nodes)
    # skeleton holds node names only — no exprIds/paths that churn
    assert all("#" not in n and "/" not in n for n in nodes)


def test_bench_queries_all_exist():
    """Every BENCH_QUERIES name must resolve — a typo'd entry would
    silently land in the bench's errors field and drop the query from
    the round's timing record."""
    import bench

    import __spark_entry__ as entry

    missing = [n for n in bench.BENCH_QUERIES if n not in entry.queries()]
    assert not missing, f"bench names not in queries(): {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
