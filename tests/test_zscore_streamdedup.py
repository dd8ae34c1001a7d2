"""Round-6 additions: grouped z-score normalization and the
watermark-bounded streaming dedup driver query."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.relational import grouped_zscore
from hr_moderndatapipeline_spark.sources.readers import load_table


def test_grouped_zscore_matches_closed_form(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 30)],
        "g string, v long",
    )
    got = {
        (r["g"], r["v"]): r["z"]
        for r in grouped_zscore(df, ["g"], "v").collect()
    }
    # group a: mean 2, sample std 1
    assert got[("a", 1)] == -1.0 and got[("a", 3)] == 1.0 and got[("a", 2)] == 0.0
    # group b: mean 20, sample std sqrt(200)
    assert math.isclose(got[("b", 30)], round(10 / math.sqrt(200), 6))


def test_grouped_zscore_degenerate_groups_are_null(spark):
    df = spark.createDataFrame(
        [("solo", 7), ("flat", 5), ("flat", 5), ("flat", 5)],
        "g string, v long",
    )
    rows = grouped_zscore(df, ["g"], "v").collect()
    assert all(r["z"] is None for r in rows)  # n=1 and zero variance


def test_grouped_zscore_plan_broadcasts_stats(spark, sf_dir):
    from tests.test_plan_quality import plan_of

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("v")
    )
    plan = plan_of(grouped_zscore(docs, ["source"], "v"))
    # the stats side broadcasts; the row side must not sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_streaming_dedup_events_drops_injected_duplicates(spark, sf_dir):
    from hr_moderndatapipeline_spark.queries.streaming_queries import (
        q_streaming_dedup_events,
    )

    row = q_streaming_dedup_events(spark, sf_dir).collect()[0]
    expected = (
        load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000).count()
    )
    # every injected duplicate dropped, every original kept
    assert row["n_rows"] == row["n_distinct"] == expected


def test_salted_join_result_identical_and_smj(spark, sf_dir):
    from tests.test_plan_quality import plan_of

    from hr_moderndatapipeline_spark.operators.relational import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=4)
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    # result-identical (multiset) to the plain join
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0
    # the salt columns never leak
    assert "_fsalt" not in salted.columns and "_dsalt" not in salted.columns
    # plan: sort-merge on (key, salt); a broadcast would mean the
    # skew-spreading silently degenerated
    plan = plan_of(salted)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_salted_join_left_keeps_unmatched(spark):
    from hr_moderndatapipeline_spark.operators.relational import salted_join

    f = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    d = spark.createDataFrame([(1, "x"), (2, "y")], "dk long, w string")
    out = salted_join(f, d, "k", "dk", n_salts=3, how="left").collect()
    assert len(out) == 3
    unmatched = [r for r in out if r["k"] == 99][0]
    assert unmatched["w"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(f, d, "k", "dk", how="full")
