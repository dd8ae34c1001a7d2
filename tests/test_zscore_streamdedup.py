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


def test_grouped_zscore_keeps_null_group_rows(spark):
    """A null group key is a group like any other: a plain equality
    join-back would silently drop every null-keyed row."""
    df = spark.createDataFrame(
        [(None, 1), (None, 3), ("a", 5), ("a", 7)],
        "g string, v long",
    )
    rows = grouped_zscore(df, ["g"], "v").collect()
    assert len(rows) == 4  # nothing dropped
    nulls = {r["v"]: r["z"] for r in rows if r["g"] is None}
    assert nulls[1] is not None and nulls[1] < 0 < nulls[3]


def test_grouped_zscore_rejects_reserved_columns(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1, 0)], "g string, v long, _n long")
    with _pytest.raises(ValueError, match="reserves"):
        grouped_zscore(df, ["g"], "v")


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


def test_salted_query_matches_plain_join_and_pins_smj(spark, sf_dir):
    """The driver query for the (round-4) salted_join operator:
    grouped revenue equals the plain join's, and the plan is
    sort-merge on the salted key — an auto-broadcast of the 8×
    replicated dim would silently degenerate the skew spreading."""
    from tests.test_plan_quality import plan_of

    from hr_moderndatapipeline_spark.queries.core import (
        q_salted_lineitem_order_revenue,
    )

    out = q_salted_lineitem_order_revenue(spark, sf_dir)
    assert "_salt" not in out.columns  # salt never leaks
    plan = plan_of(out)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    got = {r["o_orderpriority"]: r["n_lines"] for r in out.collect()}
    want = {r["o_orderpriority"]: r["count"] for r in plain.collect()}
    assert got == want


def test_lsh_index_probe_equals_one_shot(spark, sf_dir):
    """The persisted LSH index/probe split must return EXACTLY the
    one-shot ann_lsh result for the same parameters — same planes,
    same candidates, same prenormed fold scores, same ranks."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        ann_lsh,
        lsh_index,
        lsh_probe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    one_shot = ann_lsh(emb, queries, "vec_id", "embedding", k=5, dim=64)
    idx = lsh_index(emb, "vec_id", "embedding", dim=64)
    probed = lsh_probe(queries, idx, "vec_id", "embedding", k=5, dim=64)
    a = sorted(map(tuple, one_shot.collect()))
    b = sorted(map(tuple, probed.collect()))
    assert a == b and len(a) > 0
