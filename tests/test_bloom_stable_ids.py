"""Bloom semi-join reduction + stable global ids.

Bloom contract: zero false negatives (every inserted key passes),
false-positive rate near the configured fpp, probe stays pure JVM
expression (no Python eval in the plan), and the filtered-then-joined
result is identical to the unfiltered join.

Stable-id contract: ids are exactly 0..n-1, assigned in order_by
order, stable across invocations, and the plan never collapses to a
single partition (the global-window trap the operator exists to
avoid)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.bloom import (
    bloom_semi_filter,
    build_bloom,
    might_contain,
    optimal_params,
)
from hr_moderndatapipeline_spark.operators.relational import assign_stable_ids
from hr_moderndatapipeline_spark.sources.readers import load_table
from tests.test_plan_quality import plan_of


def test_optimal_params_sizing():
    n_bits, n_hashes = optimal_params(1000, 0.01)
    assert n_bits % 64 == 0
    assert n_bits >= 9000  # ~9.6 bits/key at 1% fpp
    assert 1 <= n_hashes <= 16
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(100, 1.5)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", expected_items=500, fpp=0.01)
    misses = keys.filter(~might_contain(bloom, F.col("k"))).count()
    assert misses == 0


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(0, 1000).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", expected_items=1000, fpp=0.01)
    absent = spark.range(1_000_000, 1_010_000).withColumnRenamed("id", "k")
    fp = absent.filter(might_contain(bloom, F.col("k"))).count()
    # 1% nominal; allow generous slack for hash variance
    assert fp / 10_000 < 0.03


def test_bloom_probe_is_pure_jvm_and_filters(spark, sf_dir):
    dim = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 3 == 0)
    fact = load_table(spark, sf_dir, "lineitem")
    filtered = bloom_semi_filter(
        fact, dim, "l_suppkey", "s_suppkey", expected_items=256
    )
    plan = plan_of(filtered)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the probe actually prunes: selective dim keeps a strict subset
    assert 0 < filtered.count() < fact.count()


def test_bloom_filtered_join_equals_plain_join(spark, sf_dir):
    dim = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    fact = load_table(spark, sf_dir, "lineitem")
    filtered = bloom_semi_filter(
        fact, dim, "l_suppkey", "s_suppkey", expected_items=256, fpp=0.05
    )
    plain = fact.join(dim, fact.l_suppkey == dim.s_suppkey).select("l_orderkey", "l_linenumber")
    with_bloom = filtered.join(dim, filtered.l_suppkey == dim.s_suppkey).select(
        "l_orderkey", "l_linenumber"
    )
    assert with_bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(with_bloom).count() == 0


def test_stable_ids_contiguous_in_key_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = assign_stable_ids(docs, ["doc_id"]).collect()
    n = len(out)
    assert sorted(r["stable_id"] for r in out) == list(range(n))
    by_key = sorted(out, key=lambda r: r["doc_id"])
    assert [r["stable_id"] for r in by_key] == list(range(n))


def test_stable_ids_parallel_plan_and_custom_partitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = assign_stable_ids(docs, ["doc_id"], num_partitions=3)
    plan = plan_of(out)
    # never the single-partition global window; offsets join broadcasts
    assert "SinglePartition" not in plan
    assert "BroadcastExchange" in plan
    rows = out.collect()
    assert sorted(r["stable_id"] for r in rows) == list(range(len(rows)))


def test_stable_ids_requires_order_key(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        assign_stable_ids(docs, [])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_bloom_no_false_negatives_random_sets(spark, seed):
    """Randomized key sets (different density/offset per seed):
    membership of every inserted key is an invariant, not a property
    of the arithmetic sequence in the basic test."""
    keys = (
        spark.range(0, 20_000)
        .selectExpr(f"xxhash64(id, {seed}) as k")
        .filter(F.pmod(F.col("k"), 7) == 0)
    )
    n = keys.count()
    bloom = build_bloom(keys, "k", expected_items=max(n, 1), fpp=0.02)
    assert keys.filter(~might_contain(bloom, F.col("k"))).count() == 0


@pytest.mark.parametrize("shuffle_parts", [1, 3, 11])
def test_stable_ids_invariant_to_input_partitioning(spark, sf_dir, shuffle_parts):
    """The assigned ids depend only on the data and order_by — never
    on how the input happened to be partitioned (the failure mode of
    monotonically_increasing_id / zipWithIndex-without-sort)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .repartition(shuffle_parts)
    )
    got = {
        r["doc_id"]: r["stable_id"]
        for r in assign_stable_ids(docs, ["doc_id"]).collect()
    }
    expected = {d: i for i, d in enumerate(sorted(got))}
    assert got == expected


def test_bloom_json_roundtrip(spark):
    from hr_moderndatapipeline_spark.operators.bloom import (
        bloom_from_json,
        bloom_to_json,
    )

    keys = spark.range(0, 300).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", expected_items=300)
    revived = bloom_from_json(bloom_to_json(bloom))
    assert keys.filter(~might_contain(revived, F.col("k"))).count() == 0
    with pytest.raises(ValueError):
        bloom_from_json('{"words": []}')


def test_bloom_cross_width_keys_no_false_negatives(spark):
    """xxhash64 is type-sensitive; the string-canonicalized hash must
    make an int-keyed build match a bigint-keyed probe (the dim-int /
    fact-bigint case that silently emptied the join before)."""
    dim = spark.range(0, 100).select(F.col("id").cast("int").alias("k"))
    fact = spark.range(0, 100).select(F.col("id").cast("bigint").alias("k"))
    filtered = bloom_semi_filter(fact, dim, "k", "k", expected_items=100)
    assert filtered.count() == 100  # every key IS in the dim


def test_bloom_int_dim_double_fact_no_false_negatives(spark):
    """ADVICE r5: v2 derived the canon from the dim side only, so an
    int dim ('5') probed by a double fact ('5.0') missed every member
    key and silently emptied the join Spark would happily coerce
    (5 == 5.0). v3's shared numeric canon must keep them equal."""
    dim = spark.range(0, 200).select(F.col("id").cast("int").alias("k"))
    fact = spark.range(0, 200).select(F.col("id").cast("double").alias("k"))
    filtered = bloom_semi_filter(fact, dim, "k", "k", expected_items=200)
    assert filtered.count() == 200  # every key IS in the dim
    # decimal fact against the same int-built filter
    fact_dec = spark.range(0, 200).select(F.col("id").cast("decimal(10,2)").alias("k"))
    assert bloom_semi_filter(fact_dec, dim, "k", "k", expected_items=200).count() == 200


def test_bloom_edge_numeric_keys_no_false_negatives(spark):
    """v4 double-canon edge values: ±0.0 fold together, NaN/±Inf and
    beyond-2^53 integrals canon deterministically — membership of
    every inserted key must hold for all of them."""
    vals = [
        0.0, -0.0, 1.5, -1.5, float(2**53) + 2.0, 1e300,
        float("inf"), float("-inf"), float("nan"),
    ]
    dim = spark.createDataFrame([(v,) for v in vals], "k double")
    bloom = build_bloom(dim, "k", expected_items=16)
    assert dim.filter(~might_contain(bloom, F.col("k"))).count() == 0
    # -0.0 and +0.0 are join-equal: a +0.0-only filter accepts -0.0
    only_pos = spark.createDataFrame([(0.0,)], "k double")
    b2 = build_bloom(only_pos, "k", expected_items=4)
    neg = spark.createDataFrame([(-0.0,)], "k double")
    assert neg.filter(might_contain(b2, F.col("k"))).count() == 1


def test_bloom_probe_kind_mismatch_raises(spark):
    """Irreconcilable canon families (numeric filter, timestamp or
    string probe) must raise loudly instead of silently returning an
    empty superset-of-nothing."""
    from hr_moderndatapipeline_spark.operators.bloom import filter_by_bloom

    dim = spark.range(0, 50).withColumnRenamed("id", "k")
    bloom = build_bloom(dim, "k", expected_items=50)
    ts = spark.range(0, 5).select(F.timestamp_seconds(F.col("id")).alias("k"))
    with pytest.raises(TypeError, match="canonicalizes"):
        filter_by_bloom(ts, bloom, F.col("k"))
    strs = spark.range(0, 5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(TypeError, match="canonicalizes"):
        filter_by_bloom(strs, bloom, F.col("k"))


def test_bloom_timestamp_keys_survive_session_timezone_change(spark):
    """Timestamp keys hash through epoch micros, not their session-tz
    string form: a filter built under UTC must still accept the same
    instants when probed under a different session timezone."""
    df = spark.range(0, 50).select(
        F.timestamp_seconds(F.col("id") * 3600).alias("ts")
    )
    bloom = build_bloom(df, "ts", expected_items=50)
    assert bloom["key_kind"] == "timestamp"
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        misses = df.filter(~might_contain(bloom, F.col("ts"))).count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert misses == 0


def test_bloom_rejects_unversioned_filters(spark):
    from hr_moderndatapipeline_spark.operators.bloom import bloom_from_json

    legacy = {"words": [0] * 4, "n_bits": 256, "n_hashes": 3}  # pre-format dict
    with pytest.raises(ValueError, match="format"):
        might_contain({**legacy, "format": 1}, F.lit(1))
    import json as _json

    with pytest.raises(ValueError):
        bloom_from_json(_json.dumps(legacy))


def test_large_bloom_uses_broadcast_not_literal(spark):
    """Big filters must ship via broadcast join, not a plan literal
    serialized into every task."""
    from hr_moderndatapipeline_spark.operators.bloom import filter_by_bloom

    keys = spark.range(0, 2000).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", expected_items=2000)
    out = filter_by_bloom(keys, bloom, F.col("k"), literal_max_words=1)
    plan = plan_of(out)
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert out.count() == 2000  # no false negatives through either path
    assert out.columns == ["k"]
