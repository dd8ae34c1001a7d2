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


def test_benford_digit_profile(spark):
    """Hand-checkable corpus: digits of [1, 12, 19, 2, 30, -5, 0]
    → positives only: leading digits 1,1,1,2,3."""
    from hr_moderndatapipeline_spark.operators.diagnostics import (
        BENFORD_PPM,
        benford_digit_profile,
    )

    df = spark.createDataFrame(
        [(1,), (12,), (19,), (2,), (30,), (-5,), (0,)], "amt long"
    )
    rows = {r["digit"]: r for r in benford_digit_profile(df, "amt").collect()}
    # ADVICE r6: every digit 1-9 emits a row — zero-count digits ARE
    # the anomaly signal the screen exists for.
    assert set(rows) == set(range(1, 10))
    assert rows[1]["cnt"] == 3 and rows[2]["cnt"] == 1 and rows[3]["cnt"] == 1
    assert rows[1]["observed_ppm"] == 600000  # 3/5 exactly
    assert rows[1]["benford_ppm"] == BENFORD_PPM[1]
    assert rows[1]["deviation_ppm"] == 600000 - BENFORD_PPM[1]
    for d in range(4, 10):
        assert rows[d]["cnt"] == 0
        assert rows[d]["observed_ppm"] == 0
        assert rows[d]["deviation_ppm"] == -BENFORD_PPM[d]


def test_benford_digit_profile_no_positive_amounts(spark):
    """Zero positive amounts: the 9-digit spine still emits, with
    0 ppm everywhere (no division by the zero total on either
    engine)."""
    from hr_moderndatapipeline_spark.operators.diagnostics import (
        benford_digit_profile,
    )

    df = spark.createDataFrame([(-5,), (0,)], "amt long")
    rows = {r["digit"]: r for r in benford_digit_profile(df, "amt").collect()}
    assert set(rows) == set(range(1, 10))
    assert all(r["cnt"] == 0 and r["observed_ppm"] == 0 for r in rows.values())


def test_contingency_chisq_independence(spark):
    """A perfectly independent 2x2 grid has expected == observed and
    zero chi-square in every cell."""
    from hr_moderndatapipeline_spark.operators.diagnostics import contingency_chisq

    rows = [(a, b) for a in ("x", "y") for b in ("p", "q") for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = contingency_chisq(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["observed"] == 10
        assert r["expected_micro"] == 10_000_000
        assert r["chisq_cell"] == 0.0


def test_contingency_chisq_marginals(spark):
    """Expected counts reproduce row_tot*col_tot/n: a 3-vs-1 skewed
    grid gets fractional micro expectations."""
    from hr_moderndatapipeline_spark.operators.diagnostics import contingency_chisq

    rows = [("x", "p")] * 3 + [("y", "q")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["a"], r["b"]): r for r in contingency_chisq(df, "a", "b").collect()}
    # E(x,p) = 3*3/4 = 2.25 → 2_250_000 micro
    assert out[("x", "p")]["expected_micro"] == 2_250_000
    assert out[("y", "q")]["expected_micro"] == 250_000
