"""CUPED adjusted-means tests: hand-computed θ on a tiny cohort,
degenerate-variance fallback, and the unbiasedness sanity that a
constant covariate never moves the means."""

from __future__ import annotations


def test_cuped_hand_computed(spark):
    """Units (variant, x, y): θ and adjusted means checked against
    the closed form computed by hand in exact arithmetic."""
    from hr_moderndatapipeline_spark.operators.experiments import (
        cuped_adjusted_means,
    )

    rows = [(0, 1, 10), (0, 3, 30), (1, 2, 25), (1, 4, 45)]
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    out = {r["variant"]: r for r in cuped_adjusted_means(df, "variant", "x", "y").collect()}
    n, sx, sy = 4, 10, 110
    sxy = 1 * 10 + 3 * 30 + 2 * 25 + 4 * 45
    sx2 = 1 + 9 + 4 + 16
    theta = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert out[0]["theta"] == theta and out[1]["theta"] == theta
    mean_x = sx / n
    assert out[0]["mean_y_adjusted"] == (40 / 2) - theta * ((4 / 2) - mean_x)
    assert out[1]["mean_y_adjusted"] == (70 / 2) - theta * ((6 / 2) - mean_x)
    # CUPED preserves the pooled mean: weighted adjusted means == raw
    pooled_adj = sum(out[v]["mean_y_adjusted"] * out[v]["n_units"] for v in (0, 1))
    assert abs(pooled_adj - sy) < 1e-9


def test_cuped_degenerate_covariate(spark):
    """Constant x ⇒ zero variance ⇒ θ = 0 and adjusted == raw means
    (no divide-by-zero)."""
    from hr_moderndatapipeline_spark.operators.experiments import (
        cuped_adjusted_means,
    )

    rows = [(0, 5, 10), (0, 5, 20), (1, 5, 40)]
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    out = {r["variant"]: r for r in cuped_adjusted_means(df, "variant", "x", "y").collect()}
    assert out[0]["theta"] == 0.0
    assert out[0]["mean_y_adjusted"] == out[0]["mean_y"] == 15.0
    assert out[1]["mean_y_adjusted"] == out[1]["mean_y"] == 40.0
