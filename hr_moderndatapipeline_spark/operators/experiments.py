"""Experimentation analytics: variance-reduced A/B readouts.

CUPED (Controlled-experiment Using Pre-Experiment Data; Deng,
Xu, Kohavi, Walker — WSDM 2013) is the standard industry variance
reducer: adjust each unit's experiment-period metric y by its
pre-period covariate x, ``y_adj = y − θ·(x − mean(x))`` with
``θ = cov(x, y) / var(x)``, shrinking the readout's variance by the
squared x↔y correlation without biasing the treatment effect (θ is
pooled across variants, and randomization makes x independent of
assignment).

Exactness contract (the repo's integer-canon discipline): per-unit x
and y arrive as exact integers (caller quantizes — milli-units for
the event `value` signal); every SUM is an exact BIGINT; θ and the
adjusted means are derived doubles computed by ONE fixed expression
tree from those sums, so they hash identically on any engine.
Integer bound: Σx·y must stay under 2^63 — at milli quantization
that holds through ~10⁶ units × (5·10⁷)² per-unit products; beyond
that, quantize coarser (the bound is the caller's, documented, not a
silent overflow).

Shuffle ledger: one groupBy on the unit (caller side), one groupBy
on the variant (O(#variants) rows), pooled statistics as
unpartitioned window sums OVER THE VARIANT AGGREGATE — never a join,
never a second pass over units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjusted_means(
    per_unit: DataFrame, variant_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-variant CUPED-adjusted means from a per-unit frame of
    exact-integer (variant, x, y) rows.

    Returns one row per variant: unit count, the exact integer sums
    (the auditable sufficient statistics), the raw mean, θ (pooled,
    same value on every row), and the adjusted mean
    ``mean_y_v − θ·(mean_x_v − mean_x_pooled)``. Degenerate pre-period
    (zero variance) yields θ = 0 — CUPED degrades to the raw mean
    instead of dividing by zero."""
    from pyspark.sql import Window

    v = per_unit.groupBy(variant_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(x_col).cast("bigint").alias("sum_x"),
        F.sum(y_col).cast("bigint").alias("sum_y"),
        F.sum(F.col(x_col) * F.col(y_col)).cast("bigint").alias("sum_xy"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("bigint").alias("sum_x2"),
    )
    w = Window.partitionBy()
    pooled = (
        v.withColumn("_n", F.sum("n_units").over(w))
        .withColumn("_sx", F.sum("sum_x").over(w))
        .withColumn("_sy", F.sum("sum_y").over(w))
        .withColumn("_sxy", F.sum("sum_xy").over(w))
        .withColumn("_sx2", F.sum("sum_x2").over(w))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731 — local cast shorthand
    var_x = d("_n") * d("_sx2") - d("_sx") * d("_sx")
    theta = F.when(
        var_x > 0, (d("_n") * d("_sxy") - d("_sx") * d("_sy")) / var_x
    ).otherwise(F.lit(0.0))
    mean_y_v = d("sum_y") / d("n_units")
    mean_x_v = d("sum_x") / d("n_units")
    mean_x_pooled = d("_sx") / d("_n")
    return pooled.select(
        F.col(variant_col),
        "n_units",
        "sum_x",
        "sum_y",
        theta.alias("theta"),
        mean_y_v.alias("mean_y"),
        (mean_y_v - theta * (mean_x_v - mean_x_pooled)).alias("mean_y_adjusted"),
    )
