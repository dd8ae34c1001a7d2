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


def rank_sum_auc(
    df: DataFrame, id_col: str, score_col: str, label_col: str
) -> DataFrame:
    """Exact tie-averaged ROC-AUC via the Mann–Whitney rank-sum
    identity — the ONLY formulation that scales: pairwise
    pos×neg comparison is O(n²), the rank sum is two global
    rankings + one aggregate.

    Ties are handled EXACTLY without per-group averaging (which
    would need a cumulative window over the O(#distinct scores)
    relation — a scaling relation, so banned): rank twice with
    OPPOSITE id tie-breaks. With ranks by (score, id asc),
    U_up = R⁺ − np(np+1)/2 counts {score_p > score_n} plus the tied
    pairs the id-order resolves upward; with (score, id desc) the
    tied pairs resolve the other way, so

        U_up + U_dn = 2·U_strict + T  =  2·U_tie-averaged

    exactly, in BIGINT. Both rankings use ``assign_stable_ids``
    (range-partitioned two-pass rank — no single-partition window);
    the two ranked frames union into ONE map-side-combinable
    aggregate, no join anywhere.

    Returns one row: (n_pos, n_neg, u2, auc_ppm, gini_ppm) with
    ``auc_ppm = u2·1e6 DIV (2·np·nn)``. The ×1e6 scaling runs in
    DECIMAL(38,0): u2 ≤ 2·np·nn, so a BIGINT ``u2·1e6`` would wrap
    SILENTLY (non-ANSI) once np·nn exceeds ~4.6e12 — e.g. ~2.2M pos
    × 2.2M neg, squarely reachable at 100 TB (ADVICE r10). In
    DECIMAL(38,0) the product is exact to np·nn < 4.6e31; only the
    final ≤1e6-valued quotient returns to BIGINT."""
    from hr_moderndatapipeline_spark.operators.relational import (
        assign_stable_ids,
    )

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_sc"),
        F.col(label_col).cast("bigint").alias("_y"),
    ).withColumn("_negid", -F.col("_id"))
    up = assign_stable_ids(base, ["_sc", "_id"], id_col="_sid").select(
        "_y", (F.col("_sid") + 1).alias("_rk"), F.lit("up").alias("_side")
    )
    dn = assign_stable_ids(base, ["_sc", "_negid"], id_col="_sid").select(
        "_y", (F.col("_sid") + 1).alias("_rk"), F.lit("dn").alias("_side")
    )
    stats = up.unionByName(dn).agg(
        F.sum(F.when((F.col("_side") == "up") & (F.col("_y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when((F.col("_side") == "up") & (F.col("_y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neg"),
        F.sum(F.when((F.col("_side") == "up") & (F.col("_y") == 1), F.col("_rk")))
        .cast("bigint")
        .alias("_rp_up"),
        F.sum(F.when((F.col("_side") == "dn") & (F.col("_y") == 1), F.col("_rk")))
        .cast("bigint")
        .alias("_rp_dn"),
    )
    u2 = (
        F.col("_rp_up") + F.col("_rp_dn") - F.col("n_pos") * (F.col("n_pos") + 1)
    )
    return stats.select(
        "n_pos",
        "n_neg",
        u2.alias("u2"),
        F.expr(
            "CAST(CAST(_rp_up + _rp_dn - n_pos * (n_pos + 1) AS DECIMAL(38,0))"
            " * 1000000 DIV (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)"
            " AS BIGINT)"
        ).alias("auc_ppm"),
        F.expr(
            "CAST(CAST(_rp_up + _rp_dn - n_pos * (n_pos + 1) AS DECIMAL(38,0))"
            " * 1000000 DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
            " - 1000000 AS BIGINT)"
        ).alias("gini_ppm"),
    )


def did_readout(
    per_row: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences estimate from row-level
    (treat, post, integer value) observations: the 2×2 cell means
    from ONE map-side-combinable conditional aggregate (no window,
    no join, no shuffle beyond the single 1-row gather), then
        DiD = (m_treat_post − m_treat_pre) − (m_ctrl_post − m_ctrl_pre).
    Cell sums are exact BIGINT; the four means and the estimate are
    fixed double expressions over them — identical on any engine.

    Returns one row: per-cell counts + the DiD point estimate in the
    value column's own integer unit (double)."""
    t, p, v = F.col(treat_col), F.col(post_col), F.col(value_col)

    def _cell(tv: int, pv: int, agg) -> object:
        return agg(F.when((t == tv) & (p == pv), v))

    cells = per_row.agg(
        F.count(F.when((t == 1) & (p == 0), 1)).cast("bigint").alias("n_treat_pre"),
        F.count(F.when((t == 1) & (p == 1), 1)).cast("bigint").alias("n_treat_post"),
        F.count(F.when((t == 0) & (p == 0), 1)).cast("bigint").alias("n_ctrl_pre"),
        F.count(F.when((t == 0) & (p == 1), 1)).cast("bigint").alias("n_ctrl_post"),
        _cell(1, 0, F.sum).cast("bigint").alias("_s_tp0"),
        _cell(1, 1, F.sum).cast("bigint").alias("_s_tp1"),
        _cell(0, 0, F.sum).cast("bigint").alias("_s_cp0"),
        _cell(0, 1, F.sum).cast("bigint").alias("_s_cp1"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    did = (
        mean("_s_tp1", "n_treat_post") - mean("_s_tp0", "n_treat_pre")
    ) - (mean("_s_cp1", "n_ctrl_post") - mean("_s_cp0", "n_ctrl_pre"))
    return cells.select(
        "n_treat_pre",
        "n_treat_post",
        "n_ctrl_pre",
        "n_ctrl_post",
        did.alias("did_estimate"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    variant_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group —
    the distribution-free "did the treatment change the SHAPE of
    this metric?" test, one D per ``group_col`` value (e.g. per
    event type). ``variant_col`` must be 0/1.

    ENTIRELY integer arithmetic: at every observed value v,
    D's numerator is |cum₁(v)·n₀ − cum₀(v)·n₁| (BIGINT — the
    cross-multiplied ECDF difference), maximized per group;
    ``ks_ppm = max·1e6 DIV (n₁·n₀)``, with the ×1e6 scaling in
    DECIMAL(38,0): ks_num ≤ n₁·n₀, so a BIGINT ``ks_num·1e6`` would
    wrap silently once n₁·n₀ exceeds ~9.2e12 — ~3M vs 3M subjects,
    reachable at 100 TB (ADVICE r10). DECIMAL keeps the product
    exact to n₁·n₀ < 9.2e31. No doubles anywhere, so the statistic
    is exact on any engine.

    Scale shape: one map-side-combinable (group, value) aggregate;
    the ECDF cumulative window is partitioned BY GROUP over that
    aggregate — its per-group row count is bounded by the DISTINCT
    quantized value domain (milli-quantized metrics: fixed by the
    metric's range, not the row count), the contingency-aggregate
    window class. Subjects are never windowed row-wise."""
    from pyspark.sql import Window

    g = F.col(group_col)
    v1 = (F.col(variant_col) == 1).cast("bigint")
    per_value = df.groupBy(g.alias("_g"), F.col(value_col).alias("_v")).agg(
        F.sum(v1).alias("_c1"),
        F.sum(1 - v1).alias("_c0"),
    )
    wcum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("_g")
    cum = per_value.select(
        "_g",
        F.sum("_c1").over(wcum).alias("_cum1"),
        F.sum("_c0").over(wcum).alias("_cum0"),
        F.sum("_c1").over(wtot).cast("bigint").alias("_n1"),
        F.sum("_c0").over(wtot).cast("bigint").alias("_n0"),
    )
    return (
        cum.groupBy(F.col("_g").alias(group_col), "_n1", "_n0")
        .agg(
            F.max(
                F.abs(F.col("_cum1") * F.col("_n0") - F.col("_cum0") * F.col("_n1"))
            )
            .cast("bigint")
            .alias("ks_num")
        )
        .select(
            group_col,
            F.col("_n1").alias("n_treat"),
            F.col("_n0").alias("n_ctrl"),
            "ks_num",
            F.expr(
                "CAST(CAST(ks_num AS DECIMAL(38,0)) * 1000000"
                " DIV greatest(CAST(_n1 AS DECIMAL(38,0)) * _n0, 1)"
                " AS BIGINT)"
            ).alias("ks_ppm"),
        )
    )
