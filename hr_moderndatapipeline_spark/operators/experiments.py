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


#: DCG position discounts for ranks 1..20, parts-per-million:
#: round_half_up(1e6 / log2(rank + 1)). A LITERAL table so every
#: engine shares the exact same integers — computing log2 on data
#: would put an engine-specific double into the canon. 20 entries
#: bounds the supported cutoff (k ≤ 20); deeper evaluation extends
#: the table, it does not compute logs at runtime.
DCG_DISCOUNT_PPM: dict[int, int] = {
    1: 1000000, 2: 630930, 3: 500000, 4: 430677, 5: 386853,
    6: 356207, 7: 333333, 8: 315465, 9: 301030, 10: 289065,
    11: 278943, 12: 270238, 13: 262650, 14: 255958, 15: 250000,
    16: 244651, 17: 239812, 18: 235409, 19: 231378, 20: 227670,
}


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Offline retrieval evaluation (TREC-style): per-query MRR@k,
    precision@k, recall@k and nDCG@k of a ranked ``run``
    (query, doc, rank — rank 1-based, unique per query) against
    graded relevance judgments ``qrels`` (query, doc, rel ≥ 0;
    rel > 0 means relevant). The offline-eval half of the BM25 /
    hybrid-RRF / ANN serving stack: every retrieval family needs a
    judged readout before a ranking change ships.

    Exactness contract: every metric is parts-per-million computed
    by integer floor division from exact BIGINT sufficient
    statistics — the DCG position discounts are the LITERAL
    ``DCG_DISCOUNT_PPM`` table (never log2 on data), so
    dcg/idcg are exact integer dot products and the readout hashes
    identically on any engine. Conventions: MRR uses the first
    relevant rank WITHIN the cutoff (0 if none); recall divides by
    the query's total relevant count (0 if the query has no
    judgments); nDCG divides the fixed-point DCG by the ideal DCG
    over the query's top-k judgments by grade (ties among equal
    grades don't affect the ideal value).

    Scale shape: run is per-query top-k (bounded rows per query);
    qrels is data-volume. One (query, doc) equi-join of the k-capped
    run against qrels, one groupBy per side on the query key, and
    one qrels-side rank window PARTITIONED BY query (bounded work
    per partition by the per-query judgment count) for the ideal
    DCG — no global windows, no driver movement.
    """
    if k > len(DCG_DISCOUNT_PPM):
        raise ValueError(
            f"k={k} exceeds the {len(DCG_DISCOUNT_PPM)}-entry literal "
            "discount table; extend DCG_DISCOUNT_PPM with "
            "round_half_up(1e6/log2(rank+1)) entries"
        )
    from pyspark.sql import Window

    disc = F.create_map(
        *[F.lit(x) for r in range(1, k + 1) for x in (r, DCG_DISCOUNT_PPM[r])]
    )
    q = F.col(query_col).alias("query_id")
    # run side, cut to k: joined grades (unjudged docs grade 0)
    r = (
        run.filter(F.col(rank_col) <= k)
        .select(q, F.col(doc_col).alias("doc_id"), F.col(rank_col).alias("rank"))
        .join(
            qrels.select(
                q, F.col(doc_col).alias("doc_id"), F.col(rel_col).alias("rel")
            ),
            ["query_id", "doc_id"],
            "left",
        )
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)).cast("bigint"))
    )
    got = r.groupBy("query_id").agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("hits_at_k"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first_rel"),
        F.sum(F.col("rel") * disc[F.col("rank")]).cast("bigint").alias("dcg_fixed"),
    )
    # qrels side: total relevant + ideal DCG over the top-k grades
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        qrels.select(
            q, F.col(doc_col).alias("doc_id"), F.col(rel_col).cast("bigint").alias("rel")
        )
        .filter(F.col("rel") > 0)
        .withColumn("_pos", F.row_number().over(wq))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rel"),
            F.sum(
                F.when(F.col("_pos") <= k, F.col("rel") * disc[F.col("_pos")])
                .otherwise(0)
            )
            .cast("bigint")
            .alias("idcg_fixed"),
        )
    )
    return (
        got.join(ideal, "query_id", "full")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("bigint").alias("n_rel"),
            F.coalesce("hits_at_k", F.lit(0)).cast("bigint").alias("hits_at_k"),
            F.coalesce(
                F.expr("CAST(1000000 DIV _first_rel AS BIGINT)"), F.lit(0)
            ).alias("mrr_ppm"),
            F.expr(
                f"CAST(1000000 * coalesce(hits_at_k, 0) DIV {k} AS BIGINT)"
            ).alias("precision_ppm"),
            F.coalesce(
                F.expr(
                    "CAST(1000000 * hits_at_k DIV nullif(n_rel, 0) AS BIGINT)"
                ),
                F.lit(0),
            ).alias("recall_ppm"),
            F.coalesce("dcg_fixed", F.lit(0)).cast("bigint").alias("dcg_fixed"),
            F.coalesce("idcg_fixed", F.lit(0)).cast("bigint").alias("idcg_fixed"),
            F.coalesce(
                F.expr(
                    "CAST(1000000 * coalesce(dcg_fixed, 0)"
                    " DIV nullif(idcg_fixed, 0) AS BIGINT)"
                ),
                F.lit(0),
            ).alias("ndcg_ppm"),
        )
    )


def calibration_ece(
    df: DataFrame,
    score_ppm_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability table + Expected Calibration Error (Naeini et al.
    2015 / Guo et al. 2017, public method) over fixed-width
    probability bins: the standard readout for "does this quality /
    relevance classifier's confidence mean anything" before its
    scores gate a 100 TB curation pass. Complements the r8 decile
    reliability curve (quality_calibration_curve), which bins by
    score RANK — ECE bins by score VALUE, the form the papers and
    model cards quote.

    Input: integer scores in parts-per-million (0..1e6 — the caller
    quantizes, keeping the canon engine-exact) and 0/1 labels.
    bin b covers [b/B, (b+1)/B) with BOTH edges clamped:
    ``greatest(least(score_ppm * B DIV 1e6, B-1), 0)`` — a
    contract-breaching negative score_ppm lands in bin 0 rather
    than minting a phantom negative-bin row that would skew the
    ECE denominator (the top edge was always clamped; the bottom
    clamp mirrors it).

    Exactness: per-bin accuracy and confidence are integer ppm floor
    divisions of BIGINT sums; the per-bin ECE contribution
    ``n_b·|acc_b − conf_b|`` reduces EXACTLY to
    ``|1e6·Σlabel − Σscore_ppm|`` (no per-row division at all), so
    ``ece_ppm = Σ_b |…| DIV N`` is a pure integer function of the
    sums. The ECE scalar is attached to every bin row via an
    unpartitioned window over the ≤``bins``-row aggregate — the
    schema-bounded-aggregate window class (same as the 64-bin
    histogram readouts), NOT a data-volume window.

    Scale shape: one map-side-combined groupBy on the bin key
    (≤``bins`` groups) — nothing else touches data volume.
    """
    from pyspark.sql import Window

    b = F.greatest(
        F.least(
            F.expr(f"CAST({score_ppm_col} AS BIGINT) * {bins} DIV 1000000"),
            F.lit(bins - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    per = (
        df.select(
            b.alias("bin"),
            F.col(label_col).cast("bigint").alias("_y"),
            F.col(score_ppm_col).cast("bigint").alias("_s"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_y").cast("bigint").alias("sum_label"),
            F.sum("_s").cast("bigint").alias("sum_score_ppm"),
        )
        .withColumn(
            "gap_fixed",
            F.abs(F.lit(1000000) * F.col("sum_label") - F.col("sum_score_ppm"))
            .cast("bigint"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "bin",
        "n",
        "sum_label",
        F.expr("CAST(1000000 * sum_label DIV n AS BIGINT)").alias("acc_ppm"),
        F.expr("CAST(sum_score_ppm DIV n AS BIGINT)").alias("conf_ppm"),
        "gap_fixed",
        F.sum("gap_fixed").over(w).cast("bigint").alias("_gap_total"),
        F.sum("n").over(w).cast("bigint").alias("_n_total"),
    ).select(
        "bin",
        "n",
        "sum_label",
        "acc_ppm",
        "conf_ppm",
        "gap_fixed",
        F.expr("CAST(_gap_total DIV _n_total AS BIGINT)").alias("ece_ppm"),
    )


def cohen_kappa(
    df: DataFrame, rater1_col: str, rater2_col: str
) -> DataFrame:
    """Cohen's kappa (1960, public method): chance-corrected
    agreement between two categorical raters —
    ``κ = (p_o − p_e) / (1 − p_e)`` — the standard readout for "do
    two labeling heuristics / annotator pools / model versions
    actually agree" before their labels train anything. One row out:
    n, raw agreement, expected agreement, and kappa, all integer ppm.

    Exactness: from the (rater1, rater2) contingency counts,
    ``κ = (n·agree − Σ_k n1_k·n2_k) / (n² − Σ_k n1_k·n2_k)`` in pure
    integers; products run in DECIMAL(38,0) (n² overflows BIGINT past
    n ≈ 3e9 — at 100 TB row counts that is reachable) and the final
    ppm division truncates toward ZERO on both engines (Spark ``DIV``
    natively; the oracle emulates with a sign-split CASE), so a
    negative kappa (worse-than-chance agreement) hashes identically.

    Scale shape: one map-side-combined groupBy on the class pair
    (≤ #classes² groups); everything after runs on that bounded
    contingency table — marginal products via two tiny re-aggregates
    and one 1-row cross join (the bounded 1-row-stats broadcast
    class).
    """
    cont = (
        df.select(
            F.col(rater1_col).cast("bigint").alias("_c1"),
            F.col(rater2_col).cast("bigint").alias("_c2"),
        )
        .groupBy("_c1", "_c2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    )
    tot = cont.agg(
        F.sum("_cnt").cast("bigint").alias("n"),
        F.sum(F.when(F.col("_c1") == F.col("_c2"), F.col("_cnt")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    m1 = cont.groupBy(F.col("_c1").alias("_k")).agg(
        F.sum("_cnt").cast("bigint").alias("_n1")
    )
    m2 = cont.groupBy(F.col("_c2").alias("_k")).agg(
        F.sum("_cnt").cast("bigint").alias("_n2")
    )
    pe = (
        m1.join(m2, "_k")
        .agg(
            F.sum(
                F.col("_n1").cast("decimal(38,0)")
                * F.col("_n2").cast("decimal(38,0)")
            ).alias("pe_num")
        )
    )
    return (
        tot.crossJoin(F.broadcast(pe))
        .withColumn("_nd", F.col("n").cast("decimal(38,0)"))
        .withColumn("_num", F.col("_nd") * F.col("agree") - F.col("pe_num"))
        .withColumn("_den", F.col("_nd") * F.col("_nd") - F.col("pe_num"))
        .select(
            "n",
            "agree",
            F.expr("CAST(1000000 * agree DIV n AS BIGINT)").alias("po_ppm"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * pe_num"
                " DIV (_nd * _nd) AS BIGINT)"
            ).alias("pe_ppm"),
            F.expr(
                "CASE WHEN _den = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * _num DIV _den"
                " AS BIGINT) END"
            ).alias("kappa_ppm"),
        )
    )


def fairness_readout(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Group-fairness audit (Hardt et al. 2016 equalized odds /
    demographic parity — public method) of a binary classifier over a
    protected/segment attribute: per-group confusion counts, selection
    rate, TPR and FPR in integer ppm, plus the cross-group max−min
    gaps (the numbers a model card quotes: demographic-parity gap,
    equalized-odds TPR/FPR gaps) attached to every row. A quality /
    routing classifier gating a 100 TB corpus needs this readout per
    source/language/domain before anyone trusts its cut.

    Exactness: confusion cells are exact BIGINT counts from ONE
    map-side-combined groupBy on the group key; rates are ppm floor
    divisions; degenerate groups (no positives / no negatives) emit
    NULL for the undefined rate and are EXCLUDED from that rate's gap
    (never conflated with an observed 0). Gap columns are min/max
    windows over the O(#groups) aggregate — the schema-bounded window
    class, not a data-volume relation.

    Scale shape: one groupBy on the group key over data volume;
    everything downstream runs on the bounded per-group table.
    """
    from pyspark.sql import Window

    y = F.col(label_col).cast("bigint")
    p = F.col(pred_col).cast("bigint")
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when((y == 1) & (p == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((y == 0) & (p == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((y == 1) & (p == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((y == 0) & (p == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    rated = per.select(
        "grp",
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(1000000 * (tp + fp) DIV n AS BIGINT)").alias(
            "selection_ppm"
        ),
        F.expr(
            "CAST(1000000 * tp DIV nullif(tp + fn, 0) AS BIGINT)"
        ).alias("tpr_ppm"),
        F.expr(
            "CAST(1000000 * fp DIV nullif(fp + tn, 0) AS BIGINT)"
        ).alias("fpr_ppm"),
    )
    w = Window.partitionBy()
    gap = lambda c: (  # noqa: E731 — max−min over the bounded group table
        F.max(c).over(w) - F.min(c).over(w)
    ).cast("bigint")
    return rated.select(
        "grp",
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        "selection_ppm",
        "tpr_ppm",
        "fpr_ppm",
        gap("selection_ppm").alias("parity_gap_ppm"),
        gap("tpr_ppm").alias("eo_tpr_gap_ppm"),
        gap("fpr_ppm").alias("eo_fpr_gap_ppm"),
    )


def stratified_ate(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Post-stratified average-treatment-effect readout (the standard
    covariate-adjustment companion to CUPED/DiD): per-stratum
    treated-vs-control mean difference, then the n-weighted average
    across strata — removes confounding from any categorical
    covariate the assignment correlates with.

    Exactness: per-stratum sums are exact BIGINT; the mean diff is
    quantized ONCE per stratum as
    ``diff_micro = (sum1·n0 − sum0·n1)·1e6 DIV (n1·n0)`` with the
    products in DECIMAL(38,0) (sum·n crosses 2^63 at 100 TB row
    counts — the rank_sum_auc lesson applied up front), and the
    overall readout is the pure-integer
    ``ate_micro = Σ n_s·diff_micro_s DIV Σ n_s`` over strata with
    BOTH arms present (single-arm strata report NULL diff and are
    excluded — post-stratification's standard positivity handling,
    never conflated with a zero effect). Quantization error is
    bounded by 1 micro-unit per stratum and identical on every
    engine. Truncation toward zero on both engines (sign-split CASE
    in the oracle — diffs can be negative).

    Scale shape: ONE map-side-combined groupBy on the stratum key;
    the ATE fold is a window over the O(#strata) aggregate (the
    bounded-aggregate window class). Returns per-stratum rows with
    the shared ate_micro on each."""
    from pyspark.sql import Window

    t = F.col(treat_col).cast("bigint")
    v = F.col(value_col).cast("bigint")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(F.lit(1) - t).cast("bigint").alias("n0"),
        F.sum(F.when(t == 1, v).otherwise(0)).cast("bigint").alias("sum1"),
        F.sum(F.when(t == 0, v).otherwise(0)).cast("bigint").alias("sum0"),
    )
    diff = per.withColumn(
        "diff_micro",
        F.expr(
            "CASE WHEN n1 > 0 AND n0 > 0 THEN"
            " CAST((CAST(sum1 AS DECIMAL(38,0)) * n0"
            "       - CAST(sum0 AS DECIMAL(38,0)) * n1) * 1000000"
            " DIV (CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)"
            " END"
        ),
    )
    w = Window.partitionBy()
    both = F.when(F.col("diff_micro").isNotNull(), F.col("n")).otherwise(0)
    contrib = F.when(
        F.col("diff_micro").isNotNull(),
        F.col("n").cast("decimal(38,0)") * F.col("diff_micro"),
    ).otherwise(F.lit(0).cast("decimal(38,0)"))
    return diff.withColumn(
        "_cn", F.sum(contrib).over(w).cast("decimal(38,0)")
    ).withColumn("_nn", F.sum(both).over(w).cast("decimal(38,0)")).select(
        "stratum",
        "n",
        "n1",
        "n0",
        "sum1",
        "sum0",
        "diff_micro",
        F.expr(
            "CAST(CASE WHEN _nn = 0 THEN 0 WHEN _cn >= 0 THEN _cn DIV _nn"
            " ELSE -((-_cn) DIV _nn) END AS BIGINT)"
        ).alias("ate_micro"),
    )
