"""Pre-flight skew and partition diagnostics.

At 100 TB the difference between a 40-minute and a 14-hour join is
usually one hot key. These helpers answer "is this key skewed, and
how badly?" BEFORE the shuffle is paid for, with bounded driver
movement: everything aggregates distributively and only O(top) /
O(#partitions) summary rows ever reach the driver.

The outputs plug straight into the repo's mitigations: a
``recommended_salt`` > 1 feeds ``operators/skewjoin.salted_join``'s
salt factor; a lopsided ``partition_size_report`` motivates
``repartitionByRange`` or AQE skew-split thresholds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> dict:
    """Frequency profile of a prospective shuffle/join key.

    One groupBy shuffle on the key builds per-key counts; a second
    aggregation over those counts (O(#keys) rows, still distributed)
    yields the skew summary. Only ``top`` heavy-hitter rows and one
    summary row are collected.

    Returns: n_keys, total_rows, max_count, avg_count,
    skew_factor (max/avg), p50/p90/p99 of per-key counts
    (approximate — this is a diagnostic, not a result),
    top_keys [{key…, count}], and recommended_salt = ceil(max_count
    / target_rows_per_task), clamped to >= 1 — the salt factor at
    which the hottest key's rows spread into tasks of the target
    size."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__cnt").alias("total_rows"),
        F.max("__cnt").alias("max_count"),
        F.percentile_approx("__cnt", [0.5, 0.9, 0.99], 10_000).alias("pcts"),
    ).first()
    top_rows = counts.orderBy(F.col("__cnt").desc(), *keys).limit(top).collect()
    n_keys = summary["n_keys"]
    total = summary["total_rows"] or 0
    mx = summary["max_count"] or 0
    avg = (total / n_keys) if n_keys else 0.0
    return {
        "keys": keys,
        "n_keys": n_keys,
        "total_rows": total,
        "max_count": mx,
        "avg_count": avg,
        "skew_factor": (mx / avg) if avg else 0.0,
        "p50_count": summary["pcts"][0] if n_keys else None,
        "p90_count": summary["pcts"][1] if n_keys else None,
        "p99_count": summary["pcts"][2] if n_keys else None,
        "top_keys": [
            {**{k: r[k] for k in keys}, "count": r["__cnt"]} for r in top_rows
        ],
        "recommended_salt": max(1, -(-mx // target_rows_per_task)),
    }


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    top: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> dict:
    """Both sides' skew profiles plus the join's worst-case task:
    for the shared heavy hitters, the output rows a single shuffle
    task would materialize (left_count × right_count on that key) —
    the number that actually decides whether the join finishes.
    Driver movement: 2 summary rows + 2×top key rows."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    lrep = key_skew_report(left, keys, top, target_rows_per_task)
    rrep = key_skew_report(right, keys, top, target_rows_per_task)
    rmap = {tuple(k[c] for c in keys): k["count"] for k in rrep["top_keys"]}
    hot = []
    for k in lrep["top_keys"]:
        kt = tuple(k[c] for c in keys)
        if kt in rmap:
            hot.append(
                {
                    **{c: k[c] for c in keys},
                    "left_count": k["count"],
                    "right_count": rmap[kt],
                    "output_rows": k["count"] * rmap[kt],
                }
            )
    hot.sort(key=lambda h: -h["output_rows"])
    return {
        "keys": keys,
        "left": lrep,
        "right": rrep,
        "hot_join_keys": hot,
        "max_task_output_rows": hot[0]["output_rows"] if hot else 0,
    }


def partition_size_report(df: DataFrame) -> dict:
    """Rows per physical partition AS CURRENTLY PARTITIONED — the
    post-shuffle balance check. Distributive count keyed by
    ``spark_partition_id()``; O(#partitions) rows to the driver.
    Empty partitions (pure scheduling overhead) are reported —
    ``n_partitions`` counts only non-empty ones, ``rdd_partitions``
    the physical total."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = sorted((r["cnt"] for r in rows), reverse=True)
    total = sum(counts)
    return {
        "rdd_partitions": df.rdd.getNumPartitions(),
        "n_partitions": len(counts),
        "total_rows": total,
        "max_rows": counts[0] if counts else 0,
        "min_rows": counts[-1] if counts else 0,
        "imbalance": (counts[0] * len(counts) / total) if total else 0.0,
    }


def histogram_drift(hist_a: DataFrame, hist_b: DataFrame) -> DataFrame:
    """Distribution drift between two snapshots of the same metric,
    as L1 / total-variation distance over matched equi-width
    histograms (operators/sketch.histogram_build) — the monitoring
    primitive behind "did this feed's shape change since yesterday?"

    Integer-exact and scale-safe: each side is first normalized to
    truncated parts-per-million shares (``cnt * 1e6 DIV n`` — the
    intermediate stays under 2^63 for any n up to 10^12 rows, where
    the naive cross-product form ``cnt_a*n_b`` overflows at ~10^9),
    then the per-bin absolute differences are summed.  All math over
    O(nbins) rows; the inputs are already bounded sketch state, so
    drift over a 100 TB feed costs two histogram scans and pennies
    here.  tv_ppm is in [0, 1e6]: 0 = identical shapes, 1e6 =
    disjoint support."""
    a = hist_a.select("bin_idx", F.col("cnt").alias("cnt_a"))
    b = hist_b.select("bin_idx", F.col("cnt").alias("cnt_b"))
    j = (
        a.join(b, "bin_idx", "full_outer")
        .select(
            "bin_idx",
            F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # over the O(nbins) histogram rows only
    shares = j.select(
        F.sum("cnt_a").over(w).cast("bigint").alias("n_a"),
        F.sum("cnt_b").over(w).cast("bigint").alias("n_b"),
        "cnt_a",
        "cnt_b",
    ).select(
        "n_a",
        "n_b",
        # greatest(n,1): an empty side reads as all-zero shares
        # instead of NULL-poisoning the group keys (ANSI-safe, too)
        F.expr("cnt_a * 1000000 DIV greatest(n_a, 1)").alias("p_a"),
        F.expr("cnt_b * 1000000 DIV greatest(n_b, 1)").alias("p_b"),
    )
    return shares.groupBy("n_a", "n_b").agg(
        F.sum(F.abs(F.col("p_a") - F.col("p_b"))).cast("bigint").alias("l1_ppm"),
        F.expr("CAST(sum(abs(p_a - p_b)) DIV 2 AS BIGINT)").alias("tv_ppm"),
    )


def histogram_psi(
    hist_a: DataFrame, hist_b: DataFrame, nbins: int
) -> DataFrame:
    """Population stability index between two matched equi-width
    histograms — the industry-standard drift scalar beside
    ``histogram_drift``'s L1/TV: PSI = Σ_bins (pₐ−p_b)·ln(pₐ/p_b)
    (each term ≥ 0), with half-count Laplace smoothing
    p = (cnt + 0.5)/(n + nbins·0.5) so empty bins never produce
    ln(0). Rule-of-thumb readout: <0.1 stable, 0.1–0.25 drifting,
    >0.25 shifted.

    Exactness: the per-bin term quantizes to integer MICRO-nats
    (``floor(x·1e6 + 0.5)`` — the DSIR/bigram-LM idiom) BEFORE the
    sum, so the total is an exact BIGINT under any accumulation
    order; the doubles inside each term come from identical count
    ratios on every engine. All math over O(nbins) sketch rows."""
    a = hist_a.select("bin_idx", F.col("cnt").alias("cnt_a"))
    b = hist_b.select("bin_idx", F.col("cnt").alias("cnt_b"))
    j = a.join(b, "bin_idx", "full_outer").select(
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # over the O(nbins) histogram rows only
    half_bins = float(nbins) * 0.5
    shares = j.select(
        F.sum("cnt_a").over(w).cast("bigint").alias("n_a"),
        F.sum("cnt_b").over(w).cast("bigint").alias("n_b"),
        "cnt_a",
        "cnt_b",
    )
    pa = (F.col("cnt_a").cast("double") + F.lit(0.5)) / (
        F.col("n_a").cast("double") + F.lit(half_bins)
    )
    pb = (F.col("cnt_b").cast("double") + F.lit(0.5)) / (
        F.col("n_b").cast("double") + F.lit(half_bins)
    )
    term_micro = F.floor(
        (pa - pb) * F.log(pa / pb) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("bigint")
    return shares.groupBy("n_a", "n_b").agg(
        F.sum(term_micro).cast("bigint").alias("psi_micro_nat")
    )


def join_cardinality_report(
    left: DataFrame, right: DataFrame, keys: "list[str] | str"
) -> DataFrame:
    """Predict an equi-join's output size BEFORE paying for it: for
    inner equi-joins, |L JOIN R| = sum over shared keys of
    cnt_l * cnt_r — computable exactly from the two per-key count
    aggregates (O(#keys) rows each), i.e. two cheap pre-aggregations
    instead of the join itself.  The companion to key_skew_report:
    ``max_key_pairs`` is the single worst key's output (the task that
    will straggle), ``join_rows`` the total to provision for.

    One row out: left_rows, right_rows, left_keys, right_keys,
    shared_keys, join_rows, max_key_pairs. All exact integers (this
    is not an estimate for inner equi-joins — it is the answer)."""
    kcols = [keys] if isinstance(keys, str) else list(keys)
    lc = left.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_cl"))
    rc = right.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_cr"))
    j = lc.join(rc, kcols, "full_outer").select(
        F.coalesce("_cl", F.lit(0)).cast("bigint").alias("_cl"),
        F.coalesce("_cr", F.lit(0)).cast("bigint").alias("_cr"),
    )
    return j.agg(
        F.coalesce(F.sum("_cl"), F.lit(0)).cast("bigint").alias("left_rows"),
        F.coalesce(F.sum("_cr"), F.lit(0)).cast("bigint").alias("right_rows"),
        F.coalesce(F.sum(F.when(F.col("_cl") > 0, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("left_keys"),
        F.coalesce(F.sum(F.when(F.col("_cr") > 0, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("right_keys"),
        F.coalesce(
            F.sum(F.when((F.col("_cl") > 0) & (F.col("_cr") > 0), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("shared_keys"),
        F.coalesce(F.sum(F.col("_cl") * F.col("_cr")), F.lit(0))
        .cast("bigint")
        .alias("join_rows"),
        F.coalesce(F.max(F.col("_cl") * F.col("_cr")), F.lit(0))
        .cast("bigint")
        .alias("max_key_pairs"),
    )


# ── statistical data-quality profiles ──

#: Benford expected first-digit shares, parts-per-million. Computed
#: once here (log10(1 + 1/d)) and injected as LITERALS into both
#: engines, so neither side does any floating-point log.
BENFORD_PPM = {
    d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)
}


def benford_digit_profile(df: DataFrame, amount_col) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    amount column vs Benford's law — the classic bulk anomaly /
    fabricated-data screen for financial facts. Emits one row per
    digit 1-9: observed count, observed ppm (integer-exact
    ``1e6*cnt DIV total``), expected Benford ppm (literal), and the
    signed deviation.

    The leading digit is taken from the decimal string of the BIGINT
    amount — pure string/int ops, identical on every engine (no
    log10 on data). Non-positive amounts are excluded (Benford is
    defined on positive magnitudes). One map-side-combinable groupBy
    on 9 keys, LEFT-JOINED onto a 9-digit literal spine (the
    dq_rule_summary pattern, ADVICE r6) so a digit with ZERO
    observations still emits its row — the zero-count row IS the
    anomaly signal a Benford screen exists to surface; the ppm
    normalization is an unpartitioned window over that O(9)
    aggregate, never the facts (the domain_mix_weights pattern — no
    nested-loop broadcast)."""
    from pyspark.sql import Window

    digits = (
        df.select(F.col(amount_col).cast("bigint").alias("_amt"))
        .filter(F.col("_amt") > 0)
        .select(F.substring(F.col("_amt").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    observed = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    spine = df.sparkSession.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    counts = spine.join(observed, "digit", "left").select(
        "digit", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")
    )
    expected = F.create_map(
        *[x for d, ppm in BENFORD_PPM.items() for x in (F.lit(d), F.lit(ppm))]
    )
    return (
        counts.withColumn("_total", F.sum("cnt").over(Window.partitionBy()))
        .select(
            "digit",
            "cnt",
            # total = 0 (no positive amounts at all) must not divide:
            # report 0 ppm on every spine row, same CASE in the oracle.
            F.expr(
                "CAST(CASE WHEN _total = 0 THEN 0 "
                "ELSE 1000000 * cnt DIV _total END AS BIGINT)"
            ).alias("observed_ppm"),
            expected[F.col("digit")].cast("bigint").alias("benford_ppm"),
        )
        .withColumn(
            "deviation_ppm", (F.col("observed_ppm") - F.col("benford_ppm")).cast("bigint")
        )
    )


def contingency_chisq(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-cell chi-square contingency profile of two categorical
    columns: observed count, expected count under independence
    (quantized to integer micro-units: ``row_tot*col_tot*1e6 DIV
    n``), and the cell's chi-square contribution — the independence
    screen behind "did the label mix drift by segment?".

    The contribution is the one double computed, and it is derived
    from exact integers by a fixed expression ((O - E)²/E with
    E = expected_micro/1e6), so it is bit-stable across engines;
    there is deliberately NO global chi-square sum emitted — summing
    doubles is order-dependent, and the per-cell grid (|A|×|B| rows)
    is the useful diagnostic anyway (consumers can sum exactly from
    expected_micro if they need the statistic).

    Integer bound: row_tot*col_tot*1e6 < 2^63 requires row_tot ×
    col_tot < 9.2e12 — holds through ~3M×3M marginals; beyond that
    switch the quantization down (documented, loud at the caller).
    One shuffle for the (a, b) counts; marginals are windows over the
    O(cells) aggregate, never the facts."""
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    enriched = (
        cells.withColumn("_rt", F.sum("observed").over(wa))
        .withColumn("_ct", F.sum("observed").over(wb))
        .withColumn("_n", F.sum("observed").over(wall))
    )
    return enriched.select(
        F.col("a").alias(col_a),
        F.col("b").alias(col_b),
        "observed",
        F.expr("CAST(_rt * _ct * 1000000 DIV _n AS BIGINT)").alias("expected_micro"),
    ).withColumn(
        "chisq_cell",
        F.when(
            F.col("expected_micro") > 0,
            (
                (
                    F.col("observed").cast("double")
                    - F.col("expected_micro").cast("double") / F.lit(1_000_000.0)
                )
                * (
                    F.col("observed").cast("double")
                    - F.col("expected_micro").cast("double") / F.lit(1_000_000.0)
                )
            )
            / (F.col("expected_micro").cast("double") / F.lit(1_000_000.0)),
        ).otherwise(F.lit(0.0)),
    )
