"""Regression pins for the four round-11 ADVICE items (ADVICE.md r12).

Each test fails on the pre-fix code:

1. cohort_centroid_merge narrowed sum(sx) to DECIMAL(28,10) — a merged
   cohort whose per-dimension sum exceeds 28-digit range overflowed
   (NULL non-ANSI / error ANSI) while the one-shot face still worked.
2. calibration_ece clamped only the TOP bin — a contract-breaching
   negative score_ppm minted a phantom negative bin row.
3. centroid_silhouette_literal docstring claimed s in [-1, 1]; the
   nearest-centroid simplified form is [0, 1e6] ppm (own_cos >=
   other_cos by construction). Pinned here structurally.
4. tools/bm25_lifecycle_probe.py silently mis-parsed a space-separated
   '--suffix c0' (flag dropped, value taken as sf_dir).
"""

from __future__ import annotations

import subprocess
import sys
from decimal import Decimal

import pyspark.sql.functions as F


def test_cohort_centroid_merge_survives_28_digit_overflow(spark):
    """Merged per-dimension sums beyond DECIMAL(28,10) range must
    stay exact — the merge may not narrow below the (38,10) type the
    state aggregate produces (ADVICE r12 #1)."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        cohort_centroid_merge,
    )

    # Two published states whose sx each fit (28,10) but whose SUM
    # has 19 integer digits — representable only at DECIMAL(38,10).
    big = Decimal("900000000000000000.5")  # 9e17, 18 int digits: fits (28,10)
    schema = "label int, pos int, sx decimal(38,10), n bigint"
    a = spark.createDataFrame([(0, 0, big, 10)], schema)
    b = spark.createDataFrame([(0, 0, big, 7)], schema)
    merged = cohort_centroid_merge(a, b).collect()
    assert len(merged) == 1
    row = merged[0]
    assert row["sx"] == Decimal("1800000000000000001.0")  # 19 digits, exact
    assert row["n"] == 17
    # type parity with the one-shot state: sum(decimal(28,10)) widens
    # to decimal(38,10) in Spark, so the merged face must match.
    assert dict(cohort_centroid_merge(a, b).dtypes)["sx"] == "decimal(38,10)"


def test_cohort_state_and_merge_share_sx_type(spark):
    """state() and merge() must emit the SAME sx type so a merged
    state can be re-merged / re-published without a silent narrow."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        cohort_centroid_merge,
        cohort_centroid_state,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "label int, _v array<double>"
    )
    st = cohort_centroid_state(df, "label", "_v")
    t_state = dict(st.dtypes)["sx"]
    t_merged = dict(cohort_centroid_merge(st, st).dtypes)["sx"]
    assert t_state == t_merged == "decimal(38,10)"


def test_calibration_ece_clamps_negative_scores_to_bin0(spark):
    """A negative score_ppm (contract breach) lands in bin 0 instead
    of minting a negative bin row (ADVICE r12 #2)."""
    from hr_moderndatapipeline_spark.operators.experiments import (
        calibration_ece,
    )

    rows = [(-50000, 0), (-1, 1), (0, 0), (999999, 1), (1000000, 1)]
    df = spark.createDataFrame(rows, "score_ppm bigint, label int")
    out = calibration_ece(df, "score_ppm", "label", bins=10).collect()
    bins = sorted(r["bin"] for r in out)
    assert bins[0] == 0, f"negative bin leaked: {bins}"
    assert all(0 <= b <= 9 for b in bins)
    by_bin = {r["bin"]: r for r in out}
    # the three clamped/zero scores all land in bin 0
    assert by_bin[0]["n"] == 3
    # ECE denominator counts every input row exactly once
    n_total = sum(r["n"] for r in out)
    assert n_total == len(rows)
    # ece_ppm identical on every row (window over the bounded aggregate)
    assert len({r["ece_ppm"] for r in out}) == 1


def test_silhouette_range_is_nonnegative_ppm(spark):
    """Nearest-centroid simplified silhouette: own_cos >= other_cos by
    construction, so s_ppm in [0, 1e6] — including points square on
    the boundary and points far from every centroid (ADVICE r12 #3)."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        centroid_silhouette_literal,
        l2_norm,
    )

    rows = [
        ([1.0, 0.0],),   # exactly on centroid 0
        ([0.0, 1.0],),   # exactly on centroid 1
        ([1.0, 1.0],),   # equidistant -> rounded tie -> s = 0
        ([-1.0, -1.0],), # anti-aligned with both
    ]
    df = spark.createDataFrame(rows, "_v array<double>").withColumn(
        "_vn", l2_norm(F.col("_v"), 2)
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = centroid_silhouette_literal(df, cents, 2).collect()
    assert all(0 <= r["s_ppm"] <= 1000000 for r in got)
    tie = [r for r in got if r["_cos"] == r["_cos2"]]
    assert tie and all(r["s_ppm"] == 0 for r in tie)


def test_bm25_probe_rejects_bare_suffix_flag():
    """Space-separated '--suffix c0' must error, not silently take
    'c0' as sf_dir (ADVICE r12 #4). The reject fires before any Spark
    session is built, so this is a fast subprocess check."""
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/bm25_lifecycle_probe.py",
            "--suffix",
            "c0",
            "/tmp/nonexistent_sf_dir",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "--suffix=VALUE" in (proc.stderr + proc.stdout)
