"""Round-9 operators: gaps-and-islands streaks, Kaplan–Meier
survival, and the integer-exact weighted priority sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.relational import (
    activity_streaks,
    kaplan_meier,
)
from hr_moderndatapipeline_spark.operators.sampling import (
    weighted_priority_sample,
)


def test_activity_streaks_islands_and_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-02 09:00:00"),
            (1, "2024-01-02 23:00:00"),  # same day — distinct collapses it
            (1, "2024-01-04 01:00:00"),
            (2, "2024-02-10 00:00:00"),
            (2, "2024-02-11 00:00:00"),
            (2, "2024-02-12 00:00:00"),
        ],
        "uid int, ts string",
    )
    rows = {
        (r["uid"], str(r["streak_start"])): (str(r["streak_end"]), r["streak_days"])
        for r in activity_streaks(df, ["uid"], "ts").collect()
    }
    assert rows == {
        (1, "2024-01-01"): ("2024-01-02", 2),
        (1, "2024-01-04"): ("2024-01-04", 1),
        (2, "2024-02-10"): ("2024-02-12", 3),
    }


def test_kaplan_meier_matches_hand_computation(spark):
    # the classic textbook shape: events at 1,2,3,5; censorings at 2,4,6
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1), (5, 1), (6, 0)],
        "dur int, ev int",
    )
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got[1]["n_at_risk"] == 8 and got[1]["n_events"] == 1
    assert got[1]["survival"] == 7.0 / 8.0
    assert got[2]["n_at_risk"] == 7 and got[2]["n_censored"] == 1
    assert got[2]["survival"] == (7.0 / 8.0) * (1.0 - 1.0 / 7.0)
    assert got[3]["survival"] == got[2]["survival"] * (1.0 - 1.0 / 5.0)
    # censor-only times keep S flat
    assert got[4]["n_events"] == 0 and got[4]["survival"] == got[3]["survival"]
    assert got[5]["n_at_risk"] == 3 and got[5]["n_events"] == 2
    assert got[5]["survival"] == got[3]["survival"] * (1.0 - 2.0 / 3.0)
    assert got[6]["survival"] == got[5]["survival"]
    # at-risk bookkeeping: counts telescope to zero
    assert got[6]["n_at_risk"] - got[6]["n_events"] - got[6]["n_censored"] == 0


def test_kaplan_meier_no_censoring_is_empirical_survival(spark):
    # without censoring S(t) must equal the plain empirical tail
    df = spark.createDataFrame([(d, 1) for d in [1, 1, 2, 3, 3, 3, 4, 10]],
                               "dur int, ev int")
    got = {r["t"]: r["survival"] for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got[1] == pytest.approx(6 / 8)
    assert got[2] == pytest.approx(5 / 8)
    assert got[3] == pytest.approx(2 / 8)
    assert got[4] == pytest.approx(1 / 8)
    assert got[10] == pytest.approx(0.0)


def test_weighted_priority_sample_fixed_size_and_deterministic(spark):
    df = spark.range(10_000).select(
        F.col("id"),
        (F.pmod(F.col("id"), 4) + 1).cast("int").alias("w"),
    )
    s1 = weighted_priority_sample(df, "id", "w", 500)
    s2 = weighted_priority_sample(df, "id", "w", 500)
    r1 = [(r["id"], r["sample_rank"]) for r in s1.orderBy("sample_rank").collect()]
    r2 = [(r["id"], r["sample_rank"]) for r in s2.orderBy("sample_rank").collect()]
    assert r1 == r2  # deterministic, content-addressed
    assert len(r1) == 500
    assert [rk for _, rk in r1] == list(range(1, 501))
    assert len({i for i, _ in r1}) == 500  # without replacement


def test_weighted_priority_sample_prefers_heavy_weights(spark):
    # equal counts of weight-1 and weight-4 rows: the A-Res rule must
    # select weight-4 rows far more often (expected ~4:1)
    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 4).otherwise(1).cast("int").alias("w"),
    )
    out = weighted_priority_sample(df, "id", "w", 1000).collect()
    heavy = sum(1 for r in out if r["w"] == 4)
    assert heavy > 700, f"weight-4 rows selected only {heavy}/1000"


def test_weighted_priority_sample_rejects_bad_weight(spark):
    df = spark.range(100).select(
        F.col("id"), F.lit(7).cast("int").alias("w")
    )
    with pytest.raises(Exception, match="weight outside"):
        weighted_priority_sample(df, "id", "w", 10).collect()


def test_touch_attribution_models_and_reconciliation(spark):
    from hr_moderndatapipeline_spark.operators.relational import (
        touch_attribution,
    )

    rows = [
        # user 1: view(t10) -> click(t20) -> purchase(t30, 10.0):
        # first=view, last=click, linear 5/5 (both in 25s window)
        (1, 10, 1, "view", 0.0),
        (1, 20, 2, "click", 0.0),
        (1, 30, 3, "purchase", 10.0),
        # user 2: purchase with no touches at all -> (none)
        (2, 50, 4, "purchase", 3.5),
        # user 3: only touch OUTSIDE the window -> (none)
        (3, 1, 5, "view", 0.0),
        (3, 30, 6, "purchase", 2.0),
        # user 4: three touches, value 1.0 -> linear 333333 each,
        # remainder 1 micro unattributed (integer DIV)
        (4, 10, 7, "view", 0.0),
        (4, 11, 8, "click", 0.0),
        (4, 12, 9, "signup", 0.0),
        (4, 20, 10, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "uid int, sec long, eid long, etype string, value double"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    out = {
        r["channel"]: r
        for r in touch_attribution(
            df, "uid", "ts", "etype", "eid", "value",
            "purchase", ["view", "click", "signup"], lookback_seconds=25,
        ).collect()
    }
    # user 1's first touch is the view (10.0) AND user 4's is too (1.0)
    assert out["view"]["first_touch_micro"] == 11_000_000
    assert out["click"]["last_touch_micro"] == 10_000_000  # user 1 last
    assert out["view"]["linear_micro"] == 5_000_000 + 333_333
    assert out["click"]["linear_micro"] == 5_000_000 + 333_333
    assert out["signup"]["linear_micro"] == 333_333
    assert out["signup"]["first_touch_micro"] == 0
    assert out["signup"]["last_touch_micro"] == 1_000_000  # user 4 last
    assert out["(none)"]["n_conversions"] == 2
    assert out["(none)"]["first_touch_micro"] == 5_500_000
    # reconciliation: every model's grand total covers all purchases
    # (minus the documented linear DIV remainder of 1 micro)
    tot_first = sum(r["first_touch_micro"] for r in out.values())
    tot_last = sum(r["last_touch_micro"] for r in out.values())
    tot_lin = sum(r["linear_micro"] for r in out.values())
    assert tot_first == tot_last == 16_500_000
    assert tot_lin == 16_500_000 - 1


def test_weighted_priority_sample_matches_integer_reference(spark):
    """The selected SET equals a pure-Python evaluation of the exact
    integer priority key p^(12/w) * 1024^(12-12/w) with the same
    mixer — pins the exponent table and the tie-break order."""
    n, k = 5_000, 137
    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.col("id") * 7, 4) + 1).cast("int").alias("w")
    )
    got = [
        (r["id"], r["sample_rank"])
        for r in weighted_priority_sample(df, "id", "w", k)
        .orderBy("sample_rank")
        .collect()
    ]

    def prio(key: int, w: int) -> int:
        p = ((key % 2**31) * 2654435761 % 2**32) % 1023 + 1
        e = {1: 12, 2: 6, 3: 4, 4: 3}[w]
        return p**e * 1024 ** (12 - e)

    ref = sorted(
        ((i, (i * 7) % 4 + 1) for i in range(n)),
        key=lambda t: (-prio(t[0], t[1]), t[0]),
    )[:k]
    assert got == [(i, rk + 1) for rk, (i, _) in enumerate(ref)]


def test_kaplan_meier_grouped_matches_per_group_ungrouped(spark):
    """group_cols must give EXACTLY the per-group ungrouped curves —
    the grouped fold is the same fold, partitioned."""
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1),
            ("b", 1, 0), ("b", 2, 1), ("b", 2, 1), ("b", 5, 0)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    grouped = {
        (r["g"], r["t"]): (r["n_at_risk"], r["n_events"], r["n_censored"],
                           r["survival"])
        for r in kaplan_meier(df, "dur", "ev", group_cols=["g"]).collect()
    }
    for g in ("a", "b"):
        solo = {
            (g, r["t"]): (r["n_at_risk"], r["n_events"], r["n_censored"],
                          r["survival"])
            for r in kaplan_meier(
                df.filter(F.col("g") == g), "dur", "ev"
            ).collect()
        }
        for key, v in solo.items():
            assert grouped[key] == v, key
    assert len(grouped) == 6  # 3 distinct durations per group


def test_touch_attribution_negative_value_floor_division(spark):
    """Refund conversions (negative value): the linear split must use
    FLOOR division on both engines — Spark's DIV truncates toward
    zero and would disagree with SQL // on negatives."""
    from hr_moderndatapipeline_spark.operators.relational import (
        touch_attribution,
    )

    rows = [
        (1, 10, 1, "view", 0.0),
        (1, 11, 2, "click", 0.0),
        (1, 12, 3, "signup", 0.0),
        (1, 20, 4, "purchase", -1.0),  # refund: -1_000_000 micro
    ]
    df = spark.createDataFrame(
        rows, "uid int, sec long, eid long, etype string, value double"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    out = {
        r["channel"]: r
        for r in touch_attribution(
            df, "uid", "ts", "etype", "eid", "value",
            "purchase", ["view", "click", "signup"], lookback_seconds=25,
        ).collect()
    }
    # floor(-1_000_000 / 3) = -333_334 (NOT the trunc -333_333)
    assert out["view"]["linear_micro"] == -333_334
    assert out["click"]["linear_micro"] == -333_334
    assert out["signup"]["linear_micro"] == -333_334
