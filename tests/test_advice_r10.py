"""Round-10 regression pins for the r9 VERDICT/ADVICE items.

1. ADVICE r9 (medium): ORACLE_PURCHASE_ATTRIBUTION used DuckDB's
   ``//``, which TRUNCATES toward zero (-7 // 2 = -3), while the Spark
   operator floors — a latent 1-micro-per-touch divergence on negative
   (refund) conversions. The oracle now floors in pure integers; the
   parity test here runs BOTH engines on a fixture that contains a
   negative conversion and fails on the pre-fix oracle.
2. VERDICT r9 #1: ``touch_attribution``'s conv×touch join is re-based
   on the bucketized interval-join pattern. Bucketing must be
   semantically invisible: results identical for any bucket width,
   touches on bucket boundaries counted exactly once, negative epochs
   floor-bucketed (not truncated one bucket high).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.relational import touch_attribution


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, sec long, event_id long, event_type string, value double"
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")


# One user with a refund (negative value) split over 3 touches — the
# case where floor-div and trunc-div disagree — plus a plain positive
# conversion and an untouched one so all three channels + '(none)'
# appear.
NEG_FIXTURE = [
    (1, 10, 1, "view", 0.0),
    (1, 11, 2, "click", 0.0),
    (1, 12, 3, "signup", 0.0),
    (1, 20, 4, "purchase", -1.0),     # refund: -1_000_000 micro / 3
    (2, 30, 5, "view", 0.0),
    (2, 40, 6, "purchase", 10.0),
    (3, 50, 7, "purchase", 3.0),      # no touches -> (none)
]


def test_purchase_attribution_oracle_parity_with_negative_values(
    spark, tmp_path
):
    """The committed oracle SQL and the Spark operator must agree on a
    fixture containing a NEGATIVE conversion (ADVICE r9). Fails on the
    pre-fix oracle, whose `vmicro // cnt` truncated toward zero."""
    from hr_moderndatapipeline_spark.queries.core import (
        ORACLE_PURCHASE_ATTRIBUTION,
    )

    pq = str(tmp_path / "events.parquet")
    _events_df(spark, NEG_FIXTURE).write.parquet(pq)

    got = {
        r["channel"]: (
            r["first_touch_micro"], r["last_touch_micro"],
            r["linear_micro"], r["n_touches"], r["n_conversions"],
        )
        for r in touch_attribution(
            spark.read.parquet(pq),
            "user_id", "ts", "event_type", "event_id", "value",
            "purchase", ["view", "click", "signup"], lookback_seconds=25,
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(ORACLE_PURCHASE_ATTRIBUTION).fetchall()
    }
    con.close()
    assert got == want
    # the disagreeing cell, pinned explicitly: floor(-1e6/3) = -333_334
    # (click/signup carry ONLY the refund; view also carries user 2's
    # +10.0 conversion)
    assert got["click"][2] == -333_334
    assert got["signup"][2] == -333_334


@pytest.mark.parametrize("bucket", [3, 7, 25, 100, 10_000])
def test_touch_attribution_invariant_to_bucket_width(spark, bucket):
    """Bucketization is a physical-plan choice, never a semantic one:
    any bucket width gives byte-identical channel totals, including
    touches exactly on bucket boundaries and at the window edges."""
    rows = [
        # touches at multiples of 3 and 7 (bucket boundaries for the
        # small widths) around two conversions 25s apart
        (1, 0, 1, "view", 0.0),
        (1, 3, 2, "click", 0.0),
        (1, 7, 3, "signup", 0.0),
        (1, 21, 4, "view", 0.0),
        (1, 25, 5, "purchase", 5.0),   # window [0, 25]: all 4 touches
        (1, 26, 6, "click", 0.0),
        (1, 50, 7, "purchase", 2.0),   # window [25, 50]: events 5? no —
        #                                touches at 26 only (25 is conv)
        (2, 49, 8, "view", 0.0),
        (2, 50, 9, "purchase", 1.0),
    ]
    df = _events_df(spark, rows)
    base = None
    for b in (None, bucket):
        out = sorted(
            touch_attribution(
                df, "user_id", "ts", "event_type", "event_id", "value",
                "purchase", ["view", "click", "signup"],
                lookback_seconds=25, bucket_seconds=b,
            ).collect(),
            key=lambda r: r["channel"],
        )
        if base is None:
            base = out
        else:
            assert out == base, f"bucket={b} diverged"
    # exactly-once: total touches equals the hand count (4 + 1 + 1)
    assert sum(r["n_touches"] for r in base) == 6


def test_touch_attribution_pre_epoch_timestamps_floor_bucketed(spark):
    """Negative epochs: (x - pmod(x, B)) DIV B floors for any sign —
    a float-divide-then-cast bucketing would land pre-1970 touches one
    bucket high and silently drop boundary matches."""
    rows = [
        (1, -100, 1, "view", 0.0),
        (1, -90, 2, "purchase", 1.0),   # touch 10s before, in window
        (1, -200, 3, "click", 0.0),     # 110s before: outside 25s window
    ]
    df = _events_df(spark, rows)
    out = {
        r["channel"]: r
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "event_id", "value",
            "purchase", ["view", "click", "signup"],
            lookback_seconds=25, bucket_seconds=7,
        ).collect()
    }
    assert out["view"]["n_touches"] == 1
    assert out["view"]["linear_micro"] == 1_000_000
    assert "click" not in out
    assert "(none)" not in out


# ── as_of_join_sorted: merge-based as-of == probe-based as-of ──

def _asof_frames(spark):
    import random

    rng = random.Random(20260816)
    dim_rows, fact_rows = [], []
    for u in range(1, 40):
        n_ver = rng.randint(0, 6)
        starts = sorted(rng.sample(range(0, 1000), n_ver))
        for i, s in enumerate(starts):
            # deliberate validity GAP after every 3rd version, and a
            # NULL attribute on every 4th (the struct-carry case)
            end = starts[i + 1] if i + 1 < len(starts) else 2000
            if i % 3 == 2:
                end = min(end, s + 5)
            dim_rows.append(
                (u, None if i % 4 == 3 else f"state_{u}_{i}", s, end)
            )
        for _ in range(rng.randint(0, 8)):
            fact_rows.append((u, rng.randrange(0, 1100), rng.randrange(10**6)))
    dim = spark.createDataFrame(
        dim_rows, "user_id int, state string, s int, e int"
    ).select(
        "user_id", "state",
        F.timestamp_seconds("s").alias("effective_start_date"),
        F.timestamp_seconds("e").alias("effective_end_date"),
    )
    facts = spark.createDataFrame(
        fact_rows, "user_id int, t int, fact_id long"
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "fact_id")
    return facts, dim


@pytest.mark.parametrize("how", ["left", "inner"])
def test_as_of_join_sorted_matches_probe_join(spark, how):
    """The merge-based as-of (one sort, O((P+V)log) per key — the
    hot-key-safe plan, VERDICT r9 #2) must return row-for-row what the
    probe-based as_of_join returns, including NULL version attributes
    (struct carry, never per-column) and validity gaps (carried
    version voided when ts >= end)."""
    from hr_moderndatapipeline_spark.operators.scd2 import (
        as_of_join,
        as_of_join_sorted,
    )

    facts, dim = _asof_frames(spark)
    key = lambda r: (  # noqa: E731
        r["fact_id"], r["state"], r["effective_start_date"],
        r["effective_end_date"],
    )
    got = sorted(
        map(key, as_of_join_sorted(
            facts, dim, ["user_id"], "ts", how=how
        ).collect())
    )
    want = sorted(
        map(key, as_of_join(
            facts, dim, ["user_id"], "ts", how=how, broadcast_dim=True
        ).collect())
    )
    assert got == want
    assert len(got) > 50  # the fixture actually exercises matches


def test_bm25_rank_matches_python_reference(spark):
    """bm25_rank == a transliterated pure-Python BM25 (Lucene idf,
    micro-quantized contributions) on a small corpus with repeated
    terms, varied doc lengths, and an unmatched doc."""
    import math

    from hr_moderndatapipeline_spark.operators.text import bm25_rank

    corpus = [
        (1, "spark window merge window window stream"),
        (2, "merge merge merge merge merge merge merge merge"),
        (3, "the quick brown fox"),                      # no query term
        (4, "stream spark"),
        (5, "window stream merge spark window stream spark window"),
    ]
    terms = ["window", "merge", "stream", "spark"]
    k1, b = 1.2, 0.75
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25_micro"])
        for r in bm25_rank(df, "doc_id", "text", terms, top_n=10).collect()
    }

    docs = {i: t.split(" ") for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dft = {
        t: sum(1 for w in docs.values() if t in w) for t in terms
    }
    want = {}
    for i, w in docs.items():
        s, m = 0, 0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            m += 1
            idf = math.log(((n - dft[t]) + 0.5) / (dft[t] + 0.5) + 1.0)
            tfn = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(w) / avgdl))
            )
            s += math.floor(idf * tfn * 1000000.0 + 0.5)
        if m:
            want[i] = (m, s)
    assert got == want
    assert 3 not in got  # unmatched doc never appears


def test_point_in_time_join_merge_sorted_matches_broadcast(spark):
    """merge_sorted=True routes each feature through as_of_join_sorted
    and must enrich identically to the broadcast probe plan."""
    from hr_moderndatapipeline_spark.operators.scd2 import point_in_time_join

    spine = spark.createDataFrame(
        [(1, 100, 10), (1, 250, 11), (2, 50, 12), (3, 100, 13)],
        "uid int, t int, label int",
    ).select("uid", F.timestamp_seconds("t").alias("obs_ts"), "label")
    feat = spark.createDataFrame(
        [(1, 90, 1.0), (1, 200, 2.0), (2, 60, 3.0)],
        "uid int, t int, score double",
    ).select("uid", F.timestamp_seconds("t").alias("fts"), "score")

    def rows(merge_sorted):
        return sorted(
            (r["uid"], r["label"], r["score"])
            for r in point_in_time_join(
                spine, "obs_ts", [(feat, ["uid"], "fts")],
                merge_sorted=merge_sorted,
            ).collect()
        )

    got, want = rows(True), rows(False)
    assert got == want
    # the leakage guard: user 2's obs at t=50 predates its t=60
    # feature -> NULL; user 3 has no features -> NULL
    assert (2, 12, None) in got and (3, 13, None) in got
    assert (1, 11, 2.0) in got  # latest <= obs, not the t=90 one
