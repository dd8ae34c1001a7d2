"""Property pins for the round-9 operators: seeded random inputs,
pure-Python references (the hand-built unit cases can't explore the
tie/censor/oscillation space).

The Spark-in-the-loop tests use a few seeded cases (the r8 prefix-
losslessness pattern) — one Spark job per case; the references are
deliberately independent reformulations, not transcriptions.
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _py_streaks(rows):
    """Reference gaps-and-islands: per key, sorted distinct day
    ordinals split where the gap exceeds 1."""
    by_key = defaultdict(set)
    for k, d in rows:
        by_key[k].add(d)
    out = set()
    for k, days in by_key.items():
        run = []
        for d in sorted(days):
            if run and d != run[-1] + 1:
                out.add((k, run[0], run[-1], len(run)))
                run = []
            run.append(d)
        out.add((k, run[0], run[-1], len(run)))
    return out


def test_activity_streaks_matches_reference_on_random_days(spark):
    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(6), rng.randrange(40))
            for _ in range(rng.randrange(30, 120))
        ]
        df = spark.createDataFrame(
            [(k, d) for k, d in rows], "k int, dnum int"
        ).select(
            "k",
            (F.to_timestamp(F.lit("2024-01-01 12:00:00"))
             + F.make_interval(days=F.col("dnum"))).alias("ts"),
        )
        from hr_moderndatapipeline_spark.operators.relational import (
            activity_streaks,
        )

        got = {
            (
                r["k"],
                (r["streak_start"] - __import__("datetime").date(2024, 1, 1)).days,
                (r["streak_end"] - __import__("datetime").date(2024, 1, 1)).days,
                r["streak_days"],
            )
            for r in activity_streaks(df, ["k"], "ts").collect()
        }
        assert got == _py_streaks(rows), f"seed {seed}"


def _py_km(subjects):
    """Reference product-limit estimator over (duration, event)."""
    agg = defaultdict(lambda: [0, 0])
    for t, e in subjects:
        agg[t][0] += e
        agg[t][1] += 1 - e
    n = len(subjects)
    s = 1.0
    out = {}
    for t in sorted(agg):
        d, c = agg[t]
        s = s * (1.0 - d / n)
        out[t] = (n, d, c, s)
        n -= d + c
    return out


def test_kaplan_meier_matches_reference_on_random_censoring(spark):
    for seed in range(5):
        rng = random.Random(100 + seed)
        subjects = [
            (rng.randrange(1, 15), rng.randrange(2))
            for _ in range(rng.randrange(20, 200))
        ]
        df = spark.createDataFrame(subjects, "dur int, ev int")
        from hr_moderndatapipeline_spark.operators.relational import kaplan_meier

        got = {
            r["t"]: (r["n_at_risk"], r["n_events"], r["n_censored"],
                     r["survival"])
            for r in kaplan_meier(df, "dur", "ev").collect()
        }
        want = _py_km(subjects)
        assert set(got) == set(want), f"seed {seed}"
        for t in want:
            assert got[t][:3] == want[t][:3], (seed, t)
            # same fold order => exact float equality
            assert got[t][3] == want[t][3], (seed, t)


def _py_lpa(edges, iterations):
    """Reference synchronous LPA: mode of neighbor labels, ties to
    the smallest label; isolated-from-update vertices keep labels."""
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        nxt = {}
        for v in labels:
            counts = Counter(labels[u] for u in nbrs[v])
            if not counts:
                nxt[v] = labels[v]
                continue
            best = max(counts.values())
            nxt[v] = min(l for l, c in counts.items() if c == best)
        labels = nxt
    return labels


def test_label_propagation_matches_reference_on_random_graphs(spark):
    from hr_moderndatapipeline_spark.operators.graph import label_propagation

    for seed in range(5):
        rng = random.Random(200 + seed)
        n_v = rng.randrange(8, 30)
        edges = list(
            {
                tuple(sorted((rng.randrange(n_v), rng.randrange(n_v))))
                for _ in range(rng.randrange(10, 60))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        iters = rng.choice([2, 3, 4, 5])
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["vertex"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _py_lpa(edges, iters), f"seed {seed} iters {iters}"


def _py_attribution(rows, touch_types, lookback):
    """Reference multi-touch credit: per conversion, in-window
    touches; first/last by (ts, id); linear = floor division."""
    convs = [(u, t, i, v) for u, t, i, ty, v in rows if ty == "purchase"]
    touches = [(u, t, i, ty) for u, t, i, ty, v in rows if ty in touch_types]
    out = defaultdict(lambda: [0, 0, 0, 0, set()])
    for u, ct, cid, v in convs:
        vm = int(__import__("math").floor(v * 1e6))
        win = [
            (tt, tid, ty)
            for tu, tt, tid, ty in touches
            if tu == u and ct - lookback <= tt <= ct
        ]
        if not win:
            ch = "(none)"
            out[ch][0] += vm
            out[ch][1] += vm
            out[ch][2] += vm  # floor(vm/1) == vm
            out[ch][4].add(cid)
            continue
        first = min(win, key=lambda x: (x[0], x[1]))
        last = max(win, key=lambda x: (x[0], x[1]))
        n = len(win)
        for tt, tid, ty in win:
            rec = out[ty]
            if (tt, tid) == (first[0], first[1]):
                rec[0] += vm
            if (tt, tid) == (last[0], last[1]):
                rec[1] += vm
            rec[2] += vm // n  # python // IS floor division
            rec[3] += 1
            rec[4].add(cid)
    return {
        ch: (r[0], r[1], r[2], r[3], len(r[4])) for ch, r in out.items()
    }


def test_touch_attribution_matches_reference_on_random_streams(spark):
    from hr_moderndatapipeline_spark.operators.relational import (
        touch_attribution,
    )

    types = ["view", "click", "signup", "purchase", "noise"]
    for seed in range(5):
        rng = random.Random(300 + seed)
        rows = [
            (
                rng.randrange(5),
                rng.randrange(0, 500),
                i,
                rng.choice(types),
                round(rng.uniform(-20, 100), 2),
            )
            for i in range(rng.randrange(40, 150))
        ]
        lookback = rng.choice([60, 120, 300])
        df = spark.createDataFrame(
            rows, "uid int, sec long, eid long, etype string, value double"
        ).withColumn("ts", F.timestamp_seconds("sec"))
        got = {
            r["channel"]: (
                r["first_touch_micro"], r["last_touch_micro"],
                r["linear_micro"], r["n_touches"], r["n_conversions"],
            )
            for r in touch_attribution(
                df, "uid", "ts", "etype", "eid", "value",
                "purchase", ["view", "click", "signup"],
                lookback_seconds=lookback,
            ).collect()
        }
        want = _py_attribution(rows, {"view", "click", "signup"}, lookback)
        assert got == want, f"seed {seed}"
