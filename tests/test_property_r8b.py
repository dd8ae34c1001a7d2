"""Second round-8 property batch: randomized equivalence pins for the
operators whose correctness rests on an argument rather than an
oracle row — the grouped two-pass rank vs the naive per-group window,
and the funnel fold vs a plain-Python two-pointer reference.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_grouped_ranks_equal_naive_window_on_random_data(spark):
    """assign_grouped_ranks must equal row_number() OVER (PARTITION BY
    group ORDER BY keys) − 1 on random group/value tables — skewed
    group sizes, singleton groups, many groups — at several partition
    counts (the offsets arithmetic is partition-layout-sensitive by
    construction; the RESULT must not be)."""
    from hr_moderndatapipeline_spark.operators.relational import (
        assign_grouped_ranks,
        release_stable_ids_cache,
    )

    rng = random.Random(812)
    for trial, nparts in ((0, 4), (1, 16), (2, 32)):
        n_groups = rng.randint(1, 8)
        rows = []
        k = 0
        for g in range(n_groups):
            size = rng.choice([1, 2, rng.randint(3, 400)])
            for _ in range(size):
                rows.append((f"g{g}", rng.randint(-50, 50), k))
                k += 1
        df = spark.createDataFrame(rows, "g string, v long, k long")
        got = {
            r["k"]: (r["rk"], r["n"])
            for r in assign_grouped_ranks(
                df, ["g"], ["v", "k"], id_col="rk", total_col="n",
                num_partitions=nparts,
            ).collect()
        }
        w = Window.partitionBy("g").orderBy("v", "k")
        want = {
            r["k"]: (r["rk"], r["n"])
            for r in df.withColumn("rk", F.row_number().over(w) - 1)
            .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
            .collect()
        }
        assert got == want, (trial, nparts)
        release_stable_ids_cache(spark)


def _ref_funnel(evs, steps):
    """Plain-Python greedy two-pointer subsequence match."""
    sc = 0
    for e in evs:
        if sc < len(steps) and e == steps[sc]:
            sc += 1
    return sc


def test_funnel_steps_equal_python_reference_on_random_streams(spark):
    """funnel_steps' aggregate() fold must equal the two-pointer
    reference for random event streams — noise types, re-entries,
    duplicate steps, empty progress — across step lists of length
    1..4."""
    from hr_moderndatapipeline_spark.operators.relational import funnel_steps

    rng = random.Random(813)
    types = ["view", "click", "cart", "purchase", "noise", "ping"]
    rows = []
    for uid in range(40):
        n = rng.randint(1, 30)
        for i in range(n):
            rows.append((uid, i, rng.choice(types)))
    df = spark.createDataFrame(rows, "uid long, seq long, etype string").select(
        "uid",
        F.timestamp_seconds(F.col("seq")).alias("ts"),
        F.col("seq").alias("event_id"),
        F.col("etype").alias("event_type"),
    )
    streams: dict = {}
    for uid, seq, e in rows:
        streams.setdefault(uid, []).append((seq, e))
    for L in range(1, 5):
        steps = ["view", "click", "cart", "purchase"][:L]
        got = {
            r["uid"]: (r["steps_completed"], r["converted"])
            for r in funnel_steps(
                df, ["uid"], "ts", "event_type", steps, tiebreak_col="event_id"
            ).collect()
        }
        for uid, evs in streams.items():
            sc = _ref_funnel([e for _, e in sorted(evs)], steps)
            assert got[uid] == (sc, 1 if sc == L else 0), (uid, L)
