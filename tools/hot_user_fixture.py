"""Hot-user (bot) skew fixture for the event-join family (VERDICT r9
tasks 1–2).

Every real event stream has a bot/service account with 10⁵–10⁶
events. The r9 sweeps grew USERS with per-user event counts flat, so
per-key superlinear terms were never exercised. This fixture builds
the adversarial shape — ONE user holds 90% of the events — and
records, per query:

- wall time + spill at two hot-user decades (54k and 540k hot
  events): a ~10× wall ratio is linear in the hot user's activity, a
  ~100× ratio is the quadratic this fixture exists to catch;
- for ``touch_attribution`` (the r9 'weak' item): the ANALYTIC
  candidate counts of the old bare user-key join (Σ C_u·T_u) vs the
  bucketized join (Σ_{u,bkt} C·T per bucket) vs the TRUE in-window
  match count — the bucketized join must be within (lookback+bucket)/
  lookback ≈ 2× of the true matches (output-optimal: you cannot emit
  fewer candidates than real matches), while the old shape is
  span/lookback ≈ 26× over and funnels through ONE task;
- the per-TASK matched-row distribution of the bucketized join (the
  claim's observable — no task may receive the hot user's full C·T
  product);
- old-shape == new-shape result equality at the mini scale (the
  semantics pin; sf-dir oracles pin it at 3 SFs already).

The fixture writes a driver-shaped ``events.parquet`` (same columns
as testdata) so the REAL ``queries()`` entries run on it unmodified.

Usage:
  python tools/hot_user_fixture.py --gen   # build both scales (~10s)
  python tools/hot_user_fixture.py         # measure, print JSON
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

ROOT = "/tmp/hr_mdp_hotuser"
SCALES = (60_000, 600_000)     # total events; hot user holds 90%
HOT_FRAC = 0.9
N_COLD_USERS = 2_000
SPAN_SEC = 180 * 86_400        # 180-day stream
SEED = 20260816
LOOKBACK = 7 * 86_400


def _dir(n: int) -> str:
    return f"{ROOT}/n{n}"


def generate() -> None:
    import duckdb

    con = duckdb.connect()
    for n in SCALES:
        os.makedirs(_dir(n), exist_ok=True)
        n_hot = int(n * HOT_FRAC)
        # Knuth-mixer pseudo-uniform ts over the span; event-type mix
        # purchase 1% / view 44% / click 30% / signup 15% / error 10%
        # (1% conversions ≈ a realistic stream; keeps the TRUE match
        # count executable while the old shape's product is not)
        con.execute(f"""
COPY (
  SELECT i AS event_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + INTERVAL (CAST((CAST(i AS HUGEINT) * 2654435761 + {SEED})
                            % {SPAN_SEC} AS BIGINT)) SECOND AS ts,
         CAST(CASE WHEN i < {n_hot} THEN 0
                   ELSE 1 + i % {N_COLD_USERS} END AS BIGINT) AS user_id,
         CASE WHEN m < 1 THEN 'purchase'
              WHEN m < 45 THEN 'view'
              WHEN m < 75 THEN 'click'
              WHEN m < 90 THEN 'signup'
              ELSE 'error' END AS event_type,
         CAST(i % 1000 AS DOUBLE) / 10 AS value,
         CAST(NULL AS VARCHAR) AS props
  FROM (SELECT i, CAST((CAST(i AS HUGEINT) * 40503 + 7) % 100 AS BIGINT) AS m
        FROM range(0, {n}) t(i))
) TO '{_dir(n)}/events.parquet' (FORMAT PARQUET)
""")
        print(f"generated {_dir(n)}/events.parquet: {n} rows "
              f"({os.path.getsize(_dir(n) + '/events.parquet') // 1048576} MiB)")
    con.close()


def _timed(df) -> tuple[float, dict, int]:
    from hr_moderndatapipeline_spark.functions.execmetrics import (
        executed_metrics,
    )

    t0 = time.time()
    n = df.count()
    sec = round(time.time() - t0, 2)
    return sec, executed_metrics(df), n


def measure() -> None:
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark.operators.relational import (
        touch_attribution,
    )
    from hr_moderndatapipeline_spark.queries.cdc_queries import (
        q_asof_purchase_state,
    )
    from hr_moderndatapipeline_spark.queries.core import (
        q_event_change_pairs,
        q_event_transition_matrix,
        q_funnel_conversion,
        q_purchase_attribution,
        q_rolling_weekly_active_users,
        q_user_activity_streaks,
        q_user_hourly_resampled,
        q_user_sessions,
        q_user_value_twap,
    )

    spark = get_spark("hot_user_fixture")
    # warmup (codegen/JIT) on the mini scale so timed runs time work
    q_user_sessions(spark, _dir(SCALES[0])).count()
    touches = ["view", "click", "signup"]
    out: dict[str, dict] = {}

    for n in SCALES:
        d = _dir(n)
        ev = spark.read.parquet(f"{d}/events.parquet")
        row: dict = {"rows": n, "hot_rows": int(n * HOT_FRAC)}

        # ── analytic candidate counts (aggregates, no join executed) ──
        sec = F.unix_timestamp("ts").cast("bigint")
        base = ev.select(
            "user_id",
            sec.alias("s"),
            F.col("event_type").alias("et"),
        )
        per_user = base.groupBy("user_id").agg(
            F.sum((F.col("et") == "purchase").cast("long")).alias("c"),
            F.sum(F.col("et").isin(*touches).cast("long")).alias("t"),
        )
        row["cand_old"] = per_user.agg(
            F.sum(F.col("c") * F.col("t"))
        ).collect()[0][0]
        bkt = F.expr(f"(s - pmod(s, {LOOKBACK})) DIV {LOOKBACK}")
        tb = (
            base.filter(F.col("et").isin(*touches))
            .groupBy("user_id", bkt.alias("b"))
            .agg(F.count(F.lit(1)).alias("t"))
        )
        cb = (
            base.filter(F.col("et") == "purchase")
            .select(
                "user_id",
                F.explode(
                    F.sequence(
                        F.expr(
                            f"((s - {LOOKBACK}) - pmod(s - {LOOKBACK},"
                            f" {LOOKBACK})) DIV {LOOKBACK}"
                        ),
                        F.expr(f"(s - pmod(s, {LOOKBACK})) DIV {LOOKBACK}"),
                    )
                ).alias("b"),
            )
            .groupBy("user_id", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row["cand_new"] = (
            tb.join(cb, ["user_id", "b"])
            .agg(F.sum(F.col("c") * F.col("t")))
            .collect()[0][0]
        )

        # ── the bucketized join, executed: true matches + per-task
        # distribution (mirrors the operator's bucketing exprs) ──
        conv = base.filter(F.col("et") == "purchase").select(
            "user_id", F.col("s").alias("cts")
        )
        touch = base.filter(F.col("et").isin(*touches)).select(
            "user_id", F.col("s").alias("tts")
        )
        conv_b = conv.withColumn(
            "b",
            F.explode(
                F.sequence(
                    F.expr(
                        f"((cts - {LOOKBACK}) - pmod(cts - {LOOKBACK},"
                        f" {LOOKBACK})) DIV {LOOKBACK}"
                    ),
                    F.expr(f"(cts - pmod(cts, {LOOKBACK})) DIV {LOOKBACK}"),
                )
            ),
        )
        touch_b = touch.withColumn(
            "b", F.expr(f"(tts - pmod(tts, {LOOKBACK})) DIV {LOOKBACK}")
        )
        matched = (
            conv_b.join(touch_b, ["user_id", "b"])
            .filter(
                (F.col("tts") <= F.col("cts"))
                & (F.col("tts") >= F.col("cts") - F.lit(LOOKBACK))
            )
            .withColumn("_pid", F.spark_partition_id())
        )
        dist = matched.groupBy("_pid").count().collect()
        per_task = sorted(r["count"] for r in dist)
        true_matches = sum(per_task)
        row["true_matches"] = true_matches
        row["match_tasks"] = len(per_task)
        row["match_max_task_share"] = (
            round(max(per_task) / true_matches, 4) if true_matches else None
        )
        # Partition-layout-INDEPENDENT observable (task counts above
        # are confounded by AQE coalescing the tiny fixture inputs —
        # AQE sizes reducers by INPUT bytes and cannot see join-output
        # explosion): the max matched rows any single join KEY
        # (user, bucket) carries. The old shape's key was the bare
        # user → the hot user's share was 1.0 by construction; the
        # bucketized key must spread him across his active buckets.
        kdist = matched.groupBy("user_id", "b").count().collect()
        per_key = sorted(r["count"] for r in kdist)
        row["match_keys"] = len(per_key)
        row["match_max_key_share"] = (
            round(max(per_key) / true_matches, 4) if true_matches else None
        )
        row["cand_overhead_new"] = (
            round(row["cand_new"] / true_matches, 2) if true_matches else None
        )
        row["cand_overhead_old"] = (
            round(row["cand_old"] / true_matches, 2) if true_matches else None
        )

        # ── the real queries, timed ──
        for name, fn in (
            ("purchase_attribution", q_purchase_attribution),
            ("funnel_conversion", q_funnel_conversion),
            ("user_sessions", q_user_sessions),
            ("asof_purchase_state", q_asof_purchase_state),
            ("event_change_pairs", q_event_change_pairs),
            ("event_transition_matrix", q_event_transition_matrix),
            ("rolling_weekly_active_users", q_rolling_weekly_active_users),
            ("user_activity_streaks", q_user_activity_streaks),
            ("user_hourly_resampled", q_user_hourly_resampled),
            ("user_value_twap", q_user_value_twap),
        ):
            t0 = time.time()
            df = fn(spark, d)
            cnt = df.count()
            from hr_moderndatapipeline_spark.functions.execmetrics import (
                executed_metrics,
            )

            m = executed_metrics(df)
            row[name] = {
                "sec": round(time.time() - t0, 2),
                "rows": cnt,
                "spill_bytes": m["spill_bytes"],
            }
            print(f"n={n} {name}: {row[name]}", flush=True)

        # ── old-shape attribution (bare user-key join), MINI scale
        # only — the quadratic product is unrunnable at the main scale
        # by construction; result equality is the semantics pin ──
        if n == SCALES[0]:
            t0 = time.time()
            old_j = conv.join(touch, "user_id").filter(
                (F.col("tts") <= F.col("cts"))
                & (F.col("tts") >= F.col("cts") - F.lit(LOOKBACK))
            )
            old_matches = old_j.count()
            row["old_shape_sec"] = round(time.time() - t0, 2)
            assert old_matches == true_matches, (
                f"old {old_matches} != new {true_matches}"
            )
            new_res = sorted(
                touch_attribution(
                    ev, "user_id", "ts", "event_type", "event_id", "value",
                    "purchase", touches, lookback_seconds=LOOKBACK,
                ).collect()
            )
            old_res = sorted(
                touch_attribution(
                    ev, "user_id", "ts", "event_type", "event_id", "value",
                    "purchase", touches, lookback_seconds=LOOKBACK,
                    bucket_seconds=SPAN_SEC * 4,  # one bucket == old join
                ).collect()
            )
            assert new_res == old_res, "bucketized result != single-bucket"

        out[f"n{n}"] = row
        spark.catalog.clearCache()

    lo, hi = (out[f"n{s}"] for s in SCALES)
    growth = {
        q: round(hi[q]["sec"] / lo[q]["sec"], 1)
        for q in (
            "purchase_attribution", "funnel_conversion", "user_sessions",
            "asof_purchase_state", "event_change_pairs",
            "event_transition_matrix", "rolling_weekly_active_users",
            "user_activity_streaks", "user_hourly_resampled",
            "user_value_twap",
        )
        if lo[q]["sec"] > 0
    }
    out["wall_growth_10x_hot"] = growth
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--gen" in sys.argv[1:]:
        generate()
    else:
        measure()
