"""Skewed-group fixture for ``assign_grouped_ranks`` (VERDICT r8
task 2).

The operator's scale claim (operators/relational.py): range-
partitioning on ``(group_cols…, order_by…)`` gives each group a
CONTIGUOUS RUN of partitions, so a huge group parallelizes across its
run instead of funneling through one task the way
``Window.partitionBy(group)`` does. That claim was argued from the
layout but never MEASURED under skew. This fixture builds the
adversarial shape — ONE group holds 90% of the rows, nine cold groups
share the rest — and records:

- the per-task row distribution of the hot group (the operator's own
  per-(partition, group) counts): the claim is REFUTED if any single
  task receives the hot group whole, EVIDENCED if the hot group's
  largest task slice is ~rows/num_partitions;
- wall time and spill of the grouped-rank job at two decades
  (1.5M and 4.5M rows ≈ the sf1/sf3 orders row counts);
- the naive ``Window.partitionBy(group).orderBy(value)`` rank on the
  same data — the single-task baseline the operator exists to beat
  (its hot group IS one task by construction);
- exactness: per-group rank min/max/count and a full row-count match,
  plus ranks == the naive window's ranks on a 10k-row sample join
  (both orders are total per group: (value, unique id) tiebreak).

Usage:
  python tools/skewed_rank_fixture.py --gen   # build both scales (~20s)
  python tools/skewed_rank_fixture.py         # measure, print JSON
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

ROOT = "/tmp/hr_mdp_skewfix"
SCALES = (1_500_000, 4_500_000)
HOT_FRAC = 0.9
N_COLD = 9
SEED = 20260815
NUM_PARTS = 32


def _path(n: int) -> str:
    return f"{ROOT}/skewed_{n}.parquet"


def generate() -> None:
    import duckdb

    os.makedirs(ROOT, exist_ok=True)
    con = duckdb.connect()
    for n in SCALES:
        n_hot = int(n * HOT_FRAC)
        # value: a fixed permutation of 0..n-1 (Knuth-mixer shuffle,
        # deterministic) so (group, value) is unique and values are
        # not pre-sorted on disk
        con.execute(
            f"""
COPY (
  SELECT CASE WHEN i < {n_hot} THEN 'hot'
              ELSE 'cold_' || CAST(i % {N_COLD} AS VARCHAR) END AS grp,
         CAST((CAST(i AS HUGEINT) * 2654435761 + {SEED}) % {n} AS BIGINT)
           * {n} + i AS value,
         i AS row_id
  FROM range(0, {n}) t(i)
) TO '{_path(n)}' (FORMAT PARQUET)
"""
        )
        print(f"generated {_path(n)}: {n} rows, "
              f"{os.path.getsize(_path(n)) // 1048576} MiB")
    con.close()


def measure() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark.functions.execmetrics import executed_metrics
    from hr_moderndatapipeline_spark.operators.relational import (
        assign_grouped_ranks,
    )

    spark = get_spark("skew_fixture")
    # session/JIT warmup so the first timed run isn't billed codegen
    # compilation (fresh lineages below time the actual work)
    warm = spark.read.parquet(_path(SCALES[0]))
    assign_grouped_ranks(
        warm, ["grp"], ["value"], id_col="rk", total_col="n_g",
        num_partitions=NUM_PARTS,
    ).groupBy("grp").count().collect()
    out: dict[str, dict] = {}
    for n in SCALES:
        row: dict = {}
        df = spark.read.parquet(_path(n))

        # ── the operator under skew ──
        t0 = time.time()
        ranked = assign_grouped_ranks(
            df, ["grp"], ["value"], id_col="rk", total_col="n_g",
            num_partitions=NUM_PARTS,
        )
        agg = ranked.groupBy("grp").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("rk").alias("min_rk"),
            F.max("rk").alias("max_rk"),
            F.max("n_g").alias("n_g"),
        )
        per_group = {r["grp"]: r for r in agg.collect()}
        op_sec = round(time.time() - t0, 2)
        m = executed_metrics(agg)
        n_hot = int(n * HOT_FRAC)
        assert per_group["hot"]["cnt"] == n_hot, "hot rows lost"
        assert per_group["hot"]["min_rk"] == 0
        assert per_group["hot"]["max_rk"] == n_hot - 1
        assert per_group["hot"]["n_g"] == n_hot
        assert sum(r["cnt"] for r in per_group.values()) == n

        # ── the claim's observable: hot-group rows per TASK under the
        # operator's own range layout ──
        parts = (
            df.repartitionByRange(NUM_PARTS, "grp", "value")
            .withColumn("_pid", F.spark_partition_id())
        )
        dist = (
            parts.filter(F.col("grp") == "hot")
            .groupBy("_pid")
            .count()
            .collect()
        )
        hot_per_task = sorted(r["count"] for r in dist)
        max_share = max(hot_per_task) / n_hot

        # ── naive window baseline: hot group == ONE task ──
        df2 = spark.read.parquet(_path(n))
        t0 = time.time()
        w = Window.partitionBy("grp").orderBy("value")
        naive = df2.withColumn("rk", F.row_number().over(w) - 1)
        naive_agg = naive.groupBy("grp").agg(
            F.count(F.lit(1)).alias("cnt"), F.max("rk").alias("max_rk")
        )
        naive_rows = {r["grp"]: r for r in naive_agg.collect()}
        naive_sec = round(time.time() - t0, 2)
        nm = executed_metrics(naive_agg)
        assert naive_rows["hot"]["max_rk"] == n_hot - 1

        # ── rank equality vs the window on a sample (both total orders) ──
        sample = ranked.filter(F.col("row_id") % 997 == 0).select(
            "grp", "value", "rk"
        )
        mism = (
            sample.join(
                naive.select("grp", "value", F.col("rk").alias("rk_w")),
                ["grp", "value"],
            )
            .filter(F.col("rk") != F.col("rk_w"))
            .count()
        )
        assert mism == 0, f"{mism} rank mismatches vs the naive window"

        spark.catalog.clearCache()
        row.update(
            {
                "rows": n,
                "hot_rows": n_hot,
                "op_sec": op_sec,
                "op_spill_bytes": m["spill_bytes"],
                "op_shuffle_mib": round(m["shuffle_bytes"] / 1048576, 1),
                "hot_tasks": len(hot_per_task),
                "hot_max_task_rows": max(hot_per_task),
                "hot_max_task_share": round(max_share, 4),
                "naive_sec": naive_sec,
                "naive_spill_bytes": nm["spill_bytes"],
                "speedup_vs_naive": round(naive_sec / op_sec, 2)
                if op_sec > 0
                else None,
            }
        )
        out[f"n{n}"] = row
        print(
            f"n={n}: op={op_sec}s (spill={m['spill_bytes']}), "
            f"hot group on {len(hot_per_task)} tasks, max task share "
            f"{max_share:.1%}; naive window={naive_sec}s "
            f"(spill={nm['spill_bytes']})",
            flush=True,
        )
    lo, hi = (out[f"n{s}"] for s in SCALES)
    out["wall_growth_3x"] = (
        round(hi["op_sec"] / lo["op_sec"], 2) if lo["op_sec"] > 0 else None
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--gen" in sys.argv[1:]:
        generate()
    else:
        measure()
