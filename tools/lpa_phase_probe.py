"""Per-phase timing of customer_supplier_communities at a stress
scale (VERDICT r10 #5 adjudication): the sweep's executed-metrics
read ~0 shuffle because label_propagation does its real work inside
EAGER localCheckpoints during construction — so this probe replays
the operator inline with a clock around each phase:

- edge build + symmetrize + repartition(dst) + localCheckpoint (the
  one-time edge materialization),
- each LPA round's join + groupBy + argmax (lazy — billed to the next
  checkpoint), and each labels localCheckpoint (eager),
- the final histogram readout.

The argmax face is selectable so the r11 window→aggregate rewrite of
label_propagation's mode step can be measured head-to-head at the
same scale: ``--window`` replays the pre-r11 row_number() rank
window; the default replays the shipped min(struct(-c, label)) hash
aggregate (map-side partial combine, no sort).

Usage: python tools/lpa_phase_probe.py [sf_dir] [--window]
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--window"]
    use_window = "--window" in sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/hr_mdp_stress_sf10"
    spark = get_spark("lpa_phase_probe")
    print(f"mode face: {'rank window (pre-r11)' if use_window else 'min-struct aggregate'}", flush=True)
    t0 = time.time()

    def mark(tag: str) -> None:
        nonlocal t0
        print(f"{tag}: {time.time() - t0:.2f}s", flush=True)
        t0 = time.time()

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 2).cast("bigint").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("dst"),
    )
    e = edges.select("src", "dst").distinct()
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("dst")
        .localCheckpoint(eager=True)
    )
    mark("edge_build_checkpoint (join+2distinct+repartition)")
    print(f"  edges(sym): {sym.count():,} rows", flush=True)
    t0 = time.time()
    verts = sym.select(F.col("src").alias("vertex")).distinct()
    labels = verts.withColumn("label", F.col("vertex")).repartition("vertex")
    w = Window.partitionBy("vertex").orderBy(F.col("c").desc(), F.col("label").asc())
    for i in range(5):
        nb = (
            sym.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("vertex"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        if use_window:
            mode = (
                nb.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select("vertex", F.col("label").alias("_new"))
            )
        else:
            mode = (
                nb.groupBy("vertex")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("c")).alias("_negc"),
                            F.col("label").alias("_l"),
                        )
                    ).alias("_best")
                )
                .select("vertex", F.col("_best._l").alias("_new"))
            )
        labels = labels.join(mode, "vertex", "left").select(
            "vertex", F.coalesce(F.col("_new"), F.col("label")).alias("label")
        )
        if (i + 1) % 2 == 0 or i == 4:
            labels = labels.localCheckpoint(eager=True)
            mark(f"rounds_up_to_{i + 1}_checkpoint")
            t0 = time.time()
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cs"))
    out = (
        sizes.groupBy(F.col("cs").cast("bigint").alias("community_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
            F.sum("cs").cast("bigint").alias("n_members"),
        )
        .collect()
    )
    mark("histogram_readout")
    print(f"histogram rows: {len(out)}")
    spark.stop()


if __name__ == "__main__":
    main()
