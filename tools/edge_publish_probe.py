"""Does a PUBLISHED symmetrized-edge table amortize the graph
family's edge-build phase? (round-12 candidate #2, measured early)

The sf10 LPA phase probe showed the one-time edge build (orders ⋈
lineitem → distinct → symmetrize → distinct → repartition(dst) →
checkpoint) is ~30% of the query wall and swings 103–215s run-to-run.
Every graph query over the same relationship repays it. This probe
measures the three postures:

1. inline build (what the query does today),
2. plain-parquet publish once, then read + repartition(dst) +
   checkpoint per query (one shuffle of E at read),
3. bucketed publish (bucketBy(dst) saveAsTable), then read +
   checkpoint.

ADJUDICATION (SCALING.md r11): posture 2 is the real win — 25.6s vs
49.4s inline per query, publish (66.4s) amortizes after ~3 graph
queries. Posture 3's smaller number (18.4s) is NOT comparable for
the LPA shape: the plan check shows the query planner DISABLES the
bucketed scan in the label join ("Bucketed: false (disabled by query
planner)") and ``localCheckpoint`` strips the clustering anyway
(Scan ExistingRDD + Exchange on dst reappears) — so that posture's
checkpoint omits the dst-clustering every LPA round relies on, and
the rounds would reshuffle E rows each. Bucketed publish needs the
join to consume the SCAN directly (no checkpoint) to pay off, which
conflicts with the lineage-truncation the iterative loop needs.

Usage: python tools/edge_publish_probe.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.sources.readers import load_table  # noqa: E402

WAREHOUSE = "/tmp/edge_publish_wh"
PARQUET = "/tmp/edge_publish_sym.parquet"


def build_sym(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 2).cast("bigint").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("dst"),
    )
    e = edges.select("src", "dst").distinct()
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hr_mdp_stress_sf10"
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    shutil.rmtree(PARQUET, ignore_errors=True)
    spark = get_spark("edge_publish_probe")

    # posture 1: inline build (today's query path)
    t0 = time.time()
    sym1 = build_sym(spark, sf_dir).repartition("dst").localCheckpoint(eager=True)
    n = sym1.count()
    print(f"1 inline build+repartition+checkpoint: {time.time()-t0:.1f}s ({n:,} edges)", flush=True)
    sym1.unpersist()

    # publish once: plain parquet
    t0 = time.time()
    build_sym(spark, sf_dir).write.mode("overwrite").parquet(PARQUET)
    print(f"  publish plain parquet (once): {time.time()-t0:.1f}s", flush=True)

    # posture 2: read published + repartition + checkpoint (per query)
    t0 = time.time()
    sym2 = (
        spark.read.parquet(PARQUET).repartition("dst").localCheckpoint(eager=True)
    )
    n2 = sym2.count()
    print(f"2 read published + repartition + checkpoint: {time.time()-t0:.1f}s ({n2:,})", flush=True)
    sym2.unpersist()

    # publish once: bucketed table on dst
    t0 = time.time()
    spark.sql("DROP TABLE IF EXISTS sym_edges_bkt")
    (
        build_sym(spark, sf_dir)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", f"{WAREHOUSE}/sym_edges_bkt")
        .bucketBy(128, "dst")
        .sortBy("dst")
        .saveAsTable("sym_edges_bkt")
    )
    print(f"  publish bucketed table (once): {time.time()-t0:.1f}s", flush=True)

    # posture 3: bucketed read (dst-clustered already) + checkpoint
    t0 = time.time()
    sym3 = spark.table("sym_edges_bkt").localCheckpoint(eager=True)
    n3 = sym3.count()
    print(f"3 bucketed read + checkpoint: {time.time()-t0:.1f}s ({n3:,})", flush=True)
    assert n == n2 == n3
    spark.stop()


if __name__ == "__main__":
    main()
