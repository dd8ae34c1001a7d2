"""Un-truncated plan evidence for the ITERATIVE operators (VERDICT
r12 "What's wrong" #3): the production faces localCheckpoint per
round / per checkpoint group, so their end-of-query explain shows
only a Scan ExistingRDD — this probe dumps the plan of the work a
checkpoint actually executes.

- lpa_round_body: ONE synchronous LPA round over the checkpointed
  symmetrized edge list and a checkpointed label table — exactly the
  subtree each _lpa_rounds checkpoint materializes (r13 body: edge ⋈
  labels on dst → groupBy(src).agg(mode(label, deterministic)); no
  per-round coalesce join).
- pagerank_ladder_2iter: a TWO-iteration pagerank expression with NO
  checkpoints, so each iteration's join + contribution aggregate +
  1-row dangling-mass broadcast cross — and how step i+1 consumes
  step i in-plan — is visible in one explain. (The full 10-step
  uncheckpointed ladder explains to 11 MB of plan text, which is the
  concrete argument for checkpoint_every=3.)

Usage: python tools/dump_iterative_plans.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.graph import (  # noqa: E402
    symmetrize_edges,
)
from hr_moderndatapipeline_spark.sources.readers import load_table  # noqa: E402


def _explain_to(df, path: str) -> None:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r13"
    os.makedirs(out, exist_ok=True)
    spark = get_spark("dump_iterative_plans")

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 2).cast("bigint").alias("src"),
        (F.col("l_suppkey") * 2 + 1).cast("bigint").alias("dst"),
    )

    # ── one LPA round body over checkpointed inputs ──
    sym = symmetrize_edges(edges).repartition("dst").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .repartition("vertex")
        .localCheckpoint(eager=True)
    )
    round_body = (
        sym.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
        .groupBy(F.col("src").alias("vertex"))
        .agg(F.mode("label", True).alias("label"))
    )
    _explain_to(round_body, os.path.join(out, "lpa_round_body_full.txt"))

    # ── the full pagerank ladder, no intermediate checkpoints ──
    # (replica of operators/graph.py pagerank with the checkpoint
    # cadence removed so the whole 10-iteration expression survives
    # into one explain; the shipped operator checkpoints every 3)
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pedges = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("src"), F.col("to_type").alias("dst"))
    )
    e = pedges.select("src", "dst").distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition("vertex")
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    links = (
        e.join(out_deg, "src")
        .select(F.col("src").alias("vertex"), "dst", "deg")
        .repartition("vertex")
        .localCheckpoint(eager=True)
    )
    dangling = verts.join(
        out_deg.select(F.col("src").alias("vertex")), "vertex", "left_anti"
    ).localCheckpoint(eager=True)
    # TWO iterations, not the query's 10: the uncheckpointed plan
    # text grows super-linearly (the full 10-step ladder explains to
    # 11 MB — the concrete reason pagerank checkpoints every 3
    # steps); two chained iterations already show the per-step shape
    # (rank ⋈ links join, contribution aggregate, 1-row dangling-mass
    # aggregate broadcast-crossed into the rank update) and how step
    # i+1 consumes step i in-plan.
    damping, iterations = 0.85, 2
    teleport = (1.0 - damping) / n
    ranks = verts.withColumn("rank", F.lit(1.0 / n)).repartition("vertex")
    for _ in range(iterations):
        dm = ranks.join(dangling, "vertex", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            ranks.join(links, "vertex")
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )
        base = F.lit(teleport) + (F.lit(damping) * F.col("_dm")) / F.lit(float(n))
        ranks = (
            verts.join(contribs, "vertex", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "vertex",
                (base + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias("rank"),
            )
        )
    _explain_to(ranks, os.path.join(out, "pagerank_ladder_2iter_full.txt"))
    spark.stop()


if __name__ == "__main__":
    main()
