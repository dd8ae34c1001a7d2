"""Wall-clock evidence for LPA ``early_stop`` (VERDICT r11 #6 /
round-12): on a graph that CONVERGES before the requested iteration
count, the early-stopped face must return the identical labels while
skipping the dead rounds' cost.

Fixture: N disjoint TRIANGLES — non-bipartite on purpose. (The first
draft used stars; a star is bipartite, so synchronous LPA OSCILLATES
with period 2 and early_stop correctly never fires — measured 70.4s
vs 69.2s at 10M edges, speedup 1.02×, the honest "no dead rounds to
skip" case, kept in SCALING.md as the negative control.) A triangle
reaches the all-min fixed point in 3 synchronous rounds (pinned in
tests/test_r12_ops.py), so requesting 8 rounds wastes 4-5 on a
converged graph — exactly the production shape early_stop exists
for. Disjoint triangles scale the edge count without changing the
convergence depth.

Usage: python tools/lpa_earlystop_probe.py [n_triangles]
"""

from __future__ import annotations

import json
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.graph import (  # noqa: E402
    label_propagation,
)


def main() -> None:
    n_tri = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    spark = get_spark("lpa_earlystop_probe")
    # triangle t = vertices (3t, 3t+1, 3t+2); edges (v, next-in-ring)
    edges = (
        spark.range(n_tri * 3)
        .select(
            F.col("id").alias("src"),
            (
                (F.col("id") / 3).cast("bigint") * 3
                + (F.col("id") + 1) % 3
            ).alias("dst"),
        )
    )
    out = {"n_triangles": n_tri, "edges": n_tri * 3}

    t0 = time.time()
    fixed = (
        label_propagation(edges, iterations=8)
        .groupBy("label")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum("count").alias("n_vertices"),
        )
        .first()
    )
    out["fixed8_sec"] = round(time.time() - t0, 1)
    print(f"fixed 8 rounds: {out['fixed8_sec']}s {tuple(fixed)}", flush=True)

    t0 = time.time()
    early = (
        label_propagation(edges, iterations=8, early_stop=True)
        .groupBy("label")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum("count").alias("n_vertices"),
        )
        .first()
    )
    out["early_stop_sec"] = round(time.time() - t0, 1)
    print(f"early_stop: {out['early_stop_sec']}s {tuple(early)}", flush=True)
    assert tuple(early) == tuple(fixed), (tuple(early), tuple(fixed))
    out["speedup"] = round(out["fixed8_sec"] / out["early_stop_sec"], 2)
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
