"""Viral-fingerprint stress fixture for the winnowing pair join
(VERDICT r10 #3): the df ≤ 8 boilerplate cap bounds the self-join
fanout BY CONSTRUCTION, but its recall cost had never been measured.
This fixture makes both sides of the trade observable:

- N docs ALL share one boilerplate passage (the viral fingerprints —
  a newsletter footer, a license header). Without the cap every
  boilerplate fingerprint joins N×N/2 pairs; with it, zero.
- ``n_planted`` disjoint doc pairs share a unique passage each
  (df = 2, far below the cap) — the TRUE passage-duplicate signal
  the operator exists to find.
- One cohort of ``cohort`` docs shares a passage (df = cohort > 8,
  just ABOVE the cap) — real repeated content the cap forfeits; its
  C(cohort, 2) pairs are the honest recall cost, not a defect: at
  corpus scale a passage in >8 docs IS boilerplate by the operator's
  definition.

Measured per cap setting: candidate join rows (the fanout the cap
exists to bound), result pairs, planted-pair recall, cohort-pair
recall, wall. Run:

    python tools/winnowing_fixture.py            # N=2000
    python tools/winnowing_fixture.py --n=500
"""

from __future__ import annotations

import json
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.text import (  # noqa: E402
    winnowing_fingerprints,
)

BOILER = (
    "subscribe to our newsletter for weekly updates and exclusive offers "
    "terms of service apply all rights reserved worldwide"
)
COHORT_PASSAGE = (
    "the quarterly report shows strong growth across every region with "
    "revenue exceeding expectations in all major product categories"
)


def _docs(spark, n: int, n_planted: int, cohort: int):
    """Deterministic corpus: doc i = boilerplate + unique filler
    (+ planted passage on the pair docs, + cohort passage on the
    cohort docs). Unique filler is 40 hash-derived pseudo-words."""
    rows = []
    for i in range(n):
        filler = " ".join(
            f"w{(i * 1_000_003 + j * 7919) % 900719}" for j in range(40)
        )
        parts = [BOILER, filler]
        if i < 2 * n_planted:
            # docs (0,1), (2,3), ... share passage p{i//2}
            pid = i // 2
            # 30 words ≈ 26 grams: long enough that winnowing's
            # density (2/(w+1)) yields ≥ min_shared fingerprints with
            # certainty — so any planted-pair miss is the CAP's doing,
            # not the min_shared threshold's
            parts.append(
                " ".join(f"p{pid}x{j}" for j in range(30))
            )
        if n - cohort <= i < n:
            parts.append(COHORT_PASSAGE)
        rows.append((i, " ".join(parts)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def pairs_with_cap(fps, max_df: int, min_shared: int):
    """The one-shot pair shape; returns (pairs_df, candidates_df)."""
    rare = fps.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("fp_hash"))
    ).filter(F.col("_df") <= max_df)
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    cand = a.join(b, "fp_hash").filter(F.col("doc_a") < F.col("doc_b"))
    pairs = (
        cand.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )
    return pairs, cand


def main() -> None:
    n = 2000
    analytic = "--analytic-uncapped" in sys.argv[1:]
    for arg in sys.argv[1:]:
        if arg.startswith("--n="):
            n = int(arg.split("=", 1)[1])
    n_planted, cohort, min_shared = n // 4, 12, 3
    spark = get_spark("winnowing_fixture")
    docs = _docs(spark, n, n_planted, cohort)
    fps = (
        winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)
        .select("doc_id", "fp_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    planted = {(2 * p, 2 * p + 1) for p in range(n_planted)}
    cohort_ids = list(range(n - cohort, n))
    cohort_pairs = {
        (a, b) for ai, a in enumerate(cohort_ids) for b in cohort_ids[ai + 1:]
    }
    out = {"n_docs": n, "n_planted_pairs": n_planted, "cohort": cohort}
    for tag, cap in (("cap8", 8), ("uncapped", n + cohort + 10)):
        if tag == "uncapped" and analytic:
            # At stress N the uncapped join is unmaterializable BY
            # DESIGN (N=500k boilerplate alone is ~1.25e11 candidate
            # rows). Its candidate count is exactly Σ_fp C(df, 2) —
            # computed from the df histogram in one aggregate, no
            # join. This is the fanout the cap exists to bound.
            t0 = time.time()
            row = (
                fps.groupBy("fp_hash")
                .agg(F.count(F.lit(1)).alias("_df"))
                .agg(
                    F.sum(
                        F.col("_df").cast("decimal(38,0)")
                        * (F.col("_df") - 1)
                        / 2
                    ).alias("cand")
                )
                .first()
            )
            out[tag] = {
                "candidate_rows_analytic": int(row["cand"]),
                "sec": round(time.time() - t0, 2),
                "note": "computed from df histogram; join not materialized",
            }
            print(f"{tag}: {json.dumps(out[tag])}", flush=True)
            continue
        t0 = time.time()
        pairs, cand = pairs_with_cap(fps, cap, min_shared)
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
        n_cand = cand.count()
        dt = round(time.time() - t0, 2)
        out[tag] = {
            "candidate_rows": n_cand,
            "result_pairs": len(got),
            "planted_found": len(got & planted),
            "planted_recall": round(len(got & planted) / n_planted, 4),
            "cohort_pairs_found": len(got & cohort_pairs),
            "sec": dt,
        }
        print(f"{tag}: {json.dumps(out[tag])}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
