"""Decade-scale probe of the offline retrieval-evaluation readout
(r11): replay q_retrieval_eval's run/qrels construction + the
retrieval_metrics aggregate at a stress corpus and measure the wall.

The stress generator suffixes every word with its copy index
(tools/stress_sweep.py), so the driver query's bare terms match
NOTHING there — this probe queries the copy-0 vocabulary
('windowc0' …) so the run, the judgments and every metric carry real
rows at 100x the documents. At sf10 each query term still matches
only copy 0's docs (the fixed-queries/growing-corpus shape): the
probe therefore ALSO runs a 3-copy term set to make the matched set
grow with the corpus.

Usage: python tools/retrieval_eval_probe.py [stress_dir]
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.experiments import (  # noqa: E402
    retrieval_metrics,
)


def run_eval(spark, sf_dir: str, terms, intent: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("ws"))

    def tf(t: str):
        return F.size(F.filter(F.col("ws"), lambda w: w == F.lit(t)))

    per = base.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("query_id"), tf(t).alias("tf"))
                    for t in terms
                ]
            )
        ).alias("s"),
        tf(intent).alias("tf_spark"),
    ).select(
        F.col("s.query_id").alias("query_id"),
        "doc_id",
        F.col("s.tf").alias("tf"),
        "tf_spark",
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("tf").desc(), F.col("doc_id").desc()
    )
    run = (
        per.filter(F.col("tf") > 0)
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    qrels = per.filter((F.col("tf") > 0) & (F.col("tf_spark") > 0)).select(
        "query_id", "doc_id", F.least(F.col("tf"), F.lit(3)).alias("rel")
    )
    return retrieval_metrics(run, qrels, k=10)


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hr_mdp_stress_sf10"
    spark = get_spark("retrieval_eval_probe")
    cases = [
        ("sf0.1 (bare terms)", "/root/testdata/sf0.1",
         ["window", "merge", "stream"], "spark"),
        ("sf10 copy-0 terms", stress,
         ["windowc0", "mergec0", "streamc0"], "sparkc0"),
        ("sf10 3-copy terms", stress,
         ["windowc0", "mergec3", "streamc7"], "sparkc0"),
    ]
    for tag, d, terms, intent in cases:
        # warm the scan once so walls measure the operator, not cold IO
        spark.read.parquet(f"{d}/documents.parquet").count()
        t0 = time.time()
        rows = run_eval(spark, d, terms, intent).collect()
        wall = time.time() - t0
        nz = sum(1 for r in rows if r["n_rel"] > 0 or r["hits_at_k"] > 0)
        print(
            f"{tag}: {wall:.2f}s queries={len(rows)} with_matches={nz} "
            f"sample={sorted((r['query_id'], r['n_rel'], r['ndcg_ppm']) for r in rows)}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
