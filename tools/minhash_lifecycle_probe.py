"""Amortization evidence for the MinHash index/probe lifecycle
(round-12): at a stress geometry, measure

1. the one-shot face over corpus ∪ batch restricted to
   batch-involving pairs — what every incremental crawl costs
   WITHOUT a published index (the full corpus re-shingled and
   re-signed per batch),
2. the index build + publish (one-time: narrow bucket rows sorted by
   (band_idx, bucket) for row-group pruning, plus the id-keyed
   shingle-set table),
3. the probe against the PUBLISHED tables — what each crawl costs
   WITH the index (only the batch is hashed; corpus work is the
   bucket join + matched-id set fetch).

The lifecycle pays off after build/(one_shot − probe) batches. The
law (probe == one-shot restricted) is asserted on the full result.

Usage: python tools/minhash_lifecycle_probe.py [sf_dir] [out_dir] [batch_mod]
  batch_mod: batch = doc_id % batch_mod == 0 (default 50 → 2%)
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.dedup import (  # noqa: E402
    minhash_bucket_counts,
    minhash_dedup_pairs_portable,
    minhash_index_portable,
    minhash_probe_portable,
)

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hr_mdp_stress_sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/minhash_index_probe"
    batch_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("minhash_lifecycle_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # the shift MUST clear the corpus id range (the probe's
    # disjoint-ids contract): the stress generator offsets copies by
    # 1e7, so a fixed 1e9 shift collides from copy 100 upward — at
    # sf30 corpus doc 1_000_000_000 (copy 100's base doc 0) aliased
    # the shifted batch doc 0 and broke BOTH law faces. Derive it.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    shift = max_id + 1_000_000
    batch = docs.filter(F.col("doc_id") % batch_mod == 0).withColumn(
        "doc_id", F.col("doc_id") + shift
    )
    n_docs = docs.count()  # warm the scan so the one-shot isn't billed IO
    n_batch = batch.count()

    t0 = time.time()
    one_shot = sorted(
        tuple(r)
        for r in minhash_dedup_pairs_portable(
            docs.unionByName(batch), "doc_id", "text", shingle_n=3
        )
        .filter(F.col("doc_id_b") >= shift)
        .collect()
    )
    t_one_shot = round(time.time() - t0, 2)

    t0 = time.time()
    buckets, sets = minhash_index_portable(docs, "doc_id", "text", shingle_n=3)
    shutil.rmtree(out, ignore_errors=True)
    # sort by (band_idx, bucket): parquet row-group min/max then
    # prunes the probe's bucket join reads (the bm25 postings recipe)
    buckets.sort("band_idx", "bucket").write.parquet(f"{out}/buckets.parquet")
    sets.write.parquet(f"{out}/sets.parquet")
    # the counts by-product (cap check becomes O(batch buckets))
    minhash_bucket_counts(
        spark.read.parquet(f"{out}/buckets.parquet")
    ).write.parquet(f"{out}/counts.parquet")
    t_build = round(time.time() - t0, 2)

    t0 = time.time()
    probed = sorted(
        tuple(r)
        for r in minhash_probe_portable(
            batch,
            spark.read.parquet(f"{out}/buckets.parquet"),
            spark.read.parquet(f"{out}/sets.parquet"),
            "doc_id",
            "text",
            shingle_n=3,
        ).collect()
    )
    t_probe = round(time.time() - t0, 2)

    t0 = time.time()
    probed_counts = sorted(
        tuple(r)
        for r in minhash_probe_portable(
            batch,
            spark.read.parquet(f"{out}/buckets.parquet"),
            spark.read.parquet(f"{out}/sets.parquet"),
            "doc_id",
            "text",
            shingle_n=3,
            index_bucket_counts=spark.read.parquet(f"{out}/counts.parquet"),
        ).collect()
    )
    t_probe_counts = round(time.time() - t0, 2)
    assert probed_counts == one_shot, "counts-path law violated at stress scale"

    assert probed == one_shot, (
        f"lifecycle law violated at stress scale: "
        f"{len(probed)} probe vs {len(one_shot)} one-shot pairs"
    )
    res = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_batch": n_batch,
        "n_pairs": len(probed),
        "one_shot_sec": t_one_shot,
        "index_build_publish_sec": t_build,
        "probe_sec": t_probe,
        "probe_counts_path_sec": t_probe_counts,
        "breakeven_batches": round(
            t_build / max(t_one_shot - t_probe, 1e-9), 1
        ),
        "results_equal": True,
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
