"""Amortization evidence for the BM25 index/probe lifecycle
(VERDICT r10 #4 follow-through): at a stress scale, measure

1. the one-shot batched face (`bm25_rank_batch`) — what every query
   batch costs WITHOUT an index (a full corpus pass each time),
2. the index build + publish (one-time: postings sorted by term for
   row-group pruning + the 1-row stats),
3. the probe against the PUBLISHED index — what each query batch
   costs WITH it.

The lifecycle pays off after build/(one_shot − probe) batches.

Usage: python tools/bm25_lifecycle_probe.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.text import (  # noqa: E402
    bm25_index,
    bm25_probe,
    bm25_rank_batch,
)

QMAP = [
    ("q_scan_filter", ["scan", "filter", "column", "hash"]),
    ("q_stream_join", ["stream", "spark", "join"]),
    ("q_window_merge", ["window", "merge"]),
]


def main() -> None:
    # --suffix cK appends the stress generator's per-copy word suffix
    # to every query term (tools/stress_sweep.py suffixes ALL words),
    # so the probed queries MATCH real documents at stress scale —
    # without it the r11 first-week numbers measured full corpus
    # passes but empty result sets (timing shape right, matches zero).
    # Only the '--suffix=VALUE' form is accepted: a space-separated
    # '--suffix c0' would filter the flag but leave 'c0' positional,
    # silently running unsuffixed against the wrong sf_dir (ADVICE r12).
    if any(a == "--suffix" for a in sys.argv[1:]):
        raise SystemExit("use --suffix=VALUE (space-separated form rejected)")
    args = [a for a in sys.argv[1:] if not a.startswith("--suffix=")]
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    qmap = [(q, [t + suffix for t in ts]) for q, ts in QMAP]
    sf_dir = args[0] if args else "/tmp/hr_mdp_stress_sf10"
    out = args[1] if len(args) > 1 else "/tmp/bm25_index_sf10"
    spark = get_spark("bm25_lifecycle_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()  # warm the scan so the one-shot isn't billed IO

    t0 = time.time()
    one_shot = sorted(
        tuple(r) for r in bm25_rank_batch(docs, "doc_id", "text", qmap).collect()
    )
    t_one_shot = round(time.time() - t0, 2)

    t0 = time.time()
    postings, stats = bm25_index(docs, "doc_id", "text")
    shutil.rmtree(out, ignore_errors=True)
    # sort by term: parquet row-group min/max on _t then prunes the
    # probe's `_t IN (...)` to the queried terms' row groups
    postings.sort("_t").write.parquet(f"{out}/postings.parquet")
    stats.write.parquet(f"{out}/stats.parquet")
    t_build = round(time.time() - t0, 2)

    t0 = time.time()
    probed = sorted(
        tuple(r)
        for r in bm25_probe(
            spark.read.parquet(f"{out}/postings.parquet"),
            spark.read.parquet(f"{out}/stats.parquet"),
            "doc_id",
            qmap,
        ).collect()
    )
    t_probe = round(time.time() - t0, 2)

    assert probed == one_shot, "lifecycle law violated at stress scale"
    n_postings = spark.read.parquet(f"{out}/postings.parquet").count()
    res = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "one_shot_sec": t_one_shot,
        "index_build_publish_sec": t_build,
        "probe_sec": t_probe,
        "breakeven_batches": round(t_build / max(t_one_shot - t_probe, 1e-9), 1),
        "results_equal": True,
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
