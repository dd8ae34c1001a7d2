"""Amortized-wall evidence for the PRODUCTIZED edge-publish
lifecycle (VERDICT r11 #1 follow-through — the raw-posture numbers
live in tools/edge_publish_probe.py; this measures the shipped
operator faces end-to-end).

ADJUDICATION (r12, recorded in SCALING.md): the fresh-JVM
``--prep-only`` A/B reps CORRECTED the r11 probe — inline and
published edge prep are at PARITY at the sf10 geometry (22–24s vs
26–29s; both dominated by the shared repartition(dst) + eager
checkpoint of 117M edges). The r11 "1.9×" compared a cold-cache
inline run against a twice-warmed published run in one process.
Modes:

1. inline face — label_propagation(edges, 5 rounds) straight off the
   orders ⋈ lineitem build (what customer_supplier_communities pays),
2. publish_edges (one-time),
3. published face — label_propagation_from_published(path, 5 rounds)
   (what communities_published_edges pays per query).

Also measures early_stop=True on the published face: at this
geometry LPA is still oscillating/converging, so the probe reports
whether any rounds were actually skipped (the flag must never change
the result — equality is unit-pinned; this is the wall-clock face).

Usage: python tools/edge_lifecycle_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.operators.graph import (  # noqa: E402
    label_propagation,
    label_propagation_from_published,
    publish_edges,
)
from hr_moderndatapipeline_spark.queries.dataops import (  # noqa: E402
    _community_size_histogram,
    _cust_supp_edges,
)

PATH = "/tmp/edge_lifecycle_sym.parquet"


def main() -> None:
    prep_only = "--prep-only" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/hr_mdp_stress_sf10"
    shutil.rmtree(PATH, ignore_errors=True)
    spark = get_spark("edge_lifecycle_probe")
    out: dict = {"sf_dir": sf_dir}

    if prep_only:
        # ONE inline prep + ONE published prep per process — repeated
        # preps in a single JVM kept corrupting each other through
        # shuffle/RDD cleanup races (async unpersist → FetchFailed;
        # no unpersist → heap OOM; blocking unpersist → ContextCleaner
        # still removed a shuffle file a later eager checkpoint read —
        # all observed 2026-08-16). The caller loops the process for
        # repetitions; both faces are equally cold per rep.
        if not shutil.os.path.isdir(PATH):
            t0 = time.time()
            publish_edges(_cust_supp_edges(spark, sf_dir), PATH)
            out["publish_sec"] = round(time.time() - t0, 1)
        from hr_moderndatapipeline_spark.operators.graph import (
            load_published_edges,
            symmetrize_edges,
        )

        t0 = time.time()
        sym = (
            symmetrize_edges(_cust_supp_edges(spark, sf_dir))
            .repartition("dst")
            .localCheckpoint(eager=True)
        )
        n_inline = sym.count()
        out["prep_inline_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        sym2 = (
            load_published_edges(spark, PATH)
            .repartition("dst")
            .localCheckpoint(eager=True)
        )
        n_pub = sym2.count()
        out["prep_published_sec"] = round(time.time() - t0, 1)
        assert n_inline == n_pub, (n_inline, n_pub)
        out["n_edges"] = n_inline
        print("RESULT " + json.dumps(out), flush=True)
        spark.stop()
        return

    t0 = time.time()
    inline = sorted(
        tuple(r)
        for r in _community_size_histogram(
            label_propagation(_cust_supp_edges(spark, sf_dir), iterations=5)
        ).collect()
    )
    out["inline_lpa5_sec"] = round(time.time() - t0, 1)
    print(f"inline 5-round LPA: {out['inline_lpa5_sec']}s", flush=True)

    t0 = time.time()
    publish_edges(_cust_supp_edges(spark, sf_dir), PATH)
    out["publish_sec"] = round(time.time() - t0, 1)
    print(f"publish_edges (once): {out['publish_sec']}s", flush=True)

    t0 = time.time()
    published = sorted(
        tuple(r)
        for r in _community_size_histogram(
            label_propagation_from_published(spark, PATH, iterations=5)
        ).collect()
    )
    out["published_lpa5_sec"] = round(time.time() - t0, 1)
    print(f"published 5-round LPA: {out['published_lpa5_sec']}s", flush=True)
    assert published == inline, "published face diverged from inline"

    saved = out["inline_lpa5_sec"] - out["published_lpa5_sec"]
    out["amortize_after_queries"] = (
        round(out["publish_sec"] / saved, 1) if saved > 0 else None
    )

    t0 = time.time()
    early = sorted(
        tuple(r)
        for r in _community_size_histogram(
            label_propagation_from_published(
                spark, PATH, iterations=5, early_stop=True
            )
        ).collect()
    )
    out["published_lpa5_early_stop_sec"] = round(time.time() - t0, 1)
    assert early == inline, "early_stop changed the result"
    print(
        f"published + early_stop: {out['published_lpa5_early_stop_sec']}s",
        flush=True,
    )

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
