"""Dump .explain('formatted') for the round-13 touched queries.

Usage: python tools/dump_plans_r13.py <repo_root> <suffix> [out_dir]
  repo_root: which tree's code to import (e.g. /tmp/r13_base for the
             pre-round worktree, /root/repo for the current tree)
  suffix:    'before' | 'after'
  out_dir:   default /root/repo/plans/r13

Runs on sf0.1 (the bench scale) with the bench session factory, so
the dumps match what the bench executes.
"""

from __future__ import annotations

import io
import os
import sys

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r13"
sys.path.insert(0, REPO)

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark import queries as qmod  # noqa: E402

QUERIES = [
    "customer_supplier_communities",
    "communities_published_edges",
    "event_type_pagerank",
    "fk_integrity_audit",
    "phrase_search",
    "kmeans_cluster_profile",
    "kmeans_silhouette",
    "hybrid_rrf_multi_search",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(os.environ.get("DUMP_ONLY", "").split(",")) - {""}
    spark = get_spark("dump_plans_r13")
    os.makedirs(OUT, exist_ok=True)
    all_q = qmod.queries()
    for name in QUERIES:
        if only and name not in only:
            continue
        try:
            df = all_q[name](spark, sf_dir)
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
