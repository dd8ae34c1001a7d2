"""Physical-plan fingerprinting.

A plan regression — a broadcast join flipping to sort-merge at a
bigger scale factor, a filter no longer reaching the scan, a Python
boundary appearing — can hide inside timing noise for rounds. The
fingerprint is a short stable hash of the plan's structural skeleton
(the operator tree with ids, statistics, paths, and expression ids
stripped), so ``bench.py`` can publish one token per query and a
regression shows up as a token DIFF between rounds even when the
seconds look flat.

``fingerprint_counts`` is the human-readable companion used by
``tools/plan_report.py`` for PLANS.md.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

PATTERNS = {
    "exchanges": r"\bExchange\b",
    "broadcast_joins": r"BroadcastHashJoin",
    "sortmerge_joins": r"SortMergeJoin",
    "nested_loop": r"BroadcastNestedLoopJoin|CartesianProduct",
    "window_group_limit": r"WindowGroupLimit",
    "take_ordered": r"TakeOrderedAndProject",
    "pushed_filters": r"PushedFilters: \[[^\]]",
    "arrow_python": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "row_python": r"BatchEvalPython",
}


def plan_of(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` text without printing to stdout."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def fingerprint_counts(plan: str) -> dict[str, int]:
    """Occurrence counts of the scale-relevant plan features."""
    return {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}


def plan_skeleton(plan: str) -> list[str]:
    """The operator tree as a list of node names, in tree order.

    ``formatted`` explain prints the tree first (one node per line,
    ``+- * Project (3)`` style), then a blank line, then per-node
    details — only the tree section is structural; details carry
    exprIds and file paths that churn per session.
    """
    nodes: list[str] = []
    in_tree = False
    for line in plan.splitlines():
        if line.startswith("== Physical Plan =="):
            in_tree = True
            continue
        if not in_tree:
            continue
        if not line.strip():
            break  # end of tree section
        # strip tree art (+- :- spaces), codegen stars, and the (N) id
        bare = re.sub(r"^[\s:+\-]*", "", line).replace("* ", "").strip()
        bare = re.sub(r"\s*\(\d+\)\s*$", "", bare)
        # "Scan parquet spark_catalog.default.t" -> "Scan parquet";
        # keep at most the first two tokens (node kind + flavor)
        nodes.append(" ".join(bare.split()[:2]))
    return nodes


def plan_fingerprint(df: DataFrame) -> str:
    """12-hex-char token: equal ⇔ same operator skeleton + same
    feature counts. Stable across sessions and scale factors as long
    as Catalyst picks the same strategy; any strategy flip changes it."""
    plan = plan_of(df)
    payload = "\n".join(plan_skeleton(plan))
    counts = fingerprint_counts(plan)
    payload += "\n" + ",".join(f"{k}={counts[k]}" for k in sorted(counts))
    return hashlib.sha256(payload.encode()).hexdigest()[:12]
