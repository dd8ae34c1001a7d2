"""Measured execution metrics from the executed plan.

"One shuffle on the group keys" (SCALING.md) is a claim about plan
SHAPE; this module reads what actually moved: after an action, every
physical node's SQLMetrics (shuffle bytes/records, spill, output
rows) are sitting on the executed plan — no listener, no UI
scraping, no extra jobs. `bench.py` publishes these per headline
query so a cross-round diff catches a shuffle-volume regression even
when timing noise (ambient host load) hides it.

AQE detail: the top node is `AdaptiveSparkPlan`; metrics live on the
FINAL plan (`executedPlan()`), and QueryStageExec nodes hide their
materialized subtree behind `.plan()` (their `children()` is empty)
— the walk descends through both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# SQLMetric internal names (metric._1()), not the UI display labels
_KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "spillSize")


def _walk(node, acc: dict) -> None:
    m = node.metrics()
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        name = kv._1()
        if name in _KEYS:
            acc[name] = acc.get(name, 0) + kv._2().value()
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), acc)
    if "QueryStage" in node.nodeName():
        # QueryStageExec nodes have NO children(); the materialized
        # subtree (where the Exchange and its counters live) hangs
        # off .plan()
        _walk(node.plan(), acc)


def executed_metrics(df: DataFrame) -> dict:
    """Aggregate shuffle/spill metrics over the EXECUTED plan of
    ``df`` (call after an action; pre-execution the counters are 0).
    Returns {'shuffle_bytes', 'shuffle_records', 'spill_bytes'}."""
    top = df._jdf.queryExecution().executedPlan()
    try:
        plan = top.executedPlan()  # AdaptiveSparkPlanExec -> final
    except Exception:  # noqa: BLE001 — non-AQE plan
        plan = top
    acc: dict = {}
    _walk(plan, acc)
    return {
        "shuffle_bytes": int(acc.get("shuffleBytesWritten", 0)),
        "shuffle_records": int(acc.get("shuffleRecordsWritten", 0)),
        "spill_bytes": int(acc.get("spillSize", 0)),
    }


def files_read(df: DataFrame) -> int:
    """Total files actually opened by every file scan in the EXECUTED
    plan (FileSourceScanExec's ``numFiles`` SQLMetric, summed; call
    after an action). This is the RUNTIME face of a pruning claim:
    "``_t IN (...)`` prunes the partitioned index" is a plan-text
    assertion until the scan's file count says so — the footer-
    verification discipline (test_zorder/test_fileindex) applied to
    any partitioned publish."""

    def walk(node, acc: list) -> None:
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numFiles":
                acc.append(int(kv._2().value()))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), acc)
        if "QueryStage" in node.nodeName():
            walk(node.plan(), acc)

    top = df._jdf.queryExecution().executedPlan()
    try:
        plan = top.executedPlan()
    except Exception:  # noqa: BLE001 — non-AQE plan
        plan = top
    acc: list = []
    walk(plan, acc)
    return sum(acc)
