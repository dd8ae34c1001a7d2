"""End-to-end daily pipeline: the round-4 orchestration composed
with the engine's incremental primitives — exactly the run an
Airflow-scheduled deployment of the reference performs nightly
(airflow/dags/produce_event_dag.py + jobs/bronze/bronze_builder.py),
expressed as a Dag of engine operators:

    extract (HWM incremental) → merge (latest-wins upsert, published
    snapshot) → aggregate (incremental state fold, published
    snapshot)

Asserted: per-day incremental behavior (day 2 extracts ONLY day-2
rows), final current table equals latest-per-key over all data,
incrementally-folded aggregates equal a full recompute, and journal
resume (a re-run of a completed logical date executes nothing).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.cdc import upsert_apply
from hr_moderndatapipeline_spark.operators.incremental import (
    aggregate_batch,
    finalize_aggs,
    merge_agg_state,
)
from hr_moderndatapipeline_spark.plans.orchestrate import Dag, TaskSpec
from hr_moderndatapipeline_spark.sources.watermark import (
    MemoryWatermarkStore,
    advance_watermark,
    incremental_read,
)
from hr_moderndatapipeline_spark.streaming.sinks import (
    publish_snapshot,
    read_snapshot,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2026, 8, day, hour)


def test_daily_dag_extract_merge_aggregate_resume(spark, tmp_path):
    rows = [
        # key, status, amount, updated_at
        (1, "open", 10, _ts(1, 1)),
        (2, "open", 20, _ts(1, 2)),
        (3, "open", 30, _ts(1, 3)),
        (1, "closed", 11, _ts(2, 1)),  # day-2 update of key 1
        (4, "open", 40, _ts(2, 2)),    # day-2 insert
    ]
    source = spark.createDataFrame(
        rows, "k int, status string, amount long, updated_at timestamp"
    )
    store = MemoryWatermarkStore()
    current_t = str(tmp_path / "current")
    agg_t = str(tmp_path / "agg")
    aggs = {"amount": "sum", "k": "count"}
    extracted_counts: list[int] = []

    def extract(ctx):
        # day boundary = the logical date: the HWM filter plus a
        # closed upper bound makes the run reproducible (late data
        # lands in the next run, never silently mutates this one)
        upper = F.lit(ctx.logical_date).cast("timestamp") + F.expr("INTERVAL 1 DAY")
        batch = incremental_read(source, "updated_at", store, "orders").filter(
            F.col("updated_at") < upper
        )
        n = batch.count()
        extracted_counts.append(n)
        return batch

    def merge(ctx):
        batch = ctx.results["extract"]
        target = read_snapshot(spark, current_t)
        merged = batch if target is None else upsert_apply(
            target, batch, ["k"], "updated_at"
        )
        publish_snapshot(merged, current_t, f"v{ctx.logical_date}")
        return merged

    def aggregate(ctx):
        batch = ctx.results["extract"]
        state = read_snapshot(spark, agg_t)
        new_state = merge_agg_state(
            state, aggregate_batch(batch, ["status"], aggs), ["status"], aggs
        )
        publish_snapshot(new_state, agg_t, f"v{ctx.logical_date}")
        # only after both sinks committed does the watermark move —
        # a crash before this point replays the batch idempotently
        advance_watermark(batch, "updated_at", store, "orders")

    def mk_dag():
        return Dag(
            "daily_orders",
            [
                TaskSpec("extract", extract),
                TaskSpec("merge", merge, ("extract",)),
                TaskSpec("aggregate", aggregate, ("merge",)),
            ],
            state_path=str(tmp_path / "dagstate.json"),
        )

    r1 = mk_dag().run("2026-08-01")
    assert all(r.state == "success" for r in r1.values())
    r2 = mk_dag().run("2026-08-02")
    assert all(r.state == "success" for r in r2.values())
    # day 1 saw 3 rows; day 2 extracted ONLY the 2 new rows
    assert extracted_counts == [3, 2]

    cur = {r.k: (r.status, r.amount) for r in read_snapshot(spark, current_t).collect()}
    assert cur == {1: ("closed", 11), 2: ("open", 20), 3: ("open", 30), 4: ("open", 40)}

    # incremental agg state over the two batches == full recompute
    # over everything EXTRACTED (the day-1 version of key 1 was a
    # real event; aggregate state counts events, not current rows)
    got = {
        r.status: (r.amount_sum, r.k_count)
        for r in finalize_aggs(read_snapshot(spark, agg_t), aggs).collect()
    }
    full = {
        r.status: (r.amount_sum, r.k_count)
        for r in finalize_aggs(aggregate_batch(source, ["status"], aggs), aggs).collect()
    }
    assert got == full == {"open": (100, 4), "closed": (11, 1)}

    # journal resume: the completed date re-runs as all-skipped
    r2b = mk_dag().run("2026-08-02")
    assert all(r.state == "skipped" for r in r2b.values())
    assert extracted_counts == [3, 2]  # nothing re-executed
