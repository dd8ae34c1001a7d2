"""Structured Streaming layer tests (SURVEY.md §2.13): DLQ split
completeness on a real stream, checkpointed exactly-once resume,
foreachBatch upsert/SCD2 snapshots, event-time windows, multi-sink
fan-out — all on file streams with availableNow triggers."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hr_moderndatapipeline_spark.operators.scd2 import validate_scd2
from hr_moderndatapipeline_spark.streaming import (
    file_json_stream,
    foreach_batch_scd2,
    foreach_batch_upsert,
    parse_with_dlq,
    progress_summary,
    sessionized_counts,
    start_append_sink,
    start_json_dlq_sink,
    windowed_agg,
)
from hr_moderndatapipeline_spark.streaming.sinks import read_snapshot

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def write_events(path: str, name: str, events: list[dict | str]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write((e if isinstance(e, str) else json.dumps(e)) + "\n")


GOOD = [{"user_id": i, "kind": "login", "ts": f"2024-01-01 0{i}:00:00"} for i in range(5)]
BAD = ["not json at all", '{"user_id": "also-bad"']


def test_dlq_split_stream_completeness(spark, tmp_path):
    src = str(tmp_path / "src")
    write_events(src, "b0.jsonl", GOOD + BAD)
    raw = file_json_stream(spark, src)
    assert raw.isStreaming
    valid, dlq = parse_with_dlq(raw, "value", EVENT_SCHEMA)

    q1 = start_append_sink(
        valid, str(tmp_path / "valid"), str(tmp_path / "cp_v"), available_now=True
    )
    q2 = start_json_dlq_sink(
        dlq, str(tmp_path / "dlq"), str(tmp_path / "cp_d"), available_now=True
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)

    got_valid = spark.read.parquet(str(tmp_path / "valid"))
    got_dlq = spark.read.json(str(tmp_path / "dlq"))
    # valid ∪ dlq = input, disjoint by construction (SURVEY.md §5)
    assert got_valid.count() == len(GOOD)
    assert got_dlq.count() == len(BAD)
    assert set(got_valid.columns) == {"user_id", "kind", "ts"}
    one = json.loads(got_dlq.collect()[0]["value"])
    assert one["reason"] == "schema_parse_failed"


def test_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """T1: the checkpoint must make restarts process only NEW files."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    write_events(src, "b0.jsonl", GOOD)
    raw = file_json_stream(spark, src)
    valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
    q = start_append_sink(valid, out, cp, available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 5

    # restart with one new file: only its rows append
    write_events(src, "b1.jsonl", GOOD[:2])
    raw2 = file_json_stream(spark, src)
    valid2, _ = parse_with_dlq(raw2, "value", EVENT_SCHEMA)
    q2 = start_append_sink(valid2, out, cp, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 7  # 5 + 2, not 10 + 2


def test_foreach_batch_upsert_latest_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    write_events(
        src,
        "b0.jsonl",
        [
            {"user_id": 1, "kind": "v1", "ts": "2024-01-01 00:00:00"},
            {"user_id": 2, "kind": "v1", "ts": "2024-01-01 00:00:00"},
        ],
    )
    def run():
        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        q = foreach_batch_upsert(
            typed, target, str(tmp_path / "cp"), ["user_id"], ["ts"], available_now=True
        )
        q.awaitTermination(120)

    run()
    snap1 = read_snapshot(spark, target)
    assert {r["user_id"]: r["kind"] for r in snap1.collect()} == {1: "v1", 2: "v1"}

    # second micro-batch: update key 1, insert key 3
    write_events(
        src,
        "b1.jsonl",
        [
            {"user_id": 1, "kind": "v2", "ts": "2024-01-02 00:00:00"},
            {"user_id": 3, "kind": "v1", "ts": "2024-01-02 00:00:00"},
        ],
    )
    run()
    snap2 = read_snapshot(spark, target)
    assert {r["user_id"]: r["kind"] for r in snap2.collect()} == {1: "v2", 2: "v1", 3: "v1"}


def test_foreach_batch_scd2_invariants(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "dim")
    write_events(src, "b0.jsonl", [{"user_id": 1, "kind": "a", "ts": "2024-01-01 00:00:00"}])

    def run():
        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        q = foreach_batch_scd2(
            typed, target, str(tmp_path / "cp"), ["user_id"], ["kind"], "ts",
            available_now=True,
        )
        q.awaitTermination(120)

    run()
    write_events(src, "b1.jsonl", [{"user_id": 1, "kind": "b", "ts": "2024-02-01 00:00:00"}])
    run()
    dim = read_snapshot(spark, target)
    assert validate_scd2(dim, ["user_id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    rows = {(r["kind"]): r for r in dim.collect()}
    assert rows["a"]["is_current"] is False and rows["b"]["is_current"] is True
    assert dim.count() == 2


def test_windowed_agg_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    events = [
        {"user_id": 1, "kind": "x", "ts": "2024-01-01 00:10:00"},
        {"user_id": 2, "kind": "x", "ts": "2024-01-01 00:50:00"},
        {"user_id": 3, "kind": "x", "ts": "2024-01-01 01:10:00"},
    ]
    write_events(src, "b0.jsonl", events)

    def run():
        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        win = windowed_agg(
            typed, "ts", "1 hour", {"n": F.count(F.lit(1))}, watermark="0 seconds"
        )
        q = start_append_sink(
            win, str(tmp_path / "out"), str(tmp_path / "cp"), available_now=True
        )
        q.awaitTermination(120)

    # Append mode emits a window only once the watermark passes its
    # end: run 1 flushes the 00:00 window (watermark reaches 01:10);
    # a later event in run 2 advances the watermark past 02:00 and
    # flushes the 01:00 window.
    run()
    write_events(src, "b1.jsonl", [{"user_id": 9, "kind": "x", "ts": "2024-01-01 03:00:00"}])
    run()
    got = {
        str(r["window_start"]): r["n"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {"2024-01-01 00:00:00": 2, "2024-01-01 01:00:00": 1}

    # identical operator on the batch frame
    batch = spark.createDataFrame(
        [(e["user_id"], e["ts"]) for e in events], "user_id int, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got_b = {
        str(r["window_start"]): r["n"]
        for r in windowed_agg(batch, "ts", "1 hour", {"n": F.count(F.lit(1))}).collect()
    }
    assert got_b == got


def test_sessionized_counts_batch(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),   # same session (gap 10m < 30m)
        (1, "2024-01-01 02:00:00"),   # new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionized_counts(df, "ts", "30 minutes", ["user_id"])
    got = sorted((r["user_id"], r["n_events"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_ewma_stream_matches_batch_fold_across_restart(spark, tmp_path):
    """Streaming EWMA (applyInPandasWithState) must equal the BATCH
    ewma_features fold bit-for-bit after two runs over time-ordered
    micro-batches — the seeded-fold composition ewma_update proves,
    here carried through the state-store checkpoint."""
    from hr_moderndatapipeline_spark.operators.relational import ewma_features
    from hr_moderndatapipeline_spark.streaming.stateful import ewma_stream

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    b0 = [
        {"user_id": 1, "value": 10.0, "ts": "2024-01-01 00:00:00"},
        {"user_id": 1, "value": 0.5, "ts": "2024-01-01 01:00:00"},
        {"user_id": 2, "value": 7.0, "ts": "2024-01-01 02:00:00"},
    ]
    b1 = [
        {"user_id": 1, "value": 20.0, "ts": "2024-01-01 03:00:00"},
        {"user_id": 1, "value": 30.0, "ts": "2024-01-01 04:00:00"},
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    write_events(src, "b0.jsonl", b0)

    def run():
        emitted: list = []

        def sink(batch, _bid):
            emitted.extend(batch.collect())

        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", schema)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        out = ewma_stream(typed, [("user_id", "IntegerType")], "value", "ts")
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: r for r in emitted}

    got1 = run()
    assert got1[1]["n_events"] == 2 and got1[2]["ewma"] == 7.0
    write_events(src, "b1.jsonl", b1)
    got2 = run()

    batch_df = spark.createDataFrame(
        [(d["user_id"], float(d["value"]), d["ts"]) for d in b0 + b1],
        "user_id int, value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        r["user_id"]: r
        for r in ewma_features(
            batch_df, ["user_id"], "ts", "value", alpha=0.2
        ).collect()
    }
    assert got2[1]["ewma"] == expect[1]["ewma"]  # bitwise, not approx
    assert got2[1]["n_events"] == expect[1]["n_events"] == 4
    assert 2 not in got2  # unchanged key emits nothing on restart


def test_funnel_stream_matches_batch_fold_across_restart(spark, tmp_path):
    """Streaming funnel progress (two-integer state) must equal the
    batch funnel_steps fold after two time-ordered micro-batches
    carried through the state-store checkpoint; completion latches;
    noise events advance only n_events."""
    from hr_moderndatapipeline_spark.operators.relational import funnel_steps
    from hr_moderndatapipeline_spark.streaming.stateful import funnel_stream

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    steps = ["view", "click", "purchase"]
    b0 = [
        {"user_id": 1, "etype": "view", "ts": "2024-01-01 00:00:00"},
        {"user_id": 1, "etype": "noise", "ts": "2024-01-01 00:05:00"},
        {"user_id": 1, "etype": "click", "ts": "2024-01-01 00:10:00"},
        {"user_id": 2, "etype": "click", "ts": "2024-01-01 00:00:00"},
    ]
    b1 = [
        {"user_id": 1, "etype": "purchase", "ts": "2024-01-01 01:00:00"},
        {"user_id": 1, "etype": "view", "ts": "2024-01-01 02:00:00"},  # latched
        {"user_id": 2, "etype": "view", "ts": "2024-01-01 01:00:00"},
    ]
    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("etype", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    write_events(src, "b0.jsonl", b0)

    def run():
        emitted: list = []

        def sink(batch, _bid):
            emitted.extend(batch.collect())

        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", schema)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        out = funnel_stream(
            typed, [("user_id", "IntegerType")], "ts", "etype", steps
        )
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: r for r in emitted}

    got1 = run()
    assert got1[1]["steps_completed"] == 2 and got1[1]["converted"] == 0
    assert got1[2]["steps_completed"] == 0  # click before any view
    write_events(src, "b1.jsonl", b1)
    got2 = run()
    batch_df = spark.createDataFrame(
        [(d["user_id"], d["etype"], d["ts"]) for d in b0 + b1],
        "user_id int, etype string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        r["user_id"]: r
        for r in funnel_steps(
            batch_df, ["user_id"], "ts", "etype", steps
        ).collect()
    }
    for uid in (1, 2):
        assert got2[uid]["steps_completed"] == expect[uid]["steps_completed"], uid
        assert got2[uid]["converted"] == expect[uid]["converted"], uid
        assert got2[uid]["n_events"] == expect[uid]["n_events"], uid
    assert got2[1]["converted"] == 1  # completed in b1, later view latched


def test_running_totals_state_survives_restart(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-key
    running totals must accumulate ACROSS restarts — the state store
    checkpoint carries (count, sum, last_ts) between runs."""
    from hr_moderndatapipeline_spark.streaming.stateful import running_totals

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    write_events(
        src,
        "b0.jsonl",
        [
            {"user_id": 1, "kind": "a", "ts": "2024-01-01 00:00:00"},
            {"user_id": 1, "kind": "b", "ts": "2024-01-01 01:00:00"},
            {"user_id": 2, "kind": "a", "ts": "2024-01-01 02:00:00"},
        ],
    )

    def run():
        # foreachBatch, not the memory sink: memory-sink queries
        # cannot recover from a checkpoint, and recovery is exactly
        # what this test exercises.
        emitted: list = []

        def sink(batch, _bid):
            emitted.extend(batch.collect())

        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
        typed = valid.withColumn("ts", F.to_timestamp("ts")).withColumn(
            "v", F.lit(1.5)
        )
        out = running_totals(typed, [("user_id", "IntegerType")], "v", "ts")
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["user_id"]: r for r in emitted}

    got1 = run()
    assert got1[1]["n_events"] == 2 and got1[1]["value_sum"] == 3.0
    assert got1[2]["n_events"] == 1

    # restart with one new file: state accumulates, not resets
    write_events(src, "b1.jsonl", [{"user_id": 1, "kind": "c", "ts": "2024-01-01 03:00:00"}])
    got2 = run()
    assert got2[1]["n_events"] == 3 and got2[1]["value_sum"] == 4.5
    assert 2 not in got2  # unchanged keys emit nothing on restart
    ts_ms = got2[1]["last_ts_ms"]
    import datetime as dt

    assert dt.datetime.utcfromtimestamp(ts_ms / 1000).hour == 3


def test_dedup_stream_drops_duplicates_with_bounded_state(spark, tmp_path):
    """Streaming dedup: duplicate (user_id, kind) events within the
    watermark window are dropped across micro-batches; state is
    watermark-bounded (dropDuplicatesWithinWatermark)."""
    from hr_moderndatapipeline_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "src")
    write_events(
        src,
        "b0.jsonl",
        [
            {"user_id": 1, "kind": "a", "ts": "2024-01-01 00:00:00"},
            {"user_id": 1, "kind": "a", "ts": "2024-01-01 00:05:00"},  # dup
            {"user_id": 1, "kind": "b", "ts": "2024-01-01 00:06:00"},
            {"user_id": 2, "kind": "a", "ts": "2024-01-01 00:07:00"},
        ],
    )
    raw = file_json_stream(spark, src)
    valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
    typed = valid.withColumn("ts", F.to_timestamp("ts"))
    deduped = dedup_stream(typed, ["user_id", "kind"], "ts", watermark="1 hour")
    q = start_append_sink(
        deduped, str(tmp_path / "out"), str(tmp_path / "cp"), available_now=True
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["kind"]) for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(1, "a"), (1, "b"), (2, "a")]


def test_publish_snapshot_partitioned(spark, tmp_path):
    """partition_by lays out the snapshot as partition directories so
    reads prune (SURVEY.md §4 uplift over unpartitioned writes)."""
    import os as _os

    from hr_moderndatapipeline_spark.streaming.sinks import publish_snapshot, read_snapshot

    df = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-02", "b")], "id int, month string, v string"
    )
    target = str(tmp_path / "snap")
    publish_snapshot(df, target, "v1", partition_by=["month"])
    assert _os.path.isdir(_os.path.join(target, "v1", "month=2024-01"))
    got = read_snapshot(spark, target)
    assert got.count() == 2
    # partition filter prunes to one directory
    plan = got.filter(F.col("month") == "2024-01")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan


def test_multi_sink_fanout_and_monitor(spark, tmp_path):
    """T4/T5: two concurrent sinks off one source lineage + progress
    snapshot shape."""
    src = str(tmp_path / "src")
    write_events(src, "b0.jsonl", GOOD + BAD)
    raw = file_json_stream(spark, src)
    valid, dlq = parse_with_dlq(raw, "value", EVENT_SCHEMA)
    q1 = start_append_sink(
        valid, str(tmp_path / "v"), str(tmp_path / "cp1"),
        available_now=True, query_name="valid_sink",
    )
    q2 = start_json_dlq_sink(dlq, str(tmp_path / "d"), str(tmp_path / "cp2"), available_now=True)
    # both queries run concurrently off the same lineage
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    s = progress_summary(q1)
    assert s["name"] == "valid_sink" and s["is_active"] is False
    assert s["num_input_rows"] == len(GOOD) + len(BAD)
    assert spark.read.parquet(str(tmp_path / "v")).count() == len(GOOD)
    assert spark.read.json(str(tmp_path / "d")).count() == len(BAD)


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static join: micro-batches pick up dimension
    attributes; unmatched stream rows survive a left join."""
    from hr_moderndatapipeline_spark.streaming import enrich_stream

    src = str(tmp_path / "src")
    write_events(src, "b0.jsonl", GOOD)  # user_id 0..4
    raw = file_json_stream(spark, src)
    valid, _ = parse_with_dlq(raw, "value", EVENT_SCHEMA)
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "silver"), (2, "gold")], "user_id int, tier string"
    )
    enriched = enrich_stream(valid, dim, ["user_id"], how="left")
    q = start_append_sink(
        enriched, str(tmp_path / "out"), str(tmp_path / "cp"), available_now=True
    )
    q.awaitTermination(120)
    got = {r["user_id"]: r["tier"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got[0] == "gold" and got[1] == "silver"
    assert got[3] is None and got[4] is None  # left join keeps unmatched


def test_stream_stream_join_within_bound(spark, tmp_path):
    """Watermarked stream-stream join: pairs only within the event-
    time bound, across micro-batch boundaries (join state carries
    the left row until the right arrives)."""
    from hr_moderndatapipeline_spark.streaming import stream_stream_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    write_events(lsrc, "b0.jsonl", [
        {"user_id": 1, "kind": "error", "ts": "2024-01-01 10:00:00"},
        {"user_id": 2, "kind": "error", "ts": "2024-01-01 12:00:00"},
    ])
    write_events(rsrc, "b0.jsonl", [
        {"user_id": 1, "kind": "click", "ts": "2024-01-01 10:05:00"},  # within
        {"user_id": 1, "kind": "click", "ts": "2024-01-01 10:20:00"},  # beyond 10m
        {"user_id": 2, "kind": "click", "ts": "2024-01-01 11:59:00"},  # before window
    ])
    lraw = file_json_stream(spark, lsrc)
    rraw = file_json_stream(spark, rsrc)
    lval, _ = parse_with_dlq(lraw, "value", EVENT_SCHEMA)
    rval, _ = parse_with_dlq(rraw, "value", EVENT_SCHEMA)
    left = lval.select("user_id", F.col("ts").cast("timestamp").alias("error_ts"))
    right = rval.select("user_id", F.col("ts").cast("timestamp").alias("click_ts"))
    joined = stream_stream_join(
        left, right, ["user_id"], "error_ts", "click_ts",
        within="10 minutes", watermark="1 hour",
    )
    q = start_append_sink(
        joined, str(tmp_path / "out"), str(tmp_path / "cp"), available_now=True
    )
    q.awaitTermination(120)
    got = [
        (r["user_id"], str(r["click_ts"]))
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    ]
    assert got == [(1, "2024-01-01 10:05:00")]


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter stream-stream join: a left row with no right match
    inside the time bound is emitted null-padded — but only after the
    watermark passes left_ts + within (state eviction proves no match
    can arrive). A later right-side event advances the watermark."""
    from hr_moderndatapipeline_spark.streaming import stream_stream_join

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    write_events(lsrc, "b0.jsonl", [
        {"user_id": 1, "kind": "error", "ts": "2024-01-01 10:00:00"},  # gets a match
        {"user_id": 2, "kind": "error", "ts": "2024-01-01 10:00:00"},  # never matched
        # advances the LEFT watermark (global watermark = min of both);
        # its own bound (13:10) stays ahead of the watermark, so it is
        # held in state, not emitted
        {"user_id": 8, "kind": "error", "ts": "2024-01-01 13:00:00"},
    ])
    write_events(rsrc, "b0.jsonl", [
        {"user_id": 1, "kind": "click", "ts": "2024-01-01 10:05:00"},
        # watermark advancer: 13:00 - 1h watermark = 12:00 > 10:10 bound
        {"user_id": 9, "kind": "click", "ts": "2024-01-01 13:00:00"},
    ])
    lraw = file_json_stream(spark, lsrc)
    rraw = file_json_stream(spark, rsrc)
    lval, _ = parse_with_dlq(lraw, "value", EVENT_SCHEMA)
    rval, _ = parse_with_dlq(rraw, "value", EVENT_SCHEMA)
    left = lval.select("user_id", F.col("ts").cast("timestamp").alias("error_ts"))
    right = rval.select("user_id", F.col("ts").cast("timestamp").alias("click_ts"))
    joined = stream_stream_join(
        left, right, ["user_id"], "error_ts", "click_ts",
        within="10 minutes", watermark="1 hour", how="leftOuter",
    )
    q = start_append_sink(
        joined, str(tmp_path / "out"), str(tmp_path / "cp"), available_now=True
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (str(r["click_ts"]) if r["click_ts"] is not None else None)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got[1] == "2024-01-01 10:05:00"
    assert 2 in got and got[2] is None  # unmatched left row, null-padded

    import pytest

    with pytest.raises(ValueError):
        stream_stream_join(left, right, ["user_id"], "error_ts", "click_ts", how="rightOuter")


def test_null_payload_routes_to_dlq_not_valid(spark):
    """A NULL payload (Kafka tombstone) must not surface as an
    all-null VALID row: from_json(NULL) has a NULL corrupt-record
    field, which the ok-filter alone would misread as valid."""
    from pyspark.sql import types as T

    raw = spark.createDataFrame(
        [('{"user_id": 1}',), (None,), ("not json",)], "value string"
    )
    schema = T.StructType([T.StructField("user_id", T.IntegerType())])
    valid, dlq = parse_with_dlq(raw, "value", schema)
    assert [r["user_id"] for r in valid.collect()] == [1]
    assert dlq.count() == 2  # the tombstone AND the corrupt row


def test_batch_publish_replay_is_noop(spark, tmp_path):
    """Replaying an already-published batch id (crash after publish,
    before checkpoint commit) must not write a new version — and must
    NEVER overwrite a directory the merge lineage reads."""
    import os

    from hr_moderndatapipeline_spark.streaming.sinks import (
        _publish_batch_snapshot,
        read_snapshot,
    )

    target = str(tmp_path / "t")
    df = spark.range(0, 10).toDF("k")
    _publish_batch_snapshot(df, target, batch_id=0)
    _publish_batch_snapshot(df, target, batch_id=0)  # replay: no-op
    versions = [d for d in os.listdir(target) if d.startswith("v")]
    assert versions == ["v0"]
    # a NEW batch whose id collides with an existing version dir
    # still publishes to a fresh physical directory
    _publish_batch_snapshot(spark.range(10, 20).toDF("k"), target, batch_id=1)
    assert sorted(d for d in os.listdir(target) if d.startswith("v")) == ["v0", "v1"]
    assert read_snapshot(spark, target).count() == 10


def test_streaming_session_windows_matches_batch(spark, sf_dir):
    """The session-window lifecycle's final state (two availableNow
    runs through one checkpoint, complete mode) must equal the
    one-shot BATCH session_window over the same events — the
    cross-restart state-recovery pin for native sessionization."""
    from hr_moderndatapipeline_spark.queries.streaming_queries import (
        q_streaming_session_windows,
    )
    from hr_moderndatapipeline_spark.sources.readers import load_table

    got = {
        (r["user_id"], r["session_start_epoch"], r["session_end_epoch"],
         r["n_events"])
        for r in q_streaming_session_windows(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("user_id", "ts")
    )
    batch = sessionized_counts(ev, "ts", "30 minutes", ["user_id"])
    expect = {
        (r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
        for r in batch.select(
            "user_id",
            F.unix_timestamp("session_start").alias("start_epoch"),
            F.unix_timestamp("session_end").alias("end_epoch"),
            "n_events",
        ).collect()
    }
    assert got == expect
    assert len(got) > 100  # real session structure, not a degenerate set


def test_session_window_append_mode_finalizes_on_watermark(spark, tmp_path):
    """Production session emission: APPEND mode emits a session only
    once the watermark passes its close (end + gap). A later sentinel
    event advances the watermark and flushes the earlier sessions;
    the sentinel's own still-open session is NOT emitted — the
    complement of the complete-mode lifecycle
    (q_streaming_session_windows), which re-emits open state."""
    from hr_moderndatapipeline_spark.streaming.windows import sessionized_counts

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    b0 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00"},
        {"user_id": 2, "ts": "2024-01-01 10:05:00"},
    ]
    b1 = [{"user_id": 999, "ts": "2024-01-01 20:00:00"}]  # sentinel
    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    write_events(src, "b0.jsonl", b0)

    def run():
        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", schema)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        sess = sessionized_counts(
            typed, "ts", "30 minutes", ["user_id"], watermark="1 minute"
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()
    write_events(src, "b1.jsonl", b1)
    run()
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # exactly the b0 sessions, finalized by the sentinel's watermark
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 2),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:35:00", 1),
    }
    assert all(u != 999 for u, *_ in got)  # open session not emitted


def test_session_window_append_state_eviction_via_lastprogress(
    spark, tmp_path
):
    """Flushed sessions must leave the state store (VERDICT r9 #3 —
    the reason the append face is the production one: complete mode's
    state is ALL sessions ever, append mode's is open sessions only).
    Pinned on the query's own lastProgress state-operator counters:
    after run 1 both sessions are open (2 state rows, 0 emitted);
    after the sentinel advances the watermark, the two finalized
    sessions are emitted AND evicted — state holds only the
    sentinel's open session."""
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    b0 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00"},
        {"user_id": 2, "ts": "2024-01-01 10:05:00"},
    ]
    b1 = [{"user_id": 999, "ts": "2024-01-01 20:00:00"}]
    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("ts", T.StringType()),
        ]
    )

    def run():
        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", schema)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        sess = sessionized_counts(
            typed, "ts", "30 minutes", ["user_id"], watermark="1 minute"
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        ops = q.lastProgress["stateOperators"]
        assert len(ops) == 1
        return ops[0]

    write_events(src, "b0.jsonl", b0)
    st1 = run()
    assert st1["numRowsTotal"] == 2          # both sessions open, in state
    write_events(src, "b1.jsonl", b1)
    st2 = run()
    assert st2["numRowsTotal"] == 1          # flushed sessions EVICTED
    assert spark.read.parquet(out).count() == 2  # ...and emitted once


def test_streaming_session_windows_append_lifecycle(spark, sf_dir):
    """The append-mode lifecycle entry
    (q_streaming_session_windows_append): across two checkpointed
    availableNow runs with a restart, the exactly-once file sink must
    hold precisely the sessions the final watermark (max event time −
    1 h) finalized — every batch session closed before the watermark,
    none after, and no duplicates across the restart."""
    from hr_moderndatapipeline_spark.queries.streaming_queries import (
        q_streaming_session_windows_append,
    )
    from hr_moderndatapipeline_spark.sources.readers import load_table

    rows = q_streaming_session_windows_append(spark, sf_dir).collect()
    got = [
        (r["user_id"], r["session_start_epoch"], r["session_end_epoch"],
         r["n_events"])
        for r in rows
    ]
    assert len(set(got)) == len(got), "duplicate emission across restart"
    got_set = set(got)

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("user_id", "ts")
    )
    wm = (
        ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0] - 3600
    )
    batch = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in sessionized_counts(ev, "ts", "30 minutes", ["user_id"])
        .select(
            "user_id",
            F.unix_timestamp("session_start").alias("s"),
            F.unix_timestamp("session_end").alias("e"),
            "n_events",
        )
        .collect()
    }
    assert got_set <= batch, "emitted a session batch sessionization lacks"
    closed = {t for t in batch if t[2] < wm}
    still_open = batch - closed
    assert closed <= got_set, "a watermark-closed session was never emitted"
    assert not (got_set & still_open), "an open-tail session leaked out"
    assert len(closed) > 100  # real finalized structure
