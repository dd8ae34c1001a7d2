"""Streaming-layer driver entries (SURVEY.md §2.13): each materializes
the test corpus as a JSON-lines stream source, runs the REAL
Structured Streaming path (file source → validation split →
checkpointed sinks / foreachBatch merge) with an availableNow
trigger, and returns the sunk result as a batch frame.

Rows-only for the driver (streaming execution + engine-native
checkpointing are not ANSI-SQL-expressible); invariants and
exactly-once resume semantics are pinned by tests/test_streaming.py.
Determinism: sources derive from the deterministic events table and
sinks are re-created per run under a content-keyed temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hr_moderndatapipeline_spark.sources.readers import load_table
from hr_moderndatapipeline_spark.streaming import (
    file_json_stream,
    foreach_batch_scd2,
    parse_with_dlq,
    start_append_sink,
    start_json_dlq_sink,
)
from hr_moderndatapipeline_spark.streaming.sinks import read_snapshot


def _await(q, timeout_s: int = 300) -> None:
    """Wait for an availableNow query and FAIL LOUDLY on timeout:
    ``awaitTermination(t)`` returns False when the trigger has not
    finished — proceeding would read a half-processed checkpoint and
    return a silently wrong result (ADVICE r8)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise RuntimeError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{timeout_s}s — refusing to read a partial checkpoint"
        )



PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _workdir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Fresh work dir per (application, query, sf): stale state must
    never leak into checkpoints or sinks, and concurrent processes
    (driver gate vs user bench) must not clear each other's dirs —
    hence the applicationId scoping (functions/workdirs.py)."""
    from hr_moderndatapipeline_spark.functions.workdirs import process_workdir

    return process_workdir(spark, "hr_mdp_stream", name, sf_dir)


def _events_payloads(spark: SparkSession, sf_dir: str, corrupt_every: int | None) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"), "value",
    )
    payload = F.to_json(F.struct(*[F.col(c) for c in ev.columns]))
    if corrupt_every:
        payload = F.when(
            F.col("event_id") % corrupt_every == 0, F.concat(F.lit("x"), payload)
        ).otherwise(payload)
    return ev.select(payload.alias("value"))


def q_streaming_dlq_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming DLQ path: events serialized to JSON-lines files
    (every 10th payload corrupted) → file stream → from_json split →
    valid rows to a checkpointed parquet append sink, invalid to a
    JSON DLQ sink → both read back. Returns per-route counts."""
    wd = _workdir(spark, sf_dir, "dlq")
    src, valid_out, dlq_out = f"{wd}/src", f"{wd}/valid", f"{wd}/dlq"
    _events_payloads(spark, sf_dir, corrupt_every=10).coalesce(4).write.text(src)

    raw = file_json_stream(spark, src)
    valid, dlq = parse_with_dlq(raw, "value", PAYLOAD_SCHEMA)
    q1 = start_append_sink(valid, valid_out, f"{wd}/cp_v", available_now=True)
    q2 = start_json_dlq_sink(dlq, dlq_out, f"{wd}/cp_d", available_now=True)
    _await(q1)
    _await(q2)

    v = spark.read.schema(
        "event_id long, user_id int, event_type string, ts string, value double"
    ).parquet(valid_out).select(
        F.lit("valid").alias("route"), "event_id"
    )
    d = spark.read.json(dlq_out).select(F.lit("dlq").alias("route"), F.lit(None).cast("long").alias("event_id"))
    return v.unionByName(d).groupBy("route").agg(F.count(F.lit(1)).alias("n_rows"))


def q_streaming_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 build: the first 200 users' events stream
    through foreachBatch two-phase apply into a versioned snapshot;
    returns per-user version/current counts (equals the batch
    scd2_from_history on the same slice — asserted in tests)."""
    wd = _workdir(spark, sf_dir, "scd2")
    src, target = f"{wd}/src", f"{wd}/target"
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        )
    )
    ev.select(payload.alias("value")).coalesce(2).write.text(src)

    raw = file_json_stream(spark, src)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    valid, _ = parse_with_dlq(raw, "value", schema)
    typed = valid.withColumn("ts", F.to_timestamp("ts"))
    q = foreach_batch_scd2(
        typed, target, f"{wd}/cp", ["user_id"], ["event_type"], "ts", available_now=True
    )
    _await(q)

    snap = read_snapshot(spark, target)
    return snap.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_current"),
    )


def q_session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-NATIVE sessionization operator (``session_window``,
    streaming/windows.py sessionized_counts — same code path batch
    and streaming) over the events table: 30-minute inactivity gap
    per user. Complements ``user_sessions``, which derives sessions
    with the lag-gap-cumsum formulation; here the oracle restates the
    session semantics as gaps-and-islands SQL, so the native
    operator's exact merge rule (new session iff the gap is ≥ the
    inactivity window; session_end = last event + gap) is
    cross-engine-verified."""
    from hr_moderndatapipeline_spark.streaming.windows import sessionized_counts

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    out = sessionized_counts(ev, "ts", "30 minutes", ["user_id"])
    # Derived (non-passthrough) timestamps cross the oracle boundary
    # as epoch-second BIGINTs: the driver's timestamp canonicalization
    # is only proven for passthrough/min-max columns (see
    # tests/test_ts_canon.py), and integers have one canonical form.
    return out.select(
        F.unix_timestamp("session_start").alias("session_start_epoch"),
        F.unix_timestamp("session_end").alias("session_end_epoch"),
        "user_id",
        "n_events",
    )


ORACLE_SESSION_WINDOW_COUNTS = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
       CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end_epoch,
       user_id,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, sid
"""



def q_streaming_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join, end to end: error
    events and click events stream from separate JSON-lines sources;
    each error joins clicks by the same user within the next 10
    minutes, and errors whose bound has passed the global watermark
    emit null-padded (the "error with no follow-up click" shape).
    Returns matched/unmatched counts. Rows-only: streaming state
    eviction is not ANSI-SQL-expressible; exact semantics are pinned
    by tests/test_streaming.py on a hand-built case."""
    from hr_moderndatapipeline_spark.streaming import stream_stream_join

    wd = _workdir(spark, sf_dir, "ssjoin")
    lsrc, rsrc = f"{wd}/errors", f"{wd}/clicks"
    ev = load_table(spark, sf_dir, "events")
    for src, kind in ((lsrc, "error"), (rsrc, "click")):
        payload = F.to_json(
            F.struct(
                "event_id", "user_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            )
        )
        ev.filter(F.col("event_type") == kind).select(
            payload.alias("value")
        ).coalesce(2).write.text(src)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    lval, _ = parse_with_dlq(file_json_stream(spark, lsrc), "value", schema)
    rval, _ = parse_with_dlq(file_json_stream(spark, rsrc), "value", schema)
    left = lval.select(
        F.col("user_id"), F.to_timestamp("ts").alias("error_ts")
    )
    right = rval.select(
        F.col("user_id"), F.to_timestamp("ts").alias("click_ts")
    )
    joined = stream_stream_join(
        left, right, ["user_id"], "error_ts", "click_ts",
        within="10 minutes", watermark="1 minute", how="leftOuter",
    )
    q = start_append_sink(joined, f"{wd}/out", f"{wd}/cp", available_now=True)
    _await(q)
    out = spark.read.schema(
        "user_id int, error_ts timestamp, click_ts timestamp"
    ).parquet(f"{wd}/out")
    return out.groupBy(
        F.col("click_ts").isNotNull().alias("matched")
    ).agg(F.count(F.lit(1)).alias("n_rows"))


def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming exact dedup end to end
    (``dedup_stream`` → ``dropDuplicatesWithinWatermark``): the first
    2000 events are serialized with every 4th payload DUPLICATED,
    streamed from JSON-lines files, deduplicated on event_id with a
    1-hour watermark, and appended to a checkpointed sink. At 100 TB/
    day the dedup state holds only the watermark window's keys — the
    plain streaming ``dropDuplicates`` alternative accumulates every
    key forever and OOMs. Returns total vs distinct sunk counts
    (equal iff the dedup held). Rows-only: streaming state eviction
    is not ANSI-SQL-expressible; semantics pinned by
    tests/test_streaming.py."""
    wd = _workdir(spark, sf_dir, "dedup")
    src = f"{wd}/src"
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        )
    )
    base = ev.select(payload.alias("value"), "event_id")
    dupes = base.filter(F.col("event_id") % 4 == 0)
    base.unionAll(dupes).select("value").coalesce(2).write.text(src)

    from hr_moderndatapipeline_spark.streaming import dedup_stream

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    valid, _ = parse_with_dlq(file_json_stream(spark, src), "value", schema)
    typed = valid.withColumn("ts", F.to_timestamp("ts"))
    deduped = dedup_stream(typed, ["event_id"], "ts", watermark="1 hour")
    q = start_append_sink(deduped, f"{wd}/out", f"{wd}/cp", available_now=True)
    _await(q)

    out = spark.read.schema(
        "event_id long, user_id int, event_type string, ts timestamp"
    ).parquet(f"{wd}/out")
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


def q_streaming_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom Python DataSource (sources/pyds.py) on the
    driver surface: a slice of events exported as a manifest-JSONL
    feed BY the source's own two-phase-commit writer, then streamed
    back through its offset-tracked stream reader (one micro-batch
    per manifest window) into a checkpointed parquet sink, plus a
    second producer append picked up by a later trigger. Returns
    per-event-type counts over everything the stream delivered —
    rows-only (custom source execution is not ANSI-SQL)."""
    from hr_moderndatapipeline_spark.sources.pyds import (
        append_jsonl_batch,
        register_jsonl_source,
    )
    from hr_moderndatapipeline_spark.streaming.sinks import start_append_sink

    wd = _workdir(spark, sf_dir, "pyds")
    feed, out, cp = f"{wd}/feed", f"{wd}/out", f"{wd}/cp"
    register_jsonl_source(spark)

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ev.select(
        "event_id", "user_id", "event_type", F.col("value").alias("score")
    ).write.format("manifest_jsonl").option("path", feed).mode("append").save()

    stream = spark.readStream.format("manifest_jsonl").option("path", feed).load()
    q = start_append_sink(stream, out, cp, available_now=True)
    _await(q)
    # producer appends after the first drain; a fresh availableNow
    # run resumes from the checkpointed offset and reads ONLY the new file
    append_jsonl_batch(
        feed,
        [{"event_id": -1, "user_id": -1, "event_type": "synthetic", "score": 0.0}],
    )
    stream2 = spark.readStream.format("manifest_jsonl").option("path", feed).load()
    q2 = start_append_sink(stream2, out, cp, available_now=True)
    _await(q2)

    back = spark.read.schema(
        "event_id long, user_id long, event_type string, score double"
    ).parquet(out)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))


def q_streaming_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator end to end
    (streaming/stateful.py ewma_stream, applyInPandasWithState):
    the first 2000 events are split at their event-time midpoint
    into two JSON-lines producer drops; the first is drained into a
    checkpointed update-mode foreachBatch sink, then the second
    arrives and a RESTARTED query folds it into the state-store
    EWMA recovered from the checkpoint — the streaming face of
    ewma_incremental_state's seeded-fold composition (which
    tests/test_streaming.py pins as bitwise-equal to the batch
    fold). Returns each user's final (n_events, last_ts_ms, ewma)
    state. Rows-only: state-store execution is not
    ANSI-SQL-expressible."""
    from pyspark.sql import Window

    from hr_moderndatapipeline_spark.streaming.stateful import ewma_stream

    wd = _workdir(spark, sf_dir, "ewma")
    src, out, cp = f"{wd}/src", f"{wd}/out", f"{wd}/cp"
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id", "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        )
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    # one source dir, two producer drops: the second run restarts from
    # the checkpoint and sees only the new subdirectory's files
    for name, part in (("b0", ev.filter(F.col("ts") < cut)),
                       ("b1", ev.filter(F.col("ts") >= cut))):
        part.select(payload.alias("value")).coalesce(1).write.mode(
            "overwrite"
        ).text(f"{src}/{name}")

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.IntegerType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("ts", T.StringType()),
            ]
        )
        valid, _ = parse_with_dlq(
            file_json_stream(spark, f"{src}/*"), "value", schema
        )
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        state = ewma_stream(
            typed, [("user_id", "IntegerType")], "value", "ts", alpha=0.2
        )

        def _sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (
            state.writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    back = spark.read.schema(
        "user_id int, n_events long, last_ts_ms long, ewma double"
    ).parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        back.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "n_events", "last_ts_ms", "ewma")
    )


def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessionization THROUGH the streaming
    state store (streaming/windows.py sessionized_counts — the same
    code path the batch query session_window_counts verifies
    cross-engine): the first 2000 events split at their event-time
    midpoint into two producer drops; the first drains into a
    checkpointed COMPLETE-mode sink (Spark forbids update mode for
    session-window streaming aggregations), then a RESTARTED query
    recovers each user's sessions from the checkpoint state store and
    extends them with the second drop — complete mode re-emits the
    full session set per run, so the second run's overwrite IS the
    final state, and a batch-1 session extended by batch-2 events
    proves cross-restart state recovery (pinned equal to the one-shot
    batch ``session_window`` result in tests/test_streaming.py).
    Returns (user_id, session_start_epoch, session_end_epoch,
    n_events). Rows-only: state-store execution is not
    ANSI-SQL-expressible (the BATCH session_window query carries the
    cross-engine oracle)."""
    from hr_moderndatapipeline_spark.streaming.windows import sessionized_counts

    wd = _workdir(spark, sf_dir, "sesswin")
    src, out, cp = f"{wd}/src", f"{wd}/out", f"{wd}/cp"
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        )
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    for name, part in (("b0", ev.filter(F.col("ts") < cut)),
                       ("b1", ev.filter(F.col("ts") >= cut))):
        part.select(payload.alias("value")).coalesce(1).write.mode(
            "overwrite"
        ).text(f"{src}/{name}")

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.IntegerType()),
                T.StructField("ts", T.StringType()),
            ]
        )
        valid, _ = parse_with_dlq(
            file_json_stream(spark, f"{src}/*"), "value", schema
        )
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        sess = sessionized_counts(
            typed, "ts", "30 minutes", ["user_id"], watermark="30 days"
        )

        def _sink(batch, _bid):
            # complete mode re-emits the FULL session set each batch;
            # overwrite keeps only the latest full picture
            batch.write.mode("overwrite").parquet(out)

        q = (
            sess.writeStream.foreachBatch(_sink)
            .outputMode("complete")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    back = spark.read.schema(
        "session_start timestamp, session_end timestamp, user_id int,"
        " n_events long"
    ).parquet(out)
    return back.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start_epoch"),
        F.unix_timestamp("session_end").alias("session_end_epoch"),
        "n_events",
    )


def q_streaming_session_windows_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION emission face of streaming sessionization
    (VERDICT r9 #3): native ``session_window`` in APPEND mode with a
    real 1-hour watermark — each session is flushed to the sink
    EXACTLY ONCE, when the watermark passes its close, and its state
    row is evicted. The complete-mode twin
    (``streaming_session_windows``) holds ALL sessions in state
    forever and re-emits the full set per batch — fine for a
    restart-recovery proof, unbounded state growth at scale; THIS
    face is the one you'd run on a real stream (state = open sessions
    only; eviction pinned via ``lastProgress`` state rows in
    tests/test_streaming.py).

    Drive: the first 2000 events split at their event-time midpoint
    into two producer drops across two checkpointed availableNow
    runs (a restart between them). Sessions closed more than 1 hour
    before each run's max event time flush to the exactly-once file
    sink; the open tail (sessions ending within 1 hour of stream
    end) stays in the state store, so the readout is the FINALIZED
    session set — deterministic because the final watermark is a
    pure function of the data. Rows-only: watermark-driven emission
    and state eviction are not ANSI-SQL-expressible (the batch
    ``session_window_counts`` carries the cross-engine oracle for
    the session semantics themselves)."""
    from hr_moderndatapipeline_spark.streaming.windows import sessionized_counts

    wd = _workdir(spark, sf_dir, "sesswinapp")
    src, out, cp = f"{wd}/src", f"{wd}/out", f"{wd}/cp"
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        )
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    for name, part in (("b0", ev.filter(F.col("ts") < cut)),
                       ("b1", ev.filter(F.col("ts") >= cut))):
        part.select(payload.alias("value")).coalesce(1).write.mode(
            "overwrite"
        ).text(f"{src}/{name}")

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.IntegerType()),
                T.StructField("ts", T.StringType()),
            ]
        )
        valid, _ = parse_with_dlq(
            file_json_stream(spark, f"{src}/*"), "value", schema
        )
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        sess = sessionized_counts(
            typed, "ts", "30 minutes", ["user_id"], watermark="1 hour"
        )
        q = (
            sess.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    back = spark.read.schema(
        "session_start timestamp, session_end timestamp, user_id int,"
        " n_events long"
    ).parquet(out)
    return back.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start_epoch"),
        F.unix_timestamp("session_end").alias("session_end_epoch"),
        "n_events",
    )


def q_streaming_funnel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel progress end to end (streaming/stateful.py
    funnel_stream, applyInPandasWithState): the first 2000 events
    split at their event-time midpoint into two producer drops; the
    first drains into a checkpointed update-mode sink, then a
    RESTARTED query folds the second drop into each user's
    TWO-INTEGER state recovered from the checkpoint (bounded state —
    never the event history; the batch equivalence across restarts
    is pinned bit-for-bit in tests/test_streaming.py). Returns the
    per-step session… per-user funnel summary: users per
    steps_completed with conversion flag counts. Rows-only:
    state-store execution is not ANSI-SQL-expressible."""
    from pyspark.sql import Window

    from hr_moderndatapipeline_spark.streaming.stateful import funnel_stream

    wd = _workdir(spark, sf_dir, "funnelstate")
    src, out, cp = f"{wd}/src", f"{wd}/out", f"{wd}/cp"
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.to_json(
        F.struct(
            "event_id", "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        )
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    for name, part in (("b0", ev.filter(F.col("ts") < cut)),
                       ("b1", ev.filter(F.col("ts") >= cut))):
        part.select(payload.alias("value")).coalesce(1).write.mode(
            "overwrite"
        ).text(f"{src}/{name}")

        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.IntegerType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("ts", T.StringType()),
            ]
        )
        valid, _ = parse_with_dlq(
            file_json_stream(spark, f"{src}/*"), "value", schema
        )
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        state = funnel_stream(
            typed, [("user_id", "IntegerType")], "ts", "event_type",
            ["view", "click", "purchase"], tiebreak_col="event_id",
        )

        def _sink(batch, _bid):
            batch.write.mode("append").parquet(out)

        q = (
            state.writeStream.foreachBatch(_sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    back = spark.read.schema(
        "user_id int, n_events long, steps_completed int, converted int"
    ).parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        back.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
    )
    return final.groupBy("steps_completed").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )


def q_streaming_minhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental corpus dedup against the published
    MinHash index (operators/dedup.py minhash_probe_then_absorb):
    the corpus is indexed ONCE as the first sub-publish, then two
    re-crawl batches (10% doc slices under shifted ids) arrive as
    JSON-lines files through a checkpointed foreachBatch stream —
    each micro-batch probes everything published so far, writes its
    pairs, and absorbs itself so the later crawl dedups against the
    earlier one too. Per-tag overwrite writes make checkpoint
    replays idempotent (the tag is the commit id). Returns
    (n_pairs, n_new_docs_matched, n_exact_dups) over the
    accumulated pair table. Rows-only: streaming execution is not
    ANSI-SQL; the accumulation law (union of per-batch pairs ==
    one-shot over corpus ∪ all crawls restricted to crawl-involving
    pairs, in ANY arrival order) is pinned in
    tests/test_r12_ops.py."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_index_portable,
        minhash_probe_then_absorb,
    )

    wd = _workdir(spark, sf_dir, "mhprobe")
    root = f"{wd}/index"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cb, cs = minhash_index_portable(docs, "doc_id", "text", shingle_n=3)
    cb.write.mode("overwrite").parquet(f"{root}/buckets/corpus")
    cs.write.mode("overwrite").parquet(f"{root}/sets/corpus")

    src = f"{wd}/src"
    for i, mod in enumerate((0, 5)):
        crawl = docs.filter(F.col("doc_id") % 10 == mod).select(
            F.to_json(
                F.struct(
                    (F.col("doc_id") + (i + 1) * 1_000_000).alias("doc_id"),
                    "text",
                )
            ).alias("value")
        )
        crawl.coalesce(1).write.mode("append").text(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = file_json_stream(spark, src, max_files_per_trigger=1)
    parsed = stream.select(
        F.from_json(F.col("value"), schema).alias("d")
    ).select("d.doc_id", "d.text")

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        minhash_probe_then_absorb(
            spark,
            batch_df,
            root,
            "doc_id",
            "text",
            batch_tag=f"b{batch_id}",
            shingle_n=3,
        )

    q = (
        parsed.writeStream.foreachBatch(_step)
        .option("checkpointLocation", f"{wd}/cp")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)

    pairs = spark.read.option("recursiveFileLookup", "true").parquet(
        f"{root}/pairs"
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_id_b").cast("bigint").alias("n_new_docs_matched"),
        F.sum((F.col("jaccard") >= 1.0).cast("bigint")).alias("n_exact_dups"),
    )


QUERIES = {
    "streaming_custom_source": q_streaming_custom_source,
    "streaming_minhash_probe": q_streaming_minhash_probe,
    "streaming_session_windows": q_streaming_session_windows,
    "streaming_session_windows_append": q_streaming_session_windows_append,
    "streaming_dlq_roundtrip": q_streaming_dlq_roundtrip,
    "streaming_scd2_snapshot": q_streaming_scd2_snapshot,
    "streaming_join_enrichment": q_streaming_join_enrichment,
    "streaming_dedup_events": q_streaming_dedup_events,
    "streaming_ewma_state": q_streaming_ewma_state,
    "streaming_funnel_state": q_streaming_funnel_state,
    "session_window_counts": q_session_window_counts,
}

#: Streaming-execution entries are rows-only (not ANSI-SQL-
#: expressible); the batch-form session_window query carries a
#: gaps-and-islands oracle.
ORACLES: dict[str, str] = {
    "session_window_counts": ORACLE_SESSION_WINDOW_COUNTS,
}
