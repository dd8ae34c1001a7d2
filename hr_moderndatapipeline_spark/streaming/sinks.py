"""Streaming sinks: checkpointed appends, JSON DLQ files, and
foreachBatch merge applies (SURVEY.md §2.13 T1/K4/K6/K8).

The reference appends validated events to Delta with a checkpoint
(kafka/consumer/kafka_DLQ.py:59-63), writes DLQ rows as JSON-lines
files (kafka_DLQ.py:81-90), and sketches — but never finishes — a
``foreachBatch`` streaming upsert (util/verify_spark.py:106-114 is
syntactically broken). Here:

- ``start_append_sink`` / ``start_json_dlq_sink`` — checkpointed
  exactly-once-per-sink appends (parquet stands in for Delta in this
  environment; the option surface is identical).
- ``foreach_batch_upsert`` / ``foreach_batch_scd2`` — K8 done right:
  each micro-batch merges into a versioned parquet snapshot of the
  target via the engine's batch operators (operators/cdc.upsert_apply,
  operators/scd2.scd2_apply). With Delta available the same callback
  body becomes a MERGE; the versioned-directory commit protocol
  (write a FRESH v{n+1}, then atomically publish a _LATEST pointer)
  is the no-transaction-log fallback; replay idempotency comes from a
  _BATCH marker recording the last published batch id (a replayed
  batch is a no-op), never from reusing a version path — overwriting
  a path the merge lineage is concurrently reading is a crash.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_append_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = False,
    query_name: str | None = None,
) -> StreamingQuery:
    """Checkpointed streaming append (K4). ``available_now=True``
    processes the current backlog then stops — the batch-style
    incremental trigger used by tests and scheduled micro-batch
    jobs."""
    w = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", path)
    )
    if query_name:
        w = w.queryName(query_name)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_json_dlq_sink(
    dlq: DataFrame, path: str, checkpoint: str, available_now: bool = False
) -> StreamingQuery:
    """JSON-lines DLQ file sink (K6, kafka_DLQ.py:81-90). In a
    Kafka deployment the same frame goes to ``format("kafka")``
    with a topic option (K5)."""
    return start_append_sink(
        dlq, path, checkpoint, fmt="json", available_now=available_now
    )


def dlq_kafka_payload(
    dlq: DataFrame,
    key_col: str = "key",
    reason: str = "schema_parse_failed",
    payload_cols: Sequence[str] = ("value", "kafka_ts"),
) -> DataFrame:
    """The DLQ re-serialization projection (K5's message shape,
    kafka/consumer/kafka_consumer_contract_signing_events_DLQ.py:116-119):
    original payload columns + a failure reason folded into one JSON
    ``value``, original key as string. Pure batch-or-stream
    projection — unit-testable without a broker."""
    from pyspark.sql import functions as F

    return dlq.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(
            F.struct(*[F.col(c) for c in payload_cols], F.lit(reason).alias("reason"))
        ).alias("value"),
    )


def build_kafka_dlq_writer(
    dlq: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "key",
    reason: str = "schema_parse_failed",
    payload_cols: Sequence[str] = ("value", "kafka_ts"),
):
    """Streaming Kafka DLQ sink (K5, kafka/consumer/kafka_DLQ.py:66-79):
    invalid rows re-published to a DLQ *topic* as JSON with the
    original key and a reason. Returns the configured
    ``DataStreamWriter`` — callers ``.start()`` it; kept separate so
    the full option surface is constructible (and testable) in
    environments without a Kafka broker or the kafka-sql jars."""
    msg = dlq_kafka_payload(dlq, key_col, reason, payload_cols)
    return (
        msg.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def start_kafka_dlq_sink(
    dlq: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    **kwargs,
) -> StreamingQuery:
    """K5 started (requires a broker + spark-sql-kafka in the
    deployment; see ``build_kafka_dlq_writer``)."""
    return build_kafka_dlq_writer(
        dlq, bootstrap_servers, topic, checkpoint, **kwargs
    ).start()


def start_console_sink(
    df: DataFrame, num_rows: int = 10, truncate: bool = False
) -> StreamingQuery:
    """Console debug sink (K7,
    kafka/consumer/kafka_consumer_contract_signing_events_DLQ.py:99-103):
    prints each micro-batch to stdout — the reference's ad-hoc stream
    inspection tool, usually fanned out alongside a durable sink (T4)."""
    return (
        df.writeStream.format("console")
        .option("numRows", str(num_rows))
        .option("truncate", str(truncate).lower())
        .start()
    )


# ── versioned-snapshot target for foreachBatch merges ──

LATEST_MARKER = "_LATEST"

_DELTA_AVAILABLE: dict[str, bool] = {}


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake python package AND jars are loadable
    in this session (the reference's storage layer,
    jobs/bronze/bronze_builder.py:57-71). Checked once per
    application; this container ships neither, so the parquet
    snapshot protocol below is what CI exercises."""
    key = spark.sparkContext.applicationId
    if key not in _DELTA_AVAILABLE:
        try:
            from delta.tables import DeltaTable  # noqa: F401

            spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
            _DELTA_AVAILABLE[key] = True
        except Exception:
            _DELTA_AVAILABLE[key] = False
    return _DELTA_AVAILABLE[key]


def _is_delta_table(target: str) -> bool:
    return os.path.isdir(os.path.join(target, "_delta_log"))


def read_snapshot(spark: SparkSession, target: str) -> DataFrame | None:
    """Current published version of a snapshot table, or None before
    the first publish. Reads Delta natively when the table is Delta
    and the jars are present; otherwise the versioned-parquet
    marker protocol."""
    if delta_available(spark) and _is_delta_table(target):
        return spark.read.format("delta").load(target)
    marker = os.path.join(target, LATEST_MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(target, version))


def publish_snapshot(
    df: DataFrame,
    target: str,
    version: str,
    partition_by: Sequence[str] | None = None,
    cluster_by: Sequence[str] | None = None,
    cluster_files: int | None = None,
) -> None:
    """Publish the next version of a snapshot table.

    With Delta available this is a transactional ``overwrite`` —
    the transaction log carries the version history natively (time
    travel via ``versionAsOf``), so ``version`` becomes a commit
    metadata tag. Without Delta (this container), the fallback is
    the versioned-directory protocol: write ``target/v{n}``, then
    atomically swing the ``_LATEST`` pointer. Streaming callers go
    through ``_publish_batch_snapshot``, which allocates a FRESH
    version per publish and deduplicates replays via the ``_BATCH``
    marker — never overwrite a version directory the current merge
    lineage may be reading.

    ``partition_by`` partitions the physical layout (e.g. by date
    key) so downstream reads prune partitions — the uplift SURVEY.md
    §4 flags over the reference's unpartitioned writes.

    ``cluster_by`` range-clusters rows across files
    (``repartitionByRange`` + ``sortWithinPartitions``, Delta's
    OPTIMIZE ZORDER-lite for a lexical key set): each output file
    covers a tight, largely disjoint key range, so parquet
    footer min/max stats let filtered scans skip whole files —
    at 100 TB the difference between touching every file and
    touching the few covering the predicate's range. Without
    ``cluster_files`` the file count floats with AQE's coalescing
    (right at scale); pin it when a fixed layout is wanted.

    ``cluster_by`` is lexical — tight on the leading column only.
    When queries filter on SEVERAL columns independently, pre-shape
    the frame with ``operators.layout.zorder_cluster`` and publish
    WITHOUT ``cluster_by`` (the Morton layout already is the
    partitioning); pair with ``sources.fileindex`` for manifest
    pruning."""
    if cluster_by:
        df = (
            df.repartitionByRange(cluster_files, *cluster_by)
            if cluster_files
            else df.repartitionByRange(*cluster_by)
        ).sortWithinPartitions(*cluster_by)
    if delta_available(df.sparkSession):
        w = (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .option("userMetadata", version)
        )
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(target)
        return
    out = os.path.join(target, version)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out)
    tmp = os.path.join(target, f".{LATEST_MARKER}.tmp")
    os.makedirs(target, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(target, LATEST_MARKER))  # atomic publish


def compact_snapshot(
    spark: SparkSession, target: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction — the OPTIMIZE/bin-packing maintenance
    pass every lakehouse table needs after many small incremental
    publishes: rewrite the CURRENT snapshot into
    ``ceil(bytes / target_file_bytes)`` files as a NEW version.
    Readers never observe a half-compacted table: the rewrite goes
    through the same atomic publish (pointer swing, or Delta
    transactional overwrite), and prior versions stay addressable
    for time travel. Returns the output file count.

    Sizing uses the current version's on-disk bytes (already
    compressed), so the target is a real file-size target, not an
    in-memory estimate."""
    import math

    def _parquet_bytes(path: str) -> int:
        return sum(
            os.path.getsize(os.path.join(root, name))
            for root, _, names in os.walk(path)
            for name in names
            if name.endswith(".parquet")
        )

    cur = read_snapshot(spark, target)
    if cur is None:
        raise FileNotFoundError(f"no published snapshot at {target}")
    if delta_available(spark) and _is_delta_table(target):
        n_files = max(1, math.ceil(_parquet_bytes(target) / target_file_bytes))
        publish_snapshot(cur.repartition(n_files), target, "compaction")
        return n_files
    marker = os.path.join(target, LATEST_MARKER)
    with open(marker) as f:
        version = f.read().strip()
    n_files = max(
        1, math.ceil(_parquet_bytes(os.path.join(target, version)) / target_file_bytes)
    )
    publish_snapshot(cur.repartition(n_files), target, f"v{_next_free_version(target)}")
    return n_files


def forget_keys(
    spark: SparkSession,
    target: str,
    keys: DataFrame,
    key_col: str,
    purge_history: bool = True,
) -> int:
    """Delete propagation (right-to-be-forgotten): republish the
    current snapshot minus the given keys as a NEW version, then —
    because erasure that survives in older versions is not erasure —
    optionally vacuum every historical version so the deleted rows
    are physically gone (Delta pairs MERGE DELETE with VACUUM for
    the same reason).

    The key list is broadcast into a left-anti join: the snapshot
    side never shuffles, so the pass is one scan + rewrite no matter
    the table size. Returns the number of rows removed."""
    cur = read_snapshot(spark, target)
    if cur is None:
        raise FileNotFoundError(f"no published snapshot at {target}")
    k = keys.select(F.col(key_col)).distinct()
    if purge_history and _is_delta_table(target):
        # Physical erasure on a Delta target requires a real VACUUM at
        # retention 0 — vacuum_snapshots manages only the versioned-
        # parquet protocol and would silently leave every forgotten row
        # recoverable via time travel (ADVICE r4). Fail the erasure
        # contract loudly until the Delta path is executed end-to-end.
        raise NotImplementedError(
            "forget_keys(purge_history=True) on a Delta target needs "
            "`VACUUM delta.`<path>` RETAIN 0 HOURS` (with "
            "spark.databricks.delta.retentionDurationCheck.enabled=false); "
            "this environment has no Delta jars to execute it. Run the "
            "VACUUM yourself or call with purge_history=False."
        )
    kept = cur.join(F.broadcast(k), key_col, "left_anti")
    removed = cur.count() - kept.count()
    publish_snapshot(kept, target, f"v{_next_free_version(target)}")
    if purge_history:
        vacuum_snapshots(target, keep_last=1)
    return removed


def snapshot_diff(
    spark: SparkSession,
    target: str,
    from_version: int,
    to_version: int,
    keys: Sequence[str],
) -> DataFrame:
    """Change data feed between two published snapshot versions:
    every row is classified ``insert`` (key only in ``to``),
    ``delete`` (key only in ``from``), or ``update`` (key in both
    with any non-key column changed) — Delta's CDF/table_changes
    re-expressed over the versioned-directory protocol. Unchanged
    rows are dropped.

    One full-outer join on the key set; change detection compares
    the non-key columns as a null-safe struct equality JVM-side —
    NOT a hash: Spark's hash functions skip null inputs (a null
    argument leaves the running seed unchanged), so (42, null) and
    (null, 42) hash identically and the update would silently drop
    (ADVICE r4). Existence is tracked with explicit flags, so a
    key-only table degrades to insert/delete classification instead
    of a zero-arg expression error. Returns key columns +
    ``_change_type`` + the new row's non-key columns (null for
    deletes)."""
    old = read_snapshot_version(spark, target, from_version)
    new = read_snapshot_version(spark, target, to_version)
    val_cols = [c for c in new.columns if c not in keys]
    ex = F.lit(True)
    if val_cols:
        o = old.select(
            *keys,
            ex.alias("_oex"),
            F.struct(*[F.col(c) for c in val_cols]).alias("_ov"),
        )
        n = new.select(
            *keys,
            ex.alias("_nex"),
            F.struct(*[F.col(c) for c in val_cols]).alias("_nv"),
            *val_cols,
        )
        updated = ~F.col("_ov").eqNullSafe(F.col("_nv"))
    else:
        o = old.select(*keys, ex.alias("_oex"))
        n = new.select(*keys, ex.alias("_nex"))
        updated = F.lit(False)  # key-only rows cannot update
    j = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("_oex").isNull(), F.lit("insert"))
        .when(F.col("_nex").isNull(), F.lit("delete"))
        .when(updated, F.lit("update"))
    )
    return (
        j.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(*keys, "_change_type", *val_cols)
    )


def vacuum_snapshots(target: str, keep_last: int = 3) -> list[str]:
    """Retention for the versioned-parquet protocol (the VACUUM
    counterpart of ``compact_snapshot``): delete all but the newest
    ``keep_last`` published versions, never the one the ``_LATEST``
    marker points at. Returns the removed version names. Delta-backed
    targets manage retention through their own log — this no-ops on
    them."""
    import shutil

    if _is_delta_table(target):
        return []
    marker = os.path.join(target, LATEST_MARKER)
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = f.read().strip()
    versioned = sorted(
        (
            d
            for d in os.listdir(target)
            if d.startswith("v")
            and d[1:].isdigit()
            and os.path.isdir(os.path.join(target, d))
        ),
        key=lambda d: int(d[1:]),
    )
    doomed = [d for d in versioned[:-keep_last] if d != current] if keep_last else [
        d for d in versioned if d != current
    ]
    for d in doomed:
        shutil.rmtree(os.path.join(target, d))
    return doomed


def read_snapshot_version(spark: SparkSession, target: str, version: int) -> DataFrame:
    """Time travel: read a historical snapshot version. Delta uses
    the native transaction log (``versionAsOf``); the parquet
    protocol keeps every published ``v{n}`` directory, so history
    stays addressable in both modes."""
    if delta_available(spark) and _is_delta_table(target):
        return spark.read.format("delta").option("versionAsOf", version).load(target)
    return spark.read.parquet(os.path.join(target, f"v{version}"))


def _next_free_version(target: str) -> int:
    """First unused v{n} — shared by EVERY parquet-protocol publisher
    (micro-batches, compaction, delete propagation), so two writers
    can never allocate the same physical directory. Naming a publish
    after the BATCH id was the round-5 review's crash loop: after a
    publish-then-crash-before-checkpoint, the replayed batch read
    v{b} through _LATEST while overwriting v{b} ('Cannot overwrite a
    path that is also being read from'), and a compaction's max+1
    version could collide with the next batch id outright."""
    if not os.path.isdir(target):
        return 0
    numbers = [
        int(d[1:])
        for d in os.listdir(target)
        if d.startswith("v") and d[1:].isdigit() and os.path.isdir(os.path.join(target, d))
    ]
    return (max(numbers) + 1) if numbers else 0


_BATCH_MARKER = "_BATCH"


def _last_published_batch(target: str) -> str | None:
    try:
        with open(os.path.join(target, _BATCH_MARKER)) as f:
            return f.read().strip()
    except FileNotFoundError:
        return None


def _publish_batch_snapshot(
    df: DataFrame, target: str, batch_id: int | str, **publish_kwargs
) -> None:
    """Exactly-once publish for foreachBatch: replay of an
    already-published batch id is a no-op (marker check), and the
    physical directory is always a FRESH version — the lineage
    reading the current snapshot never has its own files overwritten
    underneath it. Marker write is tmp+rename, after the data
    publish: a crash between the two replays the batch into one
    extra (content-identical) version, never into corruption."""
    if _last_published_batch(target) == str(batch_id):
        return
    publish_snapshot(df, target, f"v{_next_free_version(target)}", **publish_kwargs)
    tmp = os.path.join(target, f".{_BATCH_MARKER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(target, _BATCH_MARKER))


def foreach_batch_upsert(
    stream: DataFrame,
    target: str,
    checkpoint: str,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming latest-row-wins upsert: every micro-batch merges
    into the published snapshot with the batch upsert operator and
    publishes the next version (K8 corrected; outputMode update
    semantics via explicit merge). When Delta is loaded and the
    target is a Delta table, the merge is a native ``DeltaTable
    .merge`` (the reference's bronze MERGE,
    jobs/bronze/bronze_builder.py:116-123); otherwise the engine's
    batch upsert + snapshot publish."""
    from hr_moderndatapipeline_spark.operators.cdc import upsert_apply

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if delta_available(spark) and _is_delta_table(target):
            from delta.tables import DeltaTable

            from hr_moderndatapipeline_spark.operators.relational import latest_per_key

            ob = [order_by] if isinstance(order_by, str) else list(order_by)
            latest = latest_per_key(batch, list(keys), ob)
            cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            (
                DeltaTable.forPath(spark, target)
                .alias("t")
                .merge(latest.alias("s"), cond)
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            return
        current = read_snapshot(spark, target)
        if current is None:
            # first batch: dedup within the batch (it can carry
            # several versions of one key) — on the TINY batch frame
            from hr_moderndatapipeline_spark.operators.relational import latest_per_key

            ob = [order_by] if isinstance(order_by, str) else list(order_by)
            merged = latest_per_key(batch, list(keys), ob)
        else:
            # upsert_apply's row_number window already keeps exactly
            # one row per key including intra-batch duplicates; a
            # second latest_per_key over the merged SNAPSHOT would
            # re-shuffle the whole table per micro-batch for nothing
            merged = upsert_apply(current, batch, keys, order_by)
        _publish_batch_snapshot(merged, target, batch_id)

    return _start_foreach_batch(stream, _apply, checkpoint, available_now)


def foreach_batch_scd2(
    stream: DataFrame,
    target: str,
    checkpoint: str,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming SCD2 apply: each micro-batch runs the two-phase
    close-and-insert against the published dimension snapshot
    (operators/scd2.scd2_apply — the corrected K3/K8 semantics)."""
    from hr_moderndatapipeline_spark.operators.scd2 import scd2_apply, scd2_from_history

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        current = read_snapshot(spark, target)
        if current is None:
            merged = scd2_from_history(batch, keys, ts_col)
        else:
            merged = scd2_apply(current, batch, keys, tracked, ts_col)
        _publish_batch_snapshot(merged, target, batch_id)

    return _start_foreach_batch(stream, _apply, checkpoint, available_now)


def _start_foreach_batch(
    stream: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool,
) -> StreamingQuery:
    w = (
        stream.writeStream.foreachBatch(fn)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
