"""Custom stateful streaming operators via ``applyInPandasWithState``
(capability uplift over SURVEY.md §2.13 T7 — the reference has no
stateful processing at all; a credible streaming engine needs
arbitrary per-key state the built-in windows can't express).

``running_totals`` maintains per-key running aggregates (event count,
value sum, last-seen timestamp) across micro-batches: state lives in
the state store, survives restarts through the checkpoint, and is
keyed exactly like the shuffle — each task owns its keys' state, no
cross-task coordination. This is the shape production dedup-on-stream,
per-entity rate limiting, and running-feature extraction all reduce
to.

State values are kept as primitive longs/doubles (epoch millis, not
timestamps) — state-store encodings are version-sensitive, primitives
are not.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def dedup_stream(
    stream: DataFrame, keys: Sequence[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: duplicates arriving
    within ``watermark`` of the first occurrence are dropped, and the
    event-time watermark lets the state store evict old keys —
    ``dropDuplicates`` alone on a stream accumulates every key ever
    seen and is the classic streaming OOM. The streaming face of the
    batch ``dedup_exact`` operator."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def _output_schema(key_cols: Sequence[tuple[str, str]]) -> T.StructType:
    fields = [T.StructField(n, getattr(T, t)(), True) for n, t in key_cols]
    return T.StructType(
        fields
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("value_sum", T.DoubleType()),
            T.StructField("last_ts_ms", T.LongType()),
        ]
    )


def running_totals(
    stream: DataFrame,
    key_cols: Sequence[tuple[str, str]],
    value_col: str,
    ts_col: str,
    idle_timeout_minutes: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum, last event time) over a stream.

    ``key_cols`` is [(name, SparkTypeClassName)], e.g.
    ``[("user_id", "IntegerType")]`` — the output schema must be
    declared, not inferred. Emits one updated row per key per
    micro-batch (outputMode update semantics).

    ``idle_timeout_minutes`` bounds the state store: a key receiving
    no events for that long has its state evicted (final totals are
    emitted once on eviction). Leaving it None keeps every key ever
    seen forever — acceptable for bounded key domains (the dimension
    tables here), but a HIGH-CARDINALITY stream (user ids, session
    ids) grows state monotonically until the store OOMs: set a
    timeout there, exactly the unbounded-state hazard
    ``dedup_stream``'s watermark bounds."""
    names = [n for n, _ in key_cols]
    out_schema = _output_schema(key_cols)
    timeout_ms = None if idle_timeout_minutes is None else idle_timeout_minutes * 60_000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, vsum, last_ms = state.get if state.exists else (0, 0.0, 0)
            state.remove()
            row = dict(zip(names, key))
            row.update({"n_events": n, "value_sum": vsum, "last_ts_ms": last_ms})
            yield pd.DataFrame([row])
            return
        if state.exists:
            n, vsum, last_ms = state.get
        else:
            n, vsum, last_ms = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf[value_col].fillna(0.0).sum())
            if len(pdf):
                batch_max = pdf[ts_col].max()
                last_ms = max(last_ms, int(batch_max.value // 1_000_000))
        state.update((n, vsum, last_ms))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        row = dict(zip(names, key))
        row.update({"n_events": n, "value_sum": vsum, "last_ts_ms": last_ms})
        yield pd.DataFrame([row])

    return stream.groupBy(*names).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def ewma_stream(
    stream: DataFrame,
    key_cols: Sequence[tuple[str, str]],
    value_col: str,
    ts_col: str,
    alpha: float = 0.2,
    idle_timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming face of the EWMA feature state
    (operators/relational.py ewma_features /
    operators/incremental.py ewma_update): per-key exponential
    smoothing maintained in the state store across micro-batches,
    emitting the updated (n_events, last_ts_ms, ewma) row per key
    per batch.

    Within a micro-batch the rows are folded in (ts, value) order;
    across batches the fold seeds from stored state — the exact
    seeded-fold composition ewma_update proves against the one-shot
    recompute. The equality therefore holds whenever batches advance
    in event time (the file/Kafka-offset replay order); late events
    that jump behind stored ``last_ts_ms`` are folded in ARRIVAL
    order like every streaming EWMA — flagged here rather than
    raised, since a stream can't reject history it already passed.
    The pandas fold uses the same IEEE mul/add sequence as the JVM
    ``aggregate()`` fold, so agreement is bitwise, not approximate.

    ``idle_timeout_minutes`` bounds state exactly as in
    ``running_totals`` (eviction emits the key's final state once).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    names = [n for n, _ in key_cols]
    fields = [T.StructField(n, getattr(T, t)(), True) for n, t in key_cols]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("last_ts_ms", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("last_ts_ms", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    timeout_ms = None if idle_timeout_minutes is None else idle_timeout_minutes * 60_000
    a, b = float(alpha), 1.0 - float(alpha)

    def _row(key: tuple, n: int, last_ms: int, s: float | None) -> pd.DataFrame:
        row = dict(zip(names, key))
        row.update({"n_events": n, "last_ts_ms": last_ms, "ewma": s})
        return pd.DataFrame([row])

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                n, last_ms, s = state.get
                state.remove()
                yield _row(key, n, last_ms, s)
            return
        n, last_ms, s = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
            for v in pdf[value_col].astype("float64"):
                s = float(v) if s is None else a * float(v) + b * s
            n += len(pdf)
            last_ms = max(last_ms, int(pdf[ts_col].max().value // 1_000_000))
        state.update((n, last_ms, s))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield _row(key, n, last_ms, s)

    return stream.groupBy(*names).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def funnel_stream(
    stream: DataFrame,
    key_cols: Sequence[tuple[str, str]],
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    tiebreak_col: str | None = None,
    idle_timeout_minutes: int | None = None,
) -> DataFrame:
    """Streaming face of ``operators/relational.funnel_steps``: per-key
    funnel progress maintained in the state store across
    micro-batches. State is TWO integers per key (events seen, steps
    completed) — the bounded-state design the batch docstring
    prescribes for unbounded streams, instead of per-key event
    history. Within a micro-batch rows fold in (event-time,
    tiebreak) order; across batches the fold seeds from stored
    progress, so the result equals the batch fold whenever batches
    advance in event time (the file/Kafka-offset replay order, the
    same contract as ``ewma_stream``); a LATE event cannot rewind a
    completed step — processing-order semantics, pinned. Completion
    latches: once all steps matched, later events only advance
    ``n_events``. Emits the updated (keys…, n_events,
    steps_completed, converted) row per key per batch; same
    idle-timeout state-eviction contract as ``running_totals``."""
    if not steps:
        raise ValueError("steps must be a non-empty sequence")
    names = [n for n, _ in key_cols]
    step_list = [str(s) for s in steps]
    tb = tiebreak_col or ts_col
    out_schema = T.StructType(
        [T.StructField(n, getattr(T, t)(), True) for n, t in key_cols]
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("steps_completed", T.IntegerType()),
            T.StructField("converted", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("steps_completed", T.IntegerType()),
        ]
    )
    timeout_ms = None if idle_timeout_minutes is None else idle_timeout_minutes * 60_000

    def _row(key: tuple, n: int, sc: int) -> pd.DataFrame:
        row = dict(zip(names, key))
        row.update(
            {
                "n_events": n,
                "steps_completed": sc,
                "converted": 1 if sc == len(step_list) else 0,
            }
        )
        return pd.DataFrame([row])

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, sc = state.get if state.exists else (0, 0)
            state.remove()
            yield _row(key, n, sc)
            return
        n, sc = state.get if state.exists else (0, 0)
        # a key's micro-batch can arrive as MULTIPLE Arrow chunks in
        # arbitrary order — sorting each chunk independently would fold
        # events out of (ts, tiebreak) order across chunk boundaries.
        # Materialize the whole group, then sort ONCE and fold.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            n += len(batch)
            ordered = batch.sort_values([ts_col, tb], kind="mergesort")
            for e in ordered[type_col]:
                if sc < len(step_list) and e == step_list[sc]:
                    sc += 1
        state.update((n, sc))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield _row(key, n, sc)

    return stream.groupBy(*names).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
