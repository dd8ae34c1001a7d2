"""Arbitrary stateful streaming on Spark 4's ``transformWithState``
API (the successor to ``applyInPandasWithState``: typed state
variables, event/processing-time timers, state TTL, RocksDB-backed).

ENVIRONMENT GATE, stated loudly: the transformWithState Python
driver worker imports ``google.protobuf`` (its state-server protocol
is protobuf-framed); this container has no protobuf and no pip, so
the path cannot EXECUTE here (verified 2026-08-14: the worker
crashes with ``ImportError: cannot import name 'descriptor'``).
The operator below is real and the test exercises it when protobuf
is importable, else skips — the same honesty pattern as the
Kafka/Delta jar-gated paths (tests/test_jar_gated.py).

vs ``streaming/stateful.py`` (applyInPandasWithState, which DOES run
here): transformWithState adds per-key timers (emit on inactivity
without waiting for the key's next event), multiple named state
variables, and native TTL — the API you'd pick on a cluster with the
full runtime present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", LongType()),
    ]
)


def transform_with_state_available() -> bool:
    """True iff the Python worker's wire dependency is importable —
    the precondition for transformWithState to execute."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", LongType())]
    )

    class RunningTotals(StatefulProcessor):
        """Per-key running (count, sum) in a typed ValueState —
        the transformWithState hello-world, kept deliberately
        minimal so the test pins API wiring, not business logic."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, s = (
                (self.totals.get()[0], self.totals.get()[1])
                if self.totals.exists()
                else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value"].sum())
            self.totals.update((n, s))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_totals_stream(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running count+sum via ``transformWithStateInPandas``
    in Update mode. Caller must set the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — the API requires it. Raises a clear
    error when the environment can't run the path, instead of the
    worker-crash stack the raw API produces."""
    if not transform_with_state_available():
        raise RuntimeError(
            "transformWithState needs google.protobuf in the Python worker "
            "environment; it is not importable here (see module docstring)"
        )
    from pyspark.sql import functions as F

    shaped = stream.select(
        F.col(key_col).alias("key"), F.col(value_col).cast("long").alias("value")
    )
    return shaped.groupBy("key").transformWithStateInPandas(
        _make_processor(), _OUT_SCHEMA, "Update", "ProcessingTime"
    )
