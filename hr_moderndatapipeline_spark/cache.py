"""Tracked-persist registry.

Operators that ``persist()`` an intermediate (the stable-id layout,
the MinHash hashed-shingle frame) pin executor storage for the
application lifetime; "unpersist via the returned DataFrame's
lineage" is not an actual API (ADVICE r5). Every such persist goes
through :func:`pin`, which records the handle keyed by the owning
context's ``applicationId``, and long-lived sessions (a bench sweep,
a multi-sf correctness run, a notebook) free the storage with
:func:`release_pins` — the same contract as
``queries.dataops.release_dedup_memo``.

At 100 TB this is the difference between "each index build borrows
cluster memory for its job" and "a shared session slowly evicts
everyone else's cache": pinned storage must have a named owner and a
release path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (tag, applicationId, persisted frame)
_PINS: list[tuple[str, str, DataFrame]] = []


def pin(df: DataFrame, tag: str, storage_level=None) -> DataFrame:
    """Persist ``df`` and register the handle under ``tag`` for later
    release. ``storage_level=None`` uses Spark's ``persist()`` default."""
    handle = df.persist() if storage_level is None else df.persist(storage_level)
    _PINS.append((tag, df.sparkSession.sparkContext.applicationId, handle))
    return handle


def release_pins(spark=None, tag: str | None = None) -> int:
    """Unpersist registered frames and return how many were released.

    ``spark`` limits the release to that session's context (others'
    pins survive); ``tag`` limits it to one operator family. With
    neither, everything goes — the end-of-iteration sweep.
    """
    app = spark.sparkContext.applicationId if spark is not None else None
    kept: list[tuple[str, str, DataFrame]] = []
    released = 0
    for t, owner, df in _PINS:
        if (app is not None and owner != app) or (tag is not None and t != tag):
            kept.append((t, owner, df))
            continue
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — dead-session frames just drop
            pass
        released += 1
    _PINS[:] = kept
    return released


def pinned_tags() -> list[str]:
    """Tags currently holding storage — for monitoring/tests."""
    return [t for t, _owner, _df in _PINS]
