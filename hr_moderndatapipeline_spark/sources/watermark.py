"""High-water-mark incremental extraction (batch CDC).

The reference persists one watermark per table as a text file,
defaults to epoch, filters ``updated_at > wm`` and advances the
watermark to ``max(updated_at)`` after a successful load (reference:
jobs/bronze/bronze_builder.py:78-90,102,126-129 and
jobs/silver/silver_builder.py:69-81,95-97,135-138 — SURVEY.md §2.11.1).

Engine version: the store is pluggable (file-backed like the
reference, or in-memory for tests); extraction is a plain filter on
top of any DataFrame source so the predicate pushes down to parquet/
JDBC. The single ``agg(max).collect()`` here is the one sanctioned
driver-side collect in the engine — it moves one scalar, not data.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Reference default watermark (jobs/bronze/bronze_builder.py:86).
EPOCH = "1970-01-01 00:00:00"


class WatermarkStore(Protocol):
    def get(self, key: str) -> str: ...
    def set(self, key: str, value: str) -> None: ...


class FileWatermarkStore:
    """One text file per key, like the reference's
    ``<state_dir>/<table>.wm`` files (bronze_builder.py:78-90)."""

    def __init__(self, state_dir: str, default: str = EPOCH):
        self.state_dir = state_dir
        self.default = default
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.state_dir, f"{key}.wm")

    def get(self, key: str) -> str:
        try:
            with open(self._path(key)) as f:
                return f.read().strip() or self.default
        except FileNotFoundError:
            return self.default

    def set(self, key: str, value: str) -> None:
        # tmp + atomic rename (same protocol as the snapshot _LATEST
        # pointer): a torn plain write leaves a truncated timestamp
        # whose cast evaluates to NULL, silently turning every later
        # incremental extract into zero rows forever.
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(value))
        os.replace(tmp, self._path(key))


class MemoryWatermarkStore:
    def __init__(self, default: str = EPOCH):
        self.default = default
        self._wm: dict[str, str] = {}

    def get(self, key: str) -> str:
        return self._wm.get(key, self.default)

    def set(self, key: str, value: str) -> None:
        self._wm[key] = str(value)


def incremental_read(
    df: DataFrame, watermark_col: str, store: WatermarkStore, key: str, full_refresh: bool = False
) -> DataFrame:
    """Rows newer than the stored watermark (or everything on
    ``--full-refresh``, reference bronze_builder.py:95-98). The
    filter is declarative → Catalyst pushes it into the scan.

    BOUNDARY CONTRACT (strictly-greater, reference parity): rows the
    source commits AT the already-consumed watermark instant after
    extraction — or with a NULL watermark column — are never
    extracted. Sources with clock skew or same-instant commit races
    should stamp a monotonically increasing watermark column (e.g.
    a sequence or commit LSN) rather than a wall clock; the silver
    SCD2 apply is additionally replay-safe via its stale guard."""
    if full_refresh:
        return df
    return df.filter(F.col(watermark_col) > F.lit(store.get(key)).cast("timestamp"))


def advance_watermark(
    df: DataFrame, watermark_col: str, store: WatermarkStore, key: str
) -> str | None:
    """Advance to max(watermark_col) of the processed batch
    (reference bronze_builder.py:126-129). Returns the new watermark
    (None on empty batch → watermark untouched)."""
    row = df.agg(F.max(watermark_col).alias("wm")).collect()[0]
    if row["wm"] is not None:
        store.set(key, str(row["wm"]))
        return str(row["wm"])
    return None
