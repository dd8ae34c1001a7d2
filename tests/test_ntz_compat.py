"""TIMESTAMP_NTZ hardening gate.

Round-3 regression: the driver regenerated the testdata parquet with
``Timestamp(isAdjustedToUTC=false)`` metadata, which PySpark 4.1 reads
as TIMESTAMP_NTZ — and ``unix_micros``/``unix_millis``/``window()``
reject that type, crashing three queries and the bench. The engine now
normalizes at the source (``sources/readers.py``): the
``inferTimestampNTZ`` conf off plus a defensive cast in ``load_table``.

This gate pins the invariant so the next parquet-writer drift is caught
by the suite, not the driver: no column of any table may surface as
``timestamp_ntz`` after ``load_table``, regardless of writer metadata.
"""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.sources.readers import TABLES, load_table


def test_no_timestamp_ntz_after_load_table(spark, sf_dir):
    offenders = []
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        for col, dtype in df.dtypes:
            if "timestamp_ntz" in dtype:
                offenders.append(f"{name}.{col}: {dtype}")
    assert not offenders, f"timestamp_ntz leaked through load_table: {offenders}"


def test_ntz_cast_applies_even_without_conf(spark, tmp_path):
    """Even if a column somehow arrives as NTZ (conf raced, foreign
    reader), the load_table cast normalizes it. Simulate by writing a
    parquet with an explicit TIMESTAMP_NTZ column named like a table."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "events.parquet")
    (
        spark.range(3)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(F.col("id") * 1_000_000)
            .cast("timestamp_ntz")
            .alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(p)
    )
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # value-preserving under the pinned UTC session zone
    got = sorted(r.ts.isoformat() for r in df.select("ts").collect())
    assert got[0].startswith("1970-01-01T00:00:00")


def test_unix_micros_works_on_loaded_events(spark, sf_dir):
    """The exact call shape that crashed r3 (queries/core.py
    user_sessions): unix_micros over the events ts column."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    n = ev.select(F.unix_micros("ts").alias("us")).filter(F.col("us").isNotNull()).count()
    assert n > 0
