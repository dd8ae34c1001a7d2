"""Multi-table atomic publish tests: consistency across the commit
point, crash-between-writes recovery, and tear-free pinned reads."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.plans.txn import (
    publish_tables,
    read_manifest,
    read_published,
)


def test_publish_and_read_consistent_set(spark, tmp_path):
    t = str(tmp_path / "lake")
    a1 = spark.range(5).select(F.col("id").alias("k"))
    b1 = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    v1 = publish_tables({"a": a1, "b": b1}, t)
    assert v1 == {"a": 0, "b": 0}
    m = read_manifest(t)
    assert read_published(spark, t, "a", m).count() == 5
    # second publish bumps both versions atomically
    v2 = publish_tables({"a": a1.limit(3), "b": b1.limit(3)}, t)
    assert v2 == {"a": 1, "b": 1}
    m2 = read_manifest(t)
    assert read_published(spark, t, "a", m2).count() == 3
    assert read_published(spark, t, "b", m2).count() == 3
    # old manifest copy still resolves the OLD consistent set (time travel)
    assert read_published(spark, t, "b", m).count() == 5


def test_crash_before_commit_leaves_old_set(spark, tmp_path):
    """A failure after table A's data write but before the manifest
    swing must leave readers on the previous consistent set."""
    t = str(tmp_path / "lake")
    a = spark.range(4).select(F.col("id").alias("k"))
    b = spark.range(4).select(F.col("id").alias("k"))
    publish_tables({"a": a, "b": b}, t)

    class Boom(Exception):
        pass

    class Exploding:
        """Quacks like a DataFrame until .write is touched."""

        @property
        def write(self):
            raise Boom()

    with pytest.raises(Boom):
        publish_tables({"a": a.limit(1), "b": Exploding()}, t)
    # manifest untouched: both tables still the v0 four-row set
    m = read_manifest(t)
    assert m == {"a": 0, "b": 0}
    assert read_published(spark, t, "a", m).count() == 4
    assert read_published(spark, t, "b", m).count() == 4


def test_read_unknown_table_is_loud(spark, tmp_path):
    t = str(tmp_path / "lake")
    publish_tables({"a": spark.range(1)}, t)
    with pytest.raises(KeyError, match="no committed version"):
        read_published(spark, t, "zzz")
