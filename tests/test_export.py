"""Shard-export sink: range sharding, manifest integrity, size
bound, and manifest-driven pruned reads."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.sources.export import (
    export_training_shards,
    read_shard_manifest,
    read_shards_for_range,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_export_manifest_counts_and_order(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = _docs(spark)
    n = docs.count()
    m = export_training_shards(docs, out, key="doc_id", num_shards=4)

    assert m["total_rows"] == n
    assert sum(f["rows"] for f in m["files"]) == n
    assert m["total_files"] >= 4
    # manifest on disk round-trips
    assert read_shard_manifest(out)["total_rows"] == n

    # range sharding: per-file [min,max] intervals must be disjoint
    # when ordered by key_min (outward-rounded double bounds can
    # touch, never properly overlap for an integer key)
    ivs = sorted((f["key_min"], f["key_max"]) for f in m["files"] if f["rows"])
    for (lo1, hi1), (lo2, _hi2) in zip(ivs, ivs[1:]):
        assert hi1 <= lo2 + 1  # outward rounding may touch at the seam

    # round-trip: exported data is the same multiset of rows
    back = spark.read.parquet(out)
    assert back.count() == n
    assert back.select(F.sum("doc_id")).first()[0] == docs.select(F.sum("doc_id")).first()[0]


def test_export_max_records_per_file(spark, tmp_path):
    out = str(tmp_path / "bounded")
    docs = _docs(spark)
    m = export_training_shards(
        docs, out, key="doc_id", num_shards=2, max_records_per_file=50
    )
    assert all(f["rows"] <= 50 for f in m["files"])
    # the bound forces more files than shards
    assert m["total_files"] > 2


def test_read_shards_for_range_prunes_and_matches(spark, tmp_path):
    out = str(tmp_path / "pruned")
    docs = _docs(spark)
    m = export_training_shards(docs, out, key="doc_id", num_shards=5)

    lo, hi = 100, 180
    got = read_shards_for_range(spark, out, lo, hi).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    )
    want = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    assert got.count() == want.count()
    assert got.select(F.sum("n_chars")).first()[0] == want.select(F.sum("n_chars")).first()[0]

    # pruning actually skips files: a narrow range must not read all
    hit = [
        f
        for f in m["files"]
        if f["key_min"] is not None and not (f["key_max"] < lo or f["key_min"] > hi)
    ]
    assert 0 < len(hit) < m["total_files"]

    # fully-out-of-range ask returns an empty frame with the schema
    empty = read_shards_for_range(spark, out, 10**9, 10**9 + 1)
    assert empty.count() == 0
    assert set(empty.columns) == set(docs.columns)


def test_export_refuses_overwrite(spark, tmp_path):
    out = str(tmp_path / "once")
    docs = _docs(spark).limit(10)
    export_training_shards(docs, out, key="doc_id", num_shards=1)
    try:
        export_training_shards(docs, out, key="doc_id", num_shards=1)
        raise AssertionError("second export into same dir must fail")
    except Exception as e:  # noqa: BLE001 — AnalysisException (path exists)
        assert "exist" in str(e).lower() or "once" in str(e)
    assert os.path.exists(os.path.join(out, "_shard_manifest.json"))
