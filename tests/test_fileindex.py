"""File-stats manifest: built from footers on executors, pruning is
a superset (never loses rows), and composed with z-order clustering
it opens a fraction of the files for a selective predicate."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.layout import zorder_cluster
from hr_moderndatapipeline_spark.sources.fileindex import (
    update_file_index,
    build_file_index,
    pruned_paths,
    read_pruned,
)


@pytest.fixture(scope="module")
def zordered_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zidx") / "t")
    grid = (
        spark.range(0, 128)
        .toDF("x")
        .crossJoin(spark.range(0, 128).toDF("y"))
        .withColumn("v", F.col("x") * 1000 + F.col("y"))
        .repartition(16)
    )
    zorder_cluster(grid, ["x", "y"], n_files=16, bits=7).write.parquet(d)
    return d


def test_index_covers_all_files_and_rows(spark, zordered_dir):
    idx = build_file_index(spark, zordered_dir, ["x", "y"])
    n_files = len(glob.glob(f"{zordered_dir}/*.parquet"))
    per_col = idx.groupBy("column").agg(
        F.count(F.lit(1)).alias("files"), F.sum("row_count").alias("rows")
    )
    for r in per_col.collect():
        assert r["files"] == n_files
        assert r["rows"] == 128 * 128


def test_pruning_skips_files_but_loses_nothing(spark, zordered_dir):
    idx = build_file_index(spark, zordered_dir, ["x", "y"]).cache()
    all_files = glob.glob(f"{zordered_dir}/*.parquet")
    # selective predicate on the SECOND clustered column
    kept = pruned_paths(idx, "y", 5, 10)
    assert 0 < len(kept) < len(all_files)

    pruned = read_pruned(spark, idx, "y", 5, 10).select("x", "y", "v")
    full = (
        spark.read.parquet(zordered_dir)
        .filter((F.col("y") >= 5) & (F.col("y") <= 10))
        .select("x", "y", "v")
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0


def test_unindexed_column_raises_instead_of_silent_empty(spark, zordered_dir):
    idx = build_file_index(spark, zordered_dir, ["x"])
    with pytest.raises(KeyError):
        pruned_paths(idx, "nope", 0, 1)


def test_empty_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        build_file_index(spark, str(tmp_path), ["x"])


def test_incremental_index_update(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.range(0, 100).toDF("x").coalesce(1).write.parquet(d)
    idx0 = build_file_index(spark, d, ["x"]).cache()
    n0 = idx0.count()

    # append a new file; update stats only the new one
    spark.range(100, 200).toDF("x").coalesce(1).write.mode("append").parquet(d)
    idx1 = update_file_index(spark, idx0, d, ["x"]).cache()
    assert idx1.count() == n0 + 1
    assert idx1.agg(F.sum("row_count")).collect()[0][0] == 200

    # no new files -> unchanged; a deleted file drops out
    idx2 = update_file_index(spark, idx1, d, ["x"])
    assert idx2.count() == idx1.count()
    import os as _os

    victim = [r["path"] for r in idx1.select("path").collect()][0]
    _os.remove(victim)
    idx3 = update_file_index(spark, idx1, d, ["x"])
    assert victim not in {r["path"] for r in idx3.select("path").collect()}


def test_string_column_indexes_as_unprunable(spark, tmp_path):
    d = str(tmp_path / "s")
    spark.range(0, 50).selectExpr("id as x", "concat('v', id) as s").coalesce(
        1
    ).write.parquet(d)
    idx = build_file_index(spark, d, ["x", "s"])
    srow = idx.filter(F.col("column") == "s").collect()[0]
    assert srow["min_val"] is None and srow["max_val"] is None  # never pruned on
    xrow = idx.filter(F.col("column") == "x").collect()[0]
    assert xrow["min_val"] == 0.0 and xrow["max_val"] == 49.0


def test_read_pruned_empty_range_returns_empty_frame(spark, zordered_dir):
    idx = build_file_index(spark, zordered_dir, ["x"])
    out = read_pruned(spark, idx, "x", 1e9, 2e9)
    assert out.count() == 0
    assert set(out.columns) == {"x", "y", "v"}


def test_update_index_survives_deleted_files_without_cache(spark, tmp_path):
    """The returned manifest's lineage must not re-read removed
    files: build (NOT cached), delete a file, update, evaluate."""
    import os as _os

    d = str(tmp_path / "t")
    spark.range(0, 100).toDF("x").repartition(2).write.parquet(d)
    idx = build_file_index(spark, d, ["x"])  # lazily defined, uncached
    victim = sorted(
        _os.path.join(d, f) for f in _os.listdir(d) if f.endswith(".parquet")
    )[0]
    _os.remove(victim)
    out = update_file_index(spark, idx, d, ["x"])
    paths = {r["path"] for r in out.collect()}  # would crash pre-fix
    assert victim not in paths and len(paths) >= 1


def test_huge_int_stats_round_outward(spark, tmp_path):
    """int64 values beyond 2^53 have no exact double: the manifest
    range must round OUTWARD so the true min/max stay inside it and
    a file containing the probed value is never pruned."""
    big = (1 << 53) + 1  # float(big) rounds DOWN to 2^53
    d = str(tmp_path / "big")
    spark.createDataFrame([(big,), (big + 10,)], "id long").coalesce(1).write.parquet(d)
    idx = build_file_index(spark, d, ["id"])
    assert pruned_paths(idx, "id", float(big), float(big)) != []
    row = idx.collect()[0]
    assert row["min_val"] <= big <= row["max_val"]


@pytest.fixture(scope="module")
def string_keyed_dir(spark, tmp_path_factory):
    """Files range-clustered on a string date key — disjoint per-file
    key ranges, the partition-pruning-without-partitions shape."""
    d = str(tmp_path_factory.mktemp("sidx") / "t")
    df = (
        spark.range(0, 3650)
        .withColumn("day", F.date_format(F.date_add(F.lit("2015-01-01"), F.col("id").cast("int")), "yyyy-MM-dd"))
        .withColumn("v", F.col("id") * 7)
    )
    df.repartitionByRange(10, "day").sortWithinPartitions("day").write.parquet(d)
    return d


def test_string_stats_prune_files_and_lose_nothing(spark, string_keyed_dir):
    idx = build_file_index(spark, string_keyed_dir, ["day"]).cache()
    all_files = glob.glob(f"{string_keyed_dir}/*.parquet")
    kept = pruned_paths(idx, "day", "2016-02-01", "2016-03-15")
    assert 0 < len(kept) < len(all_files)  # most files skipped
    pruned = read_pruned(spark, idx, "day", "2016-02-01", "2016-03-15")
    full = spark.read.parquet(string_keyed_dir).filter(
        (F.col("day") >= "2016-02-01") & (F.col("day") <= "2016-03-15")
    )
    assert pruned.select("id", "day", "v").exceptAll(full.select("id", "day", "v")).count() == 0
    assert full.select("id", "day", "v").exceptAll(pruned.select("id", "day", "v")).count() == 0


def test_bounds_kind_mismatch_raises(spark, string_keyed_dir, zordered_dir):
    sidx = build_file_index(spark, string_keyed_dir, ["day"])
    with pytest.raises(TypeError, match="statistics"):
        pruned_paths(sidx, "day", 0.0, 10.0)  # numeric bounds, string stats
    nidx = build_file_index(spark, zordered_dir, ["x"])
    with pytest.raises(TypeError, match="statistics"):
        pruned_paths(nidx, "x", "a", "z")  # string bounds, numeric stats


def test_string_index_incremental_update(spark, string_keyed_dir, tmp_path):
    import shutil

    d = str(tmp_path / "t2")
    shutil.copytree(string_keyed_dir, d)
    idx = build_file_index(spark, d, ["day"])
    extra = spark.range(0, 10).withColumn("day", F.lit("2030-01-01")).withColumn("v", F.col("id"))
    extra.coalesce(1).write.mode("append").parquet(d)
    idx2 = update_file_index(spark, idx, d, ["day"])
    kept = pruned_paths(idx2, "day", "2029-12-31", "2030-12-31")
    assert len(kept) == 1  # only the appended file can match
