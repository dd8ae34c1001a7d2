"""Z-order clustering: every clustered column must be skippable.

The discriminating property vs lexical range clustering: on a
uniform 2-D grid written as 16 files, lexical cluster_by=[x, y]
gives files spanning y's FULL domain (zero skipping for y-only
predicates), while z-order tiles both dimensions — each file's
footer [min, max] on y covers a fraction of the domain, so a y-only
filter can skip most files."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.layout import morton_key, zorder_cluster


def _file_ranges(path_glob: str, col_name: str) -> list[tuple]:
    out = []
    for path in glob.glob(path_glob):
        md = pq.ParquetFile(path).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == col_name:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        out.append((min(mins), max(maxs)))
    return out


def test_morton_key_bit_budget(spark):
    with pytest.raises(ValueError):
        morton_key([F.lit(0)] * 4, bits=16)  # 64 bits > 63


def test_zorder_tiles_both_dimensions(spark, tmp_path):
    grid = (
        spark.range(0, 256)
        .toDF("x")
        .crossJoin(spark.range(0, 256).toDF("y"))
        .repartition(16)  # scrambled input layout
    )
    target = str(tmp_path / "z")
    zorder_cluster(grid, ["x", "y"], n_files=16, bits=8).write.parquet(target)

    files = glob.glob(f"{target}/*.parquet")
    assert len(files) >= 8  # range partitioner may merge a boundary
    domain = 255.0
    for col in ("x", "y"):
        ranges = _file_ranges(f"{target}/*.parquet", col)
        spans = sorted(hi - lo for lo, hi in ranges)
        # the typical file covers a strict sub-range of BOTH
        # dimensions (a file straddling a major curve boundary may
        # span a full axis; the median cannot) — lexical clustering
        # would give y spans == full domain in EVERY file
        assert spans[len(spans) // 2] <= domain * 0.5
        # and a point predicate on this column alone skips most files
        probe = 10
        skippable = sum(1 for lo, hi in ranges if not (lo <= probe <= hi))
        assert skippable >= len(files) // 2

    # the layout is a pure rewrite: same rows
    assert spark.read.parquet(target).count() == 256 * 256


def test_zorder_handles_nulls_and_constant_columns(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id")).alias("a"),
        F.lit(7).alias("c"),
        (F.col("id") % 13).alias("b"),
    )
    out = zorder_cluster(df, ["a", "c", "b"], n_files=4, bits=8)
    assert out.count() == 1000
    assert out.columns == ["a", "c", "b"]


def test_zorder_rejects_non_numeric_columns(spark):
    df = spark.range(0, 10).withColumn("s", F.concat(F.lit("a"), F.col("id")))
    with pytest.raises(ValueError, match="numeric"):
        zorder_cluster(df, ["s"], n_files=2)


def test_bucketed_join_has_no_exchange_on_either_side(spark):
    """publish_bucketed + same-bucket-count join must plan with ZERO
    Exchange below the join (the shuffle was paid at publish time);
    the same data joined from plain frames shuffles both sides."""
    from hr_moderndatapipeline_spark.operators.layout import publish_bucketed
    from hr_moderndatapipeline_spark.plans.fingerprint import plan_of, plan_skeleton

    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    publish_bucketed(left, "t_buck_l", "k", 4, sort_cols=("k",))
    publish_bucketed(right, "t_buck_r", "k", 4, sort_cols=("k",))
    try:
        bl, br = spark.table("t_buck_l"), spark.table("t_buck_r")
        joined = bl.hint("merge").join(br, "k")
        nodes = plan_skeleton(plan_of(joined))
        assert sum(n.startswith("SortMergeJoin") for n in nodes) == 1
        assert not any(n.startswith("Exchange") for n in nodes), nodes
        # control: identical join WITHOUT bucket metadata shuffles both sides
        plain_nodes = plan_skeleton(plan_of(left.hint("merge").join(right, "k")))
        assert sum(n.startswith("Exchange") for n in plain_nodes) == 2
        # and the result is identical either way
        assert sorted(r["k"] for r in joined.collect()) == list(range(1000))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_buck_l")
        spark.sql("DROP TABLE IF EXISTS t_buck_r")
