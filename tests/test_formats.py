"""Storage-format matrix: lossless round trips across the formats a
Spark lake actually negotiates (parquet/ORC splittable columnar,
JSON-lines interchange, CSV legacy), plus parquet compression
codecs. At 100 TB the codec choice is a real knob (zstd ≈ gzip size
at ~3× decode speed); correctness here is that values, types, and
nulls survive every trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _slice(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
        .limit(500)
    )


def _canon(df):
    return sorted(
        map(
            tuple,
            df.select(
                "l_orderkey",
                "l_linenumber",
                "l_quantity",
                "l_returnflag",
                F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("d"),
            ).collect(),
        )
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip_lossless(spark, tmp_path, fmt):
    src = _slice(spark)
    out = str(tmp_path / fmt)
    w = src.write.format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    w.save(out)
    r = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        # schema-on-read formats get the schema declared, not inferred:
        # inference is a full extra pass and can widen types silently
        r = r.schema(src.schema)
        if fmt == "csv":
            r = r.option("header", "true").option(
                "timestampFormat", "yyyy-MM-dd HH:mm:ss"
            )
    back = r.load(out)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
def test_parquet_codecs_roundtrip(spark, tmp_path, codec):
    src = _slice(spark)
    out = str(tmp_path / codec)
    src.write.option("compression", codec).parquet(out)
    assert _canon(spark.read.parquet(out)) == _canon(src)
    # the codec actually applied (file suffix carries it)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files and all(f".{codec[:2]}" in f or codec in f for f in files)
