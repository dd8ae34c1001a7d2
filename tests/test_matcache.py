"""Materialized-result cache: hit/miss on plan and data changes,
nondeterminism refusal, torn-write discipline."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.plans.matcache import ResultCache, cache_key


def _write_input(spark, path, mult):
    spark.range(100).select(
        F.col("id"), (F.col("id") * mult).alias("v")
    ).write.mode("overwrite").parquet(path)


def test_cache_hits_on_unchanged_plan_and_inputs(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_input(spark, src, 2)
    cache = ResultCache(str(tmp_path / "cache"))

    def q():
        return spark.read.parquet(src).groupBy((F.col("id") % 10).alias("b")).agg(
            F.sum("v").alias("s")
        )

    r1 = cache.get_or_compute(q())
    assert len(cache.entries()) == 1
    r2 = cache.get_or_compute(q())
    assert len(cache.entries()) == 1  # second call reused the entry
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))
    # the cached frame is a plain scan of the materialized parquet
    assert all("cache" in f for f in r2.inputFiles())


def test_cache_misses_on_literal_change(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_input(spark, src, 2)
    df10 = spark.read.parquet(src).filter(F.col("id") < 10)
    df20 = spark.read.parquet(src).filter(F.col("id") < 20)
    assert cache_key(df10) != cache_key(df20)


def test_cache_misses_when_input_rewritten(spark, tmp_path):
    src = str(tmp_path / "src")
    cache = ResultCache(str(tmp_path / "cache"))
    _write_input(spark, src, 2)
    q = lambda: spark.read.parquet(src).agg(F.sum("v").alias("s"))  # noqa: E731
    assert cache.get_or_compute(q()).first()["s"] == 9900
    time.sleep(1.1)  # mtime granularity
    _write_input(spark, src, 3)
    assert cache.get_or_compute(q()).first()["s"] == 14850  # fresh, not stale
    assert len(cache.entries()) == 2


def test_cache_refuses_nondeterministic_plan(spark, tmp_path):
    df = spark.range(10).select(F.rand(7).alias("r"))
    try:
        cache_key(df)
        raise AssertionError("rand() plan must be refused")
    except ValueError as e:
        assert "nondeterministic" in str(e)


def test_cache_ignores_stale_tmp(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_input(spark, src, 2)
    root = str(tmp_path / "cache")
    cache = ResultCache(root)
    df = spark.read.parquet(src).agg(F.count(F.lit(1)).alias("n"))
    key = cache_key(df)
    os.makedirs(os.path.join(root, key + ".tmp"))  # simulated crash debris
    assert cache.get_or_compute(df).first()["n"] == 100
    assert key in cache.entries()


def test_cache_key_stable_across_rebuilds(spark, tmp_path):
    """Rebuilding the same logical query allocates fresh expression
    ids — the key must not see them (the whole point of the exprId
    normalization: a restarted pipeline hits yesterday's cache)."""
    src = str(tmp_path / "src")
    _write_input(spark, src, 2)

    def build():
        return (
            spark.read.parquet(src)
            .filter(F.col("id") >= 5)
            .groupBy((F.col("id") % 3).alias("b"))
            .agg(F.sum("v").alias("s"))
        )

    assert cache_key(build()) == cache_key(build())
