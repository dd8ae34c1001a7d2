"""Custom Python DataSource: schema from manifest, one partition per
file, lazy per-partition iteration, null/missing-field tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.sources.pyds import (
    register_jsonl_source,
    write_jsonl_dataset,
)

SCHEMA = {"id": "bigint", "score": "double", "tag": "string", "ok": "boolean"}


def _dataset(tmp_path):
    return write_jsonl_dataset(
        str(tmp_path / "feed"),
        SCHEMA,
        [
            [{"id": 1, "score": 0.5, "tag": "a", "ok": True},
             {"id": 2, "score": 1.5, "tag": "b", "ok": False}],
            [{"id": 3, "score": 2.5, "tag": "a", "ok": True}],
            [{"id": 4, "tag": "c"}],  # missing fields -> NULL
        ],
    )


def test_jsonl_source_reads_all_partitions(spark, tmp_path):
    _dataset(tmp_path)
    register_jsonl_source(spark)
    df = spark.read.format("manifest_jsonl").option("path", str(tmp_path / "feed")).load()
    assert set(df.columns) == set(SCHEMA)
    assert df.count() == 4
    # partition planning follows the manifest: 3 files -> 3 partitions
    assert df.rdd.getNumPartitions() == 3
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["ok"] is False and rows[2]["tag"] == "b"
    assert rows[4]["score"] is None and rows[4]["ok"] is None


def test_jsonl_source_composes_with_sql(spark, tmp_path):
    _dataset(tmp_path)
    register_jsonl_source(spark)
    df = spark.read.format("manifest_jsonl").option("path", str(tmp_path / "feed")).load()
    out = (
        df.filter(F.col("ok"))
        .groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("tag")
        .collect()
    )
    assert [(r["tag"], r["n"]) for r in out] == [("a", 2)]


def test_jsonl_stream_source_picks_up_appended_files(spark, tmp_path):
    from hr_moderndatapipeline_spark.sources.pyds import append_jsonl_batch

    feed = str(tmp_path / "stream_feed")
    write_jsonl_dataset(
        feed, SCHEMA, [[{"id": 1, "score": 0.5, "tag": "a", "ok": True}]]
    )
    register_jsonl_source(spark)
    q = (
        spark.readStream.format("manifest_jsonl")
        .option("path", feed)
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM pyds_stream").first()["c"] == 1
        append_jsonl_batch(feed, [{"id": 2, "score": 1.0, "tag": "b", "ok": False},
                                  {"id": 3, "score": 2.0, "tag": "b", "ok": True}])
        q.processAllAvailable()
        got = spark.sql("SELECT id FROM pyds_stream ORDER BY id").collect()
        assert [r["id"] for r in got] == [1, 2, 3]
    finally:
        q.stop()


def test_jsonl_source_rejects_unknown_type(spark, tmp_path):
    write_jsonl_dataset(str(tmp_path / "bad"), {"id": "uuid"}, [[{"id": 1}]])
    register_jsonl_source(spark)
    try:
        spark.read.format("manifest_jsonl").option("path", str(tmp_path / "bad")).load()
        raise AssertionError("unsupported manifest type must fail loudly")
    except Exception as e:  # noqa: BLE001
        assert "uuid" in str(e)
