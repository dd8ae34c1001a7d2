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


def test_jsonl_writer_roundtrip_append_overwrite(spark, tmp_path):
    register_jsonl_source(spark)
    out = str(tmp_path / "written")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 0.5).alias("score"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("tag"),
        (F.col("id") % 2 == 0).alias("ok"),
    ).repartition(3)

    df.write.format("manifest_jsonl").option("path", out).mode("append").save()
    back = spark.read.format("manifest_jsonl").option("path", out).load()
    assert back.count() == 10
    assert back.select(F.sum("id")).first()[0] == 45

    # append doubles the data
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()
    assert spark.read.format("manifest_jsonl").option("path", out).load().count() == 20

    # overwrite resets to one copy and removes stale files
    df.write.format("manifest_jsonl").option("path", out).mode("overwrite").save()
    back = spark.read.format("manifest_jsonl").option("path", out).load()
    assert back.count() == 10
    import os

    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    from hr_moderndatapipeline_spark.sources.pyds import read_manifest_files

    assert on_disk == read_manifest_files(out)


def test_jsonl_writer_rejects_unsupported_column(spark, tmp_path):
    register_jsonl_source(spark)
    df = spark.range(3).select(F.col("id"), F.array(F.lit(1)).alias("xs"))
    try:
        df.write.format("manifest_jsonl").option(
            "path", str(tmp_path / "nope")
        ).mode("append").save()
        raise AssertionError("array column must be rejected")
    except Exception as e:  # noqa: BLE001
        assert "xs" in str(e)


def test_jsonl_source_rejects_unknown_type(spark, tmp_path):
    write_jsonl_dataset(str(tmp_path / "bad"), {"id": "uuid"}, [[{"id": 1}]])
    register_jsonl_source(spark)
    try:
        spark.read.format("manifest_jsonl").option("path", str(tmp_path / "bad")).load()
        raise AssertionError("unsupported manifest type must fail loudly")
    except Exception as e:  # noqa: BLE001
        assert "uuid" in str(e)


def test_streaming_custom_source_query_exactly_once(spark):
    """The driver-surface entry: second availableNow run resumes from
    the checkpointed offset — the first feed's rows must not be
    delivered twice, and the late-appended file must arrive."""
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark.queries.streaming_queries import (
        q_streaming_custom_source,
    )

    out = q_streaming_custom_source(spark, "/root/testdata/sf0.001")
    rows = {r["event_type"]: r["n_rows"] for r in out.collect()}
    assert rows.pop("synthetic") == 1
    assert sum(rows.values()) == (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("event_id") < 2000)
        .count()
    )
