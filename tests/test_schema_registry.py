"""Schema registry: versioning/ids/persistence, the published
compatibility matrix, Confluent wire framing, and the mixed-version
schema-evolution read (reference:
kafka/schema/kafka_connect_schema_commands.txt:17-64)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.avro_codec import encode_record, _parse_schema
from hr_moderndatapipeline_spark.functions.schema_registry import (
    IncompatibleSchemaError,
    SchemaRegistry,
    can_read,
    decode_wire_df,
    wire_decode,
    wire_encode,
    wire_encode_col,
    wire_header_cols,
)


def _schema(fields) -> str:
    return json.dumps({"type": "record", "name": "T", "fields": fields})


V1 = _schema(
    [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
    ]
)
# Adds a defaulted field: BACKWARD- and FORWARD-compatible with V1.
V2 = _schema(
    [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double", "default": 0.0},
    ]
)
# Adds a field WITHOUT a default: new readers cannot read old data.
V_BAD = _schema(
    [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "required_new", "type": "string"},
    ]
)


class TestRegistry:
    def test_versioning_and_content_addressed_ids(self, tmp_path):
        reg = SchemaRegistry(path=str(tmp_path / "reg.json"))
        r1 = reg.register("events-value", V1)
        r2 = reg.register("events-value", V2)
        assert (r1.version, r2.version) == (1, 2)
        assert r1.schema_id != r2.schema_id
        # Same schema under another subject keeps its global id.
        other = reg.register("events-dlq-value", V1)
        assert other.schema_id == r1.schema_id and other.version == 1
        # Idempotent re-registration returns the existing version.
        assert reg.register("events-value", V1).version == 1
        assert reg.versions("events-value") == [1, 2]
        assert reg.latest("events-value").schema_id == r2.schema_id
        assert reg.subjects() == ["events-dlq-value", "events-value"]
        # Persistence roundtrip.
        reloaded = SchemaRegistry.load(str(tmp_path / "reg.json"))
        assert reloaded.latest("events-value").schema == r2.schema
        assert reloaded.schema_by_id(r1.schema_id) == r1.schema

    def test_backward_mode_rejects_undefaulted_field(self):
        reg = SchemaRegistry()  # default BACKWARD
        reg.register("s", V1)
        with pytest.raises(IncompatibleSchemaError):
            reg.register("s", V_BAD)
        assert reg.test_compatibility("s", V2)
        assert not reg.test_compatibility("s", V_BAD)

    def test_none_mode_accepts_anything(self):
        reg = SchemaRegistry()
        reg.set_compatibility("s", "NONE")
        reg.register("s", V1)
        assert reg.register("s", V_BAD).version == 2

    def test_forward_mode(self):
        # FORWARD: old schema must read new data. Dropping a field
        # the old reader requires (no default) violates it.
        reg = SchemaRegistry()
        reg.set_compatibility("s", "FORWARD")
        reg.register("s", V1)
        dropped = _schema([{"name": "id", "type": "long"}])
        with pytest.raises(IncompatibleSchemaError):
            reg.register("s", dropped)
        # Adding any field is FORWARD-ok (old reader ignores it).
        assert reg.register("s", V_BAD).version == 2

    def test_transitive_checks_all_versions(self):
        reg = SchemaRegistry()
        reg.set_compatibility("s", "BACKWARD_TRANSITIVE")
        reg.register("s", V1)
        reg.register("s", V2)
        # V3 drops `name`: readable-from-latest would miss nothing
        # (deletes are BACKWARD-ok), but re-adding name WITHOUT a
        # default later must fail against v1/v2 too.
        v3 = _schema(
            [
                {"name": "id", "type": "long"},
                {"name": "score", "type": "double", "default": 0.0},
            ]
        )
        reg.register("s", v3)
        back = _schema(
            [
                {"name": "id", "type": "long"},
                {"name": "extra", "type": "string"},
            ]
        )
        with pytest.raises(IncompatibleSchemaError):
            reg.register("s", back)

    def test_can_read_type_promotion(self):
        w = _schema([{"name": "v", "type": "int"}])
        r = _schema([{"name": "v", "type": "long"}])
        assert can_read(w, r)
        assert not can_read(r, w)  # long -> int is not a promotion


class TestWireFormat:
    def test_bytes_roundtrip(self):
        framed = wire_encode(7, b"payload")
        assert framed[0] == 0 and len(framed) == 5 + 7
        sid, payload = wire_decode(framed)
        assert (sid, payload) == (7, b"payload")
        with pytest.raises(ValueError):
            wire_decode(b"\x01\x00\x00\x00\x07x")

    def test_spark_columns_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"abc")), (2, bytearray(b"defg"))], "k int, raw binary"
        )
        framed = df.select("k", wire_encode_col(300, F.col("raw")).alias("w"))
        sid, payload = wire_header_cols("w")
        got = framed.select(
            "k", sid.alias("sid"), payload.alias("p")
        ).orderBy("k").collect()
        assert [r.sid for r in got] == [300, 300]
        assert bytes(got[0].p) == b"abc" and bytes(got[1].p) == b"defg"


class TestEvolutionRead:
    def test_mixed_version_decode_under_latest_reader(self, spark, tmp_path):
        reg = SchemaRegistry(path=str(tmp_path / "reg.json"))
        r1 = reg.register("t-value", V1)
        r2 = reg.register("t-value", V2)
        f1, f2 = _parse_schema(V1), _parse_schema(V2)
        rows = [
            (1, bytearray(wire_encode(r1.schema_id, encode_record({"id": 10, "name": "a"}, f1)))),
            (2, bytearray(wire_encode(r2.schema_id, encode_record({"id": 20, "name": "b", "score": 1.5}, f2)))),
        ]
        df = spark.createDataFrame(rows, "k int, w binary")
        out = decode_wire_df(df, "w", reg, reader_schema=V2, keep_cols=["k"])
        got = {r.k: r for r in out.collect()}
        assert got[1].id == 10 and got[1].name == "a"
        assert got[1].score == 0.0  # reader default fills the v1 gap
        assert got[2].id == 20 and got[2].score == 1.5


class TestResolutionErrors:
    def test_decode_raises_when_reader_field_lacks_default(self, spark, tmp_path):
        """ADVICE r4: Avro resolution REQUIRES an error when a reader
        field has no default and the writer record lacks it — filling
        None would decode incompatible data to silent nulls."""
        reg = SchemaRegistry(path=str(tmp_path / "reg.json"))
        r1 = reg.register("t-value", V1)
        f1 = _parse_schema(V1)
        rows = [
            (1, bytearray(wire_encode(r1.schema_id, encode_record({"id": 10, "name": "a"}, f1)))),
        ]
        df = spark.createDataFrame(rows, "k int, w binary")
        out = decode_wire_df(df, "w", reg, reader_schema=V_BAD, keep_cols=["k"])
        with pytest.raises(Exception, match="no default"):
            out.collect()
