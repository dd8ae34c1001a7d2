"""Avro envelope support (SURVEY.md §1.3 / VERDICT round-1 missing #3).

The reference has a full Avro flavor: an AvroProducer publishing
``TrainingEvent`` records against a registered schema
(kafka/producer/producer_training_events.py:12-28, kafka/schema/) and
an Avro Debezium connector
(kafka/debezium/debezium-postgres-connector-AVRO.json). Spark's
idiomatic decode path is ``from_avro`` — but the ``spark-avro``
module is an external jar not bundled with the PySpark distribution,
so this module provides BOTH:

- ``parse_avro`` / ``serialize_avro`` — route through the native
  ``from_avro``/``to_avro`` expressions when the jar is loadable
  (``spark_avro_available``): JVM-side, codegen, the 100 TB path.
- A pure-Python Avro **binary** codec for flat record schemas
  (``decode_records``/``encode_records`` + the Arrow-batched
  ``avro_decode_udf``/``avro_encode_udf``), implementing the public
  Avro 1.x binary spec (zigzag varints, length-prefixed utf8,
  little-endian IEEE doubles, enum indices, ["null", T] unions) —
  a correct fallback where the jar is absent, and the fixture
  generator for tests either way.

Supported field types (everything the reference's schemas use, plus
the numerics the test corpus needs): boolean, int, long, float,
double, string, bytes, enum, and nullable unions ``["null", T]``.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPARK_AVRO_CHECKED: dict[str, bool] = {}

#: The reference's registered TrainingEvent schema
#: (kafka/producer/producer_training_events.py:13-26).
TRAINING_EVENT_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "TrainingEvent",
        "fields": [
            {"name": "employee_id", "type": "string"},
            {"name": "training_id", "type": "string"},
            {
                "name": "event_type",
                "type": {
                    "type": "enum",
                    "name": "EventType",
                    "symbols": ["ENROLLED", "STARTED", "COMPLETED"],
                },
            },
            {"name": "event_timestamp", "type": "long"},
            {"name": "deadline_date", "type": "string"},
        ],
    }
)


def spark_avro_available(spark: SparkSession) -> bool:
    """True when the external ``spark-avro`` jar is loadable (the
    ``from_avro``/``to_avro`` expressions need it; the PySpark wheel
    ships only Avro core). Checked once per application."""
    key = spark.sparkContext.applicationId
    if key not in _SPARK_AVRO_CHECKED:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.avro.AvroDataToCatalyst"
            )
            _SPARK_AVRO_CHECKED[key] = True
        except Exception:
            _SPARK_AVRO_CHECKED[key] = False
    return _SPARK_AVRO_CHECKED[key]


# ── schema handling ──

def _parse_schema(schema_json: str) -> list[tuple[str, object]]:
    """Flat record schema → [(field_name, type_spec)]. type_spec is a
    primitive name, {"type": "enum", "symbols": [...]}, or
    ["null", primitive]."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError(f"only record schemas supported, got {sch.get('type')!r}")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "enum":
            out.append((f["name"], {"type": "enum", "symbols": list(t["symbols"])}))
        elif isinstance(t, list):
            if len(t) != 2 or t[0] != "null" or not isinstance(t[1], str):
                raise ValueError(f"only ['null', primitive] unions supported: {t}")
            out.append((f["name"], t))
        elif isinstance(t, str):
            out.append((f["name"], t))
        else:
            raise ValueError(f"unsupported field type {t!r} (flat records only)")
    return out


_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def spark_schema_for(schema_json: str) -> T.StructType:
    """The Catalyst schema ``from_avro`` (or the fallback decoder)
    produces for a flat record schema — enums land as strings, just
    like spark-avro."""
    fields = []
    for name, spec in _parse_schema(schema_json):
        if isinstance(spec, dict):
            fields.append(T.StructField(name, T.StringType(), False))
        elif isinstance(spec, list):
            fields.append(T.StructField(name, _SPARK_TYPES[spec[1]], True))
        else:
            fields.append(T.StructField(name, _SPARK_TYPES[spec], False))
    return T.StructType(fields)


# ── Avro binary primitives (public Avro 1.x spec) ──

def _write_long(n: int, out: bytearray) -> None:
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF  # zigzag, 64-bit wrap
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (acc >> 1) ^ -(acc & 1)  # un-zigzag
    return n, pos


def _encode_value(v, spec, out: bytearray) -> None:
    if isinstance(spec, list):  # ["null", prim]
        if v is None:
            _write_long(0, out)
            return
        _write_long(1, out)
        spec = spec[1]
    if isinstance(spec, dict):  # enum
        out_idx = spec["symbols"].index(v)
        _write_long(out_idx, out)
    elif spec in ("long", "int"):
        _write_long(int(v), out)
    elif spec == "boolean":
        out.append(1 if v else 0)
    elif spec == "double":
        out += struct.pack("<d", float(v))
    elif spec == "float":
        out += struct.pack("<f", float(v))
    elif spec == "string":
        b = str(v).encode("utf-8")
        _write_long(len(b), out)
        out += b
    elif spec == "bytes":
        _write_long(len(v), out)
        out += bytes(v)
    else:
        raise ValueError(f"unsupported type {spec!r}")


def _decode_value(buf: bytes, pos: int, spec) -> tuple[object, int]:
    if isinstance(spec, list):
        idx, pos = _read_long(buf, pos)
        if idx == 0:
            return None, pos
        spec = spec[1]
    if isinstance(spec, dict):
        idx, pos = _read_long(buf, pos)
        return spec["symbols"][idx], pos
    if spec in ("long", "int"):
        return _read_long(buf, pos)
    if spec == "boolean":
        return buf[pos] == 1, pos + 1
    if spec == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if spec == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if spec == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if spec == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported type {spec!r}")


def encode_record(rec: dict, fields: list[tuple[str, object]]) -> bytes:
    out = bytearray()
    for name, spec in fields:
        _encode_value(rec[name], spec, out)
    return bytes(out)


def decode_record(buf: bytes, fields: list[tuple[str, object]]) -> dict:
    pos = 0
    rec = {}
    for name, spec in fields:
        rec[name], pos = _decode_value(buf, pos, spec)
    return rec


# ── Arrow-batched UDF surface (the no-jar fallback path) ──

def avro_encode_udf(schema_json: str):
    """pandas UDF: struct column → Avro-binary column. Used to build
    test/fixture payloads (the producer side the reference runs via
    confluent AvroProducer)."""
    fields = _parse_schema(schema_json)

    @F.pandas_udf(T.BinaryType())
    def _encode(s: pd.DataFrame) -> pd.Series:
        # Arrow->pandas upcasts nullable numerics to float64 + NaN;
        # NaN is not None, so without this mask a NULL int crashes
        # int(NaN) and a NULL double silently encodes as the VALUE
        # NaN on the non-null union branch.
        clean = s.astype(object).where(pd.notnull(s), None)
        return pd.Series(
            [encode_record(row, fields) for row in clean.to_dict("records")]
        )

    return _encode


def avro_decode_udf(schema_json: str):
    """pandas UDF: Avro-binary column → struct column (the consumer
    side; the reference's Kafka consumers get this from the registry
    deserializer, Spark gets it from ``from_avro`` — this is the
    jar-free equivalent)."""
    fields = _parse_schema(schema_json)
    out_schema = spark_schema_for(schema_json)

    @F.pandas_udf(out_schema)
    def _decode(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([decode_record(b, fields) for b in s])

    return _decode


# ── routing API ──

def serialize_avro(df: DataFrame, cols: list[str], schema_json: str, out_col: str = "avro") -> DataFrame:
    """Columns → one Avro-binary column, via native ``to_avro`` when
    the jar is present, else the Python codec."""
    payload = F.struct(*[F.col(c) for c in cols])
    if spark_avro_available(df.sparkSession):
        from pyspark.sql.avro.functions import to_avro

        return df.withColumn(out_col, to_avro(payload, schema_json))
    return df.withColumn(out_col, avro_encode_udf(schema_json)(payload))


def parse_avro(df: DataFrame, col: str, schema_json: str, out_col: str = "data") -> DataFrame:
    """Avro-binary column → typed struct column, via native
    ``from_avro`` when the jar is present (JVM, codegen — the scale
    path), else the Arrow-batched Python decoder."""
    if spark_avro_available(df.sparkSession):
        from pyspark.sql.avro.functions import from_avro

        return df.withColumn(out_col, from_avro(F.col(col), schema_json))
    return df.withColumn(out_col, avro_decode_udf(schema_json)(F.col(col)))
