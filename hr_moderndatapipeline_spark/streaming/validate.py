"""Schema-validation DLQ split (SURVEY.md §2.13 T6, §1.3).

The reference parses the Kafka payload with ``from_json`` against a
fixed StructType and splits on NULL-ness: parse failures route to a
dead-letter queue re-serialized with a reason field (reference:
kafka/consumer/kafka_DLQ.py:46-90). Re-expressed here with the
corrupt-record channel (a NULL-able payload column of all-NULLs is
indistinguishable from a parse failure under permissive mode — the
explicit ``_corrupt_record`` marker is the reliable signal), as pure
column lineage usable on batch and streaming frames alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def parse_with_dlq(
    raw: DataFrame,
    payload_col: str,
    schema: T.StructType,
    passthrough: list[str] | None = None,
    reason: str = "schema_parse_failed",
) -> tuple[DataFrame, DataFrame]:
    """Split ``raw`` into (valid, dlq) by parsing ``payload_col``
    against ``schema``.

    valid: one column per schema field (struct flattened, P2) plus
    ``passthrough`` columns.
    dlq:   original payload re-serialized as ``to_json(named_struct(
    payload, reason))`` in a ``value`` column (the reference's DLQ
    publish shape, kafka_DLQ.py:68-71) plus ``passthrough``.

    Both frames share one lineage — on a stream, two sinks started
    from them form the reference's multi-sink fan-out (T4).
    """
    passthrough = passthrough or []
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    parsed = raw.withColumn(
        "_data",
        F.from_json(
            F.col(payload_col), parse_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ),
    )
    # A NULL payload (e.g. a Kafka tombstone) parses to a NULL struct
    # whose corrupt-record field is also NULL — without the
    # payload-not-null guard it would land in the VALID frame as an
    # all-null row instead of the DLQ.
    ok: Column = F.col(payload_col).isNotNull() & F.col(f"_data.{CORRUPT_COL}").isNull()

    valid = (
        parsed.filter(ok)
        .select(*[F.col(f"_data.{f.name}").alias(f.name) for f in schema.fields],
                *passthrough)
    )
    dlq = (
        parsed.filter(~ok)
        .select(
            F.to_json(
                F.struct(
                    F.col(payload_col).alias("payload"),
                    F.lit(reason).alias("reason"),
                )
            ).alias("value"),
            *passthrough,
        )
    )
    return valid, dlq
