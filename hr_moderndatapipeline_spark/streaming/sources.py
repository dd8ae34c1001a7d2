"""Streaming sources: Kafka for production, file streams for tests.

The reference subscribes to Kafka topics with replay-friendly options
(``startingOffsets=earliest``, ``failOnDataLoss=false`` — reference:
kafka/consumer/kafka_DLQ.py:38-43, SURVEY.md §2.1 S4/§2.13 T2) and
reads the binary value plus broker timestamp. The file variant
produces the same column shape (``value``/``kafka_ts``) from a
directory of JSON-lines files, so everything downstream — validation
split, sinks, windows — is source-agnostic. Schema inference stays
off (the reference pins it off: kafka_DLQ.py:32); streams always
declare explicit schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Raw-event column shape shared by all sources: the serialized
#: payload plus the transport timestamp.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("kafka_ts", T.TimestampType(), True),
    ]
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka topic subscription with the reference's replay controls
    (kafka/consumer/kafka_DLQ.py:38-43). Not exercisable in this
    environment (no broker); the construction is kept thin enough
    that the file variant covers all downstream logic."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )
    return raw.selectExpr(
        "CAST(value AS STRING) AS value", "timestamp AS kafka_ts"
    )


def file_json_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Directory-of-JSON-lines stream with the same (value, kafka_ts)
    shape as the Kafka source: each line is one event payload; the
    file modification time stands in for the broker timestamp. Used
    by tests and local replays."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    # the documented contract: the file MODIFICATION time stands in
    # for the broker timestamp. current_timestamp() (processing time)
    # would stamp a replayed backlog with "now", collapsing every
    # event-time window fed from this source into the current one.
    return raw.select(
        F.col("value"),
        F.col("_metadata.file_modification_time").alias("kafka_ts"),
    )
