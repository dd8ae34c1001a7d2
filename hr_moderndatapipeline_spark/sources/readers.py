"""Batch sources.

The reference reads from Postgres over JDBC with the incremental
predicate pushed into the ``dbtable`` subquery so it executes
DB-side (reference: jobs/bronze/bronze_builder.py:95-104, S1 in
SURVEY.md §2.1), and from Delta/parquet paths for everything
downstream (S2/S3/S5). Here:

- parquet is the canonical storage scan (columnar, predicate
  pushdown + column pruning via Catalyst — verify with
  ``df.explain``: ``PushedFilters``/``ReadSchema``);
- the JDBC pushdown-subquery builder is kept as a pure function so
  it is testable without a database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables of the driver-provided TPC-H-ish test corpus (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as
#: long (nanosAsLong); convert to micros timestamps on load.
_NANOS_TS_COLUMNS = {"events": ("ts",)}

#: Session confs the engine depends on, applied defensively at read
#: time: callers (e.g. the verification driver) may hand us a session
#: built without our factory. All three are runtime-settable SQL confs.
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet files written with Timestamp(isAdjustedToUTC=false) would
    # otherwise surface as TIMESTAMP_NTZ, which unix_micros/unix_millis
    # and window() reject. With the session zone pinned to UTC the two
    # types are value-identical, so read them as TIMESTAMP.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_engine_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Keep projections/filters on top of
    this so Catalyst pushes them into the parquet reader."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer div — double division loses precision above 2^53
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Belt-and-braces vs inferTimestampNTZ (set above): a caller may
    # hand us a DataFrame read before our confs applied, or the writer
    # metadata may drift again. Under the pinned UTC session zone the
    # cast is value-preserving.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for col in ntz:
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the SQL surface
    (mirrors the reference's dbt-on-session model, SURVEY.md §3.3)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv_validated(
    spark: SparkSession, path: str, schema, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Schema-validated CSV ingest with corrupt-row routing — the
    batch counterpart of the streaming ``parse_with_dlq`` split:
    PERMISSIVE mode lands unparsable rows in ``_corrupt_record``
    instead of failing the job, and the caller gets (good, bad)
    frames sharing ONE read. The bad frame carries the raw line for
    the quarantine/DLQ write. The input is cached because Spark
    cannot re-derive the corrupt column from a re-read that prunes
    the data columns (documented Spark behavior)."""
    from pyspark.sql import types as T

    ensure_engine_confs(spark)
    aug = T.StructType(schema.fields + [T.StructField("_corrupt_record", T.StringType())])
    raw = (
        spark.read.schema(aug)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw"), F.lit("csv_parse_failed").alias("reason")
    )
    return good, bad


def load_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read of a parquet directory whose files were
    written under DIFFERENT schema versions (columns added over
    time): ``mergeSchema`` unions the file footers into one schema,
    older files surface NULL for columns they predate. This is the
    batch counterpart of Delta's additive schema evolution — use it
    on append-style landing zones where producers upgrade
    independently. (Footer merging is a driver-side metadata pass;
    at scale pin a table schema instead and let new columns arrive
    via the catalog.)"""
    ensure_engine_confs(spark)
    return spark.read.option("mergeSchema", "true").parquet(path)


def jdbc_pushdown_query(
    schema: str, table: str, watermark_col: str | None = None, watermark: str | None = None
) -> str:
    """Build the JDBC ``dbtable`` subquery with the incremental
    predicate inlined so the source DB evaluates it (reference:
    jobs/bronze/bronze_builder.py:99-102). Full-extract when no
    watermark is given (jobs/bootstrap/bootstrap_delta.py:72-75)."""
    if watermark_col and watermark is not None:
        return (
            f"(SELECT * FROM {schema}.{table} "
            f"WHERE {watermark_col} > '{watermark}') AS {table}_cdc"
        )
    return f"(SELECT * FROM {schema}.{table}) AS {table}_full"


def jdbc_scan(
    spark: SparkSession,
    url: str,
    schema: str,
    table: str,
    properties: dict[str, str],
    watermark_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """JDBC scan with DB-side predicate pushdown via subquery
    (S1). Untested in this environment (no database); the subquery
    construction itself is unit-tested."""
    dbtable = jdbc_pushdown_query(schema, table, watermark_col, watermark)
    return spark.read.jdbc(url=url, table=dbtable, properties=properties)
