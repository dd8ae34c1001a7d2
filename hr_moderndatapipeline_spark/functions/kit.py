"""Scalar-function kit (SURVEY.md §2.9).

Small named combinators over ``pyspark.sql.functions`` for the
reference's recurring expression shapes — all JVM-side/codegen'd, no
Python UDFs:

- null-safe ratio math: ``COALESCE(x / NULLIF(y,0), 0)`` from the
  gold models (dbt/models/gold/gold_attrition_prototype.sql:19-24).
- period-key derivation: ``year()``/``month()`` from
  jobs/silver/silver_attrition_builder.py:99-100.
- ``dec_sum`` — deterministic money aggregation: accumulate in
  DECIMAL (exact, order-independent) and surface as DOUBLE. Summing
  doubles directly is order-dependent, which breaks cross-engine
  value-hash comparison and makes retried stages non-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_safe_ratio(num: Column, den: Column) -> Column:
    """``COALESCE(num / NULLIF(den, 0), 0)`` as double."""
    return F.coalesce(num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), F.lit(0.0))


def dec_sum(col: Column | str, precision: int = 38, scale: int = 2) -> Column:
    """Exact decimal sum surfaced as double — deterministic under
    any partitioning / aggregation order. Precision defaults to the
    decimal maximum (38): with ANSI off, a value overflowing the cast
    becomes NULL and F.sum silently DROPS it — at 18,2 a single
    >=10^16 outlier made the "exact" total quietly wrong."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def with_period_keys(df: DataFrame, date_col: str, year_col: str = "year", month_col: str = "month") -> DataFrame:
    """Derive integer year/month period keys (F7)."""
    return df.withColumn(year_col, F.year(date_col)).withColumn(
        month_col, F.month(date_col)
    )


def tenure_days(start: Column, end: Column) -> Column:
    """Tenure in days (F8, silver_attrition_builder.py:98)."""
    return F.datediff(end, start)


def month_bucket(col: Column | str) -> Column:
    """Month-start bucketing (F9, silver_attrition_builder.py:121)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trunc(c, "MM")


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten nested struct columns into top-level
    columns named by their path (``actor.user_id`` → ``actor_user_id``)
    — the post-``from_json`` step every semi-structured ingest needs.
    The reference flattens exactly one level with ``select("data.*")``
    (kafka/consumer/kafka_consumer_training_events.py:40); this
    handles arbitrary nesting in one projection (pure column
    selection — zero data movement, fully prunable)."""
    from pyspark.sql import types as T

    def leaves(schema: T.StructType, prefix: str) -> list:
        cols = []
        for f in schema.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            name = path.replace(".", sep)
            if isinstance(f.dataType, T.StructType):
                cols.extend(leaves(f.dataType, path))
            else:
                cols.append(F.col(path).alias(name))
        return cols

    return df.select(*leaves(df.schema, ""))
