"""Cross-engine read-compatibility checking (SURVEY.md §2.1 S3).

The reference verifies that Spark-written Delta tables are readable
outside the JVM by re-reading them with the Rust ``deltalake``
library into pandas (jobs/bronze/bronze_reader.py:72-73,
tests/delta_reader_rust.py:47-52) — the point being that the lake is
open-format: any engine must see the same rows. The engine's storage
here is parquet snapshots (Delta where jars exist), so the
counterpart check reads the SAME published snapshot through two
independent engines — Spark (JVM, via Arrow ``toPandas``) and DuckDB
(C++, no JVM) — and compares row multisets.

Driver-side pandas materialization is sanctioned here and only here:
a parity checker is an inspection tool over bounded snapshots, not a
data path (the reference's mistake of running *pipelines* through
pandas is exactly what SURVEY.md §7 bans).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from hr_moderndatapipeline_spark.streaming.sinks import LATEST_MARKER


def _canon_frame(pdf) -> list[str]:
    cols = sorted(pdf.columns)
    lines = [
        "|".join("NULL" if v is None or v != v else repr(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(lines)


def snapshot_parity_check(spark: SparkSession, target: str) -> dict:
    """Compare the current published snapshot as seen by Spark vs
    DuckDB. Returns {'rows_spark', 'rows_duckdb', 'columns_match',
    'rows_match'} — all-match ⇔ the snapshot is engine-agnostic."""
    import duckdb

    marker = os.path.join(target, LATEST_MARKER)
    with open(marker) as f:
        version = f.read().strip()
    path = os.path.join(target, version)

    spark_pdf = spark.read.parquet(path).toPandas()
    # recursive glob + hive partitioning: a snapshot published with
    # partition_by writes key=value/ subdirectories, which the flat
    # top-level glob would miss entirely
    duck_pdf = duckdb.connect().execute(
        "SELECT * FROM read_parquet(?, hive_partitioning=true)",
        [os.path.join(path, "**", "*.parquet")],
    ).df()

    cols_match = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    a, b = _canon_frame(spark_pdf), _canon_frame(duck_pdf)
    return {
        "rows_spark": len(spark_pdf),
        "rows_duckdb": len(duck_pdf),
        "columns_match": cols_match,
        "rows_match": cols_match and a == b,
    }
