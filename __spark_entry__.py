"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions) as (spark, sf_dir) callables.
``oracle_sql()`` — matching DuckDB SQL for the hash-compared
correctness gate; non-SQL-expressible ops are intentionally absent
(rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hr_moderndatapipeline_spark import queries as _q  # noqa: E402
from hr_moderndatapipeline_spark.queries.core import q_attrition_monthly  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: monthly order-status rate (the reference's
    gold monthly-attrition model, SURVEY.md §7.1) at sf0.001."""
    return q_attrition_monthly(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
