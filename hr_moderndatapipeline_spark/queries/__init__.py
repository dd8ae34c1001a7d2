"""Query inventory: every implemented operator from SURVEY.md §2 as a
named (Spark query, DuckDB oracle SQL) pair.

Each Spark callable has signature ``(spark, sf_dir) -> DataFrame``;
the oracle is ANSI SQL DuckDB runs on the same parquet tables. Column
names and (where feasible) types are aligned on both sides; floating
aggregates are computed via exact decimal accumulation or explicit
sequential folds so the order-insensitive value hash matches across
engines. Queries with no oracle entry are genuinely non-SQL-expressible
(custom hashing / streaming) and are covered by unit tests instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hr_moderndatapipeline_spark.queries import (
    cdc_queries,
    core,
    dataops,
    streaming_queries,
    tpch_extra,
)

_MODULES = (core, cdc_queries, dataops, streaming_queries, tpch_extra)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        overlap = out.keys() & m.ORACLES.keys()
        if overlap:
            raise ValueError(f"duplicate oracle names: {overlap}")
        out.update(m.ORACLES)
    # Every oracle must name a real query: an orphaned key (typo, or
    # a renamed query whose oracle wasn't renamed) would silently
    # downgrade that query to rows-only — the gate would report
    # success while hash-checking nothing.
    q = queries().keys()
    orphans = out.keys() - q
    if orphans:
        raise ValueError(f"oracles without a matching query: {sorted(orphans)}")
    return out
