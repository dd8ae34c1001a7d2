"""Minimal SQL model runner (dbt-replacement, SURVEY.md §3.3/§7.6).

The reference materializes gold models through dbt-spark's
``session`` connection: each model compiles to ``CREATE OR REPLACE
TABLE … USING delta AS SELECT …`` against an in-process SparkSession
(reference: dbt/target/run/hrdatapipeline/models/gold/
gold_attrition_prototype.sql:1-14, dbt/profiles.yml:5-7), with
upstream models addressed by name and sources bound via
sources.yml. The engine keeps exactly that capability without dbt:

- a ``Model`` = name + SELECT sql + explicit upstream deps +
  materialization ("table" → parquet CTAS + view registration;
  "view" → temp view only);
- ``ModelRunner.run()`` topologically orders models, materializes
  each, and registers it so downstream models reference it by name —
  the Jinja ``ref()`` indirection replaced by plain SQL names.

Models are plain Spark SQL strings → full Catalyst optimization
(predicate pushdown, partial aggregates) exactly as the DataFrame
surface gets.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Model:
    name: str
    sql: str
    depends_on: tuple[str, ...] = ()
    materialization: str = "view"  # "view" | "table"
    partition_by: tuple[str, ...] = ()


@dataclass
class ModelRunner:
    spark: SparkSession
    models: Sequence[Model]
    table_root: str | None = None  # required for "table" materializations
    #: When True, a table model whose (normalized plan, input files)
    #: key matches the sidecar key of its existing materialization is
    #: NOT rewritten — the dbt "state:modified" freshness skip, done
    #: engine-side via plans/matcache.cache_key. Because the key
    #: includes upstream FILES, rewriting any upstream model flips
    #: downstream keys and the recompute cascades correctly.
    #: Nondeterministic models (cache_key refuses) always rebuild.
    freshness_skip: bool = False
    _results: dict[str, DataFrame] = field(default_factory=dict)
    #: model names skipped as fresh on the last run() (observability)
    skipped: list[str] = field(default_factory=list)

    def order(self) -> list[Model]:
        by_name = {m.name: m for m in self.models}
        ts = TopologicalSorter({m.name: set(m.depends_on) for m in self.models})
        ordered = []
        for name in ts.static_order():
            if name in by_name:  # deps may be pre-registered source views
                ordered.append(by_name[name])
        return ordered

    def run(self) -> dict[str, DataFrame]:
        """Materialize every model in dependency order; returns
        name → DataFrame of the materialized relation."""
        self.skipped = []
        for m in self.order():
            df = self.spark.sql(m.sql)
            if m.materialization == "table":
                if not self.table_root:
                    raise ValueError(f"model {m.name}: table materialization needs table_root")
                path = os.path.join(self.table_root, m.name)
                key = None
                if self.freshness_skip:
                    try:
                        from hr_moderndatapipeline_spark.plans.matcache import cache_key

                        key = cache_key(df)
                    except ValueError:
                        key = None  # nondeterministic model: always rebuild
                keyfile = os.path.join(path, "_model_key")
                if (
                    key is not None
                    and os.path.exists(keyfile)
                    and open(keyfile).read() == key
                ):
                    self.skipped.append(m.name)
                    written = df.schema
                    df = self.spark.read.parquet(path)
                    from pyspark.sql import functions as F

                    df = df.select(
                        *[F.col(f.name).cast(f.dataType) for f in written.fields]
                    )
                    df.createOrReplaceTempView(m.name)
                    self._results[m.name] = df
                    continue
                w = df.write.mode("overwrite")
                if m.partition_by:
                    w = w.partitionBy(*m.partition_by)
                w.parquet(path)
                if key is not None:
                    with open(keyfile, "w") as fh:  # underscore name: invisible to readers
                        fh.write(key)
                written = df.schema
                df = self.spark.read.parquet(path)
                # partitionBy re-read infers partition-column types
                # from directory names (e.g. '00123' -> INT 123) and
                # moves them to the end; restore the model's declared
                # types and column order so downstream SQL sees
                # exactly what the model produced
                from pyspark.sql import functions as F

                df = df.select(
                    *[F.col(f.name).cast(f.dataType) for f in written.fields]
                )
            df.createOrReplaceTempView(m.name)
            self._results[m.name] = df
        return dict(self._results)
