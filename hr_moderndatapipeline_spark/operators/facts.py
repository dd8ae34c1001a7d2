"""Silver fact derivations: attrition events, headcount snapshots,
tenure, and deterministic synthetic features (SURVEY.md §2.11.4,
reference jobs/silver/silver_attrition_builder.py:91-137).

The reference derives an attrition-event fact from soft-deleted
non-current rows (``is_deleted & !is_current``), stamps period keys
and tenure, enriches with 7 *nondeterministic* ``random``-based
scalar UDFs invoked through SQL ``expr()`` (U1/F12,
silver_attrition_builder.py:71-86,102-110), and builds monthly
headcount snapshots by month-truncation (:121).

Engine decisions:
- the U1 surface is kept — ``register_feature_udfs`` registers
  scalar UDFs by name and pipelines invoke them via ``F.expr`` —
  but the functions are *deterministic* (key-derived), so results
  are reproducible and oracle-checkable; the reference's
  ``random()`` calls break retry/idempotency semantics on any real
  cluster (a retried task would draw new values).
- the same features are also exposed as pure column expressions
  (``feature_cols``) — the preferred zero-Python form; the UDF path
  exists for reference parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.kit import (
    month_bucket,
    tenure_days,
    with_period_keys,
)

#: Deterministic value pools replacing the reference's random draws
#: (silver_attrition_builder.py:71-77). Assignment = key mod pool
#: size — stable across runs, retries, and engines.
PERSONA_POOL = ("explorer", "builder", "connector", "analyst")
TRAVEL_POOL = ("rare", "frequent", "none")
MARITAL_POOL = ("single", "married")
OVERTIME_POOL = ("yes", "no")


def _pick(key: Column, pool: Sequence[str]) -> Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in pool]), (F.pmod(key, F.lit(len(pool))) + 1).cast("int")
    )


def feature_cols(key: Column) -> dict[str, Column]:
    """Deterministic synthetic features as pure column expressions
    (the scalable replacement for U1's random UDFs)."""
    return {
        "persona": _pick(key, PERSONA_POOL),
        "travel": _pick(key + 1, TRAVEL_POOL),
        "age_band": (F.pmod(key, F.lit(5)) * 10 + 20).cast("int"),
        "marital": _pick(key + 2, MARITAL_POOL),
        "overtime": _pick(key + 3, OVERTIME_POOL),
        "appraisal": (F.pmod(key, F.lit(5)) + 1).cast("int"),
        "years": F.pmod(key, F.lit(21)).cast("int"),
    }


def register_feature_udfs(spark: SparkSession) -> None:
    """U1 parity — all 7 of the reference's feature generators
    (rand_marital/persona/travel/age/overtime/appraisal/years,
    silver_attrition_builder.py:71-86), registered by name and
    invocable from SQL / ``F.expr``. Deterministic by key argument —
    ``.asNondeterministic()`` is exactly what the engine refuses to
    need: the reference's ``random()`` draws change on task retry."""
    spark.udf.register(
        "det_persona", lambda k: PERSONA_POOL[k % len(PERSONA_POOL)], "string"
    )
    spark.udf.register(
        "det_travel", lambda k: TRAVEL_POOL[(k + 1) % len(TRAVEL_POOL)], "string"
    )
    spark.udf.register("det_age_band", lambda k: k % 5 * 10 + 20, "int")
    spark.udf.register(
        "det_marital", lambda k: MARITAL_POOL[(k + 2) % len(MARITAL_POOL)], "string"
    )
    spark.udf.register(
        "det_overtime", lambda k: OVERTIME_POOL[(k + 3) % len(OVERTIME_POOL)], "string"
    )
    spark.udf.register("det_appraisal", lambda k: k % 5 + 1, "int")
    spark.udf.register("det_years", lambda k: k % 21, "int")


def attrition_events(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    deleted_col: str,
    current_col: str,
) -> DataFrame:
    """Attrition-event fact: soft-deleted, non-current rows (P5,
    silver_attrition_builder.py:97) with period keys from the
    closing date and tenure in days."""
    ev = df.filter((F.col(deleted_col)) & (~F.col(current_col)))
    ev = with_period_keys(ev, end_col)
    return ev.withColumn("tenure_days", tenure_days(F.col(start_col), F.col(end_col)))


def headcount_monthly(
    df: DataFrame, key_col: str, active_from: str, active_to: str, cap: str
) -> DataFrame:
    """Monthly headcount series: one row per month-start covered by
    each key's validity range (``active_from <= month < active_to``,
    capped at ``cap`` so open-ended current rows don't explode to
    2099), counted per month. The month explosion is map-side
    (sequence + explode); the single shuffle is the final count —
    the distributed generalization of the reference's one-month
    snapshot (silver_attrition_builder.py:121)."""
    frm, to = F.col(active_from), F.col(active_to)
    # month-start m is covered iff from <= m < to (half-open), m <= cap
    first_m = F.to_date(month_bucket(frm))
    first_covered = F.when(frm == first_m.cast("timestamp"), first_m).otherwise(
        F.add_months(first_m, 1)
    )
    to_m = F.to_date(month_bucket(to))
    last_lt_to = F.when(to == to_m.cast("timestamp"), F.add_months(to_m, -1)).otherwise(to_m)
    last_covered = F.least(last_lt_to, F.to_date(F.trunc(F.lit(cap), "MM")))
    months = F.when(
        first_covered <= last_covered,
        F.sequence(first_covered, last_covered, F.expr("interval 1 month")),
    ).otherwise(F.array().cast("array<date>"))
    exploded = df.select(F.col(key_col), F.explode(months).alias("month"))
    return exploded.groupBy("month").agg(
        F.countDistinct(key_col).alias("headcount")
    )
