"""SQL model surface: dependency-ordered materialization of SQL
models over registered views — the engine's replacement for the
reference's dbt-on-session flow (SURVEY.md §3.3) — plus the DAG
orchestrator replacing the Airflow layer (§3.4)."""

from hr_moderndatapipeline_spark.plans.models import Model, ModelRunner
from hr_moderndatapipeline_spark.plans.gold import GOLD_MODELS
from hr_moderndatapipeline_spark.plans.orchestrate import (
    Dag,
    TaskSpec,
    dag_from_models,
)

__all__ = ["Model", "ModelRunner", "GOLD_MODELS", "Dag", "TaskSpec", "dag_from_models"]
