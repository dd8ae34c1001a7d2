"""Whole-surface physical-plan antipattern sweep.

test_plan_quality.py pins named plans; this audit walks EVERY
``queries()`` entry and rejects the three patterns that are always
scale bugs unless explicitly justified:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — O(n·m) joins;
  every non-equi join in the repo is supposed to be bucketized,
  banded, or blocked into an equi-join first.
- ``BatchEvalPython`` — row-at-a-time Python UDFs on a data path
  (the serialization tax the attrition_fact fix removed);
  Arrow-batched eval (``ArrowEvalPython`` / ``mapInPandas``) is the
  sanctioned Python boundary and stays allowed.

A query that legitimately needs an exception must be added to the
allowlist WITH a reason, so every future exception is a reviewed
decision, not an accident."""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.queries import queries
from tests.test_plan_quality import plan_of

# name -> reason. Every entry here is a reviewed BuildRight broadcast
# of a provably tiny side (k rows / 1 row), where the "nested loop" IS
# the intended single-pass scan — not an accidental O(n·m) join.
NESTED_LOOP_ALLOWED: dict[str, str] = {
    "ann_bruteforce_topk": "k query vectors broadcast against the corpus; "
    "O(n*k) scoring is the brute-force baseline by definition",
    "hard_negative_mining": "same shape as ann_bruteforce_topk (it IS "
    "ann_bruteforce with a map-side label filter): fixed query batch "
    "broadcast against one corpus scan",
    "centroid_classify": "k centroids broadcast against the corpus; "
    "O(n*k) assignment is the operator",
    "tfidf_top_terms": "1-row corpus doc-count broadcast into the scorer",
    "monthly_order_spine": "recursive year spine (≈7 rows) crossed with a "
    "12-row literal month dim — bounded by the schema's date span",
}
PYTHON_ROW_EVAL_ALLOWED: dict[str, str] = {}

_QUERIES = sorted(queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_no_plan_antipatterns(spark, sf_dir, name, fn):
    plan = plan_of(fn(spark, sf_dir))
    if name not in NESTED_LOOP_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    if name not in PYTHON_ROW_EVAL_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
