"""Incremental aggregate maintenance (beyond-reference capability;
complements the HWM incremental extract of sources/watermark.py).

The reference recomputes its gold aggregates from the full silver
table every run (dbt full CTAS,
dbt/target/run/hrdatapipeline/models/gold/gold_attrition_prototype.sql:1-14).
At 100 TB a daily full recompute is the difference between a
5-minute and a 5-hour job: the scalable pattern is to keep a small
per-key AGGREGATE STATE table and fold each incremental batch into
it — only ever scanning the new data plus O(|keys|) state.

Only decomposable aggregates participate (count/sum/min/max, avg as
a (sum, count) pair finalized on read, and approx_distinct as a
mergeable HLL sketch — plain COUNT DISTINCT is NOT decomposable,
the sketch is how warehouses maintain it incrementally): each has a
merge function such that merge(agg(A), agg(B)) = agg(A ∪ B), so
folding batches in any order or grouping reproduces the
full-recompute result exactly — pinned by a property test.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: agg name -> (batch aggregator, state merger). ``count`` merges by
#: summing per-batch counts; ``approx_distinct`` carries a binary
#: HLL sketch merged by union (estimated on read); everything else
#: merges with itself.
_AGGS = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "approx_distinct": (F.hll_sketch_agg, F.hll_union_agg),
}


def _check(aggs: Mapping[str, str]) -> None:
    bad = {c: a for c, a in aggs.items() if a not in _AGGS and a != "avg"}
    if bad:
        raise ValueError(
            f"non-decomposable aggregates {bad}; supported: "
            f"{sorted(_AGGS)} + avg"
        )


def _expand_avg(aggs: Mapping[str, str]) -> dict[str, tuple[str, str]]:
    """(out_col -> (source_col, agg)); avg becomes a sum+count pair
    carried in state and finalized by ``finalize_aggs``."""
    out: dict[str, tuple[str, str]] = {}
    for col, agg in aggs.items():
        if agg == "avg":
            out[f"{col}_sum"] = (col, "sum")
            out[f"{col}_cnt"] = (col, "count")
        else:
            out[f"{col}_{agg}"] = (col, agg)
    return out


def aggregate_batch(
    batch: DataFrame, keys: Sequence[str], aggs: Mapping[str, str]
) -> DataFrame:
    """Per-key partial aggregates of ONE batch — map-side combined by
    Catalyst, one shuffle on the grouping keys."""
    _check(aggs)
    plan = _expand_avg(aggs)
    exprs = [_AGGS[a][0](F.col(src)).alias(out) for out, (src, a) in plan.items()]
    return batch.groupBy(*keys).agg(*exprs)


def merge_agg_state(
    state: DataFrame | None,
    batch_aggs: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
) -> DataFrame:
    """Fold a batch's partial aggregates into the state table:
    union + one re-aggregation over O(|state| + |batch keys|) rows —
    the incremental step never rescans historical raw data."""
    _check(aggs)
    plan = _expand_avg(aggs)
    if state is None:
        return batch_aggs
    both = state.unionByName(batch_aggs)
    exprs = [_AGGS[a][1](F.col(out)).alias(out) for out, (_, a) in plan.items()]
    return both.groupBy(*keys).agg(*exprs)


def finalize_aggs(state: DataFrame, aggs: Mapping[str, str]) -> DataFrame:
    """Read-side projection of the state table: avg pairs become the
    quotient; everything else passes through under its state name."""
    _check(aggs)
    cols = [F.col(k) for k in state.columns if not any(
        k == out for out in _expand_avg(aggs)
    )]
    for col, agg in aggs.items():
        if agg == "avg":
            cols.append(
                (F.col(f"{col}_sum") / F.col(f"{col}_cnt")).alias(f"{col}_avg")
            )
        elif agg == "approx_distinct":
            cols.append(
                F.hll_sketch_estimate(F.col(f"{col}_{agg}")).alias(f"{col}_{agg}")
            )
        else:
            cols.append(F.col(f"{col}_{agg}"))
    return state.select(*cols)


def incremental_fold(
    batches: Sequence[DataFrame], keys: Sequence[str], aggs: Mapping[str, str]
) -> DataFrame:
    """Convenience: fold a sequence of batches through the state —
    exactly what a scheduled run does with one batch per day."""
    state: DataFrame | None = None
    for b in batches:
        state = merge_agg_state(state, aggregate_batch(b, keys, aggs), keys, aggs)
    if state is None:
        raise ValueError("no batches")
    return state
