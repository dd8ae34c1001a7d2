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


def ewma_update(
    state: DataFrame | None,
    batch: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Incremental maintenance of the per-key EWMA feature state
    (operators/relational.py ewma_features) — the order-SENSITIVE
    sibling of the decomposable aggregates above. EWMA is a
    sequential recurrence, so it is not merge-in-any-order; but a
    left-to-right fold IS exactly composable across a time split:

        fold(b1 ++ b2) == fold(b2, seed=fold(b1))

    bit-for-bit (the very same operation sequence), so folding daily
    batches into a persisted O(keys) state table reproduces the
    full-history recompute EXACTLY — no approximation, no
    quantization. That exactness is pinned by a split-vs-one-shot
    property test and a DuckDB oracle that recomputes from scratch.

    Contract: batches must advance in event time. A batch containing
    a key's event EARLIER than that key's ``last_ts`` state would
    silently violate the recurrence order, so it raises loudly
    instead (the resample_fill guard pattern), naming the key's
    regression. Replaying the SAME batch is therefore also refused —
    idempotent replay needs the journal/versioned-publish machinery
    (streaming/sinks.py), not silent re-folding.

    State schema (also what's returned): keys…, n_events BIGINT,
    last_ts, ewma DOUBLE. Pass ``state=None`` to bootstrap (then
    this is exactly ``ewma_features`` on the batch). One shuffle on
    the keys per batch; state is never scanned beyond its O(keys)
    rows.
    """
    from hr_moderndatapipeline_spark.operators.relational import ewma_features

    if state is None:
        return ewma_features(
            batch, keys, ts_col, value_col, alpha=alpha, tiebreak_col=tiebreak_col
        )
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    kcols = list(keys)
    a, b = repr(float(alpha)), repr(1.0 - float(alpha))
    tb = tiebreak_col or ts_col
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col), F.col(tb), F.col(value_col)))
    )
    bagg = batch.groupBy(*kcols).agg(
        F.count(F.lit(1)).alias("_bn"),
        F.min(ts_col).alias("_bmin"),
        F.max(ts_col).alias("_bmax"),
        ordered.alias("_evs"),
    )
    joined = state.join(bagg, kcols, "full_outer").withColumn(
        "_vals", F.expr(f"transform(_evs, s -> CAST(s.{value_col} AS DOUBLE))")
    )
    lam = f"(acc, v) -> CAST({a} AS DOUBLE) * v + CAST({b} AS DOUBLE) * acc"
    seed_guarded = (
        f"IF(last_ts IS NULL OR _bmin >= last_ts, ewma, "
        f"CAST(raise_error(concat('ewma_update: batch regresses behind state ("
        f"batch min ', CAST(_bmin AS STRING), ' < state last_ts ', "
        f"CAST(last_ts AS STRING), '); batches must advance in event time')) "
        f"AS DOUBLE))"
    )
    new_ewma = F.expr(
        f"CASE WHEN _evs IS NULL THEN ewma "
        f"WHEN ewma IS NULL THEN "
        f"aggregate(slice(_vals, 2, greatest(size(_vals) - 1, 0)), "
        f"element_at(_vals, 1), {lam}) "
        f"ELSE aggregate(_vals, {seed_guarded}, {lam}) END"
    )
    return joined.select(
        *kcols,
        (F.coalesce(F.col("n_events"), F.lit(0)) + F.coalesce(F.col("_bn"), F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        F.coalesce(F.col("_bmax"), F.col("last_ts")).alias("last_ts"),
        new_ewma.alias("ewma"),
    )


def incremental_join_delta(
    l_old: DataFrame,
    dl: DataFrame,
    r_old: DataFrame,
    dr: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Delta of an inner equi-join under INSERT-ONLY deltas — the
    join half of incremental view maintenance (the aggregate half is
    ``incremental_fold``). The multiset identity

        d(L JOIN R) = (dL JOIN R_old) UNION ALL (L_old JOIN dR)
                      UNION ALL (dL JOIN dR)

    is exact: appending the delta to the old view reproduces the
    full recompute row-for-row (pinned by a property test with
    duplicates and deltas on BOTH sides). Deletes ride the
    delete-propagation operator (streaming/sinks.py); an update is a
    delete + insert.

    100 TB posture: each term shuffles at most one delta against one
    snapshot — the snapshots are never joined to each other. With
    snapshots bucketed on the join keys (operators/layout.py
    publish_bucketed) only the deltas move at all, and a small dL
    broadcasts. A nightly batch maintains a 100 TB join view by
    scanning the day's inserts, not the decade's rows.
    """
    kcols = list(keys)
    return (
        dl.join(r_old, kcols, "inner")
        .unionByName(l_old.join(dr, kcols, "inner"))
        .unionByName(dl.join(dr, kcols, "inner"))
    )
