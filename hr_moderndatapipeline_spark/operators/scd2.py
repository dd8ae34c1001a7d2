"""SCD2 (slowly-changing-dimension type-2) operators — the reference's
core semantics, implemented correctly.

The reference intends SCD2 via a single Delta MERGE
(jobs/silver/silver_builder.py:103-132): stamp
``effective_start_date = updated_at``, ``effective_end_date =
2099-12-31``, ``is_current = true`` on incoming rows, close matched
changed rows. **Its one-phase MERGE has a known semantic bug**
(SURVEY.md §2.11.3): the new version of an existing key matches the
merge condition, so ``whenNotMatchedInsertAll`` never fires — the old
row is closed but no new current row lands. One-phase MERGE cannot do
SCD2. This module implements the standard **two-phase** form, as pure
DataFrame algebra (no Delta in this environment):

- ``scd2_apply``   — incremental: close-and-insert against an existing dim.
- ``scd2_from_history`` — full recompute from a versioned change log
  (lead() windows); also the parquet-fallback path for rebuilds.
- ``as_of_join``   — point-in-time dimension resolution over the
  ``effective_start <= ts < effective_end`` ranges (idiomatic
  completion of the SCD2 capability, flagged as an addition in
  SURVEY.md §2.4).
- ``validate_scd2`` — the non-negotiable invariants: exactly one
  current row per live key, no overlapping ranges.

Target column names follow the reference's landed Delta schema
(`effective_start_date`/`effective_end_date`/`is_current`,
silver_builder.py:103-108).

Scale notes: ``scd2_from_history`` is one shuffle on the key;
``scd2_apply`` joins changes×current-slice on the key (broadcast the
change set when it is small — the common CDC case). ``as_of_join``
with a dimension that fits in memory should pass ``broadcast=True``
to avoid shuffling the 100 TB fact side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Open-ended end date used by the reference (silver_builder.py:106).
OPEN_END = "2099-12-31 00:00:00"

START, END, CURRENT = "effective_start_date", "effective_end_date", "is_current"


def scd2_from_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str = START,
    end_col: str = END,
    current_col: str = CURRENT,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build the full SCD2 table from a versioned change log: each
    version's validity runs from its own timestamp to the next
    version's timestamp (open-ended for the latest). Single window
    shuffle on ``keys``.

    PRECONDITION: ``(keys, ts_col)`` — extended by ``tiebreak`` —
    must identify rows uniquely; SCD2 validity ranges are undefined
    under same-instant versions, and without a total order the
    version chain (and therefore is_current) is engine- and
    partitioning-dependent. Pass the change-log's id column as the
    tiebreak when timestamps can collide."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn(start_col, F.col(ts_col))
        .withColumn(end_col, F.coalesce(nxt, F.lit(OPEN_END).cast("timestamp")))
        .withColumn(current_col, nxt.isNull())
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str,
    start_col: str = START,
    end_col: str = END,
    current_col: str = CURRENT,
    broadcast_changes: bool = False,
) -> DataFrame:
    """Two-phase SCD2 apply (the corrected K3, SURVEY.md §2.11.3).

    ``dim`` is an existing SCD2 table (with start/end/current
    columns); ``changes`` carries the business columns + ``ts_col``.
    Change detection is per tracked column, null-safe (the
    reference's dynamically-built ``t.c <> s.c`` OR-chain,
    silver_builder.py:115, misses NULL transitions — fixed here).

    Behavior per change row:
    - key not in dim            → insert as new current version
    - key current, tracked diff → close current row at change ts +
                                  insert new current version
    - key current, no diff      → no-op

    Multiple versions of one key inside a single batch are applied
    in ``ts_col`` order via ``scd2_from_history`` over the winning
    subset, so intra-batch history is preserved.

    POLICY (cross-engine-pinned by the ``scd2_apply_fold`` oracle):
    only a batch's LEADING row is no-op-checked against the current
    dim version; later batch rows are versions by construction — the
    changes input is a change LOG, and every logged entry (even one
    restating the same tracked values) is an observed version worth
    materializing. Callers wanting consecutive-identical collapsing
    should dedup the change frame first (``latest_per_key`` /
    ``change_pairs``).
    """
    keys = list(keys)
    biz_cols = [c for c in changes.columns if c != ts_col and c not in keys]
    if not set(tracked) <= set(biz_cols):
        raise ValueError(f"tracked columns {tracked} not all in change columns {biz_cols}")

    cur = dim.filter(F.col(current_col))
    hist = dim.filter(~F.col(current_col))

    ch = changes
    if broadcast_changes:
        ch = F.broadcast(ch)

    # Pair each change's FIRST batch version against the current dim
    # row to decide "changed?"; later batch versions are changes by
    # construction.
    first_w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    ch_ranked = ch.withColumn("_batch_rn", F.row_number().over(first_w))

    cur_k = cur.select(
        *[F.col(k).alias(f"_t_{k}") for k in keys],
        *[F.col(c).alias(f"_t_{c}") for c in tracked],
        F.col(start_col).alias("_t_start"),
    )
    join_cond = None
    for k in keys:
        c = F.col(k) == F.col(f"_t_{k}")
        join_cond = c if join_cond is None else (join_cond & c)
    paired = ch_ranked.join(cur_k, join_cond, "left")

    diff = None
    for c in tracked:
        neq = ~F.col(c).eqNullSafe(F.col(f"_t_{c}"))
        diff = neq if diff is None else (diff | neq)
    is_new_key = F.col(f"_t_{keys[0]}").isNull()
    effective_change = (
        (F.col("_batch_rn") > 1) | is_new_key | diff
    )
    # Stale guard: a change row at or before the CURRENT version's
    # start has already been applied (a replayed batch after a crash
    # between publish and watermark advance) — re-applying it would
    # close the current row at an inverted range and duplicate
    # history. SCD2 apply is forward-only; true late corrections go
    # through a history recompute (scd2_from_history).
    not_stale = is_new_key | (F.col(ts_col) > F.col("_t_start"))

    applied = paired.filter(effective_change & not_stale)
    drop_aux = ["_batch_rn"] + [f"_t_{k}" for k in keys] + [f"_t_{c}" for c in tracked] + ["_t_start"]

    # Phase A: close current rows for every existing key that has an
    # applied (to-be-inserted) change row — not only keys whose FIRST
    # batch row changed: a batch can open with a no-op version
    # (dropped) followed by a real change, and the current row must
    # still close at the first inserted version's timestamp or the
    # key would end up with two current rows.
    closing_keys = (
        applied.filter(~is_new_key)
        .groupBy(*keys)
        .agg(F.min(ts_col).alias("_close_ts"))
    )
    closed = (
        cur.join(closing_keys, keys, "inner")
        .withColumn(end_col, F.col("_close_ts"))
        .withColumn(current_col, F.lit(False))
        .drop("_close_ts")
    )
    untouched_cur = cur.join(closing_keys.select(*keys), keys, "left_anti")

    # Phase B: insert the applied change rows as SCD2 versions
    # (chained within the batch).
    inserts = scd2_from_history(
        applied.drop(*drop_aux), keys, ts_col, start_col, end_col, current_col
    )
    # Align insert schema to dim's column order.
    inserts = inserts.select(*dim.columns)

    return hist.unionByName(closed).unionByName(untouched_cur).unionByName(inserts)


def as_of_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str = START,
    end_col: str = END,
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """Resolve each fact row against the dimension version valid at
    the fact's timestamp: equi-join on ``keys`` plus the range
    residual ``start <= ts < end``. With a valid SCD2 dim (validated
    invariants) at most one version matches, so no dedup pass is
    needed. Broadcast the dim by default — the typical dimension is
    tiny next to the fact stream."""
    d = F.broadcast(dim) if broadcast_dim else dim
    d = d.select(
        *[F.col(k).alias(f"_d_{k}") for k in keys],
        *[F.col(c) for c in dim.columns if c not in keys],
    )
    cond = None
    for k in keys:
        c = facts[k] == F.col(f"_d_{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col(start_col) <= facts[ts_col]) & (facts[ts_col] < F.col(end_col))
    out = facts.join(d, cond, how)
    return out.drop(*[f"_d_{k}" for k in keys])


def as_of_join_sorted(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str = START,
    end_col: str = END,
    how: str = "left",
) -> DataFrame:
    """Merge-based as-of join — same semantics as :func:`as_of_join`
    (latest dim version with ``start <= ts < end`` per fact row) with
    a fundamentally different cost shape: union facts + version
    starts, ONE sort per key on ``(ts, row-kind)``, and a running
    ``last(ignorenulls)`` carry-forward picks each fact's governing
    version. Per-key work is O((P+V)·log(P+V)) instead of the hash
    probe's O(P·V) bucket scans.

    When to use which (measured, tools/hot_user_fixture.py r10):
    ``as_of_join`` broadcasts a SMALL dim and never shuffles the fact
    stream — the right plan for a classic dimension. But its hash
    probe scans ALL of a key's versions per fact row, so a HOT key
    (bot/service account with 10⁵–10⁶ versions, or a dim derived from
    the event stream itself) degrades to the C·T quadratic this repo
    eliminates elsewhere. This variant pays one (facts+dim) shuffle
    and is immune to per-key version counts — the plan you want when
    the dim is event-derived, version-heavy, or skewed.

    Implementation notes: dim payload travels as ONE struct so the
    carry-forward can never mix columns from different versions
    (per-column ``last(ignorenulls)`` would, on a version with a
    legitimately NULL attribute); at equal timestamps the version row
    sorts BEFORE the fact row, making ``start <= ts`` inclusive
    exactly like the range predicate; the carried version is voided
    when ``ts >= end`` (validity gap), preserving LEFT semantics.
    Output columns match :func:`as_of_join`: facts.* then the dim's
    non-key columns (including the range bounds)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    payload_cols = [c for c in dim.columns if c not in keys]
    f = facts.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_fact"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("_fact"),
    )
    d = dim.select(
        *[F.col(k) for k in keys],
        F.col(start_col).alias("_ts"),
        F.lit(0).alias("_is_fact"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_pay"),
    )
    f = f.withColumn("_pay", F.lit(None).cast(d.schema["_pay"].dataType))
    d = d.withColumn("_fact", F.lit(None).cast(f.schema["_fact"].dataType))
    u = f.unionByName(d.select(*f.columns))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_fact").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_cp", F.last("_pay", ignorenulls=True).over(w)
    ).filter(F.col("_is_fact") == 1)
    live = F.col("_cp").isNotNull() & (
        F.col("_ts") < F.col(f"_cp.{end_col}")
    )
    carried = carried.withColumn(
        "_cp", F.when(live, F.col("_cp"))
    )
    if how == "inner":
        carried = carried.filter(F.col("_cp").isNotNull())
    return carried.select(
        F.col("_fact.*"),
        *[F.col(f"_cp.{c}").alias(c) for c in payload_cols],
    )


def point_in_time_join(
    spine: DataFrame,
    ts_col: str,
    features: Sequence[tuple[DataFrame, Sequence[str], str]],
    broadcast_features: bool = True,
    merge_sorted: bool = False,
) -> DataFrame:
    """Feature-store point-in-time join: enrich every spine row
    (entity keys + observation timestamp) with, from EACH feature
    table, the latest feature row whose timestamp is ≤ the spine
    timestamp — never a later one (that would leak the future into
    training labels).

    ``features`` is a sequence of (df, keys, feature_ts_col). Each
    feature table's event log is first converted to validity ranges
    (``scd2_from_history`` — one window shuffle per feature table),
    then range-resolved against the spine. Three resolution plans:

    - default: ``as_of_join`` with the feature broadcast — the spine
      is never shuffled; right when feature tables are dimension-
      sized (the common feature-store case);
    - ``broadcast_features=False``: key-equi join with a range
      residual — one spine shuffle per feature table; right when a
      feature table is too big to broadcast but versions-per-key are
      modest (the probe scans ALL of a key's versions per spine row);
    - ``merge_sorted=True``: ``as_of_join_sorted`` — one
      (spine+feature) sort per table, per-key cost O((P+V)·log)
      regardless of version counts; right when a feature table is
      event-derived or carries hot keys (the quadratic measured in
      tools/hot_user_fixture.py r10)."""
    out = spine
    for fdf, keys, fts in features:
        # the feature's own timestamp is folded into the validity
        # range (and would collide with the spine's ts column name)
        hist = scd2_from_history(fdf, keys, fts).drop(CURRENT, fts)
        if merge_sorted:
            out = as_of_join_sorted(out, hist, keys, ts_col).drop(START, END)
        else:
            out = as_of_join(
                out, hist, keys, ts_col, broadcast_dim=broadcast_features
            ).drop(START, END)
    return out


def validate_scd2(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = START,
    end_col: str = END,
    current_col: str = CURRENT,
) -> dict[str, int]:
    """SCD2 invariants (SURVEY.md §5): (1) exactly one current row
    per key; (2) effective ranges per key are non-overlapping and
    contiguous; (3) start < end everywhere. Returns violation counts
    (all zero ⇔ healthy)."""
    one_current = (
        df.groupBy(*keys)
        .agg(F.sum(F.when(F.col(current_col), 1).otherwise(0)).alias("n_cur"))
        .filter(F.col("n_cur") != 1)
        .count()
    )
    w = Window.partitionBy(*keys).orderBy(F.col(start_col).asc())
    with_next = df.withColumn("_next_start", F.lead(start_col).over(w))
    overlap_or_gap = with_next.filter(
        F.col("_next_start").isNotNull() & (F.col(end_col) != F.col("_next_start"))
    ).count()
    bad_range = df.filter(F.col(start_col) >= F.col(end_col)).count()
    return {
        "keys_without_exactly_one_current": one_current,
        "non_contiguous_ranges": overlap_or_gap,
        "inverted_ranges": bad_range,
    }
