"""CDC apply operators: upsert (latest-row-wins) and op classification.

Reference behaviors re-expressed (SURVEY.md §2.11):

- **Upsert apply** — the reference runs a Delta MERGE keyed on the
  primary key, ``whenMatchedUpdateAll / whenNotMatchedInsertAll``
  (jobs/bronze/bronze_builder.py:116-123). Without Delta jars the
  engine implements identical semantics as a pure-DataFrame merge:
  union target+source and keep the winning row per key. The
  reference derived the PK by the crude ``table[:-1]+"_id"``
  convention (bronze_builder.py:119); here keys are explicit.
- **CDC op classification** — the reference reconstructs
  INSERT/UPDATE/DELETE from per-key version history in pandas
  (jobs/bronze/bronze_reader.py:101-122); here it is a ``lag``
  window (distributed, one shuffle).

Scale notes: the merge shuffles both sides once on the key. When the
change set is small relative to the target (the common CDC case), a
real deployment partitions the target by key-bucket so only touched
partitions rewrite; that strategy lives in the writer, not here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
) -> DataFrame:
    """Latest-row-wins upsert: MERGE semantics of
    jobs/bronze/bronze_builder.py:116-123 without Delta. Source rows
    beat target rows on key collision; among multiple rows for one
    key the greatest ``order_by`` wins (remaining ties → source
    precedence). Include a unique tie-breaker in ``order_by`` for
    full determinism."""
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    t = target.withColumn("_src_pri", F.lit(0))
    s = source.withColumn("_src_pri", F.lit(1))
    merged = t.unionByName(s)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("_src_pri").desc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src_pri")
    )


def classify_cdc_ops(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    soft_delete_col: str | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Emit an ``op`` column per versioned row: first version of a
    key is INSERT, later versions UPDATE, and EVERY version carrying
    the soft-delete flag is DELETE (the reference's deletes are
    ``is_deleted=true`` updates — jobs/bronze/ingest_change_source.py:89-96,
    SURVEY.md §2.11.4).

    POLICY (cross-engine-pinned by the ``cdc_op_classification``
    oracle): the flag classifies by STATE, not by transition — a
    touch-up on an already-deleted record re-emits DELETE (idempotent
    for appliers), and a key born deleted is DELETE from its first
    version (it must not be inserted downstream at all). Appliers
    needing transition events (deleted-ness changed) should diff the
    flag with ``change_pairs`` instead."""
    # ``tiebreak`` makes the per-key order TOTAL when ts alone can
    # collide (same-microsecond versions): without it INSERT/UPDATE
    # assignment under a tie is engine/partitioning-dependent.
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    out = df.withColumn("_prev_ts", F.lag(ts_col).over(w))
    op = F.when(F.col("_prev_ts").isNull(), F.lit("INSERT")).otherwise(F.lit("UPDATE"))
    if soft_delete_col is not None:
        op = F.when(F.col(soft_delete_col) == True, F.lit("DELETE")).otherwise(op)  # noqa: E712
    return out.withColumn("op", op).drop("_prev_ts")
