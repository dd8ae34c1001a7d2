"""SCD2 invariants (SURVEY.md §5): the reference's one-phase MERGE
bug (silver_builder.py:119-130 closes but never re-inserts changed
keys) is exactly what these tests would catch — every apply must
leave one current row per live key and contiguous ranges."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.scd2 import (
    OPEN_END,
    as_of_join,
    scd2_apply,
    scd2_from_history,
    validate_scd2,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _dim(spark):
    """Existing SCD2 dim: key 1 has history (v1 closed, v2 current),
    key 2 has a single current row."""
    rows = [
        (1, "eng", ts("2020-01-01"), ts("2021-01-01"), False),
        (1, "sales", ts("2021-01-01"), ts(OPEN_END.replace(" ", "T")), True),
        (2, "hr", ts("2020-06-01"), ts(OPEN_END.replace(" ", "T")), True),
    ]
    return spark.createDataFrame(
        rows, "id int, dept string, effective_start_date timestamp, "
        "effective_end_date timestamp, is_current boolean"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id int, dept string, updated_at timestamp")


def collect_map(df):
    return {
        (r["id"], r["effective_start_date"]): r
        for r in df.collect()
    }


def test_scd2_apply_change_closes_and_inserts(spark):
    dim = _dim(spark)
    changes = _changes(spark, [(1, "ops", ts("2022-03-01"))])
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")

    assert validate_scd2(out, ["id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    rows = collect_map(out)
    # old current row closed at the change timestamp
    closed = rows[(1, ts("2021-01-01"))]
    assert closed["effective_end_date"] == ts("2022-03-01")
    assert closed["is_current"] is False
    # new current version inserted (the reference's bug dropped this row)
    new = rows[(1, ts("2022-03-01"))]
    assert new["dept"] == "ops" and new["is_current"] is True
    # untouched key unchanged
    assert rows[(2, ts("2020-06-01"))]["is_current"] is True
    # 3 dim rows (one now closed in place) + 1 inserted version
    assert out.count() == 4


def test_scd2_apply_nochange_is_noop(spark):
    dim = _dim(spark)
    changes = _changes(spark, [(1, "sales", ts("2022-03-01"))])  # same dept
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")
    assert out.count() == 3
    assert validate_scd2(out, ["id"])["keys_without_exactly_one_current"] == 0


def test_scd2_apply_new_key_inserts_current(spark):
    dim = _dim(spark)
    changes = _changes(spark, [(9, "legal", ts("2022-01-01"))])
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")
    rows = collect_map(out)
    assert rows[(9, ts("2022-01-01"))]["is_current"] is True
    assert out.count() == 4


def test_scd2_apply_intra_batch_versions_chain(spark):
    dim = _dim(spark)
    changes = _changes(
        spark,
        [(1, "ops", ts("2022-03-01")), (1, "legal", ts("2022-05-01"))],
    )
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")
    assert validate_scd2(out, ["id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    rows = collect_map(out)
    mid = rows[(1, ts("2022-03-01"))]
    assert mid["effective_end_date"] == ts("2022-05-01") and mid["is_current"] is False
    assert rows[(1, ts("2022-05-01"))]["is_current"] is True


def test_scd2_apply_noop_then_change_in_one_batch(spark):
    """A batch whose FIRST row for a key is a no-op (tracked values
    equal the current version) followed by a real change: the no-op
    version is dropped, but the current row must still close at the
    inserted version's timestamp — the naive 'close only keys whose
    first batch row changed' form leaves two current rows here."""
    dim = _dim(spark)
    changes = _changes(
        spark,
        [(1, "sales", ts("2022-03-01")), (1, "ops", ts("2022-05-01"))],
    )
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")
    assert validate_scd2(out, ["id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    rows = collect_map(out)
    # the no-op (sales@2022-03-01) row is NOT inserted...
    assert (1, ts("2022-03-01")) not in rows
    # ...the old current row closes at the real change's timestamp...
    closed = rows[(1, ts("2021-01-01"))]
    assert closed["effective_end_date"] == ts("2022-05-01")
    assert closed["is_current"] is False
    # ...and the change lands as the one current version.
    assert rows[(1, ts("2022-05-01"))]["dept"] == "ops"
    assert rows[(1, ts("2022-05-01"))]["is_current"] is True


def test_scd2_apply_null_transition_detected(spark):
    """The reference's ``t.c <> s.c`` change predicate misses
    value→NULL transitions (silver_builder.py:115); the null-safe
    fix must close and insert."""
    dim = _dim(spark)
    changes = _changes(spark, [(2, None, ts("2022-07-01"))])
    out = scd2_apply(dim, changes, ["id"], ["dept"], "updated_at")
    rows = collect_map(out)
    assert rows[(2, ts("2022-07-01"))]["dept"] is None
    assert rows[(2, ts("2020-06-01"))]["is_current"] is False
    assert validate_scd2(out, ["id"])["keys_without_exactly_one_current"] == 0


def test_scd2_from_history_matches_apply_on_fold(spark):
    """Folding a change log row-by-row through scd2_apply must equal
    the one-shot scd2_from_history recompute."""
    log = [
        (1, "a", ts("2020-01-01")),
        (1, "b", ts("2020-06-01")),
        (1, "c", ts("2021-01-01")),
        (2, "x", ts("2020-03-01")),
    ]
    log_df = _changes(spark, log)
    full = scd2_from_history(log_df.withColumnRenamed("updated_at", "ts"), ["id"], "ts")

    empty = spark.createDataFrame(
        [], "id int, dept string, updated_at timestamp, "
        "effective_start_date timestamp, effective_end_date timestamp, is_current boolean"
    )
    folded = empty
    for row in log:
        folded = scd2_apply(
            folded, _changes(spark, [row]), ["id"], ["dept"], "updated_at"
        )

    a = {(r["id"], r["effective_start_date"], r["effective_end_date"], r["is_current"])
         for r in full.collect()}
    b = {(r["id"], r["effective_start_date"], r["effective_end_date"], r["is_current"])
         for r in folded.collect()}
    assert a == b


def test_as_of_join_resolves_point_in_time(spark):
    dim = _dim(spark)
    facts = spark.createDataFrame(
        [(100, 1, ts("2020-05-01")), (101, 1, ts("2021-05-01")), (102, 3, ts("2021-05-01"))],
        "fact_id int, id int, at timestamp",
    )
    out = as_of_join(facts, dim, ["id"], "at").orderBy("fact_id").collect()
    assert [r["dept"] for r in out] == ["eng", "sales", None]
    # exactly one dim version matched per fact
    assert len(out) == 3


def test_as_of_join_boundary_semantics(spark):
    """start <= ts < end: a fact exactly at a version boundary
    resolves to the NEW version."""
    dim = _dim(spark)
    facts = spark.createDataFrame([(1, 1, ts("2021-01-01"))], "fact_id int, id int, at timestamp")
    out = as_of_join(facts, dim, ["id"], "at").collect()
    assert out[0]["dept"] == "sales"


def test_validate_scd2_flags_violations(spark):
    bad = spark.createDataFrame(
        [
            (1, "a", ts("2020-01-01"), ts("2021-01-01"), True),
            (1, "b", ts("2020-06-01"), ts("2020-03-01"), True),  # overlap + inverted + 2 current
        ],
        "id int, dept string, effective_start_date timestamp, "
        "effective_end_date timestamp, is_current boolean",
    )
    v = validate_scd2(bad, ["id"])
    assert v["keys_without_exactly_one_current"] == 1
    assert v["non_contiguous_ranges"] == 1
    assert v["inverted_ranges"] == 1


def test_point_in_time_join_no_future_leakage(spark):
    """Feature-store PIT join: each spine row gets the latest feature
    value AT OR BEFORE its timestamp from every feature table — a
    later feature value must never leak backwards."""
    from hr_moderndatapipeline_spark.operators.scd2 import point_in_time_join

    def ts(d, h=0):
        return dt.datetime(2026, 1, d, h)

    spine = spark.createDataFrame(
        [(1, ts(5)), (1, ts(12)), (2, ts(12))], "user int, obs_ts timestamp"
    )
    balances = spark.createDataFrame(
        [(1, ts(1), 100), (1, ts(10), 150), (2, ts(11), 70), (2, ts(13), 99)],
        "user int, ts timestamp, balance int",
    )
    statuses = spark.createDataFrame(
        [(1, ts(2), "bronze"), (1, ts(11), "gold")],
        "user int, ts timestamp, status string",
    )
    out = point_in_time_join(
        spine, "obs_ts", [(balances, ["user"], "ts"), (statuses, ["user"], "ts")]
    )
    got = {(r.user, r.obs_ts.day): (r.balance, r.status) for r in out.collect()}
    assert got == {
        (1, 5): (100, "bronze"),   # day-10/11 values must not leak back
        (1, 12): (150, "gold"),
        (2, 12): (70, None),       # user 2 has no status history
    }
