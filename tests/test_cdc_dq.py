"""CDC upsert / op-classification, watermark store, and DQ rules
engine unit tests (SURVEY.md §2.11-§2.12)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.dq import Rule, apply_rules
from hr_moderndatapipeline_spark.operators.cdc import classify_cdc_ops, upsert_apply
from hr_moderndatapipeline_spark.sources.readers import jdbc_pushdown_query
from hr_moderndatapipeline_spark.sources.watermark import (
    EPOCH,
    FileWatermarkStore,
    MemoryWatermarkStore,
    advance_watermark,
    incremental_read,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ── upsert (K2, bronze_builder.py:116-123 semantics) ──

def test_upsert_source_beats_target_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "old", ts("2020-01-01")), (2, "keep", ts("2020-01-01"))],
        "id int, v string, updated_at timestamp",
    )
    source = spark.createDataFrame(
        [(1, "new", ts("2021-01-01")), (3, "ins", ts("2021-01-01"))],
        "id int, v string, updated_at timestamp",
    )
    out = {r["id"]: r["v"] for r in upsert_apply(target, source, ["id"], "updated_at").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_upsert_equal_ts_source_precedence(spark):
    t = spark.createDataFrame([(1, "t", ts("2020-01-01"))], "id int, v string, updated_at timestamp")
    s = spark.createDataFrame([(1, "s", ts("2020-01-01"))], "id int, v string, updated_at timestamp")
    assert upsert_apply(t, s, ["id"], "updated_at").collect()[0]["v"] == "s"


def test_upsert_idempotent(spark):
    t = spark.createDataFrame([(1, "a", ts("2020-01-01"))], "id int, v string, updated_at timestamp")
    s = spark.createDataFrame([(1, "b", ts("2021-01-01"))], "id int, v string, updated_at timestamp")
    once = upsert_apply(t, s, ["id"], "updated_at")
    twice = upsert_apply(once, s, ["id"], "updated_at")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


# ── CDC op classification (§2.11.7) ──

def test_classify_cdc_ops(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2020-01-01"), False),
            (1, ts("2020-02-01"), False),
            (1, ts("2020-03-01"), True),  # soft delete
            (2, ts("2020-01-15"), False),
        ],
        "id int, updated_at timestamp, is_deleted boolean",
    )
    out = classify_cdc_ops(df, ["id"], "updated_at", soft_delete_col="is_deleted")
    got = {(r["id"], r["updated_at"]): r["op"] for r in out.collect()}
    assert got == {
        (1, ts("2020-01-01")): "INSERT",
        (1, ts("2020-02-01")): "UPDATE",
        (1, ts("2020-03-01")): "DELETE",
        (2, ts("2020-01-15")): "INSERT",
    }


# ── watermark store + incremental read (§2.11.1) ──

def test_watermark_file_store_roundtrip(tmp_path):
    st = FileWatermarkStore(str(tmp_path))
    assert st.get("orders") == EPOCH
    st.set("orders", "2021-05-01 00:00:00")
    assert FileWatermarkStore(str(tmp_path)).get("orders") == "2021-05-01 00:00:00"


def test_incremental_read_and_advance(spark):
    st = MemoryWatermarkStore()
    df = spark.createDataFrame(
        [(1, ts("2020-01-01")), (2, ts("2021-01-01")), (3, ts("2022-01-01"))],
        "id int, updated_at timestamp",
    )
    first = incremental_read(df, "updated_at", st, "t")
    assert first.count() == 3
    assert advance_watermark(first, "updated_at", st, "t") == "2022-01-01 00:00:00"
    # second pass: nothing new
    second = incremental_read(df, "updated_at", st, "t")
    assert second.count() == 0
    assert advance_watermark(second, "updated_at", st, "t") is None  # empty keeps wm
    # new row arrives
    df2 = df.union(
        spark.createDataFrame([(4, ts("2023-01-01"))], "id int, updated_at timestamp")
    )
    assert [r["id"] for r in incremental_read(df2, "updated_at", st, "t").collect()] == [4]


def test_full_refresh_ignores_watermark(spark):
    st = MemoryWatermarkStore()
    st.set("t", "2022-01-01 00:00:00")
    df = spark.createDataFrame([(1, ts("2020-01-01"))], "id int, updated_at timestamp")
    assert incremental_read(df, "updated_at", st, "t", full_refresh=True).count() == 1


def test_jdbc_pushdown_query_shapes():
    assert jdbc_pushdown_query("hr", "employees") == "(SELECT * FROM hr.employees) AS employees_full"
    q = jdbc_pushdown_query("hr", "employees", "updated_at", "2021-01-01 00:00:00")
    assert "WHERE updated_at > '2021-01-01 00:00:00'" in q and q.endswith("AS employees_cdc")


# ── silver facts (§2.11.4) ──

def test_attrition_events_filter_and_tenure(spark):
    from hr_moderndatapipeline_spark.operators.facts import attrition_events

    dim = spark.createDataFrame(
        [
            (1, ts("2020-01-01"), ts("2020-03-01"), True, False),   # attrition
            (2, ts("2020-01-01"), ts("2099-12-31"), True, True),    # deleted but current
            (3, ts("2020-01-01"), ts("2020-02-01"), False, False),  # closed, not deleted
        ],
        "id int, effective_start_date timestamp, effective_end_date timestamp, "
        "is_deleted boolean, is_current boolean",
    )
    out = attrition_events(
        dim, "id", "effective_start_date", "effective_end_date", "is_deleted", "is_current"
    ).collect()
    assert [r["id"] for r in out] == [1]
    assert out[0]["tenure_days"] == 60 and out[0]["year"] == 2020 and out[0]["month"] == 3


def test_headcount_monthly_boundaries(spark):
    from hr_moderndatapipeline_spark.operators.facts import headcount_monthly

    dim = spark.createDataFrame(
        [
            # covers Feb 1 and Mar 1? to == Mar 1 midnight → half-open excludes Mar
            (1, ts("2020-01-15"), ts("2020-03-01")),
            # starts exactly at a month boundary → Feb 1 counts
            (2, ts("2020-02-01"), ts("2020-02-20")),
            # open-ended → capped at 2020-04
            (3, ts("2020-03-10"), ts("2099-12-31")),
        ],
        "id int, effective_start_date timestamp, effective_end_date timestamp",
    )
    out = headcount_monthly(
        dim, "id", "effective_start_date", "effective_end_date", "2020-04-30"
    )
    got = {str(r["month"]): r["headcount"] for r in out.collect()}
    assert got == {"2020-02-01": 2, "2020-04-01": 1}


def test_feature_udfs_match_columns(spark):
    """The F.expr-invoked UDF surface (U1/F12) and the pure-column
    variant must agree."""
    from hr_moderndatapipeline_spark.operators.facts import (
        feature_cols,
        register_feature_udfs,
    )
    from pyspark.sql import functions as FF

    register_feature_udfs(spark)
    df = spark.range(20).select(FF.col("id").cast("int").alias("k"))
    cols = feature_cols(FF.col("k"))
    both = df.select(
        "k",
        cols["persona"].alias("p_col"),
        FF.expr("det_persona(k)").alias("p_udf"),
        cols["travel"].alias("t_col"),
        FF.expr("det_travel(k)").alias("t_udf"),
        cols["age_band"].alias("a_col"),
        FF.expr("det_age_band(k)").alias("a_udf"),
    )
    assert both.filter(
        (FF.col("p_col") != FF.col("p_udf"))
        | (FF.col("t_col") != FF.col("t_udf"))
        | (FF.col("a_col") != FF.col("a_udf"))
    ).count() == 0


# ── DQ rules engine (§2.12) ──

def test_dq_rules_split_is_complete_partition(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 100.0, 10),
            (2, None, 100.0, 10),       # not_null violation
            (3, "c@x.com", -5.0, 10),   # between violation
            (4, "dup@x.com", 100.0, 10),
            (5, "dup@x.com", 100.0, 10),  # unique violation (both rows)
            (6, "f@x.com", 100.0, 99),  # fk violation
        ],
        "id int, email string, salary double, dept_id int",
    )
    ref = spark.createDataFrame([(10,)], "dept_id int")
    rules = [
        Rule("r.not_null.email.0", "not_null", "email"),
        Rule("r.between.salary.1", "between", "salary", min=0.0, max=1000.0),
        Rule("r.unique.email.2", "unique", "email"),
        Rule("r.fk.dept_id.3", "foreign_key", "dept_id", ref_table="ref", ref_column="dept_id"),
    ]
    good, violations = apply_rules(df, rules, refs={"ref": ref}, id_cols=["id"])
    bad_ids = {r["id"] for r in violations.collect()}
    assert bad_ids == {2, 3, 4, 5, 6}
    good_ids = {r["id"] for r in good.collect()}
    # valid ∪ quarantined = input, valid ∩ quarantined = ∅ (SURVEY.md §5)
    assert good_ids == {1}
    assert good_ids | bad_ids == {1, 2, 3, 4, 5, 6}
    by_rule = {(r["id"], r["rule_id"]) for r in violations.collect()}
    assert (2, "r.not_null.email.0") in by_rule
    assert (3, "r.between.salary.1") in by_rule
    assert (6, "r.fk.dept_id.3") in by_rule


def test_avro_encode_preserves_nulls_in_numeric_unions(spark):
    """Arrow->pandas turns nullable numerics into NaN; the encoder
    must still take the NULL union branch — a NULL long would crash
    int(NaN), a NULL double would silently round-trip as NaN."""
    import json as _json

    from hr_moderndatapipeline_spark.functions.avro_codec import (
        avro_decode_udf,
        avro_encode_udf,
    )

    schema = _json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": ["null", "long"]},
                {"name": "b", "type": ["null", "double"]},
            ],
        }
    )
    df = spark.createDataFrame([(1, 2.5), (None, None)], "a long, b double")
    enc = avro_encode_udf(schema)
    dec = avro_decode_udf(schema)
    out = df.select(dec(enc(F.struct("a", "b"))).alias("r")).select("r.*").collect()
    got = {(r["a"], r["b"]) for r in out}
    assert got == {(1, 2.5), (None, None)}


def test_chunk_udtf_matches_jvm_on_empty_and_null_text(spark):
    from hr_moderndatapipeline_spark.functions.udtfs import ChunkWords

    impl = ChunkWords.func()  # the @udtf wrapper hides the raw class
    rows = list(impl.eval("", 4))
    assert rows == [(0, "", 1)]  # doc_chunks emits one empty chunk
    assert list(impl.eval(None, 4)) == []
    assert list(impl.eval("a b", None)) == []
