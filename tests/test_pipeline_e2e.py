"""End-to-end medallion lifecycle (SURVEY.md §3.1): incremental
bronze/silver maintenance with watermark advancement, idempotent
re-runs, SCD2 invariants after every increment, full-refresh reset,
and a gold model over the pipeline's silver output."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.scd2 import validate_scd2
from hr_moderndatapipeline_spark.pipelines import MedallionPipeline, TableSpec
from hr_moderndatapipeline_spark.sources.watermark import MemoryWatermarkStore


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _src(spark, rows):
    return spark.createDataFrame(rows, "id int, dept string, updated_at timestamp")


SPEC = TableSpec(name="employees", keys=["id"], tracked=["dept"], watermark_col="updated_at")


def test_medallion_incremental_lifecycle(spark, tmp_path):
    store = MemoryWatermarkStore()
    pipe = MedallionPipeline(spark, str(tmp_path), SPEC, store)

    # run 1: initial load
    src1 = _src(spark, [(1, "eng", ts("2020-01-01")), (2, "hr", ts("2020-01-02"))])
    m1 = pipe.run_increment(src1)
    assert m1 == {"extracted": 2, "skipped": False}
    assert store.get("employees") == "2020-01-02 00:00:00"
    assert pipe.bronze().count() == 2
    assert validate_scd2(pipe.silver(), ["id"])["keys_without_exactly_one_current"] == 0

    # run 2: same source, nothing new → complete no-op
    m2 = pipe.run_increment(src1)
    assert m2["skipped"] is True
    assert pipe.bronze().count() == 2

    # run 3: one update (dept change) + one insert arrive
    src3 = src1.union(
        _src(spark, [(1, "ops", ts("2020-02-01")), (3, "legal", ts("2020-02-02"))])
    )
    m3 = pipe.run_increment(src3)
    assert m3["extracted"] == 2  # only the rows past the watermark
    bronze = {r["id"]: r["dept"] for r in pipe.bronze().collect()}
    assert bronze == {1: "ops", 2: "hr", 3: "legal"}

    silver = pipe.silver()
    assert validate_scd2(silver, ["id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    hist1 = silver.filter(F.col("id") == 1).orderBy("effective_start_date").collect()
    assert [r["dept"] for r in hist1] == ["eng", "ops"]
    assert hist1[0]["is_current"] is False and hist1[1]["is_current"] is True

    # run 4: full refresh rebuilds from the complete source
    m4 = pipe.run_increment(src3, full_refresh=True)
    assert m4["extracted"] == 4
    assert pipe.bronze().count() == 3
    assert validate_scd2(pipe.silver(), ["id"])["keys_without_exactly_one_current"] == 0

    # gold: SQL model over the pipeline's silver output
    pipe.silver().createOrReplaceTempView("silver_employees")
    gold = spark.sql(
        """SELECT dept, count(*) AS n
           FROM silver_employees WHERE is_current GROUP BY 1"""
    )
    assert {r["dept"]: r["n"] for r in gold.collect()} == {"ops": 1, "hr": 1, "legal": 1}


def test_snapshot_partition_pruning(spark, tmp_path):
    """Published snapshots are laid out by month(watermark) and a
    recency-filtered read PRUNES to the matching partition directory
    (PartitionFilters in the scan) — the SURVEY.md §4 uplift over the
    reference's flat writes. The logical accessors still present the
    source schema (derived column stripped)."""
    from hr_moderndatapipeline_spark.pipelines import PARTITION_COL
    from hr_moderndatapipeline_spark.streaming.sinks import read_snapshot

    store = MemoryWatermarkStore()
    pipe = MedallionPipeline(spark, str(tmp_path), SPEC, store)
    src = _src(
        spark,
        [
            (1, "eng", ts("2020-01-01")),
            (2, "hr", ts("2020-02-01")),
            (3, "ops", ts("2020-03-01")),
        ],
    )
    pipe.run_increment(src)

    raw = read_snapshot(spark, f"{tmp_path}/bronze/{SPEC.name}")
    assert PARTITION_COL in raw.columns
    pruned = raw.filter(F.col(PARTITION_COL) == "2020-02")
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert PARTITION_COL in pf and "2020-02" in pf
    assert pruned.count() == 1

    # silver is partitioned too, and the accessors hide the derived col
    assert PARTITION_COL in read_snapshot(spark, f"{tmp_path}/silver/{SPEC.name}").columns
    assert PARTITION_COL not in pipe.bronze().columns
    assert PARTITION_COL not in pipe.silver().columns


def test_load_rules_yaml_spec():
    from hr_moderndatapipeline_spark.functions.dq import load_rules

    spec = {
        "employees": {
            "rules": [
                {"type": "not_null", "column": "email"},
                {"type": "between", "column": "salary", "min": 0, "max": 100},
                {"type": "foreign_key", "column": "dept_id",
                 "ref_table": "departments", "ref_column": "id"},
            ]
        }
    }
    rules = load_rules(spec)
    assert [r.kind for r in rules] == ["not_null", "between", "foreign_key"]
    assert rules[0].rule_id == "employees.not_null.email.0"
    assert rules[1].min == 0 and rules[1].max == 100
    assert rules[2].ref_table == "departments"


def test_load_rules_table_filter_and_attribution():
    from hr_moderndatapipeline_spark.functions.dq import load_rules

    spec = {
        "customer": {"rules": [{"type": "not_null", "column": "c_custkey"}]},
        "orders": {"rules": [{"type": "not_null", "column": "o_orderkey"}]},
    }
    all_rules = load_rules(spec)
    assert {r.table for r in all_rules} == {"customer", "orders"}
    only = load_rules(spec, table="customer")
    assert [r.column for r in only] == ["c_custkey"]


def test_replayed_increment_is_noop(spark, tmp_path):
    """Crash between the silver publish and the watermark advance:
    the rerun extracts the same rows, computes the same batch tag,
    and must publish NOTHING new (a replay previously re-applied the
    batch into the SCD2 dim, closing current rows at inverted ranges
    and duplicating history)."""
    import glob

    from hr_moderndatapipeline_spark.operators.scd2 import validate_scd2
    from hr_moderndatapipeline_spark.pipelines import MedallionPipeline, TableSpec
    from hr_moderndatapipeline_spark.sources.watermark import MemoryWatermarkStore

    spec = TableSpec("emp", ["id"], ["dept"], "updated_at")
    store = MemoryWatermarkStore()
    pipe = MedallionPipeline(spark, str(tmp_path), spec, store)
    src1 = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00"), (2, "a", "2024-01-02 00:00:00")],
        "id int, dept string, updated_at string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    pipe.run_increment(src1)
    src2 = src1.unionByName(
        spark.createDataFrame(
            [(1, "b", "2024-02-01 00:00:00")], "id int, dept string, updated_at string"
        ).withColumn("updated_at", F.to_timestamp("updated_at"))
    )
    pipe.run_increment(src2)
    wm_after = store.get("emp")
    silver_versions = set(glob.glob(f"{tmp_path}/silver/emp/v*"))

    # simulate the crash: watermark rolls back to before increment 2
    store.set("emp", "2024-01-02 00:00:00")
    out = pipe.run_increment(src2)  # replay of increment 2
    assert out["skipped"] is False
    assert set(glob.glob(f"{tmp_path}/silver/emp/v*")) == silver_versions  # no-op
    assert store.get("emp") == wm_after  # watermark healed forward
    dim = pipe.silver()
    assert validate_scd2(dim, ["id"]) == {
        "keys_without_exactly_one_current": 0,
        "non_contiguous_ranges": 0,
        "inverted_ranges": 0,
    }
    assert dim.count() == 3  # a(1), b(1-current), a(2-current)
