"""Regression pins for the four ADVICE items of round 8:

1. ``funnel_stream`` must fold a key's micro-batch as ONE sorted
   sequence even when applyInPandasWithState delivers it as multiple
   Arrow chunks in arbitrary order (chunk-local sorting mis-folds).
2. ``assign_grouped_ranks`` must not drop rows for group columns
   whose Python ``str()`` differs from Spark's ``CAST(.. AS STRING)``
   (booleans 'True' vs 'true', floats '1e-05' vs '1.0E-5').
3. ``pq_probe``/``ivfpq_probe`` emit UNROUNDED scores — Spark's
   HALF_UP BigDecimal round and DuckDB's float-multiply round can
   disagree near 1e-6 boundaries, so the probes no longer round at
   all (the oracle compares full-precision doubles).
4. ``streaming_queries._await`` must raise when an availableNow
   trigger exceeds its timeout instead of reading a half-processed
   checkpoint.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hr_moderndatapipeline_spark.streaming import file_json_stream, parse_with_dlq
from tests.test_streaming import write_events


def test_funnel_stream_multichunk_out_of_order(spark, tmp_path):
    """One key, 12 events written in REVERSE ts order, Arrow chunk
    size forced to 2 rows: chunk-local sorting would see (purchase,
    click) before (view) and complete at most 1 step; the fixed fold
    concatenates all chunks, sorts once, and converts."""
    from hr_moderndatapipeline_spark.operators.relational import funnel_steps
    from hr_moderndatapipeline_spark.streaming.stateful import funnel_stream

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    steps = ["view", "click", "purchase"]
    seq = ["view", "noise", "noise", "click", "noise", "noise",
           "noise", "noise", "noise", "noise", "noise", "purchase"]
    events = [
        {"user_id": 7, "etype": e, "ts": f"2024-01-01 00:{i:02d}:00"}
        for i, e in enumerate(seq)
    ]
    # reverse arrival order: with 2-row chunks the purchase/click
    # events arrive in chunks BEFORE the chunk containing the view
    write_events(src, "b0.jsonl", list(reversed(events)))

    schema = T.StructType(
        [
            T.StructField("user_id", T.IntegerType()),
            T.StructField("etype", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        emitted: list = []

        def sink(batch, _bid):
            emitted.extend(batch.collect())

        raw = file_json_stream(spark, src)
        valid, _ = parse_with_dlq(raw, "value", schema)
        typed = valid.withColumn("ts", F.to_timestamp("ts"))
        # coalesce(1): keep the whole key in one task so the 2-row
        # Arrow batching is what splits it into chunks
        out = funnel_stream(
            typed.coalesce(1), [("user_id", "IntegerType")], "ts", "etype", steps
        )
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {r["user_id"]: r for r in emitted}
    batch_df = spark.createDataFrame(
        [(d["user_id"], d["etype"], d["ts"]) for d in events],
        "user_id int, etype string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        r["user_id"]: r
        for r in funnel_steps(batch_df, ["user_id"], "ts", "etype", steps).collect()
    }
    assert got[7]["steps_completed"] == expect[7]["steps_completed"] == 3
    assert got[7]["converted"] == 1
    assert got[7]["n_events"] == len(seq)


def test_assign_grouped_ranks_boolean_groups(spark):
    """Python str(True)='True' vs Spark CAST -> 'true': the counts/
    offsets join must use the SAME rendering or every boolean-group
    row silently disappears."""
    from hr_moderndatapipeline_spark.operators.relational import (
        assign_grouped_ranks,
    )

    df = spark.createDataFrame(
        [(True, 10), (True, 5), (True, 7), (False, 3), (False, 9)],
        "flag boolean, v int",
    )
    out = assign_grouped_ranks(
        df, ["flag"], ["v"], id_col="rk", total_col="n_g", num_partitions=3
    )
    rows = out.collect()
    assert len(rows) == 5, "boolean-group rows were dropped"
    by_group = {}
    for r in rows:
        by_group.setdefault(r["flag"], []).append((r["rk"], r["v"], r["n_g"]))
    t = sorted(by_group[True])
    assert [v for _, v, _ in t] == [5, 7, 10]
    assert [rk for rk, _, _ in t] == [0, 1, 2]
    assert all(n == 3 for _, _, n in t)
    f = sorted(by_group[False])
    assert [v for _, v, _ in f] == [3, 9]
    assert [rk for rk, _, _ in f] == [0, 1]
    assert all(n == 2 for _, _, n in f)


def test_assign_grouped_ranks_float_groups(spark):
    """Python repr '1e-05' vs Spark '1.0E-5' — same trap, float key."""
    from hr_moderndatapipeline_spark.operators.relational import (
        assign_grouped_ranks,
    )

    df = spark.createDataFrame(
        [(1e-05, 2), (1e-05, 1), (2.5, 4), (None, 6), (None, 5)],
        "g double, v int",
    )
    out = assign_grouped_ranks(
        df, ["g"], ["v"], id_col="rk", total_col="n_g", num_partitions=2
    )
    rows = out.collect()
    assert len(rows) == 5, "float/null-group rows were dropped"
    small = sorted((r["rk"], r["v"]) for r in rows if r["g"] == 1e-05)
    assert small == [(0, 1), (1, 2)]
    nulls = sorted((r["rk"], r["v"]) for r in rows if r["g"] is None)
    assert nulls == [(0, 5), (1, 6)]


def test_pq_probe_scores_unrounded(spark):
    """The probe's score must equal the exact sub-ordered LUT fold
    bit-for-bit — no decimal rounding step between the fold and the
    output (rounding is engine-divergent near 1e-6 boundaries)."""
    import numpy as np

    from hr_moderndatapipeline_spark.operators.pq import (
        pq_codebooks,
        pq_encode,
        pq_probe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    cb = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=8, k=16)
    enc = pq_encode(emb, cb, "vec_id", "embedding", dim=64, m=8)
    got = pq_probe(queries, enc, cb, "vec_id", "embedding", k=5, dim=64, m=8)

    tensor = {}
    for r in cb.collect():
        tensor[(r["sub"], r["cluster"])] = np.array(r["_cv"], dtype=np.float64)
    codes = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    qv = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
          for r in queries.collect()}

    checked = 0
    for r in got.collect():
        q = qv[r["q_id"]]
        expect = 0.0
        for sub in range(8):
            c = tensor[(sub, codes[r["c_id"]][sub])]
            seg = q[sub * 8:(sub + 1) * 8]
            ip = 0.0
            for j in range(8):
                ip += seg[j] * c[j]
            expect += ip
        assert r["score"] == expect, (r["q_id"], r["c_id"])
        checked += 1
    assert checked > 0


def test_await_raises_on_unfinished_trigger():
    from hr_moderndatapipeline_spark.queries.streaming_queries import _await

    class FakeQuery:
        name = "fake"
        id = "fake-id"

        def __init__(self):
            self.stopped = False

        def awaitTermination(self, _t):
            return False

        def stop(self):
            self.stopped = True

    q = FakeQuery()
    try:
        _await(q, timeout_s=1)
        raise AssertionError("expected RuntimeError on timeout")
    except RuntimeError as e:
        assert "partial checkpoint" in str(e)
    assert q.stopped


def test_await_passes_on_finished_trigger():
    from hr_moderndatapipeline_spark.queries.streaming_queries import _await

    class FakeQuery:
        name = "fake"
        id = "fake-id"

        def awaitTermination(self, _t):
            return True

        def stop(self):  # pragma: no cover
            raise AssertionError("must not stop a finished query")

    _await(FakeQuery(), timeout_s=1)
