"""Relational/sampling/similarity operator unit tests: interval
join semantics, deterministic training shuffle, int8 quantization
round-trip, bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F



def test_interval_join_semantics(spark):
    from hr_moderndatapipeline_spark.operators.relational import interval_join

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    # interval B crosses a 10-min bucket boundary; C tests end-exclusive
    intervals = spark.createDataFrame(
        [("u1", "A", ts(0), ts(10)), ("u1", "B", ts(8), ts(18)), ("u2", "C", ts(0), ts(5))],
        "user string, iv string, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [("u1", "p1", ts(9)),   # in A and B (crosses bucket line)
         ("u1", "p2", ts(15)),  # in B only, different bucket than B's start
         ("u2", "p3", ts(5)),   # exactly at C's end → excluded
         ("u3", "p4", ts(1))],  # no intervals for u3
        "user string, pt string, t timestamp",
    )
    out = {(r["pt"], r["iv"]) for r in interval_join(
        points, intervals, "t", "s", "e", keys=["user"], bucket_seconds=600
    ).collect()}
    assert out == {("p1", "A"), ("p1", "B"), ("p2", "B")}


def test_training_shuffle_deterministic_and_dense(spark):
    from hr_moderndatapipeline_spark.operators.sampling import training_shuffle

    df = spark.range(0, 1000).toDF("doc_id")
    a = training_shuffle(df, "doc_id", num_shards=8).collect()
    b = training_shuffle(df, "doc_id", num_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1
    # the order is actually shuffled, not id order
    shard0 = [r["doc_id"] for r in sorted(a, key=lambda r: (r["shard"], r["pos"])) if r["shard"] == 0]
    assert shard0 != sorted(shard0)


def test_quantize_embeddings_roundtrip(spark):
    from hr_moderndatapipeline_spark.operators.similarity import quantize_embeddings

    rows = [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["vec_id"], r["pos"]): r for r in
           quantize_embeddings(df, "vec_id", "embedding", dim=4).collect()}
    assert out[(1, 0)]["q"] == 127 and out[(1, 1)]["q"] == -63  # floor(-63.5)=-64? no: floor(-0.5*127+0.5)=floor(-63.0)=-63
    assert out[(1, 3)]["q"] == 0
    # dequantized error bounded by scale/2 + 1ulp
    for (vid, pos), r in out.items():
        orig = rows[vid - 1][1][pos]
        assert abs(r["q"] * r["scale"] - orig) <= r["scale"] * 0.5 + 1e-12
    assert out[(2, 0)]["q"] == 0 and out[(2, 0)]["scale"] == 0.0


def test_bucketed_join_no_exchange(spark, tmp_path, sf_dir):
    """Co-located join: both sides bucketed+sorted on the join key →
    the sort-merge join plans with ZERO exchanges (and no per-task
    sort), and results match the plain join."""
    from hr_moderndatapipeline_spark.sources.bucketed import read_bucketed, write_bucketed
    from hr_moderndatapipeline_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(
        orders, "orders_b", ["o_custkey"], 8,
        sort_by=["o_custkey"], path=str(tmp_path / "ob"),
    )
    write_bucketed(
        cust, "customer_b", ["c_custkey"], 8,
        sort_by=["c_custkey"], path=str(tmp_path / "cb"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "orders_b").join(
            read_bucketed(spark, "customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_read_csv_validated_splits_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from hr_moderndatapipeline_spark.sources.readers import read_csv_validated

    p = tmp_path / "in.csv"
    p.write_text("id,qty,name\n1,10,ok\n2,notanint,bad\n3,30,fine\n")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, bad = read_csv_validated(spark, str(p), schema)
    assert {r["id"] for r in good.collect()} == {1, 3}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "notanint" in bad_rows[0]["raw"]
    assert bad_rows[0]["reason"] == "csv_parse_failed"


def test_chunk_words_udtf_matches_jvm_chunker(spark, sf_dir):
    """The Python UDTF path must agree with the JVM doc_chunks path
    on every (doc, chunk) row — same indices, text, and word counts."""
    from hr_moderndatapipeline_spark.functions.udtfs import register_udtfs
    from hr_moderndatapipeline_spark.operators.text import doc_chunks
    from hr_moderndatapipeline_spark.sources.readers import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_words "
        "FROM udtf_docs d, LATERAL chunk_words(d.text, 32) c"
    )
    via_jvm = doc_chunks(docs, "doc_id", "text", max_words=32)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in via_jvm.collect()}
    assert a == b and len(a) > 50


def test_observed_metrics_no_extra_scan(spark, tmp_path):
    from hr_moderndatapipeline_spark.functions.metrics import observed

    df = spark.range(0, 1000).withColumn(
        "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
    )
    frame, obs = observed(
        df, "m",
        rows=F.count(F.lit(1)),
        nulls=F.sum(F.col("v").isNull().cast("int")),
    )
    frame.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"rows": 1000, "nulls": 100}


def test_resample_fill_gaps_and_carry_forward(spark):
    import datetime as dt

    from hr_moderndatapipeline_spark.operators.relational import resample_fill

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, 10),
        ("u1", t0 + dt.timedelta(hours=3), 7),     # 2 missing hours between
        ("u1", t0 + dt.timedelta(hours=3, minutes=30), 5),  # same slot as above
        ("u2", t0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = {
        (r["k"], str(r["slot_ts"])): (r["value"], r["is_gap"])
        for r in resample_fill(df, ["k"], "ts", "v", 3600).collect()
    }
    assert out[("u1", "2024-01-01 00:00:00")] == (10, False)
    assert out[("u1", "2024-01-01 01:00:00")] == (10, True)   # carried forward
    assert out[("u1", "2024-01-01 02:00:00")] == (10, True)
    assert out[("u1", "2024-01-01 03:00:00")] == (12, False)  # 7+5 same slot
    assert out[("u2", "2024-01-01 00:00:00")] == (1, False)
    assert len(out) == 5  # u2 has a single-slot span, no gaps


def test_resample_fill_max_slots_guard(spark):
    """One key with a pathological span (10 years at 1s step = ~315M
    slots) must FAIL FAST via the in-expression guard instead of
    materializing the grid array; a sane budget still passes."""
    import datetime as dt

    import pytest

    from hr_moderndatapipeline_spark.operators.relational import resample_fill

    t0 = dt.datetime(2024, 1, 1)
    rows = [("u1", t0, 1), ("u1", t0 + dt.timedelta(days=3650), 2)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    with pytest.raises(Exception, match="max_slots"):
        resample_fill(df, ["k"], "ts", "v", step_seconds=1, max_slots=10_000).collect()
    # same data, hour step: 87601 slots, inside a 100k budget
    ok = resample_fill(df, ["k"], "ts", "v", step_seconds=3600, max_slots=100_000)
    assert ok.count() == 87_601


def test_ewma_features_matches_reference_fold(spark):
    """The JVM aggregate() fold must equal a pure-Python EWMA over
    the same (ts, tiebreak)-ordered values — exactly (no approx),
    since both are the identical sequential IEEE fold."""
    import datetime as dt

    from hr_moderndatapipeline_spark.operators.relational import ewma_features

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0 + dt.timedelta(hours=2), 3, 30.0),
        ("u1", t0, 1, 10.0),
        ("u1", t0 + dt.timedelta(hours=1), 2, 0.5),
        ("u1", t0 + dt.timedelta(hours=2), 2, 20.0),  # ts tie → id 2 first
        ("u2", t0, 4, 7.0),                           # single event: ewma = v
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")
    out = {
        r["k"]: r
        for r in ewma_features(
            df, ["k"], "ts", "v", alpha=0.3, tiebreak_col="id"
        ).collect()
    }
    s = 10.0
    for v in [0.5, 20.0, 30.0]:  # time order with the id tiebreak
        s = 0.3 * v + (1.0 - 0.3) * s
    assert out["u1"]["ewma"] == s and out["u1"]["n_events"] == 4
    assert out["u2"]["ewma"] == 7.0 and out["u2"]["n_events"] == 1


def test_ewma_features_max_events_guard(spark):
    import pytest

    from hr_moderndatapipeline_spark.operators.relational import ewma_features

    df = spark.range(100).select(
        F.lit("k").alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(Exception, match="max_events"):
        ewma_features(df, ["k"], "ts", "v", max_events=10).collect()
    assert ewma_features(df, ["k"], "ts", "v", max_events=100).count() == 1


def test_ewma_update_split_equals_one_shot(spark, sf_dir):
    """Seeded-fold composition is EXACT: folding the events table in
    1, 2, and 3 time-ordered batches must produce bit-identical
    state (ewma, n_events, last_ts) for every key."""
    from hr_moderndatapipeline_spark.operators.incremental import ewma_update
    from hr_moderndatapipeline_spark.operators.relational import ewma_features
    from hr_moderndatapipeline_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    one = {
        r["user_id"]: (r["n_events"], r["last_ts"], r["ewma"])
        for r in ewma_features(
            ev, ["user_id"], "ts", "value", alpha=0.2, tiebreak_col="event_id"
        ).collect()
    }
    for cuts in (["2024-01-16"], ["2024-01-10", "2024-01-20"]):
        bounds = [None, *cuts, None]
        state = None
        for lo, hi in zip(bounds, bounds[1:]):
            b = ev
            if lo:
                b = b.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
            if hi:
                b = b.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
            state = ewma_update(
                state, b, ["user_id"], "ts", "value",
                alpha=0.2, tiebreak_col="event_id",
            )
        got = {
            r["user_id"]: (r["n_events"], r["last_ts"], r["ewma"])
            for r in state.collect()
        }
        assert got == one  # exact, including the doubles


def test_ewma_update_refuses_time_regression(spark):
    import datetime as dt

    import pytest

    from hr_moderndatapipeline_spark.operators.incremental import ewma_update

    t0 = dt.datetime(2024, 1, 10)
    early = spark.createDataFrame(
        [("k", t0, 1.0)], "k string, ts timestamp, v double"
    )
    late = spark.createDataFrame(
        [("k", t0 + dt.timedelta(days=1), 2.0)], "k string, ts timestamp, v double"
    )
    state = ewma_update(None, late, ["k"], "ts", "v")
    with pytest.raises(Exception, match="advance in event time"):
        ewma_update(state, early, ["k"], "ts", "v").collect()


def test_jdbc_scan_end_to_end_on_derby(spark):
    """S1 integration: a REAL spark.read.jdbc round trip against the
    embedded Derby that ships with Spark — full extract, then an
    incremental extract whose watermark predicate executes DB-side
    via the pushdown subquery."""
    from hr_moderndatapipeline_spark.sources.readers import jdbc_scan

    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:s1db;create=true"
    )
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE APP.CHANGES (ID INT, NAME VARCHAR(20), WM VARCHAR(19))"
    )
    for i, wm in [(1, "2024-01-01 00:00:00"), (2, "2024-01-02 12:00:00"),
                  (3, "2024-01-03 00:00:00")]:
        st.executeUpdate(
            f"INSERT INTO APP.CHANGES VALUES ({i}, 'row{i}', '{wm}')"
        )
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    url = "jdbc:derby:memory:s1db"
    full = jdbc_scan(spark, url, "APP", "CHANGES", props)
    assert full.count() == 3
    inc = jdbc_scan(
        spark, url, "APP", "CHANGES", props,
        watermark_col="WM", watermark="2024-01-02 12:00:00",
    )
    assert [r["ID"] for r in inc.collect()] == [3]
    st.close()
    conn.close()


from hypothesis import given, settings, strategies as st_


@settings(max_examples=10, deadline=None)
@given(
    points=st_.lists(
        st_.tuples(st_.integers(0, 3), st_.integers(0, 7200)), min_size=0, max_size=30
    ),
    intervals=st_.lists(
        st_.tuples(st_.integers(0, 3), st_.integers(0, 7200), st_.integers(0, 3600)),
        min_size=0,
        max_size=15,
    ),
)
def test_interval_join_equals_naive_range_join(spark, points, intervals):
    """Property: the bucketized interval join is EXACTLY the naive
    key + half-open-range join, for any random points/intervals —
    including empty sides, boundary hits, and intervals spanning
    many buckets."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    from hr_moderndatapipeline_spark.operators.relational import interval_join

    pdf = spark.createDataFrame(
        [(k, i, ts(s)) for i, (k, s) in enumerate(points)] or [(None, None, None)],
        "k int, pid int, t timestamp",
    ).filter(F.col("pid").isNotNull())
    idf = spark.createDataFrame(
        [(k, i, ts(s), ts(s + d)) for i, (k, s, d) in enumerate(intervals)]
        or [(None, None, None, None)],
        "k int, iid int, s timestamp, e timestamp",
    ).filter(F.col("iid").isNotNull())
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, idf, "t", "s", "e", keys=["k"], bucket_seconds=600
        ).collect()
    }
    expected = {
        (pid, iid)
        for i, (ik, s, d) in enumerate(intervals)
        for j, (pk, ps) in enumerate(points)
        for pid, iid in [(j, i)]
        if pk == ik and s <= ps < s + d
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    docs=st_.lists(
        st_.lists(st_.integers(-(2**63), 2**63 - 1), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_minhash_aggregate_form_bit_identical_to_fold(spark, docs):
    """Property: the explode+min-aggregate signature builder returns
    BIT-identical signatures to the interpreted F.aggregate fold for
    any random 64-bit hash arrays (the equivalence the codegen
    optimization rests on)."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_signature_from_hashes,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, hs) for i, hs in enumerate(docs)], "doc_id long, hs array<long>"
    )
    via_fold = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", minhash_signature_from_hashes(F.col("hs"), 16).alias("s")
        ).collect()
    }
    via_agg = {
        r["doc_id"]: r["_sig"]
        for r in minhash_signatures(df, "doc_id", "hs", 16).collect()
    }
    assert via_fold == via_agg


def test_flatten_structs_recursive(spark):
    from hr_moderndatapipeline_spark.functions.kit import flatten_structs

    df = spark.sql(
        "SELECT 1 AS id, named_struct('user_id', 7, 'ctx', "
        "named_struct('org', 'a1', 'unit', 42)) AS actor, 'x' AS tag"
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "actor_user_id", "actor_ctx_org", "actor_ctx_unit", "tag"]
    r = out.collect()[0]
    assert (r["actor_user_id"], r["actor_ctx_org"], r["actor_ctx_unit"]) == (7, "a1", 42)


def test_kmeans_refine_recovers_planted_clusters(spark):
    """Three well-separated planted clusters, init centroids nudged
    toward each other: Lloyd refinement must (a) be bit-deterministic
    across runs and (b) recover the exact per-cluster means."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        _decimal_centroids,
        as_double_vec,
        kmeans_refine,
    )

    dim = 8
    base = {0: [10.0] + [0.0] * 7, 1: [0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            2: [0.0] * 6 + [10.0, 0.0]}
    rows = []
    for c, b in base.items():
        for i in range(20):
            # deterministic small perturbation, different per point
            vec = [v + ((i * 7 + j * 3 + c) % 5) * 0.1 for j, v in enumerate(b)]
            rows.append((c * 100 + i, c, vec))
    df = spark.createDataFrame(rows, "vec_id long, true_c int, embedding array<double>")
    # init: blend each centroid 30% toward the global mean (wrong but close)
    init = spark.createDataFrame(
        [(c, [v * 0.7 + 1.0 for v in b]) for c, b in base.items()],
        "cluster int, _cv array<double>",
    )
    r1 = kmeans_refine(df, "vec_id", "embedding", init, dim, iterations=3)
    r2 = kmeans_refine(df, "vec_id", "embedding", init, dim, iterations=3)
    got1 = {r["cluster"]: r["_cv"] for r in r1.collect()}
    got2 = {r["cluster"]: r["_cv"] for r in r2.collect()}
    assert got1 == got2  # bit-deterministic
    # exact per-true-cluster decimal means
    truth = {
        r["cluster"]: r["_cv"]
        for r in _decimal_centroids(
            df.select(F.col("true_c").alias("cluster"),
                      as_double_vec(F.col("embedding")).alias("_v")),
            "_v", "cluster",
        ).collect()
    }
    assert got1 == truth


def test_linear_interpolate_planted_gap(spark):
    """A 3-hour gap between observations 10 and 40 fills with the
    straight line (20, 30); observed slots pass through exactly."""
    from decimal import Decimal

    from hr_moderndatapipeline_spark.operators.relational import linear_interpolate

    rows = [
        (1, "2024-01-01 00:30:00", Decimal("10.00")),
        (1, "2024-01-01 03:15:00", Decimal("40.00")),
        (2, "2024-01-01 05:00:00", Decimal("7.00")),  # single point: no grid gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, v decimal(18,2)").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = linear_interpolate(df, ["user_id"], "ts", "v", step_seconds=3600)
    got = {
        (r["user_id"], r["slot_ts"].hour): (r["value"], r["method"])
        for r in out.collect()
    }
    assert got[(1, 0)] == (10.0, "observed")
    assert got[(1, 1)] == (20.0, "interp")
    assert got[(1, 2)] == (30.0, "interp")
    assert got[(1, 3)] == (40.0, "observed")
    assert got[(2, 5)] == (7.0, "observed")
    assert len(got) == 5


def test_slot_bucketing_floors_pre_1970(spark):
    """ADVICE r6: the slot must FLOOR on the integer epoch — the old
    (unix/step).cast(long)*step double-divided then truncated toward
    zero, landing 1969-12-31 23:30 in the 1970-01-01 00:00 slot
    instead of 23:00 (DuckDB's time_bucket floors)."""
    from decimal import Decimal

    from hr_moderndatapipeline_spark.operators.relational import (
        linear_interpolate,
        resample_fill,
    )

    rows = [(1, "1969-12-31 23:30:00", Decimal("5.00"))]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, v decimal(18,2)"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "v")
    li = linear_interpolate(df, ["user_id"], "ts", "v", step_seconds=3600).collect()
    assert len(li) == 1
    assert li[0]["slot_ts"].isoformat() == "1969-12-31T23:00:00"
    rf = resample_fill(df, ["user_id"], "ts", "v", step_seconds=3600).collect()
    assert len(rf) == 1
    assert rf[0]["slot_ts"].isoformat() == "1969-12-31T23:00:00"


def test_funnel_steps_subsequence_match(spark):
    """Greedy subsequence semantics: noise events are skipped, a step
    counts only after all previous steps matched, re-entries don't
    rewind, ties break on the tiebreak column."""
    from hr_moderndatapipeline_spark.operators.relational import funnel_steps

    rows = [
        # user 1: full funnel with noise interleaved
        (1, 1, "signup"), (1, 2, "view"), (1, 3, "error"),
        (1, 4, "click"), (1, 5, "purchase"),
        # user 2: view then click, never purchases
        (2, 1, "view"), (2, 2, "click"), (2, 3, "click"),
        # user 3: out of order - purchase/click before any view
        (3, 1, "purchase"), (3, 2, "click"), (3, 3, "view"),
        # user 4: noise only
        (4, 1, "error"),
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, etype string").select(
        "user_id",
        F.timestamp_seconds(F.col("seq") * 60).alias("ts"),
        F.col("seq").alias("event_id"),
        F.col("etype").alias("event_type"),
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            df, ["user_id"], "ts", "event_type",
            ["view", "click", "purchase"], tiebreak_col="event_id",
        ).collect()
    }
    assert out[1]["steps_completed"] == 3 and out[1]["converted"] == 1
    assert out[2]["steps_completed"] == 2 and out[2]["converted"] == 0
    assert out[3]["steps_completed"] == 1  # only the trailing view matches
    assert out[4]["steps_completed"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="steps"):
        funnel_steps(df, ["user_id"], "ts", "event_type", [])
    with _pytest.raises(Exception, match="max_events"):
        funnel_steps(
            df, ["user_id"], "ts", "event_type", ["view"], max_events=2
        ).collect()


def test_funnel_windowed_attempt_semantics(spark):
    """Attempts anchor at step 1; steps count only within the horizon;
    a view restarts an EXPIRED attempt (not a live one); the first
    completed attempt locks."""
    from hr_moderndatapipeline_spark.operators.relational import (
        funnel_steps_windowed,
    )

    W = 100
    rows = [
        # user 1: completes within window
        (1, 0, "view"), (1, 50, "click"), (1, 90, "purchase"),
        # user 2: click lands past the horizon -> never converts
        (2, 0, "view"), (2, 150, "click"), (2, 160, "purchase"),
        # user 3: first attempt expires, second view restarts and completes
        (3, 0, "view"), (3, 150, "view"), (3, 200, "click"), (3, 240, "purchase"),
        # user 4: a mid-window re-view must NOT reset the anchor -
        # purchase at 130 is outside the ORIGINAL anchor's window
        (4, 0, "view"), (4, 60, "click"), (4, 80, "view"), (4, 130, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, etype string").select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("sec").alias("event_id"),
        F.col("etype").alias("event_type"),
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps_windowed(
            df, ["user_id"], "ts", "event_type",
            ["view", "click", "purchase"], window_seconds=W,
            tiebreak_col="event_id",
        ).collect()
    }
    assert out[1]["converted"] == 1 and out[1]["steps_completed"] == 3
    assert out[2]["converted"] == 0 and out[2]["steps_completed"] == 1
    assert out[3]["converted"] == 1
    assert out[4]["converted"] == 0 and out[4]["steps_completed"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_seconds"):
        funnel_steps_windowed(
            df, ["user_id"], "ts", "event_type", ["view"], window_seconds=0
        )


def test_assign_grouped_ranks_spans_partitions(spark):
    """Per-group ranks must be contiguous 0..n_g-1 in order even when
    one group spans MANY range partitions (the scale case the
    operator exists for) and partitions hold multiple groups; totals
    ride along; contract errors raise."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.relational import (
        assign_grouped_ranks,
        release_stable_ids_cache,
    )

    rows = [("a", v) for v in range(500)] + [("b", v) for v in range(37)] + [
        ("c", 0)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = assign_grouped_ranks(
        df, ["g"], ["v"], id_col="rk", total_col="n", num_partitions=16
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["v"], r["rk"], r["n"]))
    assert len(out) == 538
    for g, size in (("a", 500), ("b", 37), ("c", 1)):
        recs = sorted(by_g[g])
        assert [rk for _, rk, _ in recs] == list(range(size)), g
        assert all(n == size for _, _, n in recs), g
    with _pytest.raises(ValueError, match="non-empty"):
        assign_grouped_ranks(df, [], ["v"])
    # a NULL group value must rank as its own group, not silently drop
    dfn = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "g string, v long"
    )
    outn = assign_grouped_ranks(dfn, ["g"], ["v"], id_col="rk", total_col="n")
    rows = sorted(
        ((r["g"], r["v"], r["rk"], r["n"]) for r in outn.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1]),
    )
    assert rows == [(None, 2, 0, 2), (None, 3, 1, 2), ("a", 1, 0, 1)]
    release_stable_ids_cache(spark)


def test_funnel_windowed_restart_semantics(spark):
    """restart_on_anchor=True (last-anchor convention): a view ALWAYS
    re-anchors a live attempt — discarding partial progress — and an
    expired chain can convert from the LATEST entry where the
    first-anchor convention stays stuck; completion still locks."""
    from hr_moderndatapipeline_spark.operators.relational import (
        funnel_steps_windowed,
    )

    W = 400
    rows = [
        # user 5: first-anchor is stuck at the expired 0-anchor, but
        # the re-entry at 100 converts under restart semantics
        (5, 0, "view"), (5, 100, "view"), (5, 460, "click"), (5, 470, "purchase"),
        # user 4 (same shape as the first-anchor test): a mid-attempt
        # re-view DISCARDS the click progress under restart
        (4, 0, "view"), (4, 60, "click"), (4, 80, "view"), (4, 130, "purchase"),
        # user 6: completion locks — the later view must not reset
        (6, 0, "view"), (6, 10, "click"), (6, 20, "purchase"), (6, 30, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, etype string").select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("sec").alias("event_id"),
        F.col("etype").alias("event_type"),
    )

    def run(restart):
        return {
            r["user_id"]: (r["steps_completed"], r["converted"])
            for r in funnel_steps_windowed(
                df, ["user_id"], "ts", "event_type",
                ["view", "click", "purchase"], window_seconds=W,
                tiebreak_col="event_id", restart_on_anchor=restart,
            ).collect()
        }

    restart = run(True)
    assert restart[5] == (3, 1)   # converts from the latest anchor
    assert restart[4] == (1, 0)   # re-anchor discarded the click
    assert restart[6] == (3, 1)   # locked after completion
    first = run(False)
    assert first[5] == (1, 0)     # the divergence the convention pins
    assert first[4] == (3, 1)     # first-anchor keeps the click and converts


def test_funnel_step_times_matched_epochs(spark):
    """The captured epochs are the MATCHING events' timestamps in
    step order (monotonic by construction), re-entries don't
    overwrite, and the max_events slice guard raises loudly."""
    from hr_moderndatapipeline_spark.operators.relational import funnel_step_times

    rows = [
        (1, 60, "view"), (1, 120, "error"), (1, 180, "click"),
        (1, 240, "view"),        # re-entry after click: ignored
        (1, 300, "purchase"),
        (2, 60, "click"), (2, 120, "view"),   # only view matches
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, etype string").select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("sec").alias("event_id"),
        F.col("etype").alias("event_type"),
    )
    out = {
        r["user_id"]: r
        for r in funnel_step_times(
            df, ["user_id"], "ts", "event_type",
            ["view", "click", "purchase"], tiebreak_col="event_id",
        ).collect()
    }
    assert out[1]["matched_epochs"] == [60, 180, 300]
    assert out[1]["steps_completed"] == 3
    assert out[2]["matched_epochs"] == [120] and out[2]["steps_completed"] == 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_events"):
        funnel_step_times(
            df, ["user_id"], "ts", "event_type", ["view"], max_events=2
        ).collect()


def test_simhash_prefix_bits_validation(spark):
    """ADVICE r6: prefix_bits outside [1, bits] must raise loudly —
    a negative shiftrightunsigned count wraps mod 64 on the JVM and
    silently produces garbage block keys."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_portable_near_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="prefix_bits"):
        simhash_portable_near_pairs(df, "doc_id", "text", prefix_bits=63, bits=62)
    with _pytest.raises(ValueError, match="prefix_bits"):
        simhash_portable_near_pairs(df, "doc_id", "text", prefix_bits=0)
    with _pytest.raises(ValueError, match="prefix_bits"):
        simhash_near_pairs(df, "doc_id", "text", prefix_bits=65)


def test_incremental_join_delta_identity(spark):
    """Appending the maintained delta to the old join view reproduces
    the full recompute exactly — multiset semantics (duplicates kept),
    deltas on BOTH sides."""
    from hr_moderndatapipeline_spark.operators.incremental import (
        incremental_join_delta,
    )

    l_old = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, lv string"
    )
    dl = spark.createDataFrame([(1, "c"), (3, "d")], "k long, lv string")
    r_old = spark.createDataFrame([(1, "X"), (3, "Y")], "k long, rv string")
    dr = spark.createDataFrame([(1, "Z"), (2, "W")], "k long, rv string")

    old_view = l_old.join(r_old, "k", "inner")
    delta = incremental_join_delta(l_old, dl, r_old, dr, ["k"])
    maintained = sorted(map(tuple, old_view.unionByName(delta).collect()))
    full = sorted(
        map(tuple, l_old.unionByName(dl).join(r_old.unionByName(dr), "k").collect())
    )
    assert maintained == full


def test_histogram_quantiles_planted(spark):
    """Histogram invariants on a known distribution: merge law holds,
    and each quantile estimate's bin really is the first bin whose
    cumulative count reaches ceil(q*N/1e6)."""
    from hr_moderndatapipeline_spark.operators.sketch import (
        histogram_build,
        histogram_quantiles,
    )

    # 100 values 0..99 -> bins of width 10 with 10 values each
    df = spark.range(100).selectExpr("id AS v")
    hist = histogram_build(df, "v", lo=0, hi=100, nbins=10)
    got = {
        r["q_ppm"]: (r["bin_idx"], r["est_upper"])
        for r in histogram_quantiles(
            hist, [100_000, 500_000, 990_000], lo=0, hi=100, nbins=10
        ).collect()
    }
    # ceil(.1*100)=10 -> bin 0 (cum 10); ceil(.5*100)=50 -> bin 4;
    # ceil(.99*100)=99 -> bin 9
    assert got == {100_000: (0, 10), 500_000: (4, 50), 990_000: (9, 100)}

    h1 = histogram_build(df.filter("v < 37"), "v", lo=0, hi=100, nbins=10)
    h2 = histogram_build(df.filter("v >= 37"), "v", lo=0, hi=100, nbins=10)
    from hr_moderndatapipeline_spark.operators.sketch import cms_merge

    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            h1.selectExpr("0L AS row_idx", "bin_idx AS bucket", "cnt"),
            h2.selectExpr("0L AS row_idx", "bin_idx AS bucket", "cnt"),
        ).collect()
    }
    full = {
        (0, r["bin_idx"]): r["cnt"] for r in hist.collect()
    }
    assert merged == full


def test_linear_trend_planted(spark):
    """Exact line recovered exactly; degenerate keys (n<2 or zero
    x-variance) yield NULL slope instead of a divide failure."""
    from hr_moderndatapipeline_spark.operators.relational import linear_trend

    rows = (
        [("line", x, 3 * x + 7) for x in range(10)]
        + [("single", 5, 42)]
        + [("flatx", 4, 1), ("flatx", 4, 9)]
    )
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = {r["k"]: r for r in linear_trend(df, ["k"], "x", "y").collect()}
    assert out["line"]["slope"] == 3.0 and out["line"]["intercept"] == 7.0
    assert out["line"]["n_points"] == 10
    assert out["single"]["slope"] is None and out["flatx"]["slope"] is None
