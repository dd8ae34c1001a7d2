

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
