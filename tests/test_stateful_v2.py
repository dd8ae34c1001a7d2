"""transformWithState (Spark 4 arbitrary stateful API): executes end
to end where the environment allows, skips with the documented
reason where it doesn't — and always pins the loud-error contract."""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    running_totals_stream,
    transform_with_state_available,
)


def test_unavailable_path_raises_loudly(spark):
    if transform_with_state_available():
        pytest.skip("protobuf present — the loud-error branch is dead here")
    stream = spark.readStream.format("rate").load()
    with pytest.raises(RuntimeError, match="protobuf"):
        running_totals_stream(stream, "value", "value")


@pytest.mark.skipif(
    not transform_with_state_available(),
    reason="google.protobuf not importable — transformWithState worker "
    "cannot start in this container (streaming/stateful_v2.py docstring)",
)
def test_running_totals_end_to_end(spark, tmp_path):
    import json

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as fh:
        for i in range(12):
            fh.write(json.dumps({"k": i % 3, "v": i}) + "\n")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    stream = spark.readStream.schema("k long, v long").json(str(src))
    out = running_totals_stream(stream, "k", "v")
    q = (
        out.writeStream.format("memory")
        .queryName("tw_totals")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow trigger did not finish"
    rows = {r["key"]: (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tw_totals").collect()}
    assert rows[0] == (4, 0 + 3 + 6 + 9)
    assert rows[1] == (4, 1 + 4 + 7 + 10)
    assert rows[2] == (4, 2 + 5 + 8 + 11)
