"""Observation-based write accounting: metrics ride the write job."""
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.streaming.monitor import write_with_metrics
from hr_moderndatapipeline_spark.sources.readers import load_table


def test_write_with_metrics_counts_in_one_pass(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    got = write_with_metrics(
        o,
        str(tmp_path / "out"),
        metrics={
            "null_status": F.sum(
                F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)
            ),
            "max_key": F.max("o_orderkey"),
        },
    )
    assert got["n_rows"] == o.count()
    assert got["null_status"] == 0
    assert got["max_key"] == o.agg(F.max("o_orderkey")).collect()[0][0]
    # the write really happened, byte-complete
    assert spark.read.parquet(str(tmp_path / "out")).count() == got["n_rows"]
