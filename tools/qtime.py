"""Time a subset of declared queries against the noop sink — the
round-12 optimization loop's A/B harness. Same methodology as
bench.py (2 reps, min, clearCache between, warmup job first) without
the full 133-query sweep.

Usage: python tools/qtime.py [--sf DIR] [--reps N] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark import queries as qmod  # noqa: E402


def main(argv: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    spark = get_spark("qtime")
    all_q = qmod.queries()
    unknown = [n for n in names if n not in all_q]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # same warmups as bench.py
    from pyspark.sql import functions as F  # noqa: PLC0415

    all_q["attrition_monthly"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _identity(s: pd.Series) -> pd.Series:
        return s

    _warm = F.pandas_udf(_identity, "long")
    spark.range(32, numPartitions=32).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            all_q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"QTIME {name}: min={min(samples)} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
