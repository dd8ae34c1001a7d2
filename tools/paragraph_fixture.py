"""KB-scale paragraph fixture for ``paragraph_dedup(by_hash=True)``
(VERDICT r7 task 4).

The driver corpus's paragraphs are ~60 bytes, so the hash-keyed
variant showed no separation from the exact-string window — the
geometry it targets (web boilerplate, license blocks, recrawled page
bodies) is KILOBYTE paragraphs. This tool builds that geometry
deterministically and measures both variants honestly:

- 5,000 docs x 6 paragraphs of ~1 KiB each (~30 MiB of text);
- even paragraph slots draw from a 50-entry shared boilerplate pool
  (the license-block class — every pool paragraph repeats hundreds
  of times corpus-wide), odd slots are corpus-unique doc text;
- both variants run over the same corpus; wall time and MEASURED
  shuffle bytes come from SQLMetrics; result equality (n_paragraphs,
  n_dropped per doc) is asserted, pinning the hash variant's
  correctness at this geometry too.

What the measurement can and cannot show: the first shuffle moves
the full (id, pos, para) row under EITHER key — the paragraph text
is needed downstream for reassembly — so shuffle BYTES should NOT
separate; the hash key's win is the window sort's comparison cost
(8-byte longs vs KiB strings) and the partitioner's key hashing.
SCALING.md records whichever way the numbers land.

Usage:
  python tools/paragraph_fixture.py          # generate + measure, print JSON
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1/documents.parquet"
FIXTURE = "/tmp/hr_mdp_parafix/documents.parquet"
POOL = 50          # shared boilerplate paragraphs
PER_DOC = 6        # paragraphs per doc; even slots from the pool
REPEAT = 64        # ~1 KiB per paragraph (16-char unit x 64)


def generate() -> None:
    import duckdb

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  WITH docs AS (SELECT doc_id, text FROM read_parquet('{BASE}')),
  slots AS (SELECT doc_id, text, unnest(range(0, {PER_DOC})) AS j FROM docs),
  paras AS (
    SELECT doc_id, j,
           CASE WHEN j % 2 = 0
                -- shared boilerplate: one of {POOL} pool entries, ~1 KiB
                THEN repeat('license clause ' || CAST((doc_id + j) % {POOL} AS VARCHAR) || ' of the shared boilerplate pool. ', {REPEAT})
                -- corpus-unique body: doc-salted words, ~1 KiB
                ELSE repeat(substr(text, 1, 48) || ' u' || CAST(doc_id AS VARCHAR) || 'p' || CAST(j AS VARCHAR) || ' ', {REPEAT // 4})
           END AS para
    FROM slots)
  SELECT doc_id,
         string_agg(para, chr(10) || chr(10) ORDER BY j) AS text
  FROM paras GROUP BY doc_id
) TO '{FIXTURE}' (FORMAT PARQUET)
"""
    )
    con.close()
    print(
        f"generated {FIXTURE}: {os.path.getsize(FIXTURE) // 1048576} MiB",
        flush=True,
    )


def measure() -> None:
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark.functions.execmetrics import executed_metrics
    from hr_moderndatapipeline_spark.operators.text import paragraph_dedup

    spark = get_spark("paragraph_fixture")
    docs = spark.read.parquet(os.path.dirname(FIXTURE))
    out: dict[str, dict] = {}
    sums: dict[bool, tuple] = {}
    for by_hash in (False, True):
        df = paragraph_dedup(docs, "doc_id", "text", by_hash=by_hash)
        agg = df.agg(
            F.sum("n_paragraphs").alias("np"),
            F.sum("n_dropped").alias("nd"),
            F.sum(F.length("dedup_text")).alias("nb"),
        )
        t0 = time.time()
        row = agg.collect()[0]
        dt = round(time.time() - t0, 2)
        m = executed_metrics(agg)
        sums[by_hash] = (row["np"], row["nd"], row["nb"])
        out["by_hash" if by_hash else "exact"] = {
            "sec": dt,
            "shuffle_mib": round(m["shuffle_bytes"] / 1048576, 1),
            "spill_bytes": m["spill_bytes"],
            "n_paragraphs": row["np"],
            "n_dropped": row["nd"],
        }
    assert sums[False] == sums[True], f"variant results differ: {sums}"
    out["separation"] = {
        "wall_ratio_exact_over_hash": round(
            out["exact"]["sec"] / out["by_hash"]["sec"], 2
        )
        if out["by_hash"]["sec"] > 0
        else None,
        "shuffle_ratio_exact_over_hash": round(
            out["exact"]["shuffle_mib"] / out["by_hash"]["shuffle_mib"], 2
        )
        if out["by_hash"]["shuffle_mib"] > 0
        else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if not os.path.exists(FIXTURE) or "--regen" in sys.argv[1:]:
        generate()
    measure()
