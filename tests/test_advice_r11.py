"""Round-11 regression pins for the r10 ADVICE items.

1. (high) q_spend_decile_woe ranked deciles on a raw DOUBLE spend sum
   — accumulation-order-dependent at decile boundaries. Spend is now
   quantized to cents BIGINT before the sum on BOTH engines. The pin
   here is a fixture where the double sum and the cents sum RANK two
   customers differently (0.1+0.2 vs 0.3): pre-fix code puts the wrong
   customer in decile 1.
2. (medium) rank_sum_auc / ks_two_sample did the ×1e6 ppm scaling in
   BIGINT, wrapping silently once np·nn > ~4.6e12 (AUC) / n1·n0 >
   ~9.2e12 (KS) — ~2-3M × 2-3M subjects, reachable at 100 TB. The
   scaling now runs in DECIMAL(38,0). Pins build exactly-overflowing
   fixtures (AUC=1, D=1) and assert the exact 1_000_000 ppm the
   pre-fix wrap turns negative.
3. (low) bm25_rank_batch joined a NON-deduplicated (query_id, term)
   map, double-counting a term repeated inside one query's list (and
   bm25_rank's literal term array had the same flaw). Queries are term
   SETS now; pins assert duplicate-term inputs equal deduplicated ones
   and the batch face still equals the single face.
4. (low) purged_time_split silently labeled [test_start, purge_start)
   rows 'train' when the two arguments were swapped — the exact leak
   the operator exists to prevent. It now raises ValueError.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.experiments import (
    ks_two_sample,
    rank_sum_auc,
)
from hr_moderndatapipeline_spark.operators.sampling import purged_time_split
from hr_moderndatapipeline_spark.operators.text import (
    bm25_rank,
    bm25_rank_batch,
)


# ── 1. spend-decile WOE: cents ranking key ──

def _write_woe_fixture(spark, d):
    """Two customers with EQUAL true spend 0.30 — but customer 1's is
    split 0.10 + 0.20, whose IEEE double sum is 0.30000000000000004 >
    0.3. Cents rank ties them (tie-break: custkey → cust 1 first);
    the pre-fix double rank puts cust 2 first. Customer 1 is the
    returner, so decile 1's n_returners distinguishes the two."""
    spark.createDataFrame(
        [(1,), (2,)], "c_custkey bigint"
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, 0.10), (11, 1, 0.20), (12, 2, 0.30)],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(10, "R"), (12, "N")], "l_orderkey bigint, l_returnflag string"
    ).write.parquet(f"{d}/lineitem.parquet")


def test_spend_decile_woe_ranks_on_exact_cents(spark, tmp_path):
    from hr_moderndatapipeline_spark.queries.dataops import (
        q_spend_decile_woe,
    )

    d = str(tmp_path)
    _write_woe_fixture(spark, d)
    got = {
        r["decile"]: (r["n_customers"], r["n_returners"])
        for r in q_spend_decile_woe(spark, d).collect()
    }
    # cents semantics: tie on 30 cents, custkey asc -> returner (cust
    # 1) lands in decile 1. Pre-fix double semantics put cust 2 there.
    assert got[1] == (1, 1), f"decile 1 must hold the returner: {got}"
    assert got[2] == (1, 0)


def test_spend_decile_woe_oracle_parity_on_boundary_fixture(
    spark, tmp_path
):
    """Both engines must agree on the tie-at-the-boundary fixture —
    the committed oracle quantizes identically."""
    from hr_moderndatapipeline_spark.queries.dataops import (
        ORACLE_SPEND_DECILE_WOE,
        q_spend_decile_woe,
    )

    d = str(tmp_path)
    _write_woe_fixture(spark, d)
    got = sorted(
        tuple(r) for r in q_spend_decile_woe(spark, d).collect()
    )
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    want = sorted(
        tuple(r) for r in con.execute(ORACLE_SPEND_DECILE_WOE).fetchall()
    )
    con.close()
    assert got == want


# ── 2. AUC / KS ppm scaling survives np·nn beyond the BIGINT wrap ──

def test_rank_sum_auc_no_bigint_wrap_at_large_np_nn(spark):
    """np = nn = 2.2e6, every positive above every negative: u2 =
    2·np·nn = 9.68e12, and the pre-fix BIGINT u2·1e6 = 9.68e18 wraps
    past 2^63−1 ≈ 9.22e18 to a NEGATIVE auc_ppm. DECIMAL(38,0) keeps
    the exact AUC = 1."""
    n = 2_200_000
    df = spark.range(2 * n).select(
        F.col("id"),
        F.col("id").alias("score"),
        (F.col("id") >= n).cast("int").alias("label"),
    )
    row = rank_sum_auc(df, "id", "score", "label").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n, n)
    assert row["u2"] == 2 * n * n
    assert row["auc_ppm"] == 1_000_000
    assert row["gini_ppm"] == 1_000_000


def test_ks_two_sample_no_bigint_wrap_at_large_n1_n0(spark):
    """n1 = n0 = 3.1e6 with fully separated values: ks_num = n1·n0 =
    9.61e12; the pre-fix BIGINT ks_num·1e6 wraps negative. DECIMAL
    keeps the exact D = 1."""
    n = 3_100_000
    df = spark.range(2 * n).select(
        F.lit("g").alias("grp"),
        (F.col("id") < n).cast("int").alias("variant"),
        (F.col("id") < n).cast("bigint").alias("value"),
    )
    row = ks_two_sample(df, "grp", "variant", "value").collect()[0]
    assert (row["n_treat"], row["n_ctrl"]) == (n, n)
    assert row["ks_num"] == n * n
    assert row["ks_ppm"] == 1_000_000


# ── 3. BM25: queries are term sets ──

@pytest.fixture()
def bm25_docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple pear apple banana"),
            (2, "apple apple apple"),
            (3, "pear pear kiwi"),
            (4, "banana kiwi melon"),
        ],
        "doc_id bigint, body string",
    )


def test_bm25_rank_duplicate_query_term_counted_once(bm25_docs):
    ded = sorted(
        tuple(r)
        for r in bm25_rank(bm25_docs, "doc_id", "body", ["apple", "pear"]).collect()
    )
    dup = sorted(
        tuple(r)
        for r in bm25_rank(
            bm25_docs, "doc_id", "body", ["apple", "apple", "pear"]
        ).collect()
    )
    assert dup == ded
    # n_terms_matched stays ≤ |distinct terms|
    assert max(r[1] for r in dup) <= 2


def test_bm25_rank_batch_duplicate_query_term_counted_once(bm25_docs):
    ded = sorted(
        tuple(r)
        for r in bm25_rank_batch(
            bm25_docs, "doc_id", "body", [("q1", ["apple", "pear"])]
        ).collect()
    )
    dup = sorted(
        tuple(r)
        for r in bm25_rank_batch(
            bm25_docs, "doc_id", "body", [("q1", ["apple", "apple", "pear"])]
        ).collect()
    )
    assert dup == ded
    # and the batch face still equals the single face per query
    single = sorted(
        (r["doc_id"], r["n_terms_matched"], r["bm25_micro"])
        for r in bm25_rank(bm25_docs, "doc_id", "body", ["apple", "pear"]).collect()
    )
    batch = sorted((r[1], r[2], r[3]) for r in dup)
    assert batch == single


# ── 4. purged_time_split argument-order guard ──

def test_purged_time_split_rejects_swapped_bounds(spark):
    df = spark.createDataFrame(
        [("2024-01-21 00:00:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="purge_start"):
        purged_time_split(
            df, "ts", "2024-01-22 00:00:00", "2024-01-20 00:00:00"
        )
    # correct order still works, and the purge window is labeled
    out = purged_time_split(
        df, "ts", "2024-01-20 00:00:00", "2024-01-22 00:00:00"
    ).collect()
    assert out[0]["split"] == "purged"
