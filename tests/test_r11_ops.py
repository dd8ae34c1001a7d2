"""Round-11 operator pins.

1. ``centroid_assign_arrow`` (VERDICT r10 #1): the numpy assignment
   kernel must be BIT-identical to ``centroid_assign_literal`` — on
   the real embedding corpus, and on an adversarial fixture where the
   raw argmax and the round-then-rank argmax DISAGREE (two centroids
   whose cosines differ raw but round equal at 6 digits: the rounded
   tie must go to the LOWER cluster id, not the higher raw cosine).
2. ``kmeans_train(arrow=True)`` returns the same centroids as the
   pure-Catalyst face, so the query path's default is pinned to the
   verification face end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.similarity import (
    as_double_vec,
    centroid_assign_arrow,
    centroid_assign_literal,
    kmeans_train,
    l2_norm,
)

DIM = 64


def _vecs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", as_double_vec(F.col("embedding")).alias("_v")
    ).withColumn("_vn", l2_norm(F.col("_v"), DIM))


def _collect(df):
    return sorted(
        (r["vec_id"], r["cluster"], r["_cos"])
        for r in df.select("vec_id", "cluster", "_cos").collect()
    )


def test_centroid_assign_arrow_bit_identical_on_corpus(spark, sf_dir):
    vecs = _vecs(spark, sf_dir).cache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_train(
        emb, "vec_id", "embedding", dim=DIM, k=8, iterations=1, arrow=False
    )
    try:
        got = _collect(centroid_assign_arrow(vecs, cents, DIM))
        want = _collect(centroid_assign_literal(vecs, cents, DIM))
    finally:
        vecs.unpersist()
    assert got == want


def test_centroid_assign_arrow_rounded_tie_beats_raw_argmax(spark):
    """v is closest to centroid 7 in RAW cosine (1.0 vs
    0.99999999995), but both round to 1.0 at 6 digits — the module
    ROUNDING POLICY says the tie goes to cluster 2. A kernel that
    ranked on raw scores would answer 7."""
    e1 = [1.0] + [0.0] * (DIM - 1)
    tilt = [1.0, 1e-5] + [0.0] * (DIM - 2)
    vecs = (
        spark.createDataFrame([(1, e1)], "vec_id long, _v array<double>")
        .withColumn("_v", as_double_vec(F.col("_v")))
        .withColumn("_vn", l2_norm(F.col("_v"), DIM))
    )
    cents = [(7, e1), (2, tilt)]
    got = centroid_assign_arrow(vecs, cents, DIM).collect()[0]
    want = centroid_assign_literal(vecs, cents, DIM).collect()[0]
    assert (got["cluster"], got["_cos"]) == (want["cluster"], want["_cos"])
    assert got["cluster"] == 2
    assert got["_cos"] == 1.0


def test_centroid_assign_arrow_exact_tie_lower_id(spark):
    """Bitwise-equal cosines (duplicate centroids): lower id wins on
    both faces."""
    e1 = [0.5] * DIM
    vecs = (
        spark.createDataFrame([(1, e1)], "vec_id long, _v array<double>")
        .withColumn("_v", as_double_vec(F.col("_v")))
        .withColumn("_vn", l2_norm(F.col("_v"), DIM))
    )
    cents = [(9, e1), (4, e1)]
    got = centroid_assign_arrow(vecs, cents, DIM).collect()[0]
    want = centroid_assign_literal(vecs, cents, DIM).collect()[0]
    assert got["cluster"] == want["cluster"] == 4


def test_bm25_index_probe_equals_one_shot_batch(spark, sf_dir):
    """The publish-once lifecycle (VERDICT r10 #4): probe(index) is
    bit-identical to bm25_rank_batch, per query, on the real corpus
    — including n_terms_matched and the integer micro scores."""
    from hr_moderndatapipeline_spark.operators.text import (
        bm25_index,
        bm25_probe,
        bm25_rank_batch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    qmap = [
        ("q_scan_filter", ["scan", "filter", "column", "hash"]),
        ("q_stream_join", ["stream", "spark", "join"]),
        ("q_window_merge", ["window", "merge"]),
    ]
    postings, stats = bm25_index(docs, "doc_id", "text")
    got = sorted(
        tuple(r) for r in bm25_probe(postings, stats, "doc_id", qmap).collect()
    )
    want = sorted(
        tuple(r) for r in bm25_rank_batch(docs, "doc_id", "text", qmap).collect()
    )
    assert got == want
    assert len(got) > 0


def test_bm25_probe_single_query_equals_single_face(spark, sf_dir):
    from hr_moderndatapipeline_spark.operators.text import (
        bm25_index,
        bm25_probe,
        bm25_rank,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    postings, stats = bm25_index(docs, "doc_id", "text")
    got = sorted(
        (r["doc_id"], r["n_terms_matched"], r["bm25_micro"])
        for r in bm25_probe(
            postings, stats, "doc_id", [("q", ["data", "spark"])]
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in bm25_rank(docs, "doc_id", "text", ["data", "spark"]).collect()
    )
    assert got == want


def test_bm25_index_merge_law(spark, sf_dir):
    """merge(index(corpus), index(batch)) == index(corpus ∪ batch)
    for doc-disjoint inputs — probing the merged index answers
    queries exactly as a full rebuild would."""
    from hr_moderndatapipeline_spark.operators.text import (
        bm25_index,
        bm25_index_merge,
        bm25_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    pm, sm = bm25_index_merge(
        *bm25_index(corpus, "doc_id", "text"),
        *bm25_index(batch, "doc_id", "text"),
    )
    pf, sf = bm25_index(docs, "doc_id", "text")
    qmap = [("q", ["data", "spark", "scan"])]
    got = sorted(tuple(r) for r in bm25_probe(pm, sm, "doc_id", qmap).collect())
    want = sorted(tuple(r) for r in bm25_probe(pf, sf, "doc_id", qmap).collect())
    assert got == want
    assert sorted(map(tuple, pm.collect())) == sorted(map(tuple, pf.collect()))
    assert sm.collect() == sf.collect()


def test_kmeans_train_arrow_equals_catalyst_face(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = kmeans_train(emb, "vec_id", "embedding", dim=DIM, k=8, iterations=2, arrow=True)
    b = kmeans_train(emb, "vec_id", "embedding", dim=DIM, k=8, iterations=2, arrow=False)
    assert a == b


# ── winnowing index/probe lifecycle (VERDICT r10 #2) ──

def _one_shot_pairs(corpus, max_df=8, min_shared=3):
    """The one-shot winnowing pair shape (q_winnowing_dup_pairs's
    logic) over an arbitrary corpus DataFrame."""
    from pyspark.sql import Window

    from hr_moderndatapipeline_spark.operators.text import (
        winnowing_fingerprints,
    )

    fps = (
        winnowing_fingerprints(corpus, "doc_id", "text", k=5, w=4)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    rare = fps.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("fp_hash"))
    ).filter(F.col("_df") <= max_df)
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


def test_winnowing_probe_equals_one_shot_restricted(spark, sf_dir):
    """The equivalence law: probe(batch, index(corpus)) == one-shot
    over corpus ∪ batch restricted to batch-involving pairs — df cap
    included (union doc-frequency reconstructed exactly)."""
    from hr_moderndatapipeline_spark.operators.text import (
        winnowing_index,
        winnowing_probe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    words = F.split(F.col("text"), " ")
    batch = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(words, 1, F.floor(F.size(words) / 2).cast("int")), " "
        ).alias("text"),
    )
    idx = winnowing_index(docs, "doc_id", "text", k=5, w=4)
    got = sorted(
        tuple(r)
        for r in winnowing_probe(batch, idx, "doc_id", "text", k=5, w=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in _one_shot_pairs(docs.unionByName(batch))
        .filter(F.col("doc_b") >= 1_000_000)
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_winnowing_cap_keeps_planted_subcap_pairs(spark):
    """VERDICT r10 #3 unit pin: with the df ≤ 8 cap ON, passage
    pairs planted BELOW the cap are all found even when every doc
    shares a viral boilerplate passage — the cap removes the
    boilerplate fanout, not the signal. (The measured fixture at
    N=2000 lives in tools/winnowing_fixture.py; SCALING.md r11.)"""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.winnowing_fixture import _docs as fixture_docs
    from tools.winnowing_fixture import pairs_with_cap

    from hr_moderndatapipeline_spark.operators.text import (
        winnowing_fingerprints,
    )

    docs = fixture_docs(spark, 40, 10, 12)
    fps = (
        winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    pairs, _ = pairs_with_cap(fps, 8, 3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    planted = {(2 * p, 2 * p + 1) for p in range(10)}
    assert planted <= got
    # nothing beyond planted pairs + (possibly) none: the viral
    # boilerplate (df=40) and the 12-doc cohort passage (df=12) are
    # both above the cap, so no pair rides on them
    assert got == planted


def test_winnowing_probe_union_df_cap_is_exact(spark):
    """A fingerprint under the cap in the corpus alone but over it in
    the union must be dropped — the cap sees corpus_df + batch_df,
    not corpus_df. 5 corpus docs + 5 batch docs share one passage
    (union df 10 > 8 → no pairs from it); a second passage planted
    in exactly 1 corpus + 1 batch doc must still pair them."""
    from hr_moderndatapipeline_spark.operators.text import (
        winnowing_index,
        winnowing_probe,
    )

    viral = "alpha beta gamma delta epsilon zeta eta theta"
    rare = "one two three four five six seven eight nine ten"
    corpus = spark.createDataFrame(
        [(i, viral) for i in range(5)] + [(5, rare)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100 + i, viral) for i in range(5)] + [(105, rare)],
        "doc_id long, text string",
    )
    idx = winnowing_index(corpus, "doc_id", "text", k=5, w=4)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in winnowing_probe(
            batch, idx, "doc_id", "text", k=5, w=4, max_df=8, min_shared=1
        ).collect()
    }
    # the viral passage (10 docs > cap 8) must produce NO pairs; the
    # rare passage pairs its two owners
    assert got == {(5, 105)}


# ── retrieval_metrics (offline MRR/P/R/nDCG readout) ──


def _metrics(spark, run_rows, qrel_rows, k):
    from hr_moderndatapipeline_spark.operators.experiments import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        run_rows, "query_id string, doc_id bigint, rank int"
    )
    qrels = spark.createDataFrame(
        qrel_rows, "query_id string, doc_id bigint, rel int"
    )
    return {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(run, qrels, k=k).collect()
    }


def test_retrieval_metrics_hand_computed(spark):
    # q1 run (ranks 1..5): d5(unjudged) d1(rel3) d7(unjudged) d3(rel2) d2(rel1)
    run = [
        ("q1", 5, 1),
        ("q1", 1, 2),
        ("q1", 7, 3),
        ("q1", 3, 4),
        ("q1", 2, 5),
    ]
    qrels = [("q1", 1, 3), ("q1", 2, 1), ("q1", 3, 2), ("q1", 9, 1)]
    m = _metrics(spark, run, qrels, k=3)["q1"]
    assert m["n_rel"] == 4
    assert m["hits_at_k"] == 1  # only d1 inside the cutoff
    assert m["mrr_ppm"] == 1000000 // 2  # first relevant at rank 2
    assert m["precision_ppm"] == 1000000 * 1 // 3
    assert m["recall_ppm"] == 1000000 * 1 // 4
    assert m["dcg_fixed"] == 3 * 630930  # rel 3 at rank 2
    # ideal top-3 grades are (3, 2, 1) at literal discounts
    assert m["idcg_fixed"] == 3 * 1000000 + 2 * 630930 + 1 * 500000
    assert m["ndcg_ppm"] == 1000000 * m["dcg_fixed"] // m["idcg_fixed"]


def test_retrieval_metrics_degenerate_queries(spark):
    # q_norel: retrieved but zero judgments; q_norun: judged but no run
    run = [("q_norel", 1, 1), ("q_norel", 2, 2)]
    qrels = [("q_norun", 4, 2), ("q_norun", 5, 1)]
    m = _metrics(spark, run, qrels, k=2)
    a = m["q_norel"]
    assert (a["n_rel"], a["hits_at_k"], a["mrr_ppm"]) == (0, 0, 0)
    assert (a["recall_ppm"], a["ndcg_ppm"], a["idcg_fixed"]) == (0, 0, 0)
    b = m["q_norun"]
    assert b["n_rel"] == 2
    assert (b["hits_at_k"], b["precision_ppm"], b["dcg_fixed"]) == (0, 0, 0)
    assert b["idcg_fixed"] == 2 * 1000000 + 1 * 630930
    assert b["ndcg_ppm"] == 0


def test_retrieval_metrics_k_cutoff_and_bounds(spark):
    import pytest as _pytest

    # the only relevant doc sits at rank 3 — invisible at k=2
    run = [("q", 8, 1), ("q", 9, 2), ("q", 1, 3)]
    qrels = [("q", 1, 2)]
    m = _metrics(spark, run, qrels, k=2)["q"]
    assert (m["hits_at_k"], m["mrr_ppm"], m["dcg_fixed"]) == (0, 0, 0)
    assert m["n_rel"] == 1 and m["idcg_fixed"] == 2 * 1000000
    from hr_moderndatapipeline_spark.operators.experiments import (
        retrieval_metrics,
    )

    with _pytest.raises(ValueError):
        retrieval_metrics(
            spark.createDataFrame(run, "query_id string, doc_id bigint, rank int"),
            spark.createDataFrame(qrels, "query_id string, doc_id bigint, rel int"),
            k=21,
        )


def test_dcg_discount_table_is_round_half_up():
    import math

    from hr_moderndatapipeline_spark.operators.experiments import (
        DCG_DISCOUNT_PPM,
    )

    for r, ppm in DCG_DISCOUNT_PPM.items():
        assert ppm == int(math.floor(1e6 / math.log2(r + 1) + 0.5)), r


# ── calibration_ece + cohen_kappa ──


def test_calibration_ece_hand_computed(spark):
    from hr_moderndatapipeline_spark.operators.experiments import (
        calibration_ece,
    )

    # two bins at B=2: [0, .5) and [.5, 1]; score 1e6 lands in the top bin
    rows = [
        (100000, 0),
        (300000, 1),   # bin 0: n=2, sum_label=1, sum_score=400000
        (600000, 1),
        (900000, 1),
        (1000000, 0),  # bin 1: n=3, sum_label=2, sum_score=2500000
    ]
    df = spark.createDataFrame(rows, "score_ppm bigint, label int")
    got = {
        r["bin"]: r.asDict()
        for r in calibration_ece(df, "score_ppm", "label", bins=2).collect()
    }
    b0, b1 = got[0], got[1]
    assert (b0["n"], b0["sum_label"]) == (2, 1)
    assert b0["acc_ppm"] == 500000 and b0["conf_ppm"] == 200000
    assert b0["gap_fixed"] == abs(1000000 * 1 - 400000)  # 600000
    assert (b1["n"], b1["sum_label"]) == (3, 2)
    assert b1["acc_ppm"] == 1000000 * 2 // 3 and b1["conf_ppm"] == 2500000 // 3
    assert b1["gap_fixed"] == abs(1000000 * 2 - 2500000)  # 500000
    # ece = (600000 + 500000) DIV 5 on both rows
    assert b0["ece_ppm"] == b1["ece_ppm"] == (600000 + 500000) // 5


def test_cohen_kappa_hand_computed_and_negative(spark):
    from hr_moderndatapipeline_spark.operators.experiments import cohen_kappa

    # classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10 (n=50)
    rows = (
        [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    )
    df = spark.createDataFrame(rows, "r1 int, r2 int")
    m = cohen_kappa(df, "r1", "r2").collect()[0].asDict()
    assert (m["n"], m["agree"]) == (50, 35)
    # marginals: r1 {1:25, 0:25}, r2 {1:30, 0:20}; pe_num = 25*30+25*20=1250
    assert m["po_ppm"] == 1000000 * 35 // 50  # 700000
    assert m["pe_ppm"] == 1000000 * 1250 // 2500  # 500000
    # kappa = (50*35 - 1250)/(2500 - 1250) = 500/1250 = 0.4
    assert m["kappa_ppm"] == 1000000 * (50 * 35 - 1250) // (2500 - 1250)

    # worse-than-chance: perfect disagreement on a 2-class balance
    rows2 = [(1, 0)] * 10 + [(0, 1)] * 10
    m2 = cohen_kappa(
        spark.createDataFrame(rows2, "r1 int, r2 int"), "r1", "r2"
    ).collect()[0].asDict()
    # n=20 agree=0; pe_num = 10*10+10*10 = 200; num=-200 den=200
    # truncation toward zero: -(200*1e6 // 200) = -1000000
    assert m2["kappa_ppm"] == -1000000
    assert m2["po_ppm"] == 0 and m2["pe_ppm"] == 500000


def test_fairness_readout_hand_computed_and_degenerate(spark):
    from hr_moderndatapipeline_spark.operators.experiments import (
        fairness_readout,
    )

    rows = (
        # group A: tp=2 fp=1 fn=1 tn=2  (n=6)
        [("A", 1, 1)] * 2 + [("A", 0, 1)] + [("A", 1, 0)] + [("A", 0, 0)] * 2
        # group B: all-negative labels (TPR undefined), fp=1 tn=1
        + [("B", 0, 1), ("B", 0, 0)]
    )
    df = spark.createDataFrame(rows, "grp string, label int, pred int")
    got = {
        r["grp"]: r.asDict()
        for r in fairness_readout(df, "grp", "label", "pred").collect()
    }
    a, b = got["A"], got["B"]
    assert (a["tp"], a["fp"], a["fn"], a["tn"]) == (2, 1, 1, 2)
    assert a["selection_ppm"] == 1000000 * 3 // 6
    assert a["tpr_ppm"] == 1000000 * 2 // 3
    assert a["fpr_ppm"] == 1000000 * 1 // 3
    assert b["tpr_ppm"] is None  # undefined, NOT zero
    assert b["selection_ppm"] == 500000 and b["fpr_ppm"] == 500000
    # gaps: selection 500000-500000=0; TPR gap over {A} alone = 0
    # (B's NULL excluded); FPR gap = |1/3 - 1/2| in ppm
    assert a["parity_gap_ppm"] == 0 and b["parity_gap_ppm"] == 0
    assert a["eo_tpr_gap_ppm"] == 0
    assert a["eo_fpr_gap_ppm"] == 500000 - 333333


def test_centroid_silhouette_hand_computed(spark):
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.similarity import (
        centroid_silhouette_literal,
    )

    # dim=2 unit-ish vectors; centroids: c0=(1,0), c1=(0,1)
    rows = [
        (1, [1.0, 0.0]),   # own c0 cos=1.0, other c1 cos=0.0 → s=1e6
        (2, [1.0, 1.0]),   # cos to both = 1/sqrt(2) → rounded tie → s=0
        (3, [0.0, 2.0]),   # own c1 cos=1.0, other cos=0 → s=1e6
        (4, [3.0, 1.0]),   # own c0, a=1-0.948683, b=1-0.316228
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, _v array<double>")
    df = df.withColumn(
        "_vn",
        F.sqrt(
            F.aggregate(
                F.col("_v"), F.lit(0.0), lambda a, x: a + x * x
            )
        ),
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = {
        r["vec_id"]: r.asDict()
        for r in centroid_silhouette_literal(df, cents, 2).collect()
    }
    assert got[1]["cluster"] == 0 and got[1]["s_ppm"] == 1000000
    assert got[2]["s_ppm"] == 0  # rounded tie between the two centroids
    assert got[2]["cluster"] == 0  # tie goes to the lower cluster id
    assert got[3]["cluster"] == 1 and got[3]["s_ppm"] == 1000000
    own, other = got[4]["_cos"], got[4]["_cos2"]
    import math

    assert got[4]["cluster"] == 0
    expect = math.floor((own - other) / (1.0 - min(own, other)) * 1e6 + 0.5)
    assert got[4]["s_ppm"] == expect
    # nearest-centroid simplified silhouette: own_cos >= other_cos
    # always, so the range is [0, 1e6] — never negative (ADVICE r12)
    assert all(0 <= r["s_ppm"] <= 1000000 for r in got.values())

    with _pytest.raises(ValueError):
        centroid_silhouette_literal(df, [(0, [1.0, 0.0])], 2)


def test_cohort_centroid_drift_hand_computed(spark):
    import math

    from hr_moderndatapipeline_spark.operators.similarity import (
        cohort_centroid_drift,
    )

    # cohort 0: two copies of (1,0); cohort 1: two copies of (0,1)
    rows = [(0, [1.0, 0.0]), (0, [1.0, 0.0]), (1, [0.0, 1.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "label int, _v array<double>")
    got = {
        r["label"]: r.asDict()
        for r in cohort_centroid_drift(df, "label", "_v", 2).collect()
    }
    # global centroid = (0.5, 0.5); cos((1,0),(0.5,0.5)) = 1/sqrt(2)
    expect = math.floor(
        (0.5 / (1.0 * math.sqrt(0.5))) * 1e6 + 0.5
    )
    assert got[0]["n_vecs"] == 2 and got[0]["drift_ppm"] == expect
    assert got[1]["drift_ppm"] == expect  # symmetric

    # a single-cohort corpus: centroid IS the global mean -> exactly 1e6
    one = spark.createDataFrame(
        [(7, [3.0, 4.0]), (7, [3.0, 4.0])], "label int, _v array<double>"
    )
    m = cohort_centroid_drift(one, "label", "_v", 2).collect()[0]
    assert m["drift_ppm"] == 1000000


def test_cohort_centroid_merge_law(spark):
    """merge(state(a), state(b)) == state(a ∪ b) exactly, and the
    drift readout from the merged state equals the one-shot face."""
    import random

    from hr_moderndatapipeline_spark.operators.similarity import (
        cohort_centroid_drift,
        cohort_centroid_merge,
        cohort_centroid_state,
        cohort_drift_from_state,
    )

    rng = random.Random(411)
    rows = [
        (i % 3, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
        for i in range(60)
    ]
    schema = "label int, _v array<double>"
    full = spark.createDataFrame(rows, schema)
    a = spark.createDataFrame(rows[:37], schema)
    b = spark.createDataFrame(rows[37:], schema)

    state_full = {
        (r["label"], r["pos"]): (str(r["sx"]), r["n"])
        for r in cohort_centroid_state(full, "label", "_v").collect()
    }
    merged_df = cohort_centroid_merge(
        cohort_centroid_state(a, "label", "_v"),
        cohort_centroid_state(b, "label", "_v"),
    )
    state_merged = {
        (r["label"], r["pos"]): (str(r["sx"]), r["n"])
        for r in merged_df.collect()
    }
    assert state_merged == state_full  # exact decimal equality

    one_shot = sorted(
        tuple(r) for r in cohort_centroid_drift(full, "label", "_v", 4).collect()
    )
    from_state = sorted(
        tuple(r) for r in cohort_drift_from_state(merged_df, 4).collect()
    )
    assert from_state == one_shot


def test_stratified_ate_hand_computed(spark):
    from hr_moderndatapipeline_spark.operators.experiments import (
        stratified_ate,
    )

    rows = [
        # stratum A: treat mean 30, ctrl mean 10 -> diff 20e6 micro
        ("A", 1, 20), ("A", 1, 40), ("A", 0, 10),
        # stratum B: treat mean 5, ctrl mean 8 -> diff -3e6 micro
        ("B", 1, 5), ("B", 0, 8),
        # stratum C: control-only -> NULL diff, excluded from ATE
        ("C", 0, 100), ("C", 0, 200),
    ]
    df = spark.createDataFrame(rows, "stratum string, treat int, v int")
    got = {
        r["stratum"]: r.asDict()
        for r in stratified_ate(df, "stratum", "treat", "v").collect()
    }
    a, b, c = got["A"], got["B"], got["C"]
    assert (a["n"], a["n1"], a["n0"], a["sum1"], a["sum0"]) == (3, 2, 1, 60, 10)
    assert a["diff_micro"] == 20_000_000
    # negative diff truncates toward zero identically on both engines
    assert b["diff_micro"] == -3_000_000
    assert c["diff_micro"] is None
    # ATE over A (n=3) and B (n=2): (3*20e6 + 2*(-3e6)) DIV 5
    expect = (3 * 20_000_000 + 2 * -3_000_000) // 5
    assert a["ate_micro"] == b["ate_micro"] == c["ate_micro"] == expect


def test_stratified_ate_negative_total_truncates_toward_zero(spark):
    from hr_moderndatapipeline_spark.operators.experiments import (
        stratified_ate,
    )

    # one stratum, negative effect with a non-exact division:
    # diff = (0*2 - 5*1)*1e6 DIV 2 = -2500000; ate over n=3 strata rows
    rows = [("X", 1, 0), ("X", 0, 2), ("X", 0, 3)]
    df = spark.createDataFrame(rows, "stratum string, treat int, v int")
    m = stratified_ate(df, "stratum", "treat", "v").collect()[0].asDict()
    # sum1=0 n1=1, sum0=5 n0=2 -> (0*2 - 5*1)*1e6 DIV 2 = -2500000
    assert m["diff_micro"] == -2_500_000
    # cn = 3 * -2500000 = -7500000, nn = 3 -> trunc(-2500000)
    assert m["ate_micro"] == -2_500_000
