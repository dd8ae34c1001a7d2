"""Product quantization: encode/probe round trip, recall vs exact
search, compression contract, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.pq import (
    pq_codebooks,
    pq_encode,
    pq_probe,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_ip_topk(queries_rows, corpus_rows, k=10):
    """Pure-numpy exact inner-product top-k (self included) — the
    same metric pq_probe approximates, so recall is apples-to-apples."""
    import numpy as np

    qi = [r["vec_id"] for r in queries_rows]
    qv = np.array([r["embedding"] for r in queries_rows], dtype=float)
    ci = np.array([r["vec_id"] for r in corpus_rows])
    cv = np.array([r["embedding"] for r in corpus_rows], dtype=float)
    scores = qv @ cv.T
    out = {}
    for row, q in enumerate(qi):
        top = np.argsort(-scores[row])[:k]
        out[q] = set(int(ci[j]) for j in top)
    return out


def test_pq_encode_shape_and_determinism(spark):
    emb = _emb(spark)
    cb = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=8, k=16)
    assert cb.count() == 8 * 16
    enc1 = pq_encode(emb, cb, "vec_id", "embedding", dim=64, m=8)
    enc2 = pq_encode(emb, cb, "vec_id", "embedding", dim=64, m=8)
    rows1 = {r["vec_id"]: tuple(r["codes"]) for r in enc1.collect()}
    rows2 = {r["vec_id"]: tuple(r["codes"]) for r in enc2.collect()}
    assert rows1 == rows2  # deterministic end to end
    assert all(len(c) == 8 for c in rows1.values())
    assert all(0 <= x < 16 for c in rows1.values() for x in c)
    assert len(rows1) == emb.count()


def test_pq_probe_recall_beats_random_and_finds_self(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)  # 20 queries
    cb = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=8, k=16)
    enc = pq_encode(emb, cb, "vec_id", "embedding", dim=64, m=8)
    got = pq_probe(queries, enc, cb, "vec_id", "embedding", k=10, dim=64, m=8)
    approx = {}
    for r in got.collect():
        approx.setdefault(r["q_id"], set()).add(r["c_id"])
    assert all(len(v) == 10 for v in approx.values())

    exact = _exact_ip_topk(queries.collect(), emb.collect(), k=10)

    recalls = [len(approx[q] & exact[q]) / 10 for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    # random 10-of-500 would overlap ~0.02; PQ must be far above it
    assert mean_recall >= 0.3, f"mean recall {mean_recall}"
    # the quantized query should still retrieve itself (top-10)
    self_hits = sum(1 for q in approx if q in approx[q])
    assert self_hits >= len(approx) * 0.8


def test_pq_codebook_requires_enough_vectors(spark):
    tiny = _emb(spark).limit(5)
    try:
        pq_codebooks(tiny, "vec_id", "embedding", dim=64, m=8, k=16)
        raise AssertionError("k > corpus must fail loudly")
    except ValueError as e:
        assert "training vectors" in str(e)


def test_ivfpq_prunes_cells_and_keeps_recall(spark):
    from hr_moderndatapipeline_spark.operators.pq import ivfpq_index, ivfpq_probe
    from hr_moderndatapipeline_spark.operators.similarity import ivf_codebook

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    ivf_cb = ivf_codebook(emb, "vec_id", "embedding", dim=64, n_centroids=8)
    pq_cb = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=8, k=16)
    idx = ivfpq_index(emb, ivf_cb, pq_cb, "vec_id", "embedding", dim=64, m=8)
    assert idx.count() == emb.count()
    assert set(idx.columns) == {"vec_id", "cid", "codes"}

    got = ivfpq_probe(
        queries, idx, ivf_cb, pq_cb, "vec_id", "embedding",
        k=10, nprobe=4, dim=64, m=8,
    )
    approx = {}
    for r in got.collect():
        approx.setdefault(r["q_id"], set()).add(r["c_id"])
    assert len(approx) == queries.count()

    # pruning is real: nprobe=4 of 8 cells -> candidates are a strict
    # subset of the corpus for at least some query
    full_pq_cells = idx.select("cid").distinct().count()
    assert full_pq_cells == 8

    exact = _exact_ip_topk(queries.collect(), emb.collect(), k=10)
    recalls = [len(approx[q] & exact[q]) / 10 for q in exact]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.2, f"mean recall {mean_recall}"

    # widening nprobe to ALL cells must match plain-PQ behavior
    # (same codes, no cells excluded) and never lower recall
    got_all = ivfpq_probe(
        queries, idx, ivf_cb, pq_cb, "vec_id", "embedding",
        k=10, nprobe=8, dim=64, m=8,
    )
    approx_all = {}
    for r in got_all.collect():
        approx_all.setdefault(r["q_id"], set()).add(r["c_id"])
    recalls_all = [len(approx_all[q] & exact[q]) / 10 for q in exact]
    assert sum(recalls_all) / len(recalls_all) >= mean_recall


def test_ivfpq_rerank_recall_beats_adc_shortlist(spark):
    """The exact re-rank stage must never lower recall vs taking the
    ADC top-10 directly, and the self-vector must rank FIRST (an
    exact dot of a vector with itself beats every other candidate in
    its shortlist)."""
    from hr_moderndatapipeline_spark.operators.pq import (
        ivfpq_index,
        ivfpq_probe,
        ivfpq_rerank,
    )
    from hr_moderndatapipeline_spark.operators.similarity import ivf_codebook

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    ivf_cb = ivf_codebook(emb, "vec_id", "embedding", dim=64, n_centroids=8)
    pq_cb = pq_codebooks(emb, "vec_id", "embedding", dim=64, m=8, k=16)
    idx = ivfpq_index(emb, ivf_cb, pq_cb, "vec_id", "embedding", dim=64, m=8)

    adc = {}
    for r in ivfpq_probe(
        queries, idx, ivf_cb, pq_cb, "vec_id", "embedding",
        k=10, nprobe=4, dim=64, m=8,
    ).collect():
        adc.setdefault(r["q_id"], set()).add(r["c_id"])
    rr_rows = ivfpq_rerank(
        queries, idx, ivf_cb, pq_cb, emb, "vec_id", "embedding",
        k=10, shortlist=50, nprobe=4, dim=64, m=8,
    ).collect()
    rr = {}
    first = {}
    for r in rr_rows:
        rr.setdefault(r["q_id"], set()).add(r["c_id"])
        if r["rk"] == 1:
            first[r["q_id"]] = r["c_id"]

    exact = _exact_ip_topk(queries.collect(), emb.collect(), k=10)
    rec_adc = sum(len(adc[q] & exact[q]) for q in exact) / (10 * len(exact))
    rec_rr = sum(len(rr[q] & exact[q]) for q in exact) / (10 * len(exact))
    assert rec_rr >= rec_adc, (rec_rr, rec_adc)
    assert rec_rr >= 0.5, f"re-rank recall {rec_rr}"
    # the query's own vector is in its shortlist (self is the nearest
    # cell + exact ADC self-score is high) => exact re-rank puts it first
    self_first = sum(1 for q, c in first.items() if q == c)
    assert self_first >= len(first) * 0.9
