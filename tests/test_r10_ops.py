"""Round-10 operators: literal-centroid k-means (shuffle-free Lloyd
assignment), cluster-balanced selection, RRF hybrid retrieval, MMR
diversified rerank, purged temporal split, WOE binning, rank-sum AUC,
and the DiD experiment readout."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.similarity import (
    _py_seq_l2,
    as_double_vec,
    centroid_assign_literal,
    ivf_codebook,
    kmeans_refine,
    kmeans_train,
    l2_norm,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_kmeans_train_equals_refine(spark):
    """The literal-centroid training loop is bit-identical to the
    crossJoin+rank-window face on the same seeds: same rounded
    cosines, same argmax tie-break, same DECIMAL means."""
    emb = _emb(spark)
    got = kmeans_train(emb, "vec_id", "embedding", dim=64, k=8, iterations=2)
    seeds = ivf_codebook(
        emb, "vec_id", "embedding", dim=64, n_centroids=8, refine_iterations=0
    )
    ref = kmeans_refine(emb, "vec_id", "embedding", seeds, 64, iterations=2)
    ref_l = sorted(
        (int(r["cluster"]), [float(x) for x in r["_cv"]]) for r in ref.collect()
    )
    assert got == ref_l


def test_kmeans_train_zero_iterations_returns_seeds(spark):
    emb = _emb(spark)
    got = kmeans_train(emb, "vec_id", "embedding", dim=64, k=4, iterations=0)
    seeds = sorted(
        (int(r["cluster"]), [float(x) for x in r["_cv"]])
        for r in ivf_codebook(
            emb, "vec_id", "embedding", dim=64, n_centroids=4
        ).collect()
    )
    assert got == seeds


def test_centroid_assign_literal_matches_python_argmax(spark):
    """Argmax + lower-cluster tie-break pinned against a plain Python
    reference, including an exact-tie centroid pair (clusters 1 and 2
    are identical vectors — the rounded cosines tie and the LOWER id
    must win)."""
    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.5, 0.5, 0.0, 0.0]),
        (2, [0.0, 0.1, 0.9, 0.0]),
        (3, [0.2, 0.2, 0.2, 0.2]),
    ]
    cents = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),  # duplicate of 1 — forces the tie
    ]
    df = spark.createDataFrame(rows, "vid int, v array<double>")
    vecs = df.select(
        "vid", as_double_vec(F.col("v")).alias("_v")
    ).withColumn("_vn", l2_norm(F.col("_v"), dim))
    got = {
        r["vid"]: (r["cluster"], r["_cos"])
        for r in centroid_assign_literal(vecs, cents, dim).collect()
    }

    def pyref(v):
        vn = _py_seq_l2(v)
        best = None
        for cid, cv in cents:
            cn = _py_seq_l2(cv)
            acc = 0.0
            for a, b in zip(v, cv):
                acc = acc + a * b
            cos = round(acc / (vn * cn), 6)
            # round() HALF_EVEN vs Spark HALF_UP differ only at exact
            # .5 ulp boundaries, absent from this fixture
            if best is None or cos > best[1] or (cos == best[1] and cid < best[0]):
                best = (cid, cos)
        return best

    for vid, v in rows:
        assert got[vid] == pyref(v), vid
    # the tie case specifically: vector 2 is nearest the duplicated
    # centroid — cluster 1 (not 2) must be chosen
    assert got[2][0] == 1


def test_kmeans_balanced_selection_invariants(spark):
    from hr_moderndatapipeline_spark.queries.dataops import (
        q_kmeans_balanced_selection,
    )

    sel = q_kmeans_balanced_selection(spark, SF_DIR).collect()
    per_cluster: dict[int, list[int]] = {}
    for r in sel:
        per_cluster.setdefault(r["cluster"], []).append(r["sel_rank"])
    assert per_cluster, "no clusters selected"
    for cid, ranks in per_cluster.items():
        assert len(ranks) <= 25, cid
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), cid


def test_hybrid_rrf_search_fusion_arithmetic(spark):
    from hr_moderndatapipeline_spark.queries.dataops import q_hybrid_rrf_search

    out = q_hybrid_rrf_search(spark, SF_DIR).collect()
    assert 0 < len(out) <= 20
    prev = None
    for r in out:
        for c in ("lex_rank", "dense_rank"):
            assert 0 <= r[c] <= 50, (c, r)
        expect = (1_000_000_000 // (60 + r["lex_rank"]) if r["lex_rank"] else 0) + (
            1_000_000_000 // (60 + r["dense_rank"]) if r["dense_rank"] else 0
        )
        assert r["rrf_ppb"] == expect, r
        assert r["lex_rank"] or r["dense_rank"], r
        key = (r["rrf_ppb"], r["doc_id"])
        if prev is not None:
            assert key < prev, "output not (rrf desc, doc_id desc) ordered"
        prev = key


def test_mmr_rerank_properties():
    from hr_moderndatapipeline_spark.operators.similarity import mmr_rerank

    # doc 11 duplicates doc 10 (the top-relevance vector): pure
    # relevance would rank it second; MMR must defer it for the
    # orthogonal doc 12.
    shortlist = [
        (10, 0.99, [1.0, 0.0, 0.0]),
        (11, 0.98, [1.0, 0.0, 0.0]),
        # 0.7·0.98 − 0.3·1.0 = 0.386 for the duplicate; 0.7·0.60 =
        # 0.42 for the orthogonal doc — diversity must win
        (12, 0.60, [0.0, 1.0, 0.0]),
        (13, 0.40, [0.0, 0.0, 1.0]),
    ]
    picks = mmr_rerank(shortlist, dim=3, select=4, lam=0.7)
    ids = [p[0] for p in picks]
    assert len(set(ids)) == 4
    assert ids[0] == 10  # first pick = max relevance
    assert picks[0][3] == 0.0  # empty selected set ⇒ zero penalty
    assert ids[1] == 12, "duplicate of the top pick must be deferred"
    assert [p[1] for p in picks] == [1, 2, 3, 4]
    # λ=1.0 degenerates to pure relevance order
    rel_only = mmr_rerank(shortlist, dim=3, select=4, lam=1.0)
    assert [p[0] for p in rel_only] == [10, 11, 12, 13]


def test_mmr_rerank_tie_breaks_to_higher_id():
    from hr_moderndatapipeline_spark.operators.similarity import mmr_rerank

    shortlist = [
        (1, 0.9, [1.0, 0.0]),
        (2, 0.9, [0.0, 1.0]),  # identical relevance — higher id wins
    ]
    picks = mmr_rerank(shortlist, dim=2, select=1, lam=0.7)
    assert picks[0][0] == 2


def test_purged_time_split_boundaries(spark):
    from hr_moderndatapipeline_spark.operators.sampling import (
        purged_time_split,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-19 23:59:59"),
            (2, "2024-01-20 00:00:00"),  # boundary: purged, not train
            (3, "2024-01-21 12:00:00"),
            (4, "2024-01-22 00:00:00"),  # boundary: test, not purged
            (5, "2024-01-25 00:00:00"),
        ],
        "id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["id"]: r["split"]
        for r in purged_time_split(
            df, "ts", "2024-01-20 00:00:00", "2024-01-22 00:00:00"
        ).collect()
    }
    assert got == {1: "train", 2: "purged", 3: "purged", 4: "test", 5: "test"}


def test_spend_decile_woe_invariants(spark):
    from hr_moderndatapipeline_spark.queries.dataops import q_spend_decile_woe
    from hr_moderndatapipeline_spark.sources.readers import load_table

    rows = q_spend_decile_woe(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sorted(r["decile"] for r in rows) == list(range(1, 11))
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 0 <= r["n_returners"] <= r["n_customers"]
        assert r["woe_micro_nat"] is not None
        assert r["iv_micro_nat"] is not None


def test_py_seq_l2_matches_spark_fold(spark):
    vec = [0.1, -2.5, 3.75, 0.0, 1e-7, 42.0]
    got = _py_seq_l2(vec)
    spark_val = spark.createDataFrame(
        [(vec,)], "v array<double>"
    ).select(l2_norm(as_double_vec(F.col("v")), len(vec)).alias("n")).collect()[0]["n"]
    assert got == spark_val
    assert got == math.sqrt(sum(x * x for x in vec))  # no cancellation here


def test_rank_sum_auc_matches_bruteforce_pairwise(spark):
    """Tie-averaged AUC from the two opposite-tiebreak rank sums ==
    the O(pos·neg) pairwise definition, on seeded random frames WITH
    heavy score ties."""
    import random

    from hr_moderndatapipeline_spark.operators.experiments import rank_sum_auc

    rng = random.Random(421)
    for trial in range(3):
        rows = [
            (i, rng.randrange(0, 8), rng.randrange(0, 2))  # few score levels → many ties
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "id bigint, score bigint, y bigint")
        got = rank_sum_auc(df, "id", "score", "y").collect()[0]
        pos = [s for _, s, y in rows if y == 1]
        neg = [s for _, s, y in rows if y == 0]
        u2_ref = sum(
            2 if p > n else (1 if p == n else 0) for p in pos for n in neg
        )
        assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg), trial
        assert got["u2"] == u2_ref, trial
        assert got["auc_ppm"] == u2_ref * 1_000_000 // (2 * len(pos) * len(neg))
        assert got["gini_ppm"] == u2_ref * 1_000_000 // (len(pos) * len(neg)) - 1_000_000


def test_did_readout_matches_python_reference(spark):
    from hr_moderndatapipeline_spark.operators.experiments import did_readout

    rows = [
        # (treat, post, value)
        (1, 0, 10), (1, 0, 14), (1, 1, 30), (1, 1, 34),
        (0, 0, 5), (0, 1, 9), (0, 1, 11),
    ]
    df = spark.createDataFrame(rows, "treat int, post int, vm bigint")
    got = did_readout(df, "treat", "post", "vm").collect()[0]
    assert (
        got["n_treat_pre"], got["n_treat_post"], got["n_ctrl_pre"], got["n_ctrl_post"]
    ) == (2, 2, 1, 2)
    did_ref = (64 / 2 - 24 / 2) - (20 / 2 - 5 / 1)
    assert got["did_estimate"] == did_ref


def test_logrank_test_matches_python_reference(spark):
    """O/E/V/chi² pinned against a direct-formula Python loop (same
    ascending-t accumulation order) on seeded random right-censored
    two-group subjects, including duration ties and censor-only
    times."""
    import random

    from hr_moderndatapipeline_spark.operators.relational import logrank_test

    rng = random.Random(99)
    rows = [
        (rng.randrange(0, 2), rng.randrange(0, 10), rng.randrange(0, 2))
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "g int, dur bigint, ev int")
    got = logrank_test(df, "dur", "ev", "g").collect()[0]

    from collections import defaultdict

    per_t = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d0, c0
    for g, t, e in rows:
        idx = (0 if e else 1) + (0 if g == 1 else 2)
        per_t[t][idx] += 1
    n1 = sum(1 for g, _, _ in rows if g == 1)
    n0 = len(rows) - n1
    o1 = sum(1 for g, _, e in rows if g == 1 and e == 1)
    e1 = v = 0.0
    for t in sorted(per_t):
        d1, c1, d0, c0 = per_t[t]
        n, d = n1 + n0, d1 + d0
        e1 = e1 + (float(d) * float(n1)) / float(n)
        if n > 1:
            v = v + (
                (float(d) * float(n1)) / float(n) * (float(n0) / float(n))
            ) * (float(n - d) / float(n - 1))
        n1 -= d1 + c1
        n0 -= d0 + c0
    assert (got["n_treat"] + got["n_ctrl"]) == len(rows)
    assert got["o_treat"] == o1
    assert got["e_treat"] == e1
    assert got["var_treat"] == v
    assert got["chi2"] == ((o1 - e1) * (o1 - e1)) / v


def test_value_qte_readout_matches_python_quantiles(spark):
    """The per-variant p25/p50/p75 (lower-value convention at
    0-based rank (n−1)·p DIV 100) and their treat−control diffs,
    re-derived in plain Python from the same events slice."""
    from hr_moderndatapipeline_spark.queries.core import q_value_qte_readout
    from hr_moderndatapipeline_spark.sources.readers import load_table

    got = q_value_qte_readout(spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events").collect()
    import datetime

    cut = datetime.datetime(2024, 1, 15)
    by_variant = {0: [], 1: []}
    for r in ev:
        if r["ts"] >= cut:
            by_variant[r["user_id"] % 2].append(
                (int(round(r["value"] * 1000)), r["event_id"])
            )
    pref = {}
    for var, vals in by_variant.items():
        vals.sort()
        n = len(vals)
        pref[var] = {
            p: vals[(n - 1) * p // 100][0] for p in (25, 50, 75)
        }
    assert got["n_treat"] == len(by_variant[1])
    assert got["n_ctrl"] == len(by_variant[0])
    for p in (25, 50, 75):
        assert got[f"qte_p{p}_milli"] == pref[1][p] - pref[0][p], p


def test_histogram_psi_matches_python_reference(spark):
    from hr_moderndatapipeline_spark.operators.diagnostics import histogram_psi

    ha = spark.createDataFrame(
        [(0, 50), (1, 30), (2, 20)], "bin_idx int, cnt bigint"
    )
    hb = spark.createDataFrame(
        [(0, 10), (1, 40), (3, 50)], "bin_idx int, cnt bigint"
    )
    got = histogram_psi(ha, hb, nbins=8).collect()[0]
    import math

    na, nb, half = 100.0, 100.0, 8 * 0.5
    counts = {0: (50, 10), 1: (30, 40), 2: (20, 0), 3: (0, 50)}
    psi = 0
    for ca, cb in counts.values():
        pa = (ca + 0.5) / (na + half)
        pb = (cb + 0.5) / (nb + half)
        psi += math.floor((pa - pb) * math.log(pa / pb) * 1000000.0 + 0.5)
    assert (got["n_a"], got["n_b"]) == (100, 100)
    assert got["psi_micro_nat"] == psi
    # identical histograms ⇒ exactly zero
    same = histogram_psi(ha, ha, nbins=8).collect()[0]
    assert same["psi_micro_nat"] == 0


def test_ks_two_sample_matches_python_ecdf(spark):
    """KS numerator pinned against a brute-force ECDF scan on seeded
    random two-group samples, including heavy value ties."""
    import random

    from hr_moderndatapipeline_spark.operators.experiments import ks_two_sample

    rng = random.Random(7)
    rows = [
        ("t%d" % (i % 2), rng.randrange(0, 2), rng.randrange(0, 12))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, variant int, vm bigint")
    got = {r["g"]: r for r in ks_two_sample(df, "g", "variant", "vm").collect()}
    for gname in ("t0", "t1"):
        s1 = sorted(v for g, var, v in rows if g == gname and var == 1)
        s0 = sorted(v for g, var, v in rows if g == gname and var == 0)
        n1, n0 = len(s1), len(s0)
        values = sorted(set(s1) | set(s0))
        ks_num = max(
            abs(
                sum(1 for x in s1 if x <= v) * n0
                - sum(1 for x in s0 if x <= v) * n1
            )
            for v in values
        )
        r = got[gname]
        assert (r["n_treat"], r["n_ctrl"]) == (n1, n0), gname
        assert r["ks_num"] == ks_num, gname
        assert r["ks_ppm"] == ks_num * 1_000_000 // max(n1 * n0, 1), gname


def test_purchase_uplift_qini_invariants(spark):
    from hr_moderndatapipeline_spark.queries.core import q_purchase_uplift_qini
    from hr_moderndatapipeline_spark.sources.readers import load_table

    rows = sorted(
        q_purchase_uplift_qini(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    last = rows[-1]
    assert last["n_treat_cum"] + last["n_ctrl_cum"] == n_users
    prev = None
    for r in rows:
        for c in ("n_treat_cum", "n_ctrl_cum", "resp_treat_cum", "resp_ctrl_cum"):
            assert r[c] >= 0
            if prev is not None:
                assert r[c] >= prev[c], c  # cumulative monotone
        assert r["resp_treat_cum"] <= r["n_treat_cum"]
        assert r["resp_ctrl_cum"] <= r["n_ctrl_cum"]
        import math

        qini = float(r["resp_treat_cum"]) - float(r["resp_ctrl_cum"]) * (
            float(r["n_treat_cum"]) / float(r["n_ctrl_cum"])
        )
        assert r["qini_micro"] == math.floor(qini * 1000000.0 + 0.5)
        prev = r


def test_bm25_batch_equals_single_query(spark):
    """Each query's batched top-n equals the single-query bm25_rank
    run separately — same scores, same (bm25_micro desc, id desc)
    order."""
    from hr_moderndatapipeline_spark.operators.text import (
        bm25_rank,
        bm25_rank_batch,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = [
        ("qa", ["scan", "filter"]),
        ("qb", ["window", "merge", "stream"]),
    ]
    got = bm25_rank_batch(docs, "doc_id", "text", batch, top_n=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rk"], r["doc_id"], r["n_terms_matched"], r["bm25_micro"])
        )
    for qid, terms in batch:
        single = bm25_rank(docs, "doc_id", "text", terms, top_n=10).collect()
        want = [
            (i + 1, r["doc_id"], r["n_terms_matched"], r["bm25_micro"])
            for i, r in enumerate(single)
        ]
        assert sorted(by_q[qid]) == sorted(want), qid


def test_hybrid_rrf_multi_fusion_arithmetic(spark):
    from hr_moderndatapipeline_spark.queries.dataops import (
        q_hybrid_rrf_multi_search,
    )

    out = q_hybrid_rrf_multi_search(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"q_scan_filter", "q_stream_join", "q_window_merge"}
    for qid, rows in by_q.items():
        assert 0 < len(rows) <= 20, qid
        rows.sort(key=lambda r: r["rk"])
        prev = None
        for r in rows:
            expect = (
                1_000_000_000 // (60 + r["lex_rank"]) if r["lex_rank"] else 0
            ) + (
                1_000_000_000 // (60 + r["dense_rank"]) if r["dense_rank"] else 0
            )
            assert r["rrf_ppb"] == expect, (qid, r)
            assert r["lex_rank"] or r["dense_rank"], (qid, r)
            key = (r["rrf_ppb"], r["doc_id"])
            if prev is not None:
                assert key < prev, (qid, "not (rrf desc, doc_id desc) ordered")
            prev = key


def test_nelson_aalen_matches_python_reference(spark):
    """H(t) pinned against a direct Python loop in the same
    ascending-t accumulation order, with ties + censoring; and the
    KM/NA consistency identity S(t) ≥ exp(−H(t)) spot-checked via
    per-step hazards summing to the same d/n sequence."""
    from hr_moderndatapipeline_spark.operators.relational import nelson_aalen

    rows = [(1, 1), (1, 1), (2, 0), (2, 1), (3, 1), (5, 0), (5, 0), (6, 1)]
    df = spark.createDataFrame(rows, "dur bigint, ev int")
    got = sorted(
        nelson_aalen(df, "dur", "ev").collect(), key=lambda r: r["t"]
    )
    n, h, want = len(rows), 0.0, []
    from collections import Counter

    per_t = sorted(
        {
            t: (
                sum(1 for d, e in rows if d == t and e == 1),
                sum(1 for d, e in rows if d == t and e == 0),
            )
            for t, _ in rows
        }.items()
    )
    for t, (d, c) in per_t:
        h = h + float(d) / float(n)
        want.append((t, n, d, c, h))
        n -= d + c
    assert [
        (r["t"], r["n_at_risk"], r["n_events"], r["n_censored"], r["cum_hazard"])
        for r in got
    ] == want
