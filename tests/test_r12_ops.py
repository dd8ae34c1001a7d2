"""Round-12 operator pins: the edge-publish lifecycle (VERDICT r11
#1) and LPA early-stop (VERDICT r11 #6).

Equality discipline: both new faces must be BIT-IDENTICAL to the
existing fixed faces — publish/load is semantics-preserving
materialization, and early-stop only skips rounds that are provably
the identity (a synchronous fixed point).
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from hr_moderndatapipeline_spark.operators.graph import (
    label_propagation,
    label_propagation_from_published,
    load_published_edges,
    publish_edges,
    symmetrize_edges,
)


def _edges(spark, seed=12, n=120):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(0, 30) * 2, rng.randrange(0, 12) * 2 + 1)
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_publish_edges_is_symmetrized_distinct(spark, tmp_path):
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (3, 4)], "src bigint, dst bigint"
    )
    path = str(tmp_path / "sym")
    publish_edges(e, path)
    got = sorted(tuple(r) for r in load_published_edges(spark, path).collect())
    assert got == [(1, 2), (2, 1), (3, 4), (4, 3)]
    # and it equals the shared symmetrize face exactly
    inline = sorted(tuple(r) for r in symmetrize_edges(e).collect())
    assert got == inline


def test_lpa_from_published_equals_inline(spark, tmp_path):
    """The published-table face and the inline face are the same pure
    integer function of the edge set — exact (vertex, label) equality,
    the pin behind communities_published_edges sharing the inline
    query's unrolled-CTE oracle."""
    e = _edges(spark)
    path = str(tmp_path / "pub")
    publish_edges(e, path)
    for rounds in (1, 5):
        inline = sorted(
            tuple(r)
            for r in label_propagation(e, iterations=rounds).collect()
        )
        published = sorted(
            tuple(r)
            for r in label_propagation_from_published(
                spark, path, iterations=rounds
            ).collect()
        )
        assert published == inline and len(inline) > 0


def _count_checkpoints(monkeypatch, spark):
    """Patch localCheckpoint on the CONCRETE DataFrame class (pyspark
    4 instances are pyspark.sql.classic.dataframe.DataFrame; patching
    the abstract pyspark.sql.DataFrame never intercepts)."""
    calls = {"n": 0}
    cls = type(spark.range(1))
    orig = cls.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return orig(self, eager=eager)

    monkeypatch.setattr(cls, "localCheckpoint", counting)
    return calls


def test_lpa_early_stop_identical_and_skips_dead_rounds(spark, monkeypatch):
    """Triangle graph converges to the all-min label in 3 synchronous
    rounds; afterwards every round is the identity. early_stop=True
    must (a) return exactly the fixed-count result and (b) actually
    stop — observed via the per-round checkpoint count staying far
    below the requested 40 rounds."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src bigint, dst bigint"
    )
    fixed = sorted(
        tuple(r) for r in label_propagation(e, iterations=40).collect()
    )
    calls = _count_checkpoints(monkeypatch, spark)
    early = sorted(
        tuple(r)
        for r in label_propagation(e, iterations=40, early_stop=True).collect()
    )
    assert early == fixed == [(1, 1), (2, 1), (3, 1)]
    # 1 sym checkpoint + one per executed round; convergence detection
    # needs the first all-identity round, so ~5 — never the 40 asked for
    assert calls["n"] <= 8, f"early stop did not stop: {calls['n']} checkpoints"


def test_lpa_early_stop_never_fires_on_oscillation(spark, monkeypatch):
    """The documented bipartite hazard: an isolated edge's two
    vertices swap labels every round, so _changed never reaches 0 —
    early_stop must run the full fixed count and return the identical
    (phase-dependent) result as the fixed face."""
    e = spark.createDataFrame([(10, 11)], "src bigint, dst bigint")
    for rounds in (4, 5):
        fixed = sorted(
            tuple(r)
            for r in label_propagation(e, iterations=rounds).collect()
        )
        calls = _count_checkpoints(monkeypatch, spark)
        early = sorted(
            tuple(r)
            for r in label_propagation(
                e, iterations=rounds, early_stop=True
            ).collect()
        )
        assert early == fixed
        # sym checkpoint + one per round: it ran every round
        assert calls["n"] == rounds + 1
        monkeypatch.undo()


def test_lpa_early_stop_isolated_vertexless_graph(spark):
    """Empty edge set: both faces return empty, early_stop exits on
    the first (vacuously unchanged) round without error."""
    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert label_propagation(e, iterations=3).count() == 0
    assert label_propagation(e, iterations=3, early_stop=True).count() == 0


def test_bm25_probe_prunes_published_term_partitions(spark, tmp_path):
    """Plan-gate for the bm25_probe pruning claim (VERDICT r11 #4):
    the 13× probe win rests on '_t IN (...)' becoming PARTITION
    pruning on a term-partitioned published index. Pin BOTH faces of
    that mechanism so a future change that silently rescans all
    postings fails CI:

    - plan text: the probe's scan carries a PartitionFilters entry
      on _t (not a post-scan Filter),
    - runtime: the scan's numFiles SQLMetric counts ONLY the queried
      terms' partitions (+ the 1 stats file), while the published
      index holds one file per vocabulary term.
    """
    from hr_moderndatapipeline_spark.functions.execmetrics import files_read
    from hr_moderndatapipeline_spark.operators.text import (
        bm25_index,
        bm25_probe,
    )

    # 30 docs over a 40-term vocabulary — every term appears
    rng = random.Random(7)
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{rng.randrange(40)}" for _ in range(25))
             + " " + f"t{i % 40}")
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    postings, stats = bm25_index(docs, "doc_id", "text")
    # one file per term directory: hash-cluster by _t before the
    # partitioned write (the publish recipe the operator documents)
    (
        postings.repartition("_t")
        .write.partitionBy("_t")
        .mode("overwrite")
        .parquet(str(tmp_path / "postings"))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stats"))

    stored_p = spark.read.parquet(str(tmp_path / "postings"))
    stored_s = spark.read.parquet(str(tmp_path / "stats"))
    # negative control: an unpruned pass opens every term partition
    stored_p.collect()
    total_files = files_read(stored_p)
    assert total_files >= 40, f"expected ≥40 published files, saw {total_files}"

    qmap = [("q0", ["t1", "t2"]), ("q1", ["t3"])]
    probe = bm25_probe(stored_p, stored_s, "doc_id", qmap)
    rows = probe.collect()
    assert rows, "probe returned nothing — fixture broken"

    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf_lines = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "_t" in l and " IN " in l.upper()
    ]
    assert pf_lines, f"no _t IN partition filter in probe scan:\n{plan[:2000]}"

    n_read = files_read(probe)
    # the probe scans the postings TWICE (df recompute + scoring),
    # each pruned to the 3 queried term partitions, + 1 stats file
    # = 7; anything near total_files means the probe rescanned the
    # index
    assert n_read <= 7, (
        f"probe opened {n_read} files — pruning lost "
        f"(index holds {total_files})"
    )


def test_pagerank_from_published_equals_inline(spark, tmp_path):
    """Undirected PageRank over the published symmetrized table is
    bit-identical to pagerank() over the symmetrized edge list built
    inline — the published rows are already the both-direction
    distinct edge set, so the two faces run the same power
    iteration over the same relation."""
    from hr_moderndatapipeline_spark.operators.graph import (
        pagerank,
        pagerank_from_published,
    )

    e = _edges(spark, seed=77, n=80)
    path = str(tmp_path / "pr")
    publish_edges(e, path)
    inline = {
        r["vertex"]: r["rank"]
        for r in pagerank(symmetrize_edges(e), iterations=6).collect()
    }
    published = {
        r["vertex"]: r["rank"]
        for r in pagerank_from_published(spark, path, iterations=6).collect()
    }
    assert set(inline) == set(published)
    # same per-vertex contribution multisets -> same double folds
    diffs = [v for v in inline if inline[v] != published[v]]
    # the contribution sum order inside a vertex's aggregate is not
    # deterministic across partitionings, so allow ulp-level noise
    # but require ppb-quantized equality (the driver discipline)
    import math

    assert all(
        math.floor(inline[v] * 1e9 + 0.5) == math.floor(published[v] * 1e9 + 0.5)
        for v in inline
    ), f"ppb divergence on {len(diffs)} vertices"


def test_round_half_up_matches_jvm_at_half_up_boundaries(spark):
    """VERDICT r11 #5 (the _round_half_up portability watch item):
    the kernel equates Python ``repr(x)`` with Java
    ``Double.toString(x)`` shortest-roundtrip digits. Sweep doubles
    ENGINEERED to sit on/next to the .5e-6 HALF_UP boundaries (the
    only place the two algorithms could disagree at digit 6) plus a
    deterministic random band, and compare bit-for-bit against the
    JVM's ``F.round(double, 6)`` in one literal-DataFrame round trip
    — turning the docstring's 'not observed in any pinned corpus'
    into a tested claim."""
    import math
    import struct

    from hr_moderndatapipeline_spark.operators.similarity import (
        _round_half_up,
    )

    def bits(f: float) -> int:
        return struct.unpack("<q", struct.pack("<d", f))[0]

    xs: list[float] = []
    # exact .5 boundaries at digit 6 and their ±3-ulp neighborhoods,
    # across the cosine range and a few magnitudes beyond
    rng = random.Random(1206)
    for _ in range(800):
        n = rng.randrange(-2_000_000, 2_000_000)
        base = (n + 0.5) / 1e6
        x = base
        xs.append(x)
        up, dn = x, x
        for _ in range(3):
            up = math.nextafter(up, math.inf)
            dn = math.nextafter(dn, -math.inf)
            xs.extend((up, dn))
    # random band including subnormal-ish tiny and larger magnitudes
    for _ in range(1500):
        xs.append(rng.uniform(-1.0, 1.0))
        xs.append(rng.uniform(-1e3, 1e3) * 10 ** rng.randrange(-12, 3))
    xs.extend([0.0, -0.0, 1.0, -1.0, 0.9999995, -0.9999995, 5e-7, -5e-7])

    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = df.select(
        F.col("x"), F.round(F.col("x"), 6).alias("r")
    ).collect()
    diverged = [
        (r["x"], r["r"], _round_half_up(r["x"], 6))
        for r in got
        if bits(r["r"]) != bits(_round_half_up(r["x"], 6))
    ]
    assert not diverged, (
        f"{len(diverged)} divergences, first 5: {diverged[:5]}"
    )


def test_communities_published_query_matches_inline_query(spark):
    """Driver-surface pin at sf0.001: the published-edge query's
    histogram equals the inline query's histogram row for row."""
    from hr_moderndatapipeline_spark.queries.dataops import (
        q_communities_from_published_edges,
        q_customer_supplier_communities,
    )

    sf = "/root/testdata/sf0.001"
    inline = sorted(
        tuple(r) for r in q_customer_supplier_communities(spark, sf).collect()
    )
    pub = sorted(
        tuple(r)
        for r in q_communities_from_published_edges(spark, sf).collect()
    )
    assert pub == inline and len(inline) > 0


# ── MinHash index/probe lifecycle (portable face, round-12) ──


def _mh_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


_LOREM = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _mh_one_shot_restricted(corpus, batch, batch_min_id, **kw):
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_dedup_pairs_portable,
    )

    one = minhash_dedup_pairs_portable(
        corpus.unionByName(batch), "doc_id", "text", **kw
    )
    # a < b and batch ids sit above batch_min_id ⇒ b in batch means
    # the pair involves >=1 batch doc ONLY when ids are stratified;
    # for mixed-id fixtures restrict on either side explicitly
    return one.filter(
        (F.col("doc_id_a") >= batch_min_id) | (F.col("doc_id_b") >= batch_min_id)
    )


def _mh_probe(corpus, batch, **kw):
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_index_portable,
        minhash_probe_portable,
    )

    idx_buckets, idx_sets = minhash_index_portable(corpus, "doc_id", "text")
    return minhash_probe_portable(
        batch, idx_buckets, idx_sets, "doc_id", "text", **kw
    )


def test_minhash_probe_equals_one_shot_restricted(spark):
    """The lifecycle law: probe(index(corpus), batch) is BIT-identical
    to the one-shot portable pair query over corpus ∪ batch
    restricted to batch-involving pairs — including batch↔batch
    pairs (docs 101/102 match each other but nothing in the
    corpus)."""
    corpus = _mh_docs(
        spark,
        [(1, _LOREM), (2, _LOREM + " omega"), (3, "one two three four five " * 4)],
    )
    batch = _mh_docs(
        spark,
        [
            (101, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
            (102, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
            (103, _LOREM),
        ],
    )
    got = sorted(tuple(r) for r in _mh_probe(corpus, batch).collect())
    want = sorted(
        tuple(r)
        for r in _mh_one_shot_restricted(corpus, batch, 100).collect()
    )
    assert got == want and len(got) >= 3
    # batch↔batch pair present, corpus↔corpus pair (1,2) absent
    ids = {(a, b) for a, b, _ in got}
    assert (101, 102) in ids and (1, 2) not in ids and (1, 103) in ids


def test_minhash_probe_union_cap_matches_one_shot(spark):
    """The hot-bucket cap is a UNION-population decision: 3 corpus
    copies are under max_bucket=4 alone, but the 2 batch copies push
    the bucket to 5 — BOTH faces must drop it (the probe
    reconstructs the corpus∪batch count from index rows + batch
    rows). With the cap lifted both faces emit all crossing
    pairs."""
    corpus = _mh_docs(spark, [(i, _LOREM) for i in (1, 2, 3)])
    batch = _mh_docs(spark, [(101, _LOREM), (102, _LOREM)])
    capped = sorted(
        tuple(r) for r in _mh_probe(corpus, batch, max_bucket=4).collect()
    )
    want = sorted(
        tuple(r)
        for r in _mh_one_shot_restricted(
            corpus, batch, 100, max_bucket=4
        ).collect()
    )
    assert capped == want == []
    uncapped = sorted(
        tuple(r) for r in _mh_probe(corpus, batch, max_bucket=None).collect()
    )
    want_un = sorted(
        tuple(r)
        for r in _mh_one_shot_restricted(
            corpus, batch, 100, max_bucket=None
        ).collect()
    )
    assert uncapped == want_un and len(uncapped) == 7  # C(5,2) minus (1,2),(1,3),(2,3)


def test_minhash_probe_disjoint_batch_empty(spark):
    """A batch sharing no shingles with the corpus (and internally
    unique) probes to an empty pair set — and short batch docs
    (< shingle_n words) are dropped, not errored."""
    corpus = _mh_docs(spark, [(1, _LOREM), (2, _LOREM + " omega")])
    batch = _mh_docs(
        spark,
        [(101, "aa bb cc dd ee ff gg hh ii jj"), (102, "tiny doc")],
    )
    assert _mh_probe(corpus, batch).count() == 0


# ── ANN recall evaluation (round-12) ──


def test_ann_recall_eval_consistency(spark):
    """The eval must report exactly |bf ∩ approx| per query for every
    brute-force query id, with recall_ppm = hits·1e5 (k=10) — checked
    against an independent Python recomputation from the two leg
    queries' own results."""
    import collections

    from hr_moderndatapipeline_spark.queries.dataops import (
        q_ann_bruteforce_topk,
        q_ann_ivf_topk,
        q_ann_recall_eval,
    )

    sf = "/root/testdata/sf0.001"
    res = {r["q_id"]: r for r in q_ann_recall_eval(spark, sf).collect()}
    bf = [
        (r["q_id"], r["c_id"]) for r in q_ann_bruteforce_topk(spark, sf).collect()
    ]
    ivf = {(r["q_id"], r["c_id"]) for r in q_ann_ivf_topk(spark, sf).collect()}
    qids = {q for q, _ in bf}
    assert set(res) == qids and len(qids) > 0
    want = collections.Counter(q for q, c in bf if (q, c) in ivf)
    for q in qids:
        r = res[q]
        assert r["hits_ivf"] == want.get(q, 0)
        assert 0 <= r["hits_ivf"] <= 10
        assert r["recall_ivf_ppm"] == r["hits_ivf"] * 100000
        assert 0 <= r["hits_lsh"] <= 10
        assert r["recall_lsh_ppm"] == r["hits_lsh"] * 100000


def test_minhash_probe_counts_path_matches_window_path(spark):
    """The published-bucket-counts cap path (the true incremental
    deployment) must equal both the window path and the one-shot
    restriction — including on the cap fixture where the batch
    pushes a bucket over the threshold (corpus count 3 + batch count
    2 > 4) and on an ordinary mixed fixture."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_bucket_counts,
        minhash_index_portable,
        minhash_probe_portable,
    )

    def probe_counts(corpus, batch, **kw):
        ib, iss = minhash_index_portable(corpus, "doc_id", "text")
        counts = minhash_bucket_counts(ib)
        return minhash_probe_portable(
            batch, ib, iss, "doc_id", "text",
            index_bucket_counts=counts, **kw
        )

    corpus = _mh_docs(
        spark,
        [(1, _LOREM), (2, _LOREM + " omega"), (3, "one two three four five " * 4)],
    )
    batch = _mh_docs(
        spark,
        [
            (101, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
            (102, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
            (103, _LOREM),
        ],
    )
    got = sorted(tuple(r) for r in probe_counts(corpus, batch).collect())
    want = sorted(
        tuple(r) for r in _mh_one_shot_restricted(corpus, batch, 100).collect()
    )
    assert got == want and len(got) >= 3

    hot_corpus = _mh_docs(spark, [(i, _LOREM) for i in (1, 2, 3)])
    hot_batch = _mh_docs(spark, [(101, _LOREM), (102, _LOREM)])
    capped = sorted(
        tuple(r)
        for r in probe_counts(hot_corpus, hot_batch, max_bucket=4).collect()
    )
    assert capped == []  # batch pushed the bucket over the union cap


def test_minhash_probe_then_absorb_accumulation_law(spark, tmp_path):
    """Streaming incremental dedup law: after probe-then-absorb of
    crawls B1, B2 (in either order), the union of written pairs
    equals the one-shot portable pair query over corpus ∪ B1 ∪ B2
    restricted to crawl-involving pairs — each pair discovered
    exactly once, when its second member arrives."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_index_portable,
        minhash_probe_then_absorb,
    )

    corpus = _mh_docs(
        spark,
        [(1, _LOREM), (2, "one two three four five " * 4)],
    )
    b1 = _mh_docs(spark, [(101, _LOREM), (102, "aa bb cc dd ee ff gg hh")])
    b2 = _mh_docs(
        spark,
        [(201, _LOREM + " omega"), (202, "aa bb cc dd ee ff gg hh")],
    )

    for order, tag in ((["x", (b1, "b1"), (b2, "b2")], "fwd"),
                       (["x", (b2, "b2"), (b1, "b1")], "rev")):
        root = str(tmp_path / f"idx_{tag}")
        cb, cs = minhash_index_portable(corpus, "doc_id", "text")
        cb.write.mode("overwrite").parquet(f"{root}/buckets/corpus")
        cs.write.mode("overwrite").parquet(f"{root}/sets/corpus")
        for batch, btag in order[1:]:
            minhash_probe_then_absorb(
                spark, batch, root, "doc_id", "text", batch_tag=btag
            )
        got = sorted(
            tuple(r)
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(f"{root}/pairs")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in _mh_one_shot_restricted(
                corpus, b1.unionByName(b2), 100, max_bucket=None
            ).collect()
        )
        assert got == want and len(got) >= 3, (tag, got, want)
        # the cross-crawl pair (102, 202) must be present: discovered
        # by whichever of the two arrived second
        ids = {(a, b) for a, b, _ in got}
        assert (102, 202) in ids and (101, 201) in ids


def test_minhash_probe_then_absorb_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same tag, same rows — checkpoint
    recovery) rewrites the same directories and leaves the
    accumulated pair table unchanged."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_index_portable,
        minhash_probe_then_absorb,
    )

    corpus = _mh_docs(spark, [(1, _LOREM)])
    b1 = _mh_docs(spark, [(101, _LOREM)])
    root = str(tmp_path / "idx")
    cb, cs = minhash_index_portable(corpus, "doc_id", "text")
    cb.write.mode("overwrite").parquet(f"{root}/buckets/corpus")
    cs.write.mode("overwrite").parquet(f"{root}/sets/corpus")
    minhash_probe_then_absorb(spark, b1, root, "doc_id", "text", batch_tag="b1")
    once = sorted(
        tuple(r)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{root}/pairs").collect()
    )
    minhash_probe_then_absorb(spark, b1, root, "doc_id", "text", batch_tag="b1")
    twice = sorted(
        tuple(r)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{root}/pairs").collect()
    )
    assert once == twice == [(1, 101, 1.0)]
