"""Round-13 optimization pins: operator internals rewritten for
performance this round stay bit-identical to the pre-optimization
semantics, and the ADVICE-r12 behavioral fixes hold.

- LPA round body: the single deterministic-mode aggregate equals the
  former count-then-min-struct argmax (and the dropped per-round
  coalesce join is proven dead: mode covers the whole vertex
  universe of a symmetrized substrate).
- winnowing_fingerprints: words longer than the 256-entry power
  table fall back to repeated multiplication instead of raising.
- symmetrize_edges: NULL endpoints never become self-loops.
- rebalance: conf-selected mode (cores | aqe | none).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.graph import (
    _lpa_rounds,
    label_propagation,
    symmetrize_edges,
)
from hr_moderndatapipeline_spark.operators.relational import rebalance
from hr_moderndatapipeline_spark.operators.text import winnowing_fingerprints
from tests.test_r12_opt import _ref_winnowing


def _pre_r13_rounds(sym, iterations):
    """The pre-r13 _lpa_rounds body, verbatim: (vertex, label) count
    groupBy → min(struct(-c, label)) argmax → coalesce left join."""
    verts = sym.select(F.col("src").alias("vertex")).distinct()
    labels = verts.withColumn("label", F.col("vertex")).repartition("vertex")
    for _ in range(iterations):
        nb = (
            sym.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("vertex"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        mode = (
            nb.groupBy("vertex")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("_negc"), F.col("label").alias("_l"))
                ).alias("_best")
            )
            .select("vertex", F.col("_best._l").alias("_new"))
        )
        labels = labels.join(mode, "vertex", "left").select(
            "vertex",
            F.coalesce(F.col("_new"), F.col("label")).alias("label"),
        ).localCheckpoint(eager=True)
    return labels


def _mode_rounds(sym, iterations):
    """The r13 MEASURED NON-CLAIM face: one deterministic-mode
    aggregate per round (bit-identical, slower at sf1 — see the
    _lpa_rounds docstring)."""
    labels = (
        sym.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .repartition("vertex")
    )
    for _ in range(iterations):
        labels = (
            sym.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("vertex"))
            .agg(F.mode("label", True).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def test_lpa_round_faces_agree(spark):
    """The shipped r13 rounds (two-step argmax, NO coalesce join) ==
    the pre-r13 body == the deterministic-mode face, on randomized
    multigraphs (dense/sparse, self-loops, duplicate edges,
    tie-heavy label counts) across several depths. The mode face is
    the documented non-claim: equal, not shipped (slower at sf1)."""
    rng = random.Random(13)
    for trial in range(5):
        n = rng.choice([30, 80, 150])
        m = rng.choice([n // 2, n, 4 * n])
        rows = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        df = spark.createDataFrame(rows, "src bigint, dst bigint")
        iters = rng.choice([1, 2, 4, 7])
        sym = symmetrize_edges(df).repartition("dst").localCheckpoint(eager=True)
        got = {tuple(r) for r in _lpa_rounds(sym, iters, 1).collect()}
        want = {tuple(r) for r in _pre_r13_rounds(sym, iters).collect()}
        assert got == want, f"trial {trial}: {len(got ^ want)} rows differ"
        md = {tuple(r) for r in _mode_rounds(sym, iters).collect()}
        assert md == want, f"trial {trial}: mode face differs"


def test_lpa_mode_covers_whole_vertex_universe(spark):
    """The dropped coalesce join is dead logic: every vertex of the
    symmetrized substrate appears as src, so one round's mode output
    keys == the vertex universe (incl. self-loop-only vertices)."""
    df = spark.createDataFrame(
        [(1, 2), (3, 3), (4, 2)], "src bigint, dst bigint"
    )
    sym = symmetrize_edges(df)
    verts = {r[0] for r in sym.select("src").distinct().collect()}
    labels = {r[0] for r in label_propagation(df, iterations=1).collect()}
    assert verts == {1, 2, 3, 4}
    assert labels == verts


def test_winnowing_long_word_falls_back_not_raises(spark):
    """A word beyond the 256-char power table (URL/base64/DNA-style
    token) computes 31^len by repeated multiplication and yields the
    same fingerprints as the pure-Python char-fold reference."""
    long_word = "x" * 300
    texts = [
        f"start {long_word} middle tail end word",
        f"{long_word} {long_word} a b c",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["fp_hash"], r["fp_pos"])
        for r in winnowing_fingerprints(df, "doc_id", "text", k=3, w=2).collect()
    }
    want = {
        (i, h, pos)
        for i, t in enumerate(texts)
        for (h, pos) in _ref_winnowing(t, 3, 2)
    }
    assert got == want


def test_symmetrize_null_endpoints_drop(spark):
    """(NULL, x) edges vanish instead of collapsing to (x, x)."""
    df = spark.createDataFrame(
        [(None, 7), (7, None), (None, None), (1, 2)],
        "src bigint, dst bigint",
    )
    rows = {tuple(r) for r in symmetrize_edges(df).collect()}
    assert rows == {(1, 2), (2, 1)}


def test_pagerank_no_dangling_elision_matches_reference(spark):
    """On a graph with NO dangling vertices, pagerank elides the
    per-step dangling-mass machinery (literal 0.0 in the same
    expression slot); ranks must equal the Python power iteration —
    the r13 graph.py branch the dangling-graph pins can't reach."""
    from tests.test_graph import _py_pagerank
    from hr_moderndatapipeline_spark.operators.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b"), ("a", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    want = _py_pagerank(edges, iterations=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_kmeans_memo_invalidates_on_clear_cache(spark):
    """The shared k-means model memo must NOT survive
    spark.catalog.clearCache(): the bench clears caches between timed
    runs, and a memo that outlived the clear would hand later timed
    runs a pre-trained model (the round rules' result-caching ban).
    The memo anchors the driver-side centroids to the persisted vec
    frame and drops itself when the anchor is uncached."""
    from hr_moderndatapipeline_spark.queries import dataops

    sf_dir = "/root/testdata/sf0.001"
    v1, c1 = dataops._km_model(spark, sf_dir)
    assert dataops._km_model(spark, sf_dir)[0] is v1  # warm hit
    spark.catalog.clearCache()
    v2, _c2 = dataops._km_model(spark, sf_dir)
    assert v2 is not v1  # retrained after the clear
    lvl = v2.storageLevel
    assert lvl.useMemory or lvl.useDisk
    spark.catalog.clearCache()
    dataops.release_kmeans_memo()


@pytest.mark.parametrize(
    ("mode", "expect"),
    [
        ("cores", "RoundRobinPartitioning"),
        ("aqe", "REBALANCE_PARTITIONS_BY_NONE"),
        ("none", None),
    ],
)
def test_rebalance_modes(spark, mode, expect):
    df = spark.range(100)
    old = spark.conf.get("spark.hr_mdp.rebalance.mode", "cores")
    try:
        spark.conf.set("spark.hr_mdp.rebalance.mode", mode)
        out = rebalance(df)
        plan = out._jdf.queryExecution().toString()
        if mode == "none":
            assert out is df
        else:
            assert expect in plan, plan
    finally:
        spark.conf.set("spark.hr_mdp.rebalance.mode", old)
