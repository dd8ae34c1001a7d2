"""PageRank: agreement with a pure-Python power iteration on a known
graph, mass conservation, dangling handling, duplicate-edge collapse."""

from __future__ import annotations

from hr_moderndatapipeline_spark.operators.graph import pagerank


def _py_pagerank(edges, damping=0.85, iterations=10):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    rank = {v: 1.0 / n for v in verts}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in verts if v not in out)
        base = (1.0 - damping) / n + damping * dangling / n
        new = {v: base for v in verts}
        for s, ds in out.items():
            share = damping * rank[s] / len(ds)
            for d in ds:
                new[d] += share
        rank = new
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),  # d has in-degree 0
    ("c", "e"),  # e is dangling (no out-edges)
    ("a", "b"),  # duplicate edge must collapse
]


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    want = _py_pagerank(EDGES, iterations=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_is_a_distribution(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = pagerank(df, iterations=6, checkpoint_every=2).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in rows)


def test_pagerank_sink_accumulates(spark):
    # chain a -> b -> c: the sink c must outrank b, b outrank a
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=20).collect()}
    assert got["c"] > got["b"] > got["a"]


def test_triangle_enumerate_k4_and_orientation(spark):
    """K4 yields its 4 triangles exactly once each regardless of input
    edge direction/duplication; an open wedge yields none."""
    from hr_moderndatapipeline_spark.operators.graph import triangle_enumerate

    k4 = spark.createDataFrame(
        [(i, j) for i in range(1, 5) for j in range(1, 5) if i != j]
        + [(1, 1), (2, 2)],  # self-loops dropped
        "src long, dst long",
    )
    tris = sorted(tuple(r) for r in triangle_enumerate(k4).collect())
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]

    wedge = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert triangle_enumerate(wedge).count() == 0


def test_label_propagation_deterministic_communities(spark):
    from hr_moderndatapipeline_spark.operators.graph import label_propagation

    # two triangles joined by a bridge: each triangle keeps its own
    # min label; the bridge does not merge them at 4 rounds
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = dict(
        (r["vertex"], r["label"])
        for r in label_propagation(df, iterations=4).collect()
    )
    assert out == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
    # determinism: same result twice
    out2 = dict(
        (r["vertex"], r["label"])
        for r in label_propagation(df, iterations=4).collect()
    )
    assert out == out2
    # the KNOWN synchronous-LPA bipartite oscillation, pinned: an
    # isolated edge's vertices swap labels every round, so after an
    # even round count each keeps its own label and after an odd
    # count they swap
    df2 = spark.createDataFrame(edges + [(10, 11)], "src bigint, dst bigint")
    out_even = dict(
        (r["vertex"], r["label"])
        for r in label_propagation(df2, iterations=4).collect()
    )
    assert out_even[10] == 10 and out_even[11] == 11
    out_odd = dict(
        (r["vertex"], r["label"])
        for r in label_propagation(df2, iterations=3).collect()
    )
    assert out_odd[10] == 11 and out_odd[11] == 10
