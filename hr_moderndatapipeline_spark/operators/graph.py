"""Iterative graph algorithms on DataFrames: PageRank.

The one operator class where Spark's declarative model needs help is
ITERATION: each power-iteration step is a join + aggregate, and
naively chaining N of them builds a 2^N-ish logical plan that stalls
the optimizer long before the data is the problem. The fix is the
standard Spark pattern: ``localCheckpoint`` every few steps to
truncate lineage, keeping the per-step plan constant-size.

Scale posture: per iteration exactly one shuffle (contributions
grouped by destination); ranks and degrees co-partition on the
vertex key so the rank⋈edges join reuses the previous step's
partitioning; dangling-node mass is a single scalar aggregate (the
one sanctioned driver scalar per step — same class as the watermark
scalar in sources/watermark.py).

Reference parity: the reference has no graph operator; this extends
the engine the way its users would need for link-style corpus
analysis (page/domain authority scoring in web-crawl curation —
the classic quality prior for pretraining data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Classic damped PageRank over a directed edge list (duplicate
    edges are collapsed). Returns (vertex, rank); ranks sum to 1.

    Dangling vertices (no out-edges) spread their mass uniformly —
    the standard stochastic-matrix completion, so total mass is
    conserved and the result is a true probability distribution."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    verts = verts.repartition("vertex").localCheckpoint(eager=True)
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # rank ⋈ edges joins on the vertex key every step: co-partition
    # once and the per-step shuffle is only the contribution groupBy
    links = (
        e.join(out_deg, "src")
        .select(F.col("src").alias("vertex"), "dst", "deg")
        .repartition("vertex")
        .localCheckpoint(eager=True)
    )
    ranks = verts.withColumn("rank", F.lit(1.0 / n)).repartition("vertex")
    # dangling vertex set is static — compute once, so the per-step
    # mass scalar is a semi-join against it, not a probe of the full
    # edge list (which the contribution join already pays for)
    dangling_verts = verts.join(
        out_deg.select(F.col("src").alias("vertex")), "vertex", "left_anti"
    ).localCheckpoint(eager=True)

    teleport = (1.0 - damping) / n
    for i in range(iterations):
        # mass of dangling vertices this step — one scalar to the driver
        dangling = (
            ranks.join(dangling_verts, "vertex", "left_semi")
            .select(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        contribs = (
            ranks.join(links, "vertex")
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )
        base = teleport + damping * dangling / n
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_enumerate(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate each undirected triangle exactly once as an ordered
    (a < b < c) row — the third classic graph primitive alongside
    pagerank and the dedup connected components (triangle density is
    the standard cohesion/spam signal in link-graph curation).

    Algorithm: canonicalize to an oriented edge list (min, max) with
    self-loops and duplicates collapsed, then close wedges — join
    E(a,b) ⋈ E(b,c) to form the 2-path a<b<c and semi-join the
    closing edge E(a,c). Orientation means each triangle appears via
    exactly ONE wedge, so no post-hoc dedup and no 6× fanout.

    Scale: two shuffles on edge endpoints; the wedge join's fanout is
    Σ deg²(b) over the HIGH endpoint — at web scale the further
    refinement is degree-ordering instead of id-ordering (orient
    edges low-degree → high-degree, bounding wedge centers by
    arboricity; Suri & Vassilvitskii 2011). Id-orientation keeps the
    result a pure set-algebra function of the edge relation (ANSI
    restatable), which the oracle gate needs; the degree-ordered
    variant changes only the orientation key, not the plan shape."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = ab.join(bc, "b")
    return (
        wedges.join(ac, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Deterministic synchronous label propagation (community
    detection; Raghavan et al. 2007, public method) over an
    UNDIRECTED edge list: labels initialize to the vertex id; each
    round every vertex adopts the MOST FREQUENT label among its
    neighbors, ties broken by the smallest label (the deterministic
    variant — classic LPA breaks ties randomly, which no two engines
    would agree on), isolated vertices keep their label. Fixed
    iteration count, synchronous updates: the result is a pure
    integer function of the edge set — engine-exact, no floats
    anywhere (unlike PageRank's double folds). Synchronous LPA's
    known bipartite oscillation applies (an isolated edge's two
    vertices SWAP labels every round — after an even round count
    each keeps its own); callers wanting stable 2-cycles should use
    an odd iteration count or treat those pairs downstream. The
    fixed-count synchronous form is kept BECAUSE it is the
    deterministic one — the asynchronous variant's result depends on
    visit order.

    Scale shape per round: one join of the O(V) label table against
    the symmetrized edge list on the vertex key + one (vertex, label)
    count groupBy + one per-vertex argmax as a second aggregate
    ``min(struct(-count, label))`` — NOT a rank window. Measured
    honestly (SCALING.md r11, 117.4M edges): shuffle volume is
    IDENTICAL between the two shapes (the partial min cannot combine
    map-side — the count table is hash-partitioned by
    (vertex, label), so a vertex's rows rarely share a mapper
    partition); the win is the reduce side, where the sort-aggregate
    merges straight to one row per vertex instead of fully sorting
    every (vertex, label) row, materializing row numbers and
    filtering — the isolated round-1 argmax ran 32.5s vs the
    window's 55.4s at the sf10 geometry. End-to-end round walls are
    dominated by the edge-sized count groupBy either way. All
    shuffles stay on the vertex key, co-partitioned like
    ``pagerank``; ``localCheckpoint`` every ``checkpoint_every``
    rounds truncates the growing lineage. Returns (vertex, label)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        # partition on DST — the per-round label join keys on dst, so
        # the (static) edge list co-locates with the label table once
        # and never reshuffles; the only per-round shuffle is the
        # map-side-combined (src, label) count groupBy
        .repartition("dst")
        .localCheckpoint(eager=True)
    )
    verts = sym.select(F.col("src").alias("vertex")).distinct()
    labels = verts.withColumn("label", F.col("vertex")).repartition("vertex")
    for i in range(iterations):
        nb = (
            sym.join(
                labels.select(
                    F.col("vertex").alias("dst"), F.col("label")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("vertex"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (count desc, label asc) == lexicographic min of
        # (-count, label): exactly equivalent to the former
        # row_number()==1 window (pinned vs the Python reference in
        # tests/test_property_r9.py); see docstring for the measured
        # reduce-side win and the shuffle-volume non-claim
        mode = (
            nb.groupBy("vertex")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("_negc"),
                        F.col("label").alias("_l"),
                    )
                ).alias("_best")
            )
            .select("vertex", F.col("_best._l").alias("_new"))
        )
        labels = (
            labels.join(mode, "vertex", "left")
            .select(
                "vertex",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels
