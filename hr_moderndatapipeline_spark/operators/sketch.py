"""Count-min sketch: a MERGEABLE bounded-memory frequency sketch.

The reference's profiling queries count exact term frequencies with a
full groupBy (reference `jobs/gold/gold_builder.py` aggregation
shapes); at 100 TB an exact global vocabulary count is a giant
shuffle whose result is mostly tail. The count-min sketch (Cormode &
Muthukrishnan 2005) bounds state at ``depth x width`` counters while
guaranteeing ``estimate >= true count`` — the standard streaming /
distributed answer, and the same mergeable-state pattern as
`operators/incremental.py` (sketches sum elementwise, so per-batch
or per-partition sketches fold into one without recomputation).

Cross-engine exactness: the usual CMS uses xxhash/murmur, which DuckDB
lacks — so like ``dsir_logweights`` and ``hashed_linear_score`` this
implementation hashes tokens with the polynomial char fold mod 1e9+7
and derives the ``depth`` row hashes by integer mixing:

    b_i = ((h * (2654435761 + i) + 40503 * (i + 1)) % 1000000007) % width

All operands stay under 2^62 (h < 2^30, multiplier < 2^32), so the
arithmetic is exact BIGINT on Spark and DuckDB alike and the whole
sketch — build, merge, estimate — is hash-verifiable by the oracle
gate.

Shuffle ledger (the 100 TB posture):
- build: explode tokens map-side, one map-side-combinable groupBy on
  (row, bucket) — output O(depth*width) rows regardless of corpus
  size; the corpus shuffles ONCE, into a bounded keyspace.
- merge: union + same groupBy over O(depth*width) inputs — trivial.
- estimate: the sketch (<= depth*width rows) is BROADCAST onto the
  query token stream; min-over-depth is a codegen aggregate. The
  query stream never shuffles against the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_P = 1_000_000_007
_MIX_A = 2_654_435_761
_MIX_C = 40_503


def _poly_hash(col_name: str) -> Column:
    """Polynomial char fold mod 1e9+7 — the repo's cross-engine token
    hash (same expression as `doc_fingerprint` / `dsir_logweights`)."""
    return F.expr(
        f"aggregate(transform(sequence(1, length({col_name})), "
        f"i -> cast(ascii(substring({col_name}, i, 1)) as bigint)), "
        f"0L, (acc, c) -> (acc * 31 + c) % {_P})"
    )


def _bucket(h: Column, i: int, width: int) -> Column:
    return F.pmod(
        F.pmod(h * F.lit(_MIX_A + i) + F.lit(_MIX_C * (i + 1)), F.lit(_P)),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, text_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch of whitespace-token frequencies.

    Returns the sketch as O(depth*width) rows ``(row_idx, bucket,
    cnt)`` — absent (row, bucket) cells are zero. Deterministic,
    partitioning-invariant (counts are order-independent sums).
    """
    if depth <= 0 or width <= 0:
        raise ValueError(f"need depth > 0 and width > 0, got {depth} x {width}")
    toks = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("_tok"))
        .filter(F.col("_tok") != "")
        .select(_poly_hash("_tok").alias("_h"))
    )
    cells = toks.select(
        F.posexplode(
            F.array(*[_bucket(F.col("_h"), i, width) for i in range(depth)])
        ).alias("row_idx", "bucket")
    )
    return cells.groupBy("row_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width) by
    elementwise sum — the mergeable-state law: ``cms(A U B) ==
    merge(cms(A), cms(B))`` exactly (pinned by a property test)."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for each row of ``queries``: the
    classic min-over-rows readout. Adds ``cms_est`` (BIGINT,
    guaranteed >= the true count; missing cells read 0).

    The sketch side is broadcast — it is at most depth*width rows by
    construction — so the query stream keeps its partitioning.
    ``queries`` may not already contain columns named row_idx/bucket
    (they collide with the probe's join keys — loud error, not a
    silent wrong join)."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"need depth > 0 and width > 0, got {depth} x {width}")
    clash = {"row_idx", "bucket"} & set(queries.columns)
    if clash:
        raise ValueError(f"queries columns collide with probe internals: {clash}")
    q = queries.withColumn("_h", _poly_hash(token_col))
    cells = q.select(
        *queries.columns,
        F.posexplode(
            F.array(*[_bucket(F.col("_h"), i, width) for i in range(depth)])
        ).alias("row_idx", "bucket"),
    )
    joined = cells.join(
        F.broadcast(sketch.select("row_idx", "bucket", F.col("cnt").alias("_cms_cnt"))),
        ["row_idx", "bucket"],
        "left",
    ).withColumn("_c", F.coalesce(F.col("_cms_cnt"), F.lit(0)))
    return joined.groupBy(*queries.columns).agg(
        F.min("_c").cast("bigint").alias("cms_est")
    )


def histogram_build(
    df: DataFrame, value_col: str, lo: int, hi: int, nbins: int
) -> DataFrame:
    """Equi-width histogram over an INTEGER value column: O(nbins)
    rows ``(bin_idx, cnt)`` — the other classic mergeable sketch
    (merge = elementwise sum, same law as ``cms_merge``; fold
    per-batch histograms instead of rescanning history). Values are
    clamped into the edge bins, so the state is total over any input.

    Pure integer bin math — ``((v - lo) * nbins) div (hi - lo)`` —
    exact and identical on Spark and DuckDB, hence oracle-checkable,
    unlike engine-native approx_percentile sketches (KLL here, t-digest
    there) whose internals differ. One map-side-combinable shuffle
    into the bounded keyspace."""
    if hi <= lo or nbins <= 0:
        raise ValueError(f"need hi > lo and nbins > 0, got [{lo},{hi}) x {nbins}")
    raw = F.expr(
        f"(CAST({value_col} AS BIGINT) - {lo}) * {nbins} DIV {hi - lo}"
    )
    bin_idx = F.greatest(
        F.lit(0).cast("bigint"), F.least(F.lit(nbins - 1).cast("bigint"), raw)
    )
    return (
        df.select(bin_idx.alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, qs_ppm: "list[int]", lo: int, hi: int, nbins: int
) -> DataFrame:
    """Quantile readout from a histogram: for each q (integer parts
    per million — float q's would poison the cross-engine hash) find
    the first bin where the cumulative count reaches ceil(q*N/1e6)
    and report its upper edge as the estimate (true quantile lies
    within one bin width, the standard equi-width bound).

    The readout collapses the O(nbins) state to ONE row (sorted
    struct array + total), explodes the literal q list, and walks the
    array with a sequential ``aggregate`` fold — no non-equi join, so
    the plan stays nested-loop-free (the audit's invariant), and the
    same left-to-right fold is restated in DuckDB as ``list_reduce``.
    Everything after the histogram shuffle touches O(nbins) data."""
    packed = hist.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("bin_idx"), F.col("cnt")))
        ).alias("_arr"),
        F.sum("cnt").cast("bigint").alias("_n"),
    )
    q = packed.select(
        F.explode(F.array(*[F.lit(int(v)).cast("bigint") for v in qs_ppm])).alias(
            "q_ppm"
        ),
        "_arr",
        "_n",
    )
    thresh = "CAST((q_ppm * _n + 999999) DIV 1000000 AS BIGINT)"
    found = F.expr(
        "aggregate(_arr, struct(CAST(0 AS BIGINT) AS cum, CAST(-1 AS BIGINT) AS hit), "
        "(acc, s) -> IF(acc.hit >= 0, acc, "
        f"IF(acc.cum + s.cnt >= {thresh}, "
        "struct(acc.cum + s.cnt AS cum, s.bin_idx AS hit), "
        "struct(acc.cum + s.cnt AS cum, CAST(-1 AS BIGINT) AS hit))), "
        "acc -> acc.hit)"
    )
    est = F.expr(f"CAST({lo} + (bin_idx + 1) * {hi - lo} DIV {nbins} AS BIGINT)")
    return q.select("q_ppm", found.alias("bin_idx")).select(
        "q_ppm", "bin_idx", est.alias("est_upper")
    )


# ── KMV (k-minimum-values) distinct-count sketch ──

def kmv_build(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV distinct sketch (Bar-Yossef et al. 2002): the k
    smallest DISTINCT portable hashes of ``key_col``. Returns
    ``group_cols + (rank, h)`` rows — at most k per group.

    Mergeable-state law (property-tested): ``kmv(A ∪ B) ==
    kmv_merge(kmv(A), kmv(B))`` exactly, because "k smallest of a
    union" == "k smallest of the union of each side's k smallest".

    100 TB posture: one shuffle with map-side combine to distinct
    (group, h); the per-group k-smallest is a rank window that Spark
    rewrites to WindowGroupLimit, so each map partition forwards at
    most k rows per group — the shuffle carries sketches, not
    corpora.

    Hashing: the cross-engine polynomial fold is NOT uniform on
    [0, P) for short keys (a 4-char key folds to < 2^21, and the
    estimator assumes uniformity), so the fold is scrambled through
    the affine mix — multiplication by a constant coprime to the
    prime P is a bijection mod P that spreads any input range across
    the full field. Still exact BIGINT on both engines, so the whole
    sketch is oracle-verifiable."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    folded = _poly_str_hash(F.col(key_col).cast("string"))
    hashed = df.select(
        *group_cols,
        F.pmod(folded * F.lit(_MIX_A) + F.lit(_MIX_C), F.lit(_P)).alias("h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two KMV sketches built with the same k: union, distinct
    (identical keys hash identically), re-take the k smallest."""
    from pyspark.sql import Window

    u = a.select(*group_cols, "h").unionByName(b.select(*group_cols, "h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        u.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "rank", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: if the
    sketch holds fewer than k values the count is EXACT (= sketch
    size); otherwise est = (k-1) * P / h_k — the k-th smallest of n
    uniform hashes on [0, P) sits near (k/n)·P. Integer division:
    (k-1)*P < 2^38, exact BIGINT on both engines."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_hk"),
    )
    est = F.when(
        F.col("_hk").isNotNull(),
        F.expr(f"CAST({(k - 1)} * {_P}L DIV _hk AS BIGINT)"),
    ).otherwise(F.col("n_kept"))
    return agg.select(*group_cols, "n_kept", est.alias("kmv_est"))


def _poly_str_hash(c):
    """Polynomial char fold mod P of an arbitrary string Column —
    `_poly_hash` for computed columns (the name-based F.expr form
    only works on real columns). One home: operators/dedup.py."""
    from hr_moderndatapipeline_spark.operators.dedup import poly_token_hash

    return poly_token_hash(c)
