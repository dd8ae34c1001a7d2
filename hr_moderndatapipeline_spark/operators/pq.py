"""Product quantization (PQ) ANN: 8-byte codes instead of 256-byte
vectors — the memory tier below IVF in a real vector stack.

Why it earns its place next to ann_bruteforce/LSH/IVF
(operators/similarity.py): at 100 TB of embeddings the corpus can't
hold float vectors in RAM; PQ stores one small int PER SUBSPACE per
vector (m=8 codes for dim=64 → 32× compression at k≤256) and scores
a query against the ENTIRE corpus with one lookup-table gather per
code — the classic ADC (asymmetric distance computation) scan of
Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011; public method).

Spark-first layout:
- training: per-subspace codebooks from deterministic hash-seeded
  representatives (same no-RNG discipline as ivf_codebook), optional
  exact Lloyd refinement per subspace;
- encode: one Arrow-batched pass, codebooks broadcast as a numpy
  (m, k, d_sub) tensor — O(m·k·d_sub) scalars, model not data;
- probe: the query batch's LUTs (q, m, k) broadcast; the corpus
  scan gathers LUT[code] per subspace and sums — corpus codes are
  never shuffled, only per-partition top-k candidates move
  (mapInPandas + global window, mirroring ann_bruteforce's shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.similarity import as_double_vec


def _subspace_slices(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    d = dim // m
    return [(i * d, (i + 1) * d) for i in range(m)]


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    refine_iterations: int = 2,
    max_train: int = 4096,
    sample_hash: str = "xxhash",
) -> DataFrame:
    """Train per-subspace codebooks: ``(sub int, cluster int,
    _cv array<double>)`` with len(_cv) == dim/m. ONE bounded driver
    collect: a deterministic hash-ordered training sample of at most
    ``max_train`` vectors (codebook training is an O(k·d) model fit —
    a capped representative sample is the standard practice; the
    corpus itself is never collected). Seeds are the first k sample
    rows per subspace ordering; refinement is exact Lloyd on the
    sample's subvector slices.

    ``sample_hash="portable"`` orders the sample by the affine hash
    ((id % P)·A + C) % P with an id tiebreak — restatable in ANSI
    SQL, so with ``refine_iterations=0`` the ENTIRE codebook
    definition (sample → rotated seeds) is DuckDB-oracle-verifiable,
    the same verification-mode trade ``ivf_codebook`` made in r7
    (the Lloyd-refined xxhash default stays the quality path)."""
    import numpy as np

    spark = corpus.sparkSession
    slices = _subspace_slices(dim, m)
    shaped = corpus.select(
        F.col(id_col).alias("_id"), as_double_vec(F.col(vec_col)).alias("_v")
    )
    if sample_hash == "portable":
        _P, _A, _C = 1_000_000_007, 2_654_435_761, 40_503
        shaped = shaped.withColumn(
            "_hk",
            F.pmod(F.pmod(F.col("_id"), F.lit(_P)) * _A + _C, F.lit(_P)),
        )
    else:
        shaped = shaped.withColumn("_hk", F.xxhash64(F.col("_id")))
    train_rows = shaped.orderBy("_hk", "_id").limit(max_train).collect()
    pts_full = np.array([r["_v"] for r in train_rows])
    if len(pts_full) < k:
        raise ValueError(f"need at least k={k} training vectors, got {len(pts_full)}")
    out = []
    for sub, (lo, hi) in enumerate(slices):
        pts = pts_full[:, lo:hi]
        # deterministic per-subspace seed order: rotate the sample
        cents = pts[(np.arange(k) + sub) % len(pts)].copy()
        for _ in range(max(0, refine_iterations)):
            d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = pts[mask].mean(axis=0)
        out.extend(
            (sub, i, [float(x) for x in cents[i]]) for i in range(k)
        )
    return spark.createDataFrame(out, "sub int, cluster int, _cv array<double>")


def _codebook_tensor(codebooks: DataFrame):
    import numpy as np

    rows = codebooks.collect()
    m = max(r["sub"] for r in rows) + 1
    k = max(r["cluster"] for r in rows) + 1
    d = len(rows[0]["_cv"])
    t = np.zeros((m, k, d))
    for r in rows:
        t[r["sub"], r["cluster"]] = r["_cv"]
    return t


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """Encode each vector to ``(id, codes array<int>)`` — nearest
    centroid per subspace, one Arrow-batched pass, codebook tensor
    broadcast."""
    import pandas as pd

    spark = corpus.sparkSession
    tensor = _codebook_tensor(codebooks)
    bc = spark.sparkContext.broadcast(tensor)
    slices = _subspace_slices(dim, m)

    def encode(batches):
        import numpy as np

        t = bc.value
        for pdf in batches:
            vecs = np.array(list(pdf["_v"]))
            codes = np.empty((len(pdf), len(slices)), dtype=np.int32)
            for sub, (lo, hi) in enumerate(slices):
                sv = vecs[:, lo:hi]
                # accumulate SEQUENTIALLY over the dimension index
                # (the _assign_factory trick): each step is the same
                # correctly-rounded (v-c), (v-c)·(v-c), acc+x2 op
                # sequence as the DuckDB oracle's list_reduce fold, so
                # the argmin (ties → lowest cluster, np.argmin's
                # first-hit == ORDER BY d2, cluster) is engine-exact.
                d2 = np.zeros((len(pdf), t.shape[1]), dtype=np.float64)
                for d in range(hi - lo):
                    diff = sv[:, d][:, None] - t[sub][None, :, d]
                    d2 = d2 + diff * diff
                codes[:, sub] = d2.argmin(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "codes": list(codes)})

    shaped = corpus.select(
        F.col(id_col).alias("_id"), as_double_vec(F.col(vec_col)).alias("_v")
    )
    return shaped.mapInPandas(encode, schema="_id long, codes array<int>").select(
        F.col("_id").alias(id_col), "codes"
    )


def _query_lut(q_vecs, tensor, slices):
    """LUT[q, sub, cluster] = <query_subvector, centroid>, accumulated
    SEQUENTIALLY over the dimension index from a 0.0 seed — every
    float op matches the DuckDB oracle's list_reduce inner-product
    fold (a matmul's pairwise/SIMD accumulation would not)."""
    import numpy as np

    k_cb = tensor.shape[1]
    lut = np.zeros((len(q_vecs), len(slices), k_cb), dtype=np.float64)
    for sub, (lo, hi) in enumerate(slices):
        for d in range(hi - lo):
            lut[:, sub, :] += q_vecs[:, lo + d][:, None] * tensor[sub][None, :, d]
    return lut


def pq_probe(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """ADC scan: per query, an inner-product lookup table against
    every centroid (q, m, k_cb) is broadcast; the corpus pass sums
    LUT[sub, code] per vector and keeps per-partition top-k, then a
    ranked window takes the global top-k. The corpus codes never
    shuffle; only candidates (≤ partitions × q × k rows) move.
    Returns (q_id, c_id, score, rk) with approximate inner-product
    scores — recall vs exact search is pinned in tests. Scores are
    emitted UNROUNDED: the folds are engine-exact, and Spark's
    ``F.round`` (BigDecimal HALF_UP on the exact binary double) and
    DuckDB's ``round`` (float-multiply) can disagree for doubles near
    a decimal boundary, so rounding would WEAKEN the hash gate
    (ADVICE r8).

    Engine-exact by construction (r8): the LUT and the per-vector
    score accumulate sequentially (dim order, then sub order), and
    the per-partition top-k orders by (score desc, c_id asc) — the
    same total order as the final window — so the global top-k is
    the exact merge of partition top-ks and hash-matches the DuckDB
    restatement."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    tensor = _codebook_tensor(codebooks)
    slices = _subspace_slices(dim, m)
    q_rows = queries.select(
        F.col(id_col).alias("_qid"), as_double_vec(F.col(vec_col)).alias("_v")
    ).collect()
    q_ids = np.array([r["_qid"] for r in q_rows])
    q_vecs = np.array([r["_v"] for r in q_rows])
    lut = _query_lut(q_vecs, tensor, slices)
    bc = spark.sparkContext.broadcast((q_ids, lut))

    def scan(batches):
        qi, tbl = bc.value
        for pdf in batches:
            codes = np.array(list(pdf["codes"]))  # (n, m)
            n = len(pdf)
            if n == 0:
                continue
            c_ids = pdf["_id"].to_numpy()
            # scores[q, n] = sum over sub of tbl[q, sub, codes[n, sub]]
            # — sequential over sub from the 0.0 seed (oracle order)
            scores = np.zeros((len(qi), n), dtype=np.float64)
            for sub in range(codes.shape[1]):
                scores += tbl[:, sub, codes[:, sub]]
            top = min(k, n)
            out_q, out_c, out_s = [], [], []
            for qrow in range(len(qi)):
                # deterministic top-k: (-score, c_id) — argpartition's
                # arbitrary tie handling at the k boundary could keep
                # a different candidate than the final window's order
                sel = np.lexsort((c_ids, -scores[qrow]))[:top]
                for j in sel:
                    out_q.append(int(qi[qrow]))
                    out_c.append(int(c_ids[j]))
                    out_s.append(float(scores[qrow, j]))
            yield pd.DataFrame({"q_id": out_q, "c_id": out_c, "score": out_s})

    cand = encoded.select(F.col(id_col).alias("_id"), "codes").mapInPandas(
        scan, schema="q_id long, c_id long, score double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("q_id", "rk")
    )


# ── IVF-PQ: cell-partitioned codes, probe scans only nprobe cells ──


def ivfpq_index(
    corpus: DataFrame,
    ivf_codebook: DataFrame,
    pq_cb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """Compose the two quantizers (the IVF-ADC architecture of Jégou
    et al. 2011): assign each vector to its nearest IVF centroid
    (coarse cell) AND PQ-encode it — ``(id, cid, codes)``. Written
    ``partitionBy("cid")`` the probe prunes whole cells at the scan
    (dynamic partition pruning / pushed IN-filter), so a probe reads
    ``nprobe/n_cells`` of the corpus instead of all of it — the
    piece plain PQ lacks at 100 TB."""
    from hr_moderndatapipeline_spark.operators.similarity import ivf_index

    # ivf_index standardizes its id column to c_id
    assigned = ivf_index(corpus, ivf_codebook, id_col, vec_col, dim=dim).select(
        F.col("c_id").alias("_id"), "cid"
    )
    codes = pq_encode(corpus, pq_cb, id_col, vec_col, dim=dim, m=m).select(
        F.col(id_col).alias("_id"), "codes"
    )
    return (
        assigned.join(codes, "_id")
        .select(F.col("_id").alias(id_col), "cid", "codes")
    )


def ivfpq_probe(
    queries: DataFrame,
    index: DataFrame,
    ivf_codebook: DataFrame,
    pq_cb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """Probe the composed index: per query pick the ``nprobe``
    nearest coarse cells (O(q·n_cells·dim) driver arithmetic on the
    collected query batch — model-parameter scale, same budget as
    the LUTs), filter the index to the union of selected cells (an
    IN-filter the scan can push into cell partitions), then run the
    same broadcast-LUT ADC scan as ``pq_probe`` but scoring each
    query ONLY against rows of its own selected cells."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    from hr_moderndatapipeline_spark.operators.similarity import _codebook_raw

    cents = _codebook_raw(ivf_codebook)  # (n_cells, dim), unnormalized
    tensor = _codebook_tensor(pq_cb)
    slices = _subspace_slices(dim, m)
    q_rows = queries.select(
        F.col(id_col).alias("_qid"), as_double_vec(F.col(vec_col)).alias("_v")
    ).collect()
    q_ids = np.array([r["_qid"] for r in q_rows])
    q_vecs = np.array([r["_v"] for r in q_rows])
    # coarse cell selection with the SAME scoring as ivf_index's
    # _assign_factory (seqdot / seq-fold centroid norm, ties to the
    # lower cell id) so probe selection matches index assignment AND
    # the ORACLE_ANN_IVF qassign restatement verbatim (r8; the old
    # euclidean argsort used a different metric and untied
    # nondeterministically).
    n_cells = cents.shape[0]
    normsq = np.zeros(n_cells, dtype=np.float64)
    for d in range(dim):  # sequential fold, oracle order
        normsq = normsq + cents[:, d] * cents[:, d]
    norms = np.where(normsq > 0, np.sqrt(normsq), np.inf)
    dots = np.zeros((len(q_vecs), n_cells), dtype=np.float64)
    for d in range(dim):  # sequential fold, oracle order
        dots += np.outer(q_vecs[:, d], cents[:, d])
    cell_scores = dots / norms
    cells = np.argsort(-cell_scores, axis=1, kind="stable")[:, :nprobe]
    wanted = sorted({int(c) for row in cells for c in row})
    lut = _query_lut(q_vecs, tensor, slices)
    cell_sets = {int(q_ids[i]): {int(c) for c in cells[i]} for i in range(len(q_ids))}
    bc = spark.sparkContext.broadcast((q_ids, lut, cell_sets))

    def scan(batches):
        qi, tbl, qcells = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.array(list(pdf["codes"]))
            cids = pdf["cid"].to_numpy()
            c_ids = pdf["_id"].to_numpy()
            # sequential over sub from the 0.0 seed (oracle order)
            scores = np.zeros((len(qi), len(pdf)), dtype=np.float64)
            for sub in range(codes.shape[1]):
                scores += tbl[:, sub, codes[:, sub]]
            out_q, out_c, out_s = [], [], []
            for qrow in range(len(qi)):
                qid = int(qi[qrow])
                mask = np.fromiter(
                    (int(c) in qcells[qid] for c in cids), bool, len(cids)
                )
                if not mask.any():
                    continue
                idx = np.where(mask)[0]
                # deterministic top-k: (-score, c_id), the final
                # window's order (see pq_probe)
                sel = idx[np.lexsort((c_ids[idx], -scores[qrow, idx]))]
                for j in sel[: min(k, len(idx))]:
                    out_q.append(qid)
                    out_c.append(int(c_ids[j]))
                    out_s.append(float(scores[qrow, j]))
            if out_q:
                yield pd.DataFrame({"q_id": out_q, "c_id": out_c, "score": out_s})

    pruned = index.filter(F.col("cid").isin(wanted)).select(
        F.col(id_col).alias("_id"), "cid", "codes"
    )
    cand = pruned.mapInPandas(scan, schema="q_id long, c_id long, score double")
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("q_id", "rk")
    )


def ivfpq_rerank(
    queries: DataFrame,
    index: DataFrame,
    ivf_codebook: DataFrame,
    pq_cb: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 4,
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """Two-stage production ANN (the standard IVF-PQ + re-rank
    architecture, Jégou et al. 2011 §V): stage 1 takes a SHORTLIST of
    candidates per query from the compressed-domain ADC scan
    (``ivfpq_probe`` — reads nprobe/n_cells of the corpus, 8-byte
    codes, approximate scores); stage 2 re-scores ONLY the shortlist
    against the raw float vectors with the exact sequential-fold dot
    product and keeps the top-k. Recall approaches exact search while
    the full-precision vectors are touched for just
    ``q × shortlist`` rows — at 100 TB the raw-vector table is the
    expensive side and this join ships a per-query constant of it.

    Exactness: the shortlist SET is the oracle-pinned ivfpq_probe
    output; the re-rank score is the same sequential fold as
    ann_bruteforce (index order, seed 0.0) — unrounded, bit-identical
    cross-engine. Plan shape: the tiny (q_id, c_id) shortlist
    broadcast-joins the corpus scan; no full pairwise anywhere.

    Returns (q_id, c_id, score, rk), rk 1..k by exact score."""
    cand = ivfpq_probe(
        queries, index, ivf_codebook, pq_cb, id_col, vec_col,
        k=shortlist, nprobe=nprobe, dim=dim, m=m,
    ).select("q_id", "c_id")
    from hr_moderndatapipeline_spark.operators.similarity import (
        as_double_vec,
        dot,
    )

    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(F.col(vec_col)).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(F.col(vec_col)).alias("_cv")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "c_id")
        .withColumn("score", dot(F.col("_qv"), F.col("_cv"), dim))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "score", "rk")
        .orderBy("q_id", "rk")
    )
