"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference capability (BASELINE.json north star): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard — all designed so
the only shuffles are on dedup keys / LSH buckets, never all-pairs:

- ``dedup_exact``        — hash-groupBy on content; one shuffle.
- ``word_shingles``      — n-word shingle arrays, computed map-side.
- ``minhash_signatures`` — k minhashes per doc via explode + k
  codegen min-aggregates (the Column-fold form is kept for
  composability; the aggregate form is the fast path).
- ``lsh_candidate_pairs``— banding: signature rows → (band, bucket)
  keys → self-join within buckets. The join is on (band, bucket), so
  work scales with bucket sizes, not corpus²; heavily duplicated
  corpora produce hot buckets → cap or salt them (``max_bucket``).
- ``simhash64``          — JVM-side term-frequency SimHash: exploded
  xxhash64 tokens → 64 codegen sign-sum aggregates → packed bits.
- ``jaccard_pairs``      — exact word-set Jaccard over blocked
  candidate pairs (array_intersect/array_union sizes).

All hashing is content-derived and seed-stable: results are
reproducible across runs, partitionings, and retries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hr_moderndatapipeline_spark.cache import pin


def dedup_exact(df: DataFrame, content_cols: Sequence[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct content.
    Returns content + ``keep_id`` + ``n_copies``."""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def word_shingles(text: Column, n: int) -> Column:
    """Distinct n-word shingles of a whitespace-tokenized text,
    entirely as JVM array expressions (no UDF)."""
    words = F.split(text, " ")
    # Guard short texts: sequence(1, 0) is DESCENDING [1, 0] in Spark
    # and slice(…, 0, n) throws — emit an empty shingle set instead.
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def _s64(x: int) -> int:
    return x - (1 << 64) if x >= 1 << 63 else x


def _mh_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficient pairs for the permutation
    family h_i(x) = a_i*x + b_i over Java long arithmetic (overflow
    wraps = mod 2^64); a_i odd so the map is a bijection."""
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.blake2b(f"minhash:{i}".encode(), digest_size=16).digest()
        a = int.from_bytes(d[:8], "big") | 1
        b = int.from_bytes(d[8:], "big")
        out.append((_s64(a), _s64(b)))
    return out


def minhash_signature_from_hashes(hashes: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from an ``array<long>`` of pre-hashed
    shingles: the k permutations are affine maps a_i*h+b_i over
    wrapping long arithmetic folded into a running elementwise
    minimum (zip_with/least). All JVM codegen arithmetic. Empty
    arrays yield the MAX_LONG init vector (caller filters empties)."""
    coeffs = _mh_coeffs(num_hashes)
    init = F.array(*[F.lit(_s64((1 << 63) - 1)).cast("long") for _ in range(num_hashes)])

    def step(acc: Column, h: Column) -> Column:
        cand = F.array(
            *[F.lit(a).cast("long") * h + F.lit(b).cast("long") for a, b in coeffs]
        )
        return F.zip_with(acc, cand, lambda x, y: F.least(x, y))

    return F.aggregate(hashes, init, step)


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature in ONE traversal of the shingle array: each
    shingle is hashed once (xxhash64 → long) and fed to the affine
    permutation fold — strings are hashed exactly once, not k
    times."""
    return minhash_signature_from_hashes(
        F.transform(shingles, lambda s: F.xxhash64(s)), num_hashes
    )


def minhash_signatures(
    df: DataFrame, id_col: str, hashes_col: str, num_hashes: int = 64
) -> DataFrame:
    """(id, _sig) per doc via explode + k codegen min-aggregates —
    value-identical to ``minhash_signature_from_hashes`` (same affine
    family, same elementwise minimum) but an order of magnitude
    faster: the ``F.aggregate`` fold is interpreted per element and
    allocates a k-wide array per shingle (measured ~1.6s for 260k
    shingles at k=64), while min() aggregates stay in whole-stage
    codegen with map-side partial aggregation, so the extra exchange
    carries one row per document. Rows with empty hash arrays drop
    out (explode of []) — callers filter empties anyway."""
    coeffs = _mh_coeffs(num_hashes)
    h = F.col("_mh_h")
    aggs = [
        F.min(F.lit(a).cast("long") * h + F.lit(b).cast("long")).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        df.select(id_col, F.explode(F.col(hashes_col)).alias("_mh_h"))
        .groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("_sig"),
        )
    )


def lsh_bucket_rows(
    df: DataFrame, id_col: str, sig_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Explode a signature into (band_idx, bucket) rows: bucket =
    hash of the band's signature slice. Docs sharing any bucket are
    near-dup candidates (prob ≈ 1-(1-j^r)^b for Jaccard j)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.lit(b), F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
    )
    return df.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, "bb.band_idx", "bb.bucket"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH bucket.
    ``max_bucket`` drops degenerate hot buckets (e.g. the empty
    document) — at 100 TB a single pathological bucket would
    otherwise produce a quadratic join; dropped buckets are the
    "everything is identical" case better handled by exact dedup
    first."""
    bucketed = lsh_bucket_rows(df, id_col, sig_col, bands, rows_per_band)
    if max_bucket is not None:
        # Window count, not a groupBy+self-join: a join back onto the
        # same lineage makes Spark dedup the join attributes into a
        # degenerate condition (0 candidate pairs), and the window
        # reuses the exact (band, bucket) hash partitioning the
        # candidate self-join below shuffles on anyway.
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "bucket")
        bucketed = (
            bucketed.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    # Both self-join sides consume `bucketed`; Spark's exchange reuse
    # (ReusedExchange over the identical window-filtered subplan)
    # already collapses the duplicate signature aggregation — an
    # explicit persist here was measured NEUTRAL-to-worse at sf0.1
    # (adds a materialization barrier for work AQE already shares).
    a = bucketed.toDF(f"{id_col}_a", "band_idx", "bucket")
    b = bucketed.toDF(f"{id_col}_b", "band_idx", "bucket")
    return (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(f"{id_col}_a", f"{id_col}_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: shingle → signature
    → banded buckets → candidate pairs → exact shingle-Jaccard
    verification ≥ threshold. Returns (id_a, id_b, jaccard).

    Internal representation: each doc's shingle SET is reduced
    map-side to an ``array<long>`` of xxhash64 values — the signature
    fold consumes hashes anyway, and Jaccard over the hashed sets is
    size-exact (64-bit collisions within one doc are negligible), so
    the heavy string arrays never leave the scan stage: the cached/
    shuffled verification payload is ~10× smaller, and the shingle
    strings are computed exactly once."""
    from pyspark import StorageLevel

    from hr_moderndatapipeline_spark.operators.relational import rebalance

    rows_per_band = num_hashes // bands
    # (A zero-string-materialization variant — per-word xxhash64
    # combined polynomially per shingle — measured ~2× SLOWER than
    # hashing the shingle strings: higher-order-function element
    # access is interpreted, while this whole projection stays in
    # codegen. Measured, not assumed.)
    # Drop short docs on the RAW word count BEFORE shingling: the
    # equivalent `size(_shh) > 0` after the projection gets pushed
    # down with the whole shingle expression substituted into the
    # predicate — the shingling then runs twice per row (measured
    # catastrophic on the interpreted portable path; 2× even here).
    prepped = rebalance(
        df.filter(F.size(F.split(F.col(text_col), " ")) >= shingle_n)
    ).select(
        F.col(id_col),
        F.transform(
            word_shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
        ).alias("_shh"),
    )
    # The hashed-shingle frame feeds three branches (signatures, and
    # both sides of the verification join); uncached, each branch
    # would re-run the split+shingle+hash lineage. Long arrays cache
    # columnar and small — unlike the string shingles, whose cache
    # build cost more than the recompute it saved.
    prepped = pin(prepped, tag="minhash", storage_level=StorageLevel.MEMORY_AND_DISK)
    with_sig = minhash_signatures(prepped, id_col, "_shh", num_hashes)
    cands = lsh_candidate_pairs(with_sig, id_col, "_sig", bands, rows_per_band)
    a = prepped.select(F.col(id_col).alias(f"{id_col}_a"), F.col("_shh").alias("_shh_a"))
    b = prepped.select(F.col(id_col).alias(f"{id_col}_b"), F.col("_shh").alias("_shh_b"))
    verified = (
        cands.join(a, f"{id_col}_a").join(b, f"{id_col}_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_shh_a", "_shh_b")).cast("double")
            / F.size(F.array_union("_shh_a", "_shh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(f"{id_col}_a", f"{id_col}_b", "jaccard")
    )
    return verified


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Build the persistent MinHash-LSH INDEX for a corpus: one
    (id, band_idx, bucket, shingle-hash set) row per band per doc.
    Publish this as a bucketed/partitioned table and incremental
    crawls probe it with ``minhash_probe`` — the new batch joins
    against stored buckets instead of re-shingling 100 TB of
    existing corpus. Carrying the hashed shingle set in the index
    row lets verification run without a second corpus lookup."""
    from pyspark import StorageLevel

    rows_per_band = num_hashes // bands
    # persisted for the same reason as in minhash_dedup_pairs: two
    # consumers (signatures + the final join) would otherwise re-run
    # the split+shingle+hash of the WHOLE corpus — the most expensive
    # map stage of the index build — twice.
    prepped = df.filter(
        F.size(F.split(F.col(text_col), " ")) >= shingle_n
    ).select(
        F.col(id_col),
        F.transform(
            word_shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
        ).alias("_shh"),
    )
    prepped = pin(prepped, tag="minhash", storage_level=StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(prepped, id_col, "_shh", num_hashes)
    buckets = lsh_bucket_rows(sigs, id_col, "_sig", bands, rows_per_band)
    return buckets.join(prepped, id_col).select(
        id_col, "band_idx", "bucket", "_shh"
    )


def minhash_probe(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Probe an incremental batch against a prebuilt ``minhash_index``:
    shingle/sign ONLY the new docs, join their bucket rows against the
    stored index buckets, verify exact hashed-shingle Jaccard. Work
    scales with the batch and the collided buckets — the existing
    corpus is never re-read beyond the matched index rows. Returns
    (new_id, corpus_id, jaccard); self-matches (same id) excluded."""
    rows_per_band = num_hashes // bands
    probe = minhash_index(new_docs, id_col, text_col, shingle_n, num_hashes, bands)
    n = probe.toDF("_new_id", "band_idx", "bucket", "_shh_new")
    i = index.toDF("_corpus_id", "band_idx", "bucket", "_shh_old")
    cand = (
        n.join(i, ["band_idx", "bucket"])
        .filter(F.col("_new_id") != F.col("_corpus_id"))
        .select("_new_id", "_corpus_id", "_shh_new", "_shh_old")
        .dropDuplicates(["_new_id", "_corpus_id"])
    )
    return (
        cand.withColumn(
            "jaccard",
            F.size(F.array_intersect("_shh_new", "_shh_old")).cast("double")
            / F.size(F.array_union("_shh_new", "_shh_old")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(
            F.col("_new_id").alias(f"{id_col}_new"),
            F.col("_corpus_id").alias(f"{id_col}_corpus"),
            "jaccard",
        )
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash"
) -> DataFrame:
    """(id, simhash) — 64-bit term-frequency-weighted SimHash,
    entirely JVM-side: tokens exploded with multiplicity, xxhash64
    per token, the 64 per-bit sign sums as codegen SUM aggregates
    (map-side combined to one row per doc), sign bits packed by a
    64-term disjoint-bit sum. No Python anywhere — an earlier
    Arrow-batched pandas UDF (numpy reduceat over flattened token
    arrays) was itself fast, but paid worker startup and ran once
    per side of the blocked self-join; the aggregate form shares one
    shuffle and stays in whole-stage codegen. Docs with no tokens
    get signature 0 (restored via left join — explode drops them)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("_t")
    ).filter(F.col("_t") != "")
    h = F.xxhash64("_t")
    aggs = [
        F.sum(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_b{i}")
        for i in range(64)
    ]
    # Bit 63 of a signed long is the sign bit: its "set" contribution
    # is -2^63 in two's complement; all 64 contributions are disjoint
    # bits, so + is |.
    packed = sum(
        [
            F.when(
                F.col(f"_b{i}") > 0,
                F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ],
        start=F.lit(0).cast("long"),
    )
    sums = toks.groupBy(id_col).agg(*aggs).select(F.col(id_col), packed.alias(out_col))
    return (
        df.select(id_col)
        .join(sums, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long")))
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_block: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup candidates: block on the top ``prefix_bits``
    of the signature (docs within small Hamming distance usually
    share a prefix block; multi-table permutation blocking is the
    production extension), then verify Hamming ≤ ``max_hamming``
    via bit_count(xor).

    ``max_block`` caps degenerate hot blocks, mirroring
    ``lsh_candidate_pairs``'s ``max_bucket``: every token-less doc
    gets signature 0 and a 100 TB crawl has MILLIONS of empty/
    boilerplate docs — without the cap they form one block whose
    self-join is quadratic. Run exact dedup first; capped blocks are
    its job, not SimHash's."""
    # Same guard as simhash_portable_near_pairs: prefix_bits > 64 would
    # shift by a negative count (JVM wraps mod 64 → garbage blocks).
    if not 1 <= prefix_bits <= 64:
        raise ValueError(f"prefix_bits must be in [1, 64], got {prefix_bits}")
    sig = simhash64(df.select(id_col, text_col), id_col, text_col)
    blocked = sig.withColumn("_block", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits))
    if max_block is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_block")
        blocked = (
            blocked.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_block)
            .drop("_n")
        )
    a = blocked.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col("simhash").alias("_sig_a"), "_block"
    )
    b = blocked.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col("simhash").alias("_sig_b"), "_block"
    )
    return (
        a.join(b, "_block")
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .withColumn("hamming", F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(f"{id_col}_a", f"{id_col}_b", "hamming")
    )


# ── portable SimHash: cross-engine polynomial hashing ──
#
# Same constants as operators/sketch.py — the repo's one portable
# hash family (polynomial char fold mod 1e9+7, affine integer row
# mixing). All operands stay under 2^62: h < 2^30, multiplier < 2^32.
_P = 1_000_000_007
_MIX_A = 2_654_435_761
_MIX_C = 40_503


def poly_token_hash(c: Column) -> Column:
    """Polynomial char fold mod 1e9+7 of a string Column — the
    cross-engine token hash (`operators/sketch.py _poly_hash` as a
    Column-to-Column form). Exact BIGINT arithmetic on Spark and
    DuckDB alike; interpreted higher-order-function evaluation, so
    this is the VERIFICATION-mode hash — `xxhash64` remains the
    scale-path default (codegen, 64-bit spread)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, ch: (acc * 31 + ch) % F.lit(_P)
    )


def _mix_mod(h: Column, i: int) -> Column:
    """The portable affine mix family h_i(x) = (x*(A+i) + C*(i+1))
    mod P. Operand bound: x < 2^30, multiplier < 2^32 ⇒ product
    < 2^62, exact in signed-64 arithmetic on both engines."""
    return F.pmod(h * F.lit(_MIX_A + i) + F.lit(_MIX_C * (i + 1)), F.lit(_P))


def _mix_bit(h: Column, i: int) -> Column:
    """Bit i of the portable signature: affine mix of the token hash
    mod P, reduced mod 2 — the sketch.py row-hash family read one
    bit at a time."""
    return F.pmod(_mix_mod(h, i), F.lit(2))


def simhash_portable(
    df: DataFrame, id_col: str, text_col: str, bits: int = 62, out_col: str = "simhash"
) -> DataFrame:
    """(id, simhash) — SimHash over the portable polynomial token
    hash instead of xxhash64, so the whole signature computation is
    exact shared-semantics BIGINT arithmetic and the near-dup
    pipeline is verifiable by the DuckDB oracle gate end to end.

    62 bits (not 64) so the packed signature is a POSITIVE BIGINT on
    both engines — no two's-complement sign-bit special case (the
    xxhash64 `simhash64` needs one at bit 63). The structure is
    identical to `simhash64`: exploded tokens, per-bit codegen sign
    sums map-side combined to one row per doc, disjoint-bit pack;
    token-less docs get signature 0 via the restoring left join.
    Base-hash range is ~2^30, so ~0.05% of a 1M-token vocab collides
    (birthday) — immaterial for sign sums; use `simhash64` when you
    don't need cross-engine verification."""
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62], got {bits}")
    from hr_moderndatapipeline_spark.operators.relational import rebalance

    # r12: the per-token char fold is interpreted and runs in the
    # scan stage — rebalance spreads it across the cluster when the
    # corpus arrives as fewer splits than cores (no-op otherwise)
    toks = rebalance(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("_t")
    ).filter(F.col("_t") != "")
    hashed = toks.select(F.col(id_col), poly_token_hash(F.col("_t")).alias("_h"))
    aggs = [
        F.sum(_mix_bit(F.col("_h"), i) * 2 - 1).alias(f"_b{i}") for i in range(bits)
    ]
    packed = sum(
        [
            F.when(F.col(f"_b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(bits)
        ],
        start=F.lit(0).cast("long"),
    )
    sums = (
        hashed.groupBy(id_col).agg(*aggs).select(F.col(id_col), packed.alias(out_col))
    )
    return (
        df.select(id_col)
        .join(sums, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long")))
    )


def simhash_portable_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_block: int | None = 1000,
    bits: int = 62,
) -> DataFrame:
    """`simhash_near_pairs` over the portable 62-bit signature —
    same prefix-block plan (block self-join, hot-block cap, Hamming
    verify via bit_count(xor)), every step restatable in ANSI SQL.
    This is the oracle-gated face of the SimHash family; recall
    characteristics of the blocking are pinned by the shared unit
    tests, scale posture is identical to the xxhash64 variant."""
    # prefix_bits > bits would shift by a negative count, which the JVM
    # wraps mod 64 — silently-garbage block keys, not an error (ADVICE
    # r6). Mirror simhash_portable's bits-range check and fail loud.
    if not 1 <= prefix_bits <= bits:
        raise ValueError(
            f"prefix_bits must be in [1, bits={bits}], got {prefix_bits}"
        )
    sig = simhash_portable(df.select(id_col, text_col), id_col, text_col, bits=bits)
    blocked = sig.withColumn(
        "_block", F.shiftrightunsigned(F.col("simhash"), bits - prefix_bits)
    )
    if max_block is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_block")
        blocked = (
            blocked.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_block)
            .drop("_n")
        )
    a = blocked.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col("simhash").alias("_sig_a"), "_block"
    )
    b = blocked.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col("simhash").alias("_sig_b"), "_block"
    )
    return (
        a.join(b, "_block")
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(f"{id_col}_a", f"{id_col}_b", "hamming")
    )


_BAND_FOLD_MULT = 1_000_003


def _portable_shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, _shh) — distinct portable shingle-hash set per doc, the
    shared substrate of the one-shot, index, and probe faces of the
    portable MinHash family. Pinned (two consumers: signatures and
    the Jaccard verify join would otherwise re-run the most
    expensive map stage twice). Short docs are dropped on the RAW
    word count BEFORE hashing — the equivalent late filter
    `size(_shh) > 0` is a performance trap: Catalyst pushes the
    predicate through the projection by SUBSTITUTING the whole
    shingle-hash expression into it, so the pipeline's most
    expensive expression runs twice per row (measured 0.9s → 52s at
    sf0.1 for the hash stage). Shingle hashing is two-stage for
    speed (per-word char fold materialized once, shingles combine n
    word hashes) — see minhash_dedup_pairs_portable's docstring for
    the measured 2.7× and the element_at-capture trap."""
    # Expressions are built as SQL strings (one server-side parse per
    # F.expr) rather than nested Column ops: the Column form costs one
    # py4j round-trip per node — ~1s of DRIVER time per call for this
    # tree, tripled across the probe lifecycle's corpus+batch builds
    # (measured; execution identical, the parsed tree is the same).
    wh = (
        f"transform(split({text_col}, ' '), "
        f"w -> aggregate(transform(sequence(1, length(w)), "
        f"i -> cast(ascii(substr(w, i, 1)) as bigint)), "
        f"cast(0 as bigint), (acc, ch) -> (acc * 31 + ch) % {_P}))"
    )
    from hr_moderndatapipeline_spark.operators.relational import rebalance

    # r12: the word char-folds and shingle combines are interpreted
    # HOF expressions pipelined into the SCAN stage — a compacted
    # single-file corpus serializes them on one core. One
    # unconditional row shuffle buys cluster-wide parallelism for
    # the whole hash substrate; deployments whose input splits
    # already ≈ parallelism turn it off via
    # spark.hr_mdp.rebalance.mode (see the rebalance docstring).
    hashed_words = rebalance(
        df.filter(F.size(F.split(F.col(text_col), " ")) >= shingle_n)
    ).select(F.col(id_col), F.expr(wh).alias("_wh"))
    sh = "element_at(_wh, i)"
    for j in range(1, shingle_n):
        sh = f"pmod({sh} * {_BAND_FOLD_MULT} + element_at(_wh, i + {j}), {_P})"
    prepped = hashed_words.select(
        F.col(id_col),
        F.expr(
            f"array_distinct(transform("
            f"sequence(1, size(_wh) - {shingle_n - 1}), i -> {sh}))"
        ).alias("_shh"),
    )
    from pyspark import StorageLevel

    return pin(
        prepped, tag="minhash_portable", storage_level=StorageLevel.MEMORY_AND_DISK
    )


def _portable_bucket_rows(
    prepped: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band_idx, bucket) — MinHash signature + banded LSH bucket
    rows over the portable hash family: k affine-mod-P permutations
    folded per band with ``acc*1000003 + m mod P``. Uncapped — the
    hot-bucket cap is a UNION-level decision (one-shot caps over the
    whole corpus; the probe reconstructs the corpus∪batch count), so
    it lives with the callers."""
    rows_per_band = num_hashes // bands
    # SQL-string expressions for the same py4j-round-trip reason as
    # _portable_shingle_sets (64 aggs + 16 band folds as Column ops
    # cost ~1.5s of driver time per call)
    aggs = [
        F.expr(
            f"min(pmod(_mh_h * {_MIX_A + j} + {_MIX_C * (j + 1)}, {_P}))"
        ).alias(f"_m{j}")
        for j in range(num_hashes)
    ]
    sig = (
        prepped.select(id_col, F.explode(F.col("_shh")).alias("_mh_h"))
        .groupBy(id_col)
        .agg(*aggs)
    )
    band_structs = []
    for b in range(bands):
        bucket = "cast(0 as bigint)"
        for r in range(rows_per_band):
            bucket = (
                f"pmod({bucket} * {_BAND_FOLD_MULT}"
                f" + _m{b * rows_per_band + r}, {_P})"
            )
        band_structs.append(
            f"struct(cast({b} as bigint) as band_idx, {bucket} as bucket)"
        )
    return sig.select(
        F.col(id_col),
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("bb"),
    ).select(id_col, "bb.band_idx", "bb.bucket")


def minhash_dedup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """`minhash_dedup_pairs` over the portable hash family, so the
    ENTIRE MinHash→LSH→verify pipeline is restatable in ANSI SQL and
    hash-verified by the oracle gate:

    - shingle hash: per-word polynomial char fold mod P
      (`poly_token_hash`) combined per shingle with an affine fold,
      instead of xxhash64;
    - the k permutations: `_mix_mod` (affine mod P) instead of
      wrapping-long affine maps;
    - band bucket: an explicit fold ``acc*1000003 + m mod P`` of the
      band's signature slice instead of xxhash64 — a fold collision
      only creates a false CANDIDATE, which the exact-Jaccard verify
      step removes, so correctness is unaffected on either engine;
    - verify: exact Jaccard over the distinct shingle-hash sets,
      identical to the xxhash64 path's set semantics.

    Same plan shape as `minhash_dedup_pairs` (one shuffle to
    signatures, bucket equi-join, hot-bucket cap, verification join).
    Shingle hashing is two-stage for speed: each WORD is char-folded
    ONCE into a materialized array column, then each shingle combines
    its n word hashes with ``s = (s·1000003 + wᵢ) mod P`` — measured
    2.7× faster at sf0.1 than char-folding every shingle string
    (words are ~n× shorter in aggregate than the overlapping shingle
    strings). The word-hash array MUST be bound as a real column in
    its own select first: an ``element_at`` inside a lambda that
    captures the transform expression re-evaluates the entire
    word-hash array per access — measured 23× SLOWER, not faster.
    `minhash_dedup_pairs` (codegen xxhash64) stays the raw-speed
    default. Base-hash range ~2^30: cross-doc shingle collisions
    (~0.05% at 1M shingles) perturb Jaccard by <1e-3 on both engines
    identically."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    prepped = _portable_shingle_sets(df, id_col, text_col, shingle_n)
    bucketed = _portable_bucket_rows(prepped, id_col, num_hashes, bands)
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "bucket")
        bucketed = (
            bucketed.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    pa = bucketed.toDF(f"{id_col}_a", "band_idx", "bucket")
    pb = bucketed.toDF(f"{id_col}_b", "band_idx", "bucket")
    cands = (
        pa.join(pb, ["band_idx", "bucket"])
        .filter(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        .select(f"{id_col}_a", f"{id_col}_b")
        .distinct()
    )
    sa = prepped.select(F.col(id_col).alias(f"{id_col}_a"), F.col("_shh").alias("_shh_a"))
    sb = prepped.select(F.col(id_col).alias(f"{id_col}_b"), F.col("_shh").alias("_shh_b"))
    return (
        cands.join(sa, f"{id_col}_a")
        .join(sb, f"{id_col}_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_shh_a", "_shh_b")).cast("double")
            / F.size(F.array_union("_shh_a", "_shh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(f"{id_col}_a", f"{id_col}_b", "jaccard")
    )


def minhash_index_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Publishable MinHash-LSH index over the PORTABLE hash family,
    as TWO tables: narrow bucket rows ``(id, band_idx, bucket)`` —
    publish partitioned by band/bucket prefix — and the id-keyed
    shingle-set table ``(id, _shh)`` the Jaccard verify reads.
    Unlike `minhash_index` (xxhash64 scale path), the set is NOT
    carried on every band row: one-table locality costs ``bands``×
    the set storage at publish time AND a corpus-sized wide join to
    build (in-query at sf0.1 the joined form materialized ~1.3 GiB
    of cache for a 5k-doc corpus; local warm walls were parity —
    the split's case is the publish-time economics, which dominate
    at corpus scale). The sets table is written once, and the probe
    fetches only MATCHED ids' sets through an id-keyed join, so
    probe-side work scales with collisions, not corpus. Every hash
    is restatable in ANSI SQL, so the probe face is oracle-checkable
    end to end."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    prepped = _portable_shingle_sets(df, id_col, text_col, shingle_n)
    bucketed = _portable_bucket_rows(prepped, id_col, num_hashes, bands)
    return bucketed, prepped.select(id_col, "_shh")


def minhash_bucket_counts(index_buckets: DataFrame) -> DataFrame:
    """(band_idx, bucket, n) — per-bucket corpus population, an
    index-build by-product a deployment publishes NEXT TO the index:
    with it, ``minhash_probe_portable``'s union hot-bucket cap check
    joins the batch's O(batch·bands) bucket counts against this
    O(#buckets) table instead of re-counting the corpus' bucket rows
    per probe (the corpus-wide narrow-row shuffle the window path
    pays). Republish incrementally by adding each absorbed batch's
    counts (elementwise sum — the histogram_build merge law)."""
    return index_buckets.groupBy("band_idx", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def minhash_probe_portable(
    new_docs: DataFrame,
    index_buckets: DataFrame,
    index_sets: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = 1000,
    index_bucket_counts: DataFrame | None = None,
) -> DataFrame:
    """Probe an incremental batch against a published
    ``minhash_index_portable`` (bucket rows + id-keyed sets):
    shingle/sign ONLY the batch, join its bucket rows against stored
    index buckets, verify exact shingle-set Jaccard against the sets
    of MATCHED corpus ids only. Work scales with the batch and the
    collided buckets; the corpus is never re-read or re-hashed.

    Equivalence law (pinned in tests/test_r12_ops.py): equals
    ``minhash_dedup_pairs_portable(corpus ∪ batch)`` restricted to
    pairs involving ≥1 batch doc — including batch↔batch pairs, and
    including the hot-bucket cap, whose threshold the one-shot
    applies to the UNION's bucket population: the probe reconstructs
    that exact count from corpus index rows + batch bucket rows, so
    a bucket pushed over the cap BY THE BATCH is excluded on both
    faces identically. Ids must be disjoint between corpus and batch
    (same-id rows are excluded like `minhash_probe`'s self-matches).

    Output (id_a, id_b, jaccard) with a < b — the one-shot's
    orientation, so the driver oracle is the one-shot SQL plus a
    batch-membership restriction."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    from pyspark import StorageLevel

    prepped_b = _portable_shingle_sets(new_docs, id_col, text_col, shingle_n)
    # the batch's bucket rows feed the union cap count, the cross
    # join, and the batch↔batch self-join — without a pin the 64-agg
    # signature stage would re-run per consumer. O(bands·|batch|)
    # narrow rows: the incremental unit, always pinnable.
    bucketed_b = pin(
        _portable_bucket_rows(prepped_b, id_col, num_hashes, bands),
        tag="minhash_probe_batch",
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    # The cap threshold applies to the corpus∪batch population — the
    # one-shot law. Two equivalent plans (equality pinned):
    #
    # - counts path (``index_bucket_counts`` published, the true
    #   incremental deployment): total per batch-touched bucket =
    #   batch count + published corpus count, so the cap check costs
    #   O(batch buckets) and the corpus' bucket rows are touched only
    #   through the candidate join. Buckets the batch does NOT touch
    #   produce no probe pairs regardless of hotness, so restricting
    #   the check to batch-touched buckets is exact.
    # - window path (no counts published): one tagged union, ONE
    #   (band,bucket) exchange that the window cap and both candidate
    #   joins all derive from, so the join sides reuse the cap's
    #   exchange instead of re-shuffling three times (the one-shot's
    #   own plan shape; a groupBy-count + three cap joins measured
    #   2.5× slower on this stage at sf0.1) — at the price of a
    #   corpus-wide narrow-row shuffle per probe.
    if max_bucket is not None and index_bucket_counts is not None:
        batch_counts = bucketed_b.groupBy("band_idx", "bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        ok = (
            batch_counts.join(
                index_bucket_counts, ["band_idx", "bucket"], "left"
            )
            .filter(
                F.col("_bn") + F.coalesce(F.col("n"), F.lit(0)) <= max_bucket
            )
            .select("band_idx", "bucket")
        )
        bat = (
            bucketed_b.join(ok, ["band_idx", "bucket"])
            .select(F.col(id_col).alias("_bid"), "band_idx", "bucket")
        )
        cor = index_buckets.select(
            F.col(id_col).alias("_cid"), "band_idx", "bucket"
        )
    else:
        all_rows = (
            index_buckets.select(id_col, "band_idx", "bucket")
            .withColumn("_is_batch", F.lit(False))
            .unionByName(bucketed_b.withColumn("_is_batch", F.lit(True)))
        )
        if max_bucket is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("band_idx", "bucket")
            all_rows = (
                all_rows.withColumn("_n", F.count(F.lit(1)).over(w))
                .filter(F.col("_n") <= max_bucket)
                .drop("_n")
            )
        bat = all_rows.filter(F.col("_is_batch")).select(
            F.col(id_col).alias("_bid"), "band_idx", "bucket"
        )
        cor = all_rows.filter(~F.col("_is_batch")).select(
            F.col(id_col).alias("_cid"), "band_idx", "bucket"
        )
    cross = (
        bat.join(cor, ["band_idx", "bucket"])
        .filter(F.col("_bid") != F.col("_cid"))
        .select(
            F.least("_bid", "_cid").alias(f"{id_col}_a"),
            F.greatest("_bid", "_cid").alias(f"{id_col}_b"),
        )
    )
    bb = (
        bat.join(
            bat.select(F.col("_bid").alias("_bid2"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("_bid") < F.col("_bid2"))
        .select(
            F.col("_bid").alias(f"{id_col}_a"), F.col("_bid2").alias(f"{id_col}_b")
        )
    )
    # the candidate set feeds THREE consumers (the verify join, the
    # matched-id projection, and through it the corpus-set fetch);
    # unpinned, the whole bucket-join subtree would re-execute for
    # each — pin it (post-LSH candidates are orders of magnitude
    # smaller than the corpus; the dedup_clusters sizing argument)
    cands = pin(
        cross.unionByName(bb).distinct(),
        tag="minhash_probe_cands",
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    # shingle sets: batch side from the pinned batch prep; corpus side
    # from matched index rows only (one row per doc — _shh is repeated
    # identically on all of a doc's band rows)
    matched = cands.select(F.col(f"{id_col}_a").alias(id_col)).unionByName(
        cands.select(F.col(f"{id_col}_b").alias(id_col))
    ).distinct()
    corpus_sets = index_sets.join(matched, id_col, "left_semi").select(
        id_col, "_shh"
    )
    # disjoint-ids contract + both inputs unique per id ⇒ plain union
    sets = prepped_b.unionByName(corpus_sets)
    sa = sets.select(F.col(id_col).alias(f"{id_col}_a"), F.col("_shh").alias("_shh_a"))
    sb = sets.select(F.col(id_col).alias(f"{id_col}_b"), F.col("_shh").alias("_shh_b"))
    return (
        cands.join(sa, f"{id_col}_a")
        .join(sb, f"{id_col}_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_shh_a", "_shh_b")).cast("double")
            / F.size(F.array_union("_shh_a", "_shh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(f"{id_col}_a", f"{id_col}_b", "jaccard")
    )


def minhash_probe_then_absorb(
    spark,
    batch_docs: DataFrame,
    index_root: str,
    id_col: str,
    text_col: str,
    batch_tag: str,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = None,
) -> None:
    """One incremental-crawl step of streaming corpus dedup: probe
    the published index at ``index_root`` (every ``buckets/*`` and
    ``sets/*`` sub-publish so far), WRITE the found pairs, then
    absorb the batch — append its bucket rows and shingle sets as a
    new sub-publish so later crawls dedup against it too. The
    per-tag ``mode("overwrite")`` writes make a replayed micro-batch
    (checkpoint recovery re-delivers the same batch_id) idempotent:
    it rewrites the same three directories with the same content —
    the crash-replay discipline of plans/txn.py without a commit
    protocol, because the tag IS the commit id.

    Ordering: pairs are materialized BEFORE the absorb writes — a
    lazy pairs frame read after absorb would see the batch's own
    rows in the index and double-count batch↔batch pairs.

    Law (pinned in tests/test_r12_ops.py): after absorbing crawls
    B1..Bn in ANY order, the union of written pairs equals the
    one-shot pair query over corpus ∪ B1 ∪ … ∪ Bn restricted to
    pairs involving ≥1 crawled doc — each pair is discovered exactly
    once, when its second member arrives. Exact for
    ``max_bucket=None`` (the default here); with a cap the exclusion
    is by bucket population AT ARRIVAL TIME, not the final union —
    document that choice if you enable it.

    At 100 TB each sub-publish is one batch's worth of files; compact
    periodically (the file-manifest machinery) and, for the
    counts-path cap, merge each batch's bucket counts into the
    published counts table (elementwise sum — the histogram merge
    law)."""
    # exclude this batch's OWN sub-publish from the probe's read: on
    # a checkpoint replay the tag already exists, and probing one's
    # own absorbed rows both violates the disjoint-ids contract
    # (duplicate set rows for the batch ids) and would double the
    # batch↔batch pairs — the replay must see exactly the pre-state
    def _published(kind: str) -> DataFrame:
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{index_root}/{kind}"
        )
        return (
            df.withColumn("_pub_path", F.col("_metadata.file_path"))
            .filter(~F.col("_pub_path").contains(f"/{batch_tag}/"))
            .drop("_pub_path")
        )

    pairs = minhash_probe_portable(
        batch_docs,
        _published("buckets"),
        _published("sets"),
        id_col,
        text_col,
        shingle_n,
        num_hashes,
        bands,
        jaccard_threshold,
        max_bucket,
    )
    pairs.write.mode("overwrite").parquet(f"{index_root}/pairs/{batch_tag}")
    nb, ns = minhash_index_portable(
        batch_docs, id_col, text_col, shingle_n, num_hashes, bands
    )
    nb.write.mode("overwrite").parquet(f"{index_root}/buckets/{batch_tag}")
    ns.write.mode("overwrite").parquet(f"{index_root}/sets/{batch_tag}")
    # the probe/index faces pin per call; a long-lived stream must
    # not accrete one cache per micro-batch
    from hr_moderndatapipeline_spark.cache import release_pins

    for tag in ("minhash_portable", "minhash_probe_batch", "minhash_probe_cands"):
        release_pins(spark, tag=tag)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iterations: int = 20,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    assigns every id the minimum id reachable through pairs — the
    cluster representative to KEEP; all other members are the
    near-duplicates to drop. The step near-dup pipelines need after
    pair detection (pairs alone don't say which doc survives when
    A~B and B~C but A≁C).

    Two execution paths, chosen by edge count:

    - ``count <= driver_threshold``: union-find on the collected
      edge list. After LSH/Jaccard verification the edge list is
      orders of magnitude smaller than the corpus; a bounded
      O(edges) collect plus O(edges·α) driver work replaces
      O(diameter) distributed rounds of join+shuffle+action — the
      hybrid every production near-dup pipeline uses. The bound is
      explicit: at most ``driver_threshold`` edge rows ever move to
      the driver.
    - above the threshold (the 100 TB case): iterative min-label
      propagation — each round joins labels across edges both ways
      and keeps the elementwise min, converging in O(diameter)
      rounds (near-dup clusters are shallow); ``localCheckpoint``
      truncates lineage so round N doesn't replay rounds 1..N-1.
      Convergence is read from a flag aggregated over the same
      checkpointed round result — no extra join. Raises if not
      converged within ``max_iterations``.

    Returns (member_id, cluster_id) for every id appearing in pairs.

    Side effect: the eager ``localCheckpoint`` executes the entire
    upstream pair-detection pipeline at call time, and checkpointed
    blocks live only on executors (no lineage fallback) — executor
    loss recomputes nothing. Right for iterative local/batch use; on
    a long-lived elastic cluster prefer a reliable ``checkpoint()``
    directory for the edge list.
    """
    # Materialize the edge list ONCE (eager localCheckpoint): every
    # propagation round joins it (plus the convergence check), and
    # without the cut each round would re-execute the entire upstream
    # pair-detection pipeline — measured 10× wall on the LSH-verified
    # pair graph. The edge list is pairs, not corpus: small by
    # construction.
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()  # free: reads the checkpointed blocks
    if n_edges <= driver_threshold:
        return _unionfind_clusters(edges)

    # undirected: propagate both directions
    both = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        edges.select(F.col("a").alias("id"))
        .unionByName(edges.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    for _ in range(max_iterations):
        # min neighbor label per node
        neigh = (
            both.join(labels, both["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("cluster_id").alias("_nbr_min"))
        )
        updated = (
            labels.join(neigh, labels["id"] == neigh["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.coalesce(F.col("_nbr_min"), F.col("cluster_id")) < F.col("cluster_id"))
                .cast("int")
                .alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = updated.select("id", "cluster_id")
        # Aggregate over the checkpointed blocks: one cheap action,
        # no label-vs-label join.
        if updated.agg(F.max("_changed")).first()[0] == 0:
            return labels.select(F.col("id").alias("member_id"), "cluster_id")
    raise RuntimeError(f"dedup_clusters did not converge in {max_iterations} iterations")


def _unionfind_clusters(edges: DataFrame) -> DataFrame:
    """Driver-side connected components for bounded edge lists:
    path-compressed union-find, then min-member representative per
    component (identical labeling to the distributed path)."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            parent[ra] = rb
    rep: dict = {}
    for node in parent:
        root = find(node)
        if root not in rep or node < rep[root]:
            rep[root] = node
    out = [(node, rep[find(node)]) for node in parent]
    schema = T.StructType(
        [
            T.StructField("member_id", edges.schema[0].dataType),
            T.StructField("cluster_id", edges.schema[1].dataType),
        ]
    )
    return edges.sparkSession.createDataFrame(out, schema)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.8,
    salt: int = 8,
) -> DataFrame:
    """Exact word-set Jaccard over candidate pairs blocked by
    ``block_col`` (e.g. source, length bucket, or an LSH bucket).
    Blocking keeps the self-join linear in block sizes — never run
    this unblocked at scale.

    The block self-join is salted ``salt`` ways: with few large
    blocks, an unsalted join funnels each block's O(n²) pair math
    into one task. Side A gets a content-derived salt; side B is
    replicated once per salt value — pair coverage is exact, and
    each block's work spreads across ``salt`` tasks.

    Word sets are reduced map-side to ``array<long>`` xxhash64
    values (same representation as the MinHash verifier): set sizes —
    hence Jaccard — are exact up to 64-bit collisions within a single
    doc pair (negligible), the intersect/union runs on fixed-width
    longs instead of strings, and the replicated join side ships ~10×
    fewer bytes. Measured ~2× faster end-to-end at sf0.1."""
    d = df.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.transform(
            F.array_distinct(F.split(F.col(text_col), " ")), lambda s: F.xxhash64(s)
        ).alias("_words"),
    ).withColumn("_n", F.size("_words"))
    a = d.toDF(f"{id_col}_a", "_blk", "_words_a", "_n_a").withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(f"{id_col}_a")), F.lit(salt)).cast("int")
    )
    b = (
        d.toDF(f"{id_col}_b", "_blk", "_words_b", "_n_b")
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    )
    # Size-ratio prefilter: |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥
    # max(|A|,|B|), so jaccard ≤ min/max — two-int compare culls
    # most pairs before the O(|A|+|B|) intersect/union work.
    size_ok = (
        F.least("_n_a", "_n_b").cast("double")
        / F.greatest("_n_a", "_n_b").cast("double")
        >= threshold
    )
    return (
        a.join(b, ["_blk", "_salt"])
        .filter((F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & size_ok)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_words_a", "_words_b")).cast("double")
            / F.size(F.array_union("_words_a", "_words_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("_blk").alias(block_col), f"{id_col}_a", f"{id_col}_b", "jaccard")
    )


def _prefix_jaccard_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    stop_df_ratio: float | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared stages of ``prefix_jaccard_pairs``: (sorted_docs,
    candidate id pairs). Split out so fixtures can COUNT the
    candidate set the prefix filter emits (the AllPairs cost-model
    quantity: candidates vs brute-force C(n,2)) without duplicating
    the stage logic — ``prefix_jaccard_candidates`` is the public
    face."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    d = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("_words"),
    )
    tok = d.select(F.col(id_col), F.explode("_words").alias("_w"))
    dfreq = tok.groupBy("_w").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    if stop_df_ratio is not None:
        if not (0.0 < stop_df_ratio <= 1.0):
            raise ValueError(
                f"stop_df_ratio must be in (0, 1], got {stop_df_ratio}"
            )
        cutoff = int(stop_df_ratio * d.count())
        dfreq = dfreq.filter(F.col("_df") <= cutoff)
    # the token→df inner join below is ALSO the stopword filter: a
    # token with no surviving dfreq row vanishes from every doc's
    # sorted array, and the verify stage reads those arrays — the
    # filtered semantics flow through candidates AND verification
    sorted_docs = (
        tok.join(dfreq, "_w")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_df"), F.col("_w")))
                ),
                lambda st: st["_w"],
            ).alias("_arr"),
            F.count(F.lit(1)).cast("int").alias("_n"),
        )
    )
    plen = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")).cast("int") + 1
    pref = sorted_docs.select(
        F.col(id_col),
        "_n",
        F.explode(F.slice("_arr", 1, plen)).alias("_w"),
    )
    a = pref.toDF(f"{id_col}_a", "_n_a", "_w")
    b = pref.toDF(f"{id_col}_b", "_n_b", "_w")
    size_ok = (
        F.least("_n_a", "_n_b").cast("double")
        / F.greatest("_n_a", "_n_b").cast("double")
        >= threshold
    )
    cand = (
        a.join(b, "_w")
        .filter((F.col(f"{id_col}_a") < F.col(f"{id_col}_b")) & size_ok)
        .select(f"{id_col}_a", f"{id_col}_b")
        .distinct()
    )
    return sorted_docs, cand


def prefix_jaccard_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    stop_df_ratio: float | None = None,
) -> DataFrame:
    """The candidate (``{id}_a``, ``{id}_b``) pairs the prefix filter
    generates BEFORE verification — the cost-model observable of the
    AllPairs family (candidate count vs brute-force C(n,2) is what
    'sub-quadratic' means). Measured by tools/zipf_corpus_fixture.py
    on a natural-vocabulary corpus; same stages as
    ``prefix_jaccard_pairs``."""
    return _prefix_jaccard_stages(
        df, id_col, text_col, threshold, stop_df_ratio
    )[1]


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    stop_df_ratio: float | None = None,
) -> DataFrame:
    """EXACT word-set Jaccard ≥ t pairs over the WHOLE corpus via
    prefix filtering (the AllPairs/PPJoin family — Chaudhuri et al.
    2006, Bayardo et al. 2007; public method): order every doc's
    distinct words by ascending global document frequency (rare
    first, ties lexicographic), index only each doc's PREFIX of
    ``n − ceil(t·n) + 1`` tokens, and generate a candidate pair only
    when two prefixes share a token. The prefix theorem makes this
    LOSSLESS for Jaccard ≥ t (two sets similar enough must overlap
    within these prefixes — property-tested against brute force), so
    unlike source/LSH blocking there is no recall budget — this is
    the unblocked-exactness column of the near-dup family.

    Scale shape: token explode → df aggregate (1 shuffle) → join
    token→df → per-doc sort (1 shuffle on id) → prefix explode →
    equi-join on the prefix TOKEN shipping only (token, id, n) —
    the word arrays join back by id for verification, never riding
    the token join. Rare-first ordering makes hot tokens
    systematically UNLIKELY in prefixes (a token in many prefixes
    has high df and sorts out of them) — the skew argument blocking
    needs salting for. Verification is the exact intersect/union on
    the raw word arrays with the two-int size-ratio cull first.

    ``stop_df_ratio`` is the documented mitigation for corpora whose
    vocabulary is too common for rare-first prefixes to discriminate
    (SCALING.md r8: this synthetic corpus): tokens appearing in more
    than that FRACTION of documents are removed from the word sets
    BEFORE similarity — the standard stopword-filtered Jaccard, an
    explicit SEMANTICS change (similarity is then over the reduced
    sets; docs reduced to nothing drop out), not a recall budget on
    the same semantics. One bounded count() scalar prices the cutoff.

    Returns (``{id}_a``, ``{id}_b``, jaccard), a < b."""
    sorted_docs, cand = _prefix_jaccard_stages(
        df, id_col, text_col, threshold, stop_df_ratio
    )
    wa = sorted_docs.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col("_arr").alias("_wa")
    )
    wb = sorted_docs.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col("_arr").alias("_wb")
    )
    return (
        cand.join(wa, f"{id_col}_a")
        .join(wb, f"{id_col}_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_wa", "_wb")).cast("double")
            / F.size(F.array_union("_wa", "_wb")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(f"{id_col}_a", f"{id_col}_b", "jaccard")
    )


def _containment_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    stop_df_ratio: float | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared stages of ``containment_pairs``: (sorted_docs,
    candidate (_inner, _outer) pairs) — split out for the same
    candidate-count measurement as ``_prefix_jaccard_stages``."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    d = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("_words"),
    )
    tok = d.select(F.col(id_col), F.explode("_words").alias("_w"))
    dfreq = tok.groupBy("_w").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    if stop_df_ratio is not None:
        if not (0.0 < stop_df_ratio <= 1.0):
            raise ValueError(
                f"stop_df_ratio must be in (0, 1], got {stop_df_ratio}"
            )
        cutoff = int(stop_df_ratio * d.count())
        dfreq = dfreq.filter(F.col("_df") <= cutoff)
    sorted_docs = (
        tok.join(dfreq, "_w")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("_df"), F.col("_w")))),
                lambda st: st["_w"],
            ).alias("_arr"),
            F.count(F.lit(1)).cast("int").alias("_n"),
        )
    )
    plen = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")).cast("int") + 1
    probe = sorted_docs.select(
        F.col(id_col).alias("_inner"),
        F.col("_n").alias("_n_in"),
        F.explode(F.slice("_arr", 1, plen)).alias("_w"),
    )
    index = (
        tok.join(dfreq.select("_w"), "_w")  # stopword-filtered full index
        .select(F.col(id_col).alias("_outer"), "_w")
        .join(
            sorted_docs.select(
                F.col(id_col).alias("_outer"), F.col("_n").alias("_n_out")
            ),
            "_outer",
        )
    )
    smaller = (F.col("_n_in") < F.col("_n_out")) | (
        (F.col("_n_in") == F.col("_n_out")) & (F.col("_inner") < F.col("_outer"))
    )
    cand = (
        probe.join(index, "_w")
        .filter((F.col("_inner") != F.col("_outer")) & smaller)
        .select("_inner", "_outer")
        .distinct()
    )
    return sorted_docs, cand


def containment_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    stop_df_ratio: float | None = None,
) -> DataFrame:
    """Candidate (``_inner``, ``_outer``) pairs from the one-sided
    prefix probe BEFORE verification — the containment join's
    cost-model observable (see ``prefix_jaccard_candidates``)."""
    return _containment_stages(df, id_col, text_col, threshold, stop_df_ratio)[1]


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    stop_df_ratio: float | None = None,
) -> DataFrame:
    """ASYMMETRIC set-containment pairs: C(x→y) = |x∩y| / |x| ≥ t
    with |x| ≤ |y| (ties by id) — "document x is (nearly) contained
    in y", the sub-document duplication signal Jaccard misses
    entirely (a paragraph quoted inside a long page has high
    containment but tiny Jaccard; Broder's containment, public
    method). The near-dup family's fourth semantics column next to
    resemblance (jaccard/minhash), Hamming (simhash), and edit
    distance.

    Candidate generation is one-sided prefix filtering: C ≥ t forces
    |x∩y| ≥ ⌈t·|x|⌉, so x's rare-first prefix of ``|x| − ⌈t·|x|⌉ + 1``
    tokens must hit y SOMEWHERE — x probes with its prefix, y is
    indexed in FULL (no y-prefix shortcut exists without a size
    bound; that full posting side is the honest cost of asymmetric
    containment). Lossless by the same argument as
    ``prefix_jaccard_pairs`` (the minimum shared token is inside x's
    prefix and trivially inside y's full index); property-tested
    against brute force.

    ``stop_df_ratio``: same stopword-filtered-semantics mitigation
    as ``prefix_jaccard_pairs`` (containment is then over the
    reduced sets).

    Returns (``inner_id``, ``outer_id``, containment): inner ⊆~
    outer, inner strictly smaller or equal-size-lower-id."""
    sorted_docs, cand = _containment_stages(
        df, id_col, text_col, threshold, stop_df_ratio
    )
    wi = sorted_docs.select(
        F.col(id_col).alias("_inner"), F.col("_arr").alias("_wi")
    )
    wo = sorted_docs.select(
        F.col(id_col).alias("_outer"), F.col("_arr").alias("_wo")
    )
    return (
        cand.join(wi, "_inner")
        .join(wo, "_outer")
        .withColumn(
            "containment",
            F.size(F.array_intersect("_wi", "_wo")).cast("double")
            / F.size("_wi").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("_inner").alias("inner_id"),
            F.col("_outer").alias("outer_id"),
            "containment",
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_dist: int = 4,
    band_width: int | None = None,
    salt: int = 4,
) -> DataFrame:
    """Near-identical string pairs (Levenshtein ≤ ``max_dist``) with
    TWO-key blocking: ``block_col`` (e.g. nation, source) AND a string-
    length band. Edit distance ≤ d bounds the length difference by d,
    so banding by ``floor(len / (d+1))`` and probing each row's own
    band plus both neighbours is recall-safe — every qualifying pair
    lands in bands at most 1 apart, and because side B emits three
    DISTINCT bands each candidate pair is generated exactly once.
    This turns the within-block self-join from O(n²) into
    O(Σ band²): with block sizes that grow with the corpus (the
    nation-only blocking at 100× data), the band key is what keeps
    candidate generation linear-ish.

    The join is additionally salted ``salt`` ways (same scheme as
    ``jaccard_pairs``: content salt on A, replicate B) so one hot
    (block, band) cell spreads across tasks. A cheap integer
    length-difference prefilter runs before the O(len²) Levenshtein,
    and the distance call itself passes the threshold so the JVM
    implementation early-terminates rows that exceed it."""
    band_width = band_width or (max_dist + 1)
    if band_width < max_dist + 1:
        # The ±1-neighbor-band probe is only recall-safe when lengths
        # within max_dist of each other can differ by at most one band:
        # len diff ≤ max_dist < band_width. A narrower band silently
        # drops qualifying pairs 2+ bands apart (ADVICE r4).
        raise ValueError(
            f"band_width ({band_width}) must be >= max_dist + 1 "
            f"({max_dist + 1}): narrower bands break the +/-1 "
            "neighbor-band recall guarantee"
        )
    base = (
        df.select(
            F.col(id_col),
            F.col(block_col).alias("_blk"),
            F.col(text_col).alias("_txt"),
        )
        .withColumn("_len", F.length("_txt"))
        .withColumn("_band", F.floor(F.col("_len") / band_width))
    )
    a = base.toDF(f"{id_col}_a", "_blk", "_txt_a", "_len_a", "_band").withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(f"{id_col}_a")), F.lit(salt)).cast("int")
    )
    b = (
        base.toDF(f"{id_col}_b", "_blk", "_txt_b", "_len_b", "_band0")
        .withColumn(
            "_band",
            F.explode(
                F.array(
                    F.col("_band0") - 1, F.col("_band0"), F.col("_band0") + 1
                )
            ),
        )
        .drop("_band0")
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    )
    return (
        a.join(b, ["_blk", "_band", "_salt"])
        .filter(
            (F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
            & (F.abs(F.col("_len_a") - F.col("_len_b")) <= max_dist)
        )
        .withColumn(
            "edit_dist", F.levenshtein("_txt_a", "_txt_b", threshold=max_dist)
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist))
        .select(F.col("_blk").alias(block_col), f"{id_col}_a", f"{id_col}_b", "edit_dist")
    )


def golden_records(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    rules: dict[str, str],
) -> DataFrame:
    """Survivorship: collapse each entity cluster to ONE golden
    record — the master-data-management step after matching
    (`edit_distance_pairs` / `jaccard_pairs`) and clustering
    (`dedup_clusters`). ``clusters`` is the (member_id, cluster_id)
    assignment; entities absent from it are singletons and survive
    as their own cluster. ``rules`` maps each surviving column to a
    field-wise rule: ``"max"`` / ``"min"`` (deterministic — no
    "first" rule on purpose: first-wins depends on row order, which
    a distributed engine does not define).

    Plan: the cluster assignment is pairs-derived and therefore tiny
    relative to the entity table — broadcast it onto the entities
    (no shuffle of the big side), then one groupBy on cluster_id.
    Emits cluster_id, n_members, and the survived fields."""
    allowed = {"max", "min"}
    bad = {r for r in rules.values()} - allowed
    if bad:
        raise ValueError(f"unknown survivorship rules {bad}; allowed: {allowed}")
    assign = clusters.select(
        F.col("member_id").alias(id_col), F.col("cluster_id")
    )
    joined = df.join(F.broadcast(assign), id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    aggs = [
        getattr(F, rule)(col).alias(f"{rule}_{col}") for col, rule in rules.items()
    ]
    return joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"), *aggs
    )
