"""Deterministic sampling and sequence packing for training-data
pipelines (beyond-reference capability, alongside operators/text.py).

Training corpora are MIXED, not dumped: each source gets a sampling
weight (upsample books, downsample web), and documents are packed
into fixed token budgets for efficient sequence batching. Both
operators here are deterministic by construction — content/key-
derived, no ``rand()`` — so a retried task, a re-run, and the DuckDB
oracle all select the exact same rows (the same property the engine's
O4 ``deterministic_sample`` and the U1 feature UDFs enforce; the
reference's ``random()``-based sampling,
jobs/bronze/ingest_change_source.py:81, breaks under retry).
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth's multiplicative constant — a cheap integer mixer available
#: as plain arithmetic in ANY engine (unlike xxhash64/murmur, which
#: differ across engines and would make cross-engine checks
#: impossible). Quality is ample for percentage bucketing.
_KNUTH = 2654435761

#: reduce keys mod 2^31 BEFORE the Knuth multiply so the product
#: stays under 2^63 for EVERY bigint key: (2^31−1)·2654435761 ≈
#: 5.7e18 < 2^63−1. The old unreduced form relied on signed-wrap
#: semantics that Spark 4's ANSI-on default turns into an
#: ARITHMETIC_OVERFLOW throw for keys above ~3.47e9 (ADVICE r7,
#: operators/sampling.py:85) — invisible at test SFs, a hard error
#: on a 100 TB id space. The matching oracles reduce identically
#: (`% 2147483648` on the HUGEINT key), so both engines compute the
#: same draw at every key range; identity for keys < 2^31, so all
#: existing selections are unchanged. Contract: parity holds for
#: NONNEGATIVE keys (pmod here vs sign-following % in ANSI SQL).
_KEY_REDUCER = 2147483648


def _mix32(key: Column) -> Column:
    """(pmod(key, 2^31) · KNUTH) mod 2^32 — the shared ANSI-safe
    32-bit mixing draw behind every deterministic sampler here."""
    return F.pmod(
        F.pmod(key, F.lit(_KEY_REDUCER)) * F.lit(_KNUTH), F.lit(4294967296)
    )


def det_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic pseudo-uniform bucket in [0, buckets) from an
    integer key: (pmod(key, 2^31) * 2654435761 mod 2^32) mod buckets.
    Pure overflow-free integer arithmetic (see ``_KEY_REDUCER``),
    restatable in ANSI SQL."""
    return F.pmod(_mix32(key), F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (data mixing): keep a row
    iff its key bucket falls under the stratum's percentage. Pure
    filter — no shuffle, no state, exact same selection on every
    run/engine. Fractions are percents rounded to 1% granularity."""
    default_pct = F.lit(int(round(default * 100)))
    if not fractions:
        pct = default_pct
    else:
        pct = reduce(
            lambda acc, kv: acc.when(
                F.col(stratum_col) == kv[0], F.lit(int(round(kv[1] * 100)))
            ),
            fractions.items(),
            F,
        ).otherwise(default_pct)
    return df.filter(det_bucket(F.col(key_col)) < pct)


def stratified_fixed_n(
    df: DataFrame,
    stratum_cols: Sequence[str],
    key_col: str,
    n: int,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, selected by
    deterministic hash rank over the integer key (the fixed-size
    companion to ``stratified_sample``'s fraction filter): rank =
    row_number ordered by (key·KNUTH mod 2^32, key) within the
    stratum — content-blind, reproducible on every run/engine, and
    restatable in ANSI SQL. One shuffle on the stratum key; the
    per-stratum window state is the stratum itself (same caveat as
    any group-limit: pre-aggregate degenerate strata first). Output:
    input columns + ``sample_rank``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    hk = _mix32(F.col(key_col))
    w = Window.partitionBy(*stratum_cols).orderBy(hk.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .withColumn("sample_rank", F.col("sample_rank").cast("int"))
    )


def training_shuffle(
    df: DataFrame, key_col: str, num_shards: int = 32
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    (shard, pos) address — shard from the key's multiplicative-hash
    bucket, pos by hash order within the shard. Reading shards
    round-robin yields a reproducible pseudo-random global order
    (same on every run, retry, and engine — no ``rand()``), while the
    per-shard window keeps the sort distributed: there is never a
    single-partition global ordering, the shards ARE the parallelism
    at 100 TB."""
    hv = _mix32(F.col(key_col))
    w = Window.partitionBy("shard").orderBy(F.col("_hv").asc(), F.col(key_col).asc())
    return (
        df.withColumn("_hv", hv)
        .withColumn("shard", F.pmod(F.col("_hv"), F.lit(num_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1))
        .drop("_hv")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    splits: Mapping[str, float] | None = None,
    broadcast_clusters: bool = True,
) -> DataFrame:
    """Cluster-aware train/val/test assignment: near-duplicate
    documents must never straddle splits (a test doc whose near-copy
    sits in train is leaked eval). Every document is assigned by the
    deterministic bucket of its dedup CLUSTER representative —
    ``coalesce(cluster_id, id)``, singletons are their own unit — so
    an entire near-dup cluster always lands in one split, on every
    run and engine.

    ``clusters`` is (member_id, cluster_id) from ``dedup_clusters``;
    it is bounded by the near-dup pair list, orders of magnitude
    smaller than the corpus, so the default broadcast join keeps the
    corpus side shuffle-free. Split fractions are percents rounded to
    1% granularity, assigned by cumulative bucket ranges.
    """
    fracs = dict(splits or {"train": 0.9, "val": 0.05, "test": 0.05})
    pcts = [(name, int(round(f * 100))) for name, f in fracs.items()]
    if sum(p for _, p in pcts) != 100:
        raise ValueError(f"split percents must sum to 100: {pcts}")
    c = clusters.select(
        F.col("member_id").alias(id_col), F.col("cluster_id").alias("_unit")
    )
    joined = df.join(
        F.broadcast(c) if broadcast_clusters else c, id_col, "left"
    ).withColumn("_unit", F.coalesce(F.col("_unit"), F.col(id_col)))
    bucket = det_bucket(F.col("_unit"))
    if len(pcts) == 1:
        split = F.lit(pcts[0][0])
    else:
        expr, lo = F, 0
        for name, pct in pcts[:-1]:
            expr = expr.when(bucket < F.lit(lo + pct), F.lit(name))
            lo += pct
        split = expr.otherwise(F.lit(pcts[-1][0]))
    return joined.withColumn("split", split).drop("_unit")


def purged_time_split(
    df: DataFrame,
    ts_col: str,
    purge_start: str,
    test_start: str,
    split_col: str = "split",
) -> DataFrame:
    """Temporal train/test split with a PURGE gap (the de Prado
    time-series discipline): rows before ``purge_start`` train, rows
    from ``test_start`` on test, and rows in between are PURGED —
    dropped from both sides so label/feature windows that straddle
    the cutoff cannot leak future information into training (the
    failure a random or group split cannot prevent on temporal
    data). A pure map-side projection: no shuffle, fully pushdown-
    friendly, deterministic on every engine.

    Complements ``leakage_safe_split`` (group exclusivity): that one
    guards against NEAR-DUP leakage, this one against TEMPORAL
    leakage.

    Raises ``ValueError`` when ``purge_start > test_start``: with
    the arguments swapped, the first ``when`` clause would win and
    silently label the [test_start, purge_start) rows 'train' —
    exactly the leak this operator exists to prevent (ADVICE r10)."""
    from datetime import datetime

    try:
        p0 = datetime.fromisoformat(str(purge_start))
        t0 = datetime.fromisoformat(str(test_start))
    except ValueError:
        p0 = t0 = None  # unparseable format: fall through to Spark's cast
    if p0 is not None and p0 > t0:
        raise ValueError(
            f"purge_start ({purge_start!r}) must be <= test_start "
            f"({test_start!r}); swapped arguments would silently label "
            "the purge window 'train'"
        )
    ts = F.col(ts_col)
    split = (
        F.when(ts < F.lit(purge_start).cast("timestamp"), F.lit("train"))
        .when(ts < F.lit(test_start).cast("timestamp"), F.lit("purged"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count_col: Column,
    budget: int,
) -> DataFrame:
    """Contiguous sequence packing: within each group (shard), order
    documents by id, accumulate token counts, and assign pack_id =
    floor(running_start / budget) — the streaming-friendly
    approximation of bin packing every pretraining data loader uses.
    The window partitions by ``group_col`` (the shard key), so no
    global single-partition window exists: at 100 TB the shards ARE
    the parallelism."""
    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    toks = token_count_col
    cum = F.sum(toks).over(w)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        toks.cast("int").alias("n_tokens"),
        F.floor((cum - toks) / F.lit(budget)).cast("int").alias("pack_id"),
    )


def weighted_keep(key: Column, keep_prob: Column) -> Column:
    """Deterministic Bernoulli draw: keep iff the key's pseudo-uniform
    draw in [0, 1) (Knuth multiplicative hash, 1e-6 granularity —
    same family as ``det_bucket``) falls below ``keep_prob``. Pure
    integer arithmetic against a scaled threshold: restatable in ANSI
    SQL, identical across runs, engines, partitionings, and task
    retries — the property ``rand()`` sampling loses on retry."""
    # pmod, not %: Spark's % follows the dividend's sign, so a
    # negative key (xxhash64-derived ids are negative half the time)
    # yields a negative draw that is < ANY threshold — rows kept
    # unconditionally even at keep_prob 0. det_bucket and
    # training_shuffle already wrap with pmod.
    draw = F.pmod(_mix32(key), F.lit(1_000_000))
    return draw.cast("double") < keep_prob * F.lit(1_000_000.0)


def domain_mix_weights(
    df: DataFrame,
    domain_col: str,
    token_count_col: Column,
    target_shares: Mapping[str, float] | None = None,
) -> DataFrame:
    """Per-domain resampling factors for training-mixture control:
    weight = target_share / actual_token_share. With no explicit
    targets every domain gets 1/n_domains (uniform rebalancing).
    One aggregation shuffle on the domain key; the share divisions
    are single operations over exact integer sums, so the doubles
    are bit-identical across engines. Downstream, pair the weight
    with ``weighted_keep``/repetition to hit the target mix."""
    agg = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    agg = agg.withColumn("_total", F.sum("n_tokens").over(w)).withColumn(
        "_n_domains", F.count(F.lit(1)).over(w)
    )
    if target_shares is None:
        target = F.lit(1.0) / F.col("_n_domains")
    else:
        if not target_shares:
            raise ValueError("target_shares must not be empty")
        # Explicit case per LISTED domain; anything unlisted gets
        # share 0.0 (weight 0 → excluded from the mix). A catch-all
        # otherwise() would silently hand the last entry's share to
        # every unlisted domain. Flat chained-when (one CaseWhen
        # node), not nested otherwise() wrapping — a nested tree is
        # O(#domains) deep and risks analyzer recursion limits on
        # wide mixes.
        target = None
        for name, share in target_shares.items():
            case = (F.col(domain_col) == name, F.lit(float(share)))
            target = F.when(*case) if target is None else target.when(*case)
        target = target.otherwise(F.lit(0.0))
    return agg.select(
        domain_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_total").cast("double")).alias(
            "actual_share"
        ),
        target.alias("target_share"),
        (
            target
            * F.col("_total").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("weight"),
    )


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Modeling via Importance
    Resampling"): featurize each document as hashed-unigram counts,
    fit bag-of-buckets unigram distributions for the TARGET slice
    (rows where ``target`` is true) and the RAW corpus, and score
    every document with the importance log-weight

        log w(d) = sum_tokens [ log p_target(b) - log p_raw(b) ]

    under add-one smoothing. High-weight documents look like the
    target domain; resample by weight (``weighted_keep`` /
    ``quality_topk_per_source``) to shift the training mixture.

    Engineering for cross-engine exactness and 100 TB:

    - Token → bucket via the polynomial char fold mod 1e9+7 then mod
      ``buckets`` (the ``doc_fingerprint`` hash): pure integer
      arithmetic restatable in ANSI SQL, unlike xxhash64.
    - The per-bucket log-ratio is quantized ONCE to integer
      micro-nats (``floor(lr*1e6 + 0.5)``); each document's weight is
      then an INTEGER sum of (count × quantized ratio) — associative,
      order-independent, bit-identical on any engine. The only
      engine-trusted float op is ``ln`` of identical doubles (≤1 ulp
      divergence, absorbed by the 1e-6 quantum — the
      event_type_pagerank ppb argument).
    - Shuffle ledger: one map-side-combinable aggregation of the
      exploded tokens into O(buckets) rows per distribution, an
      unpartitioned window ONLY over that O(buckets) aggregate (the
      domain_mix_weights precedent, never the corpus), a BROADCAST
      of the O(buckets) ratio table back onto the token stream, and
      one groupBy on the doc id. The corpus is never joined to
      itself and never passes through a single partition.
    """
    tok_hash = F.expr(
        f"aggregate(transform(sequence(1, length(_tok)), "
        f"i -> cast(ascii(substring(_tok, i, 1)) as bigint)), "
        f"0L, (acc, c) -> (acc * 31 + c) % 1000000007)"
    )
    from hr_moderndatapipeline_spark.operators.relational import rebalance

    # r12: three consumers (raw counts, target counts, the scored
    # join) each re-run the explode + interpreted char fold off the
    # scan; one shared rebalance exchange (reused across branches)
    # spreads that work cluster-wide when the scan is under-split
    toks = (
        rebalance(df)
        .select(
            F.col(id_col),
            target.alias("_is_target"),
            F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
        )
        .filter(F.length("_tok") > 0)
        .select(
            id_col, "_is_target", F.pmod(tok_hash, F.lit(buckets)).alias("_b")
        )
    )
    raw = toks.groupBy("_b").agg(F.count(F.lit(1)).alias("r_cnt"))
    tgt = toks.filter(F.col("_is_target")).groupBy("_b").agg(
        F.count(F.lit(1)).alias("t_cnt")
    )
    w = Window.partitionBy()  # over the O(buckets) aggregate only
    stats = (
        raw.join(tgt, "_b", "left")
        .select("_b", "r_cnt", F.coalesce(F.col("t_cnt"), F.lit(0)).alias("t_cnt"))
        .withColumn("_R", F.sum("r_cnt").over(w))
        .withColumn("_T", F.sum("t_cnt").over(w))
    )
    b = F.lit(float(buckets))
    lr = stats.select(
        "_b",
        F.floor(
            (
                F.log((F.col("t_cnt") + F.lit(1.0)) / (F.col("_T") + b))
                - F.log((F.col("r_cnt") + F.lit(1.0)) / (F.col("_R") + b))
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lr_micro"),
    )
    scored = (
        toks.join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_micro").alias("logweight_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("logweight_micro"), F.lit(0))
            .cast("bigint")
            .alias("logweight_micro"),
        )
    )


#: second multiplicative mixer (xxhash32 prime 2) so the per-rank
#: draws of one anchor decorrelate; same plain-arithmetic
#: cross-engine rationale as _KNUTH
_MIX2 = 2246822519


def negative_samples(
    df: DataFrame,
    id_col: str,
    n_items: int,
    k: int = 4,
    label_col: str | None = None,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive /
    metric-learning training pairs: each anchor gets ``k`` pseudo-
    random partner ids drawn WITHOUT ``rand()`` —

        neg = (id + 1 + mix(id, rank) mod (n-1)) mod n

    — so the draw can never return the anchor itself, is identical
    across runs, engines, partitionings, and task retries (the
    ``weighted_keep`` argument), and is restatable in ANSI SQL for
    the oracle. Ids must be dense ``[0, n_items)`` — exactly what
    ``assign_stable_ids`` produces; compose with it for tables
    without dense keys.

    With ``label_col``, each pair is joined back to the corpus for
    the partner's label and flagged ``is_false_negative`` when the
    labels collide — the standard filter/debias signal in-batch
    negative mining needs. The join-back is a plain equi-join on the
    id (shuffle or broadcast by size); the k-way explode is map-side.
    """
    if n_items < 2:
        raise ValueError("negative sampling needs at least 2 items")
    acols = [F.col(id_col)]
    if label_col:
        acols.append(F.col(label_col).alias("anchor_label"))
    ex = df.select(
        *acols,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank"),
    )
    draw = F.pmod(
        F.pmod(
            F.pmod(F.col(id_col), F.lit(_KEY_REDUCER)) * F.lit(_KNUTH)
            + F.col("neg_rank") * F.lit(_MIX2),
            F.lit(4294967296),
        ),
        F.lit(n_items - 1),
    )
    out = ex.withColumn(
        "neg_id", F.pmod(F.col(id_col) + 1 + draw, F.lit(n_items))
    )
    if not label_col:
        return out.select(id_col, "neg_rank", "neg_id")
    lbl = df.select(
        F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label")
    )
    return out.join(lbl, "neg_id").select(
        F.col(id_col),
        "neg_rank",
        "neg_id",
        "anchor_label",
        "neg_label",
        (F.col("anchor_label") == F.col("neg_label")).alias("is_false_negative"),
    )


def weighted_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement — the
    weighted-reservoir (A-Res, Efraimidis & Spirakis 2006; public
    method) priority rule ``priority_i = u_i^(1/w_i)`` with the top-n
    priorities selected — engineered for cross-engine EXACTNESS:

    - ``u_i`` is a deterministic content-addressed draw quantized to
      10 bits: ``p_i = mix32(key) mod 1023 + 1``, ``u_i = p_i/1024``
      (same Knuth mixer as every sampler here — stable under retries
      and engines, no RNG);
    - weights must be INTEGERS in {1,2,3,4} (domain/priority tiers,
      loudly asserted per row). Then ``u^(1/w)`` order-compares
      exactly as the INTEGER ``p^(12/w) · 1024^(12-12/w)`` (raise to
      the 12th power, common denominator 1024^12 < 10^38): pure
      DECIMAL(38,0)/HUGEINT arithmetic — zero float pow/log, so the
      selected SET is bit-identical on any engine, unlike the
      textbook ``-ln(u)/w`` float key whose libm ULP differences can
      flip the selection boundary.

    Scale shape: one map-side integer key per row + global top-n —
    Catalyst plans ``TakeOrderedAndProject`` (per-partition heaps,
    no full sort). Quantization to 10 bits trades draw granularity
    for exactness; ties broken by key ascending (deterministic).

    Returns the n selected rows with ``sample_rank`` 1..n."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("int")
    p = (F.pmod(_mix32(F.col(key_col)), F.lit(1023)) + F.lit(1)).cast(
        "decimal(38,0)"
    )
    m = F.lit(1024).cast("decimal(38,0)")

    def _ipow(base: Column, e: int) -> Column:
        out = base
        for _ in range(e - 1):
            out = (out * base).cast("decimal(38,0)")
        return out

    # u^(1/w) ~ p^(12/w) * 1024^(12 - 12/w); exponent pairs per tier.
    # The out-of-domain branch RAISES in the evaluated expression
    # itself (a separate assert-only column would be pruned as dead
    # by Catalyst and never fire).
    prio = (
        F.when(w == 1, _ipow(p, 12))
        .when(w == 2, _ipow(p, 6) * _ipow(m, 6))
        .when(w == 3, _ipow(p, 4) * _ipow(m, 8))
        .when(w == 4, _ipow(p, 3) * _ipow(m, 9))
        .otherwise(
            F.raise_error(
                F.lit("weighted_priority_sample: weight outside {1,2,3,4}")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
    )
    checked = df.withColumn("_prio", prio)
    top = checked.orderBy(F.col("_prio").desc(), F.col(key_col).asc()).limit(n)
    # the global window ranks only the n already-selected rows —
    # bounded by construction (like the top-k family)
    rk_win = Window.orderBy(F.col("_prio").desc(), F.col(key_col).asc())
    return (
        top.withColumn("sample_rank", F.row_number().over(rk_win))
        .drop("_prio")
    )
