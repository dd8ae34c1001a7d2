"""Natural-vocabulary (Zipf) corpus fixture for the prefix-filter
similarity joins (VERDICT r8 task 1).

The driver corpus has a ~30-word vocabulary, so document frequencies
are uniformly huge and the rare-token-first prefix cannot
discriminate — candidate generation approaches the quadratic the
AllPairs family exists to avoid (SCALING.md r8: 166.9 s / 90.9 s solo
at sf0.1). That refutes the cost model ON THAT GEOMETRY but says
nothing about the geometry the algorithm targets: natural text, where
word frequency follows Zipf's law and most of each document's
rare-first prefix has document frequency 1-10. This tool builds that
geometry deterministically and measures the cost-model quantity
directly:

- vocabulary of 150,000 words with P(rank r) ∝ 1/r^1.05 (Zipf);
- doc length lognormal (median ~90 tokens, clipped [20, 400]) — a
  web-page-ish length distribution;
- planted near-dup clusters (~4% of docs are copies of an earlier doc
  with 2-12% of token positions resampled — Jaccard lands both sides
  of the 0.9 threshold) and planted containments (~2% of docs are a
  contiguous ~30% slice of a longer doc) so verification has real
  work at every scale;
- two scales, 5,000 docs (the sf0.1 shape) and 50,000 docs (the sf1.0
  shape), SAME vocabulary — document frequencies scale 10x exactly as
  a growing crawl's would.

Measured per operator and scale (fresh lineages; SQLMetrics):

- candidate-pair count vs brute-force C(n,2) — the AllPairs claim IS
  "candidates ≪ C(n,2)"; sub-quadratic means the 10x-docs candidate
  growth is far below 100x;
- wall time of the full verified join, spill bytes, shuffle MiB,
  plan-fingerprint stability across the decade.

Two vocabulary regimes, because they answer different questions:

- FIXED vocabulary (default): both scales draw from the same 150k
  words. Document frequencies grow 10x with the corpus, so the
  coincidental-collision term Σ_t C(df_prefix_t, 2) grows ~x100 — the
  AllPairs worst-case shape, with the measured constant (~1e-4 of
  C(n,2)) showing how small the quadratic's coefficient is.
- HEAPS vocabulary (--heaps): vocabulary grows with the corpus as
  V(n) ∝ n^0.5 (Heaps' law, the empirical shape of real crawls) —
  new documents keep introducing new rare words, prefix document
  frequencies stay ~flat, and candidate growth should fall back
  toward linear. This is the geometry the operator actually targets.

Usage:
  python tools/zipf_corpus_fixture.py --gen      # build both corpora (~1 min)
  python tools/zipf_corpus_fixture.py            # measure, print JSON
  python tools/zipf_corpus_fixture.py --brute    # also brute-force-verify @5k
  python tools/zipf_corpus_fixture.py --gen --heaps   # Heaps-law corpora
  python tools/zipf_corpus_fixture.py --heaps         # measure those
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

ROOT = "/tmp/hr_mdp_zipffix"
VOCAB = 150_000
ZIPF_S = 1.05
SEED = 20260815
SCALES = (5_000, 50_000)
THRESHOLD = 0.9
CLONE_FRAC = 0.04
CONTAIN_FRAC = 0.02


HEAPS = False  # set by __main__: vocabulary grows as V(n) ∝ n^0.5


def _vocab(n_docs: int) -> int:
    if not HEAPS:
        return VOCAB
    # Heaps' law V = K·T^beta over total tokens T ≈ 110·n_docs;
    # K=40, beta=0.5 lands ~30k words at 5k docs, ~95k at 50k — the
    # English-crawl ballpark
    return max(1000, int(40 * (110 * n_docs) ** 0.5))


def _path(n: int) -> str:
    tag = "heaps_" if HEAPS else ""
    return f"{ROOT}/documents_{tag}{n}.parquet"


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for n_docs in SCALES:
        vocab = _vocab(n_docs)
        ranks = np.arange(1, vocab + 1, dtype=np.float64)
        p = 1.0 / ranks**ZIPF_S
        p /= p.sum()
        lengths = np.clip(
            np.exp(rng.normal(math.log(90.0), 0.5, size=n_docs)), 20, 400
        ).astype(np.int64)
        total = int(lengths.sum())
        flat = rng.choice(vocab, size=total, p=p)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        docs = [flat[offs[i]:offs[i + 1]].copy() for i in range(n_docs)]

        # planted near-dup clones: doc i := mutated copy of doc j<i
        n_clone = int(n_docs * CLONE_FRAC)
        clone_ids = rng.choice(
            np.arange(n_docs // 10, n_docs), size=n_clone, replace=False
        )
        for i in clone_ids:
            j = int(rng.integers(0, i))
            base = docs[j].copy()
            mut_frac = float(rng.uniform(0.02, 0.12))
            k = max(1, int(len(base) * mut_frac))
            pos = rng.choice(len(base), size=min(k, len(base)), replace=False)
            base[pos] = rng.choice(vocab, size=len(pos), p=p)
            docs[int(i)] = base

        # planted containments: doc i := contiguous ~30% slice of a
        # LONGER doc j (sub-document duplication, the containment
        # signal); i's set is ~contained in j's
        n_cont = int(n_docs * CONTAIN_FRAC)
        cont_ids = rng.choice(
            np.setdiff1d(np.arange(n_docs // 10, n_docs), clone_ids),
            size=n_cont,
            replace=False,
        )
        for i in cont_ids:
            j = int(rng.integers(0, i))
            src = docs[j]
            span = max(10, int(len(src) * 0.3))
            start = int(rng.integers(0, max(1, len(src) - span)))
            docs[int(i)] = src[start:start + span].copy()

        texts = [" ".join(f"w{t}" for t in d) for d in docs]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n_docs), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        pq.write_table(tbl, _path(n_docs))
        print(
            f"generated {_path(n_docs)}: {n_docs} docs, vocab={vocab}, "
            f"{os.path.getsize(_path(n_docs)) // 1024} KiB, "
            f"{n_clone} clones, {n_cont} containment plants"
        )


def measure(brute: bool) -> None:
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark.functions.execmetrics import executed_metrics
    from hr_moderndatapipeline_spark.operators.dedup import (
        containment_candidates,
        containment_pairs,
        prefix_jaccard_candidates,
        prefix_jaccard_pairs,
    )
    from hr_moderndatapipeline_spark.plans.fingerprint import plan_fingerprint

    spark = get_spark("zipf_fixture")
    ops = {
        "prefix_jaccard": (prefix_jaccard_candidates, prefix_jaccard_pairs),
        "containment": (containment_candidates, containment_pairs),
    }
    out: dict[str, dict] = {}
    for name, (cand_fn, pairs_fn) in ops.items():
        row: dict = {}
        for n in SCALES:
            docs = spark.read.parquet(_path(n))
            n_cand = cand_fn(docs, "doc_id", "text", THRESHOLD).count()
            # fresh lineage for the timed run (shuffle reuse otherwise
            # skips stages and "measures" ~0.03s)
            docs2 = spark.read.parquet(_path(n))
            pairs = pairs_fn(docs2, "doc_id", "text", THRESHOLD)
            fp = plan_fingerprint(pairs)
            t0 = time.time()
            n_pairs = len(pairs.toPandas())
            dt = round(time.time() - t0, 2)
            m = executed_metrics(pairs)
            spark.catalog.clearCache()
            c_n2 = n * (n - 1) // 2
            row[f"n{n}"] = {
                "candidates": n_cand,
                "c_n2": c_n2,
                "cand_frac_of_n2": round(n_cand / c_n2, 8),
                "pairs": n_pairs,
                "sec": dt,
                "spill_bytes": m["spill_bytes"],
                "shuffle_mib": round(m["shuffle_bytes"] / 1048576, 1),
                "fingerprint": fp,
            }
            print(
                f"{name} n={n}: cand={n_cand} ({n_cand / c_n2:.2e} of C(n,2)), "
                f"pairs={n_pairs}, {dt}s, spill={m['spill_bytes']}",
                flush=True,
            )
        lo, hi = (row[f"n{s}"] for s in SCALES)
        ratio = SCALES[1] / SCALES[0]
        row["cand_growth"] = (
            round(hi["candidates"] / lo["candidates"], 2)
            if lo["candidates"]
            else None
        )
        # growth exponent alpha: candidates ~ n^alpha across the decade
        row["cand_alpha"] = (
            round(math.log(hi["candidates"] / lo["candidates"]) / math.log(ratio), 2)
            if lo["candidates"] and hi["candidates"]
            else None
        )
        row["wall_growth"] = (
            round(hi["sec"] / lo["sec"], 2) if lo["sec"] > 0 else None
        )
        row["plan_stable"] = lo["fingerprint"] == hi["fingerprint"]
        out[name] = row

    if brute:
        # lossless pin at the measurement geometry (property tests pin
        # tiny corpora; this pins the 5k fixture): brute force via the
        # same size-ratio cull, then exact intersect/union
        docs = spark.read.parquet(_path(SCALES[0]))
        d = docs.select(
            "doc_id",
            F.array_distinct(F.split("text", " ")).alias("_w"),
        ).withColumn("_n", F.size("_w"))
        a = d.toDF("a", "_wa", "_na")
        b = d.toDF("b", "_wb", "_nb")
        size_ok = (
            F.least("_na", "_nb").cast("double")
            / F.greatest("_na", "_nb").cast("double")
            >= THRESHOLD
        )
        brute_pairs = (
            a.crossJoin(b)
            .filter((F.col("a") < F.col("b")) & size_ok)
            .withColumn(
                "j",
                F.size(F.array_intersect("_wa", "_wb")).cast("double")
                / F.size(F.array_union("_wa", "_wb")).cast("double"),
            )
            .filter(F.col("j") >= THRESHOLD)
            .select("a", "b")
        )
        got = prefix_jaccard_pairs(docs, "doc_id", "text", THRESHOLD).select(
            F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
        )
        n_brute = brute_pairs.count()
        n_missing = brute_pairs.exceptAll(got).count()
        n_extra = got.exceptAll(brute_pairs).count()
        out["brute_check_5k"] = {
            "brute_pairs": n_brute,
            "missing": n_missing,
            "extra": n_extra,
        }
        print(f"brute check @5k: {n_brute} pairs, missing={n_missing}, extra={n_extra}")
        assert n_missing == 0 and n_extra == 0, "prefix join lost pairs!"

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    HEAPS = "--heaps" in sys.argv[1:]
    if "--gen" in sys.argv[1:]:
        generate()
    else:
        measure("--brute" in sys.argv[1:])
