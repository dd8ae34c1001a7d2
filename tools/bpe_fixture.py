"""Natural word-length BPE fixture (VERDICT r8 task 3).

Round 8 attributed the fold face's cost to an O(L²)-in-word-length
accumulator term, but measured it on synthetic suffix geometry (the
stress generator's "+2 chars per word" transform). This tool builds a
corpus with a REALISTIC word-length distribution — frequent words
short, rare words long, the empirical shape of natural language —
and times the two faces head-to-head on it, so the "Arrow face is
the 100 TB path" guidance carries a constant measured at the
geometry it claims:

- 30,000-word vocabulary, Zipf frequencies (s=1.05);
- word length grows with rank: len(rank r) = clip(2 + 1.1·ln(1+r) +
  N(0,1), 2, 14) — top words 2-4 chars, tail words 9-14, giving a
  token-weighted mean of ~4.5 chars (English-like) vs the type mean
  of ~11;
- lowercase-letter words, deterministic per rank (seeded rng);
- 5,000 and 50,000 docs (the sf0.1/sf1.0 doc-count shapes), lognormal
  doc lengths, written as documents.parquet so the DRIVER QUERIES
  themselves (`bpe_tokenize`, `bpe_tokenize_arrow`) run unmodified
  against the fixture dir.

Measured per scale, fresh lineages, result equality asserted
(the Arrow face must stay bit-identical to the fold face here too —
this doubles as a natural-text equivalence pin):

Usage:
  python tools/bpe_fixture.py --gen   # build corpora (~30s)
  python tools/bpe_fixture.py         # measure, print JSON
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

ROOT = "/tmp/hr_mdp_bpefix"
VOCAB = 30_000
ZIPF_S = 1.05
SEED = 20260815
SCALES = (5_000, 50_000)
ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _dir(n: int) -> str:
    return f"{ROOT}/n{n}"


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    # one shared vocabulary: rank-dependent lengths, random letters
    lens = np.clip(
        (2 + 1.1 * np.log1p(np.arange(VOCAB)) + rng.normal(0, 1, VOCAB)).round(),
        2,
        14,
    ).astype(int)
    words = []
    for ln in lens:
        idx = rng.integers(0, len(ALPHABET), size=ln)
        words.append("".join(ALPHABET[i] for i in idx))
    words = np.array(words, dtype=object)
    p = 1.0 / np.arange(1, VOCAB + 1, dtype=np.float64) ** ZIPF_S
    p /= p.sum()
    tok_mean = float((p * lens).sum())
    print(f"vocab: type-mean len {lens.mean():.1f}, token-weighted {tok_mean:.2f}")

    for n_docs in SCALES:
        doc_lens = np.clip(
            np.exp(rng.normal(math.log(90.0), 0.5, size=n_docs)), 20, 400
        ).astype(np.int64)
        total = int(doc_lens.sum())
        flat = rng.choice(VOCAB, size=total, p=p)
        offs = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(doc_lens, out=offs[1:])
        texts = [
            " ".join(words[flat[offs[i]:offs[i + 1]]]) for i in range(n_docs)
        ]
        os.makedirs(_dir(n_docs), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n_docs), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            ),
            f"{_dir(n_docs)}/documents.parquet",
        )
        print(
            f"generated {_dir(n_docs)}: {n_docs} docs, "
            f"{os.path.getsize(f'{_dir(n_docs)}/documents.parquet') // 1024} KiB"
        )


def measure() -> None:
    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark.queries.dataops import (
        q_bpe_tokenize,
        q_bpe_tokenize_arrow,
    )

    spark = get_spark("bpe_fixture")
    out: dict[str, dict] = {}
    for n in SCALES:
        sf_dir = _dir(n)
        row: dict = {}
        # equality pin first (also warms the JIT for both faces)
        fold_rows = {
            r["doc_id"]: (r["n_chars"], r["n_pieces"])
            for r in q_bpe_tokenize(spark, sf_dir).collect()
        }
        arrow_rows = {
            r["doc_id"]: (r["n_chars"], r["n_pieces"])
            for r in q_bpe_tokenize_arrow(spark, sf_dir).collect()
        }
        assert fold_rows == arrow_rows, "faces diverged on natural text"
        assert len(fold_rows) == n
        # timed runs on fresh lineages
        t0 = time.time()
        q_bpe_tokenize(spark, sf_dir).toPandas()
        fold_sec = round(time.time() - t0, 2)
        t0 = time.time()
        q_bpe_tokenize_arrow(spark, sf_dir).toPandas()
        arrow_sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        row.update(
            {
                "docs": n,
                "fold_sec": fold_sec,
                "arrow_sec": arrow_sec,
                "arrow_speedup": round(fold_sec / arrow_sec, 1)
                if arrow_sec > 0
                else None,
            }
        )
        out[f"n{n}"] = row
        print(
            f"n={n}: fold={fold_sec}s arrow={arrow_sec}s "
            f"(x{row['arrow_speedup']}), faces bit-identical",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--gen" in sys.argv[1:]:
        generate()
    else:
        measure()
