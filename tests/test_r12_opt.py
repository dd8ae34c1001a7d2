"""Round-12 optimization pins: every operator whose INTERNALS were
rewritten for performance this round stays bit-identical to the
pre-optimization semantics (which the DuckDB oracle gate restates
independently — these pins catch regressions earlier and on shapes
the toy corpus lacks: repeated words, empty words/docs, word-hash
composition edge cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.relational import rebalance
from hr_moderndatapipeline_spark.operators.text import (
    bpe_apply,
    bpe_apply_arrow,
    winnowing_fingerprints,
)

P = 1_000_000_007


def _charfold(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _ref_winnowing(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python reference of the ORIGINAL per-gram char-fold
    winnowing selection (hash the gram STRING, pack, trailing-window
    min, rightmost-on-tie via the pack, distinct)."""
    words = text.split(" ")
    if len(words) < k:
        return set()
    lim = 1 << 21
    keys = []
    for pos in range(len(words) - k + 1):
        gram = " ".join(words[pos : pos + k])
        keys.append(_charfold(gram) * lim + (lim - 1 - pos))
    sel = set()
    maxp = len(keys) - 1
    for pos in range(len(keys)):
        if pos >= w - 1 or pos == maxp:
            lo = max(0, pos - (w - 1))
            mn = min(keys[lo : pos + 1])
            sel.add((mn // lim, (lim - 1) - (mn % lim)))
    return sel


FIXTURE_TEXTS = [
    # repeated words (the memo/composition sweet spot)
    "the cat sat on the mat the cat sat on the mat",
    # distinct words, longer
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    # doc shorter than w grams but >= k words (single whole-doc window)
    "one two three four five six",
    # doc with fewer than k words (no grams at all)
    "tiny doc",
    # empty text
    "",
    # consecutive spaces -> empty words inside the stream
    "a  b c d e f g h",
    # word repetition inside one gram window (tie candidates)
    "x x x x x x x x x x",
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURE_TEXTS)], "doc_id long, text string"
    )


def test_winnowing_word_hash_composition_matches_charfold(spark, fixture_df):
    """The r12 word-hash-composition kernel selects EXACTLY the
    fingerprints of the original per-gram char fold — including
    empty words from ragged spacing, sub-window docs, and rounded-tie
    windows."""
    got = {
        (r["doc_id"], r["fp_hash"], r["fp_pos"])
        for r in winnowing_fingerprints(
            fixture_df, "doc_id", "text", k=5, w=4
        ).collect()
    }
    want = {
        (i, h, pos)
        for i, t in enumerate(FIXTURE_TEXTS)
        for (h, pos) in _ref_winnowing(t, 5, 4)
    }
    assert got == want


def test_winnowing_word_hash_composition_matches_charfold_corpus(spark, sf_dir):
    """Same pin on the real sf0.001 corpus (500 docs)."""
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        (r["doc_id"], r["fp_hash"], r["fp_pos"])
        for r in winnowing_fingerprints(docs, "doc_id", "text", k=5, w=4).collect()
    }
    want = {
        (r["doc_id"], h, pos)
        for r in docs.collect()
        for (h, pos) in _ref_winnowing(r["text"], 5, 4)
    }
    assert got == want


def _ref_bpe_pieces(word: str, merges: list[tuple[str, str]]) -> int:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return len(syms)


MERGES = [("t", "h"), ("th", "e"), ("c", "a"), ("ca", "t"), ("s", "a")]


def test_bpe_apply_vocab_dedup_matches_per_token_fold(spark, fixture_df):
    """The r12 vocabulary-deduplicated bpe_apply returns the exact
    per-doc (n_chars, n_pieces) of the per-token fold semantics —
    pinned against a pure-Python per-token reference on a fixture
    with repeated words, empty docs, and ragged spacing."""
    got = {
        (r["doc_id"], r["n_chars"], r["n_pieces"])
        for r in bpe_apply(fixture_df, "doc_id", "text", MERGES).collect()
    }
    want = set()
    for i, t in enumerate(FIXTURE_TEXTS):
        words = [w for w in t.split(" ") if w]
        want.add(
            (
                i,
                sum(len(w) for w in words),
                sum(_ref_bpe_pieces(w, MERGES) for w in words),
            )
        )
    assert got == want


def test_bpe_apply_vocab_dedup_matches_arrow_face(spark, sf_dir):
    """bpe_apply (JVM vocab-dedup) == bpe_apply_arrow (Python memo)
    on the sf0.001 corpus — the two faces must stay bit-identical."""
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {
        tuple(r)
        for r in bpe_apply(docs, "doc_id", "text", MERGES).collect()
    }
    b = {
        tuple(r)
        for r in bpe_apply_arrow(docs, "doc_id", "text", MERGES).collect()
    }
    assert a == b


def test_rebalance_spreads_underparallel_input(spark):
    """rebalance must spread an under-split input to cluster
    parallelism (the CPU-heavy-map-stage contract its r12 call sites
    rely on)."""
    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000, numPartitions=1)
    out = rebalance(narrow)
    assert out.rdd.getNumPartitions() == target
