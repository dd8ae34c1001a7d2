"""Dedup / similarity / text / multimodal operator tests with
planted duplicates and a recall gate for the approximate paths
(SURVEY.md §5; these cover the rows-only driver entries)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.dedup import (
    dedup_clusters,
    dedup_exact,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash_near_pairs,
    word_shingles,
)
from hr_moderndatapipeline_spark.operators.multimodal import (
    decode_media,
    extract_features,
    fake_media_from_documents,
    sample_frames,
)
from hr_moderndatapipeline_spark.operators.similarity import (
    ann_bruteforce,
    ann_ivf,
    ann_lsh,
)
from hr_moderndatapipeline_spark.operators.text import doc_fingerprint, token_stats
from hr_moderndatapipeline_spark.sources.readers import load_table


BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture(scope="module")
def corpus(spark):
    """Planted corpus: 0/1 exact dups, 2 near-dup of 0 (one word
    changed), 3 unrelated."""
    rows = [
        (0, BASE),
        (1, BASE),
        (2, BASE.replace("today", "tonight")),
        (3, "completely different text about spark query engines and shuffles here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_groups_planted(corpus):
    out = {r["keep_id"]: r["n_copies"] for r in dedup_exact(corpus, ["text"], "doc_id").collect()}
    assert out[0] == 2 and out[2] == 1 and out[3] == 1


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []  # shorter than n → empty, filtered upstream


def test_minhash_finds_exact_and_near_dups(corpus):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(corpus, "doc_id", "text", shingle_n=3,
                                     jaccard_threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0           # exact dup always found
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_recall_on_recrawl(spark, sf_dir):
    """Every doc duplicated exactly once → n_docs verified pairs
    expected; LSH with 16 bands × 4 rows must find every identical
    pair (identical signature ⇒ identical buckets, recall 1.0)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    recrawl = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    pairs = minhash_dedup_pairs(recrawl, "doc_id", "text").collect()
    exact = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs if r["jaccard"] == 1.0}
    assert {(i, i + 1_000_000) for i in range(n)} <= exact


def test_simhash_near_pairs(corpus):
    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"]
             for r in simhash_near_pairs(corpus, "doc_id", "text", max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs


def test_minhash_portable_pairs(corpus, spark):
    """Portable MinHash preserves the planted-dup contract: the exact
    duplicate pair is found at Jaccard 1.0, the unrelated doc is not
    paired with it; results are partitioning-invariant."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        minhash_dedup_pairs_portable,
    )

    out = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
           for r in minhash_dedup_pairs_portable(corpus, "doc_id", "text").collect()}
    assert out[(0, 1)] == 1.0
    assert (0, 3) not in out and (3, 0) not in out
    resh = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
            for r in minhash_dedup_pairs_portable(
                corpus.repartition(5), "doc_id", "text").collect()}
    assert out == resh


def test_simhash_portable_near_pairs(corpus):
    """The portable 62-bit variant preserves the planted-dup recall
    contract: exact duplicates at Hamming 0, unrelated docs apart."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        simhash_portable,
        simhash_portable_near_pairs,
    )

    pairs = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"]
             for r in simhash_portable_near_pairs(
                 corpus, "doc_id", "text", max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs
    # signatures are non-negative (62-bit pack, no sign-bit case) and
    # deterministic across partitionings
    sigs = simhash_portable(corpus, "doc_id", "text")
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert all(v >= 0 for v in vals.values())
    resh = {r["doc_id"]: r["simhash"]
            for r in simhash_portable(corpus.repartition(7), "doc_id", "text").collect()}
    assert vals == resh


def test_jaccard_pairs_blocked(spark):
    rows = [(0, BASE, "s1"), (1, BASE, "s1"), (2, BASE, "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = jaccard_pairs(df, "doc_id", "text", "source", threshold=0.9).collect()
    # only the same-block pair: (0,1); 2 is identical but blocked apart
    assert [(r["doc_id_a"], r["doc_id_b"], r["jaccard"]) for r in out] == [(0, 1, 1.0)]


def test_dedup_clusters_transitive(spark):
    """A~B, B~C, D~E: two clusters with min-id representatives,
    transitivity resolved without a direct A~C pair."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 4), (8, 9), (9, 7), (7, 6)],
        "doc_id_a long, doc_id_b long",
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6, 9: 6}
    # Both execution paths must label identically: driver union-find
    # (default for bounded edge lists) and distributed propagation
    # (forced via driver_threshold=0 — the 100 TB path).
    uf = {r["member_id"]: r["cluster_id"]
          for r in dedup_clusters(pairs, "doc_id_a", "doc_id_b").collect()}
    dist = {r["member_id"]: r["cluster_id"]
            for r in dedup_clusters(
                pairs, "doc_id_a", "doc_id_b", driver_threshold=0
            ).collect()}
    assert uf == expect
    assert dist == expect


def test_dedup_clusters_end_to_end_minhash(spark, sf_dir):
    """pairs → clusters over the planted re-crawl: every cluster is
    exactly {doc, doc+1M} with the original as representative."""
    from pyspark.sql import functions as FF

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.unionByName(docs.withColumn("doc_id", FF.col("doc_id") + 1_000_000))
    pairs = minhash_dedup_pairs(recrawl, "doc_id", "text").filter(FF.col("jaccard") == 1.0)
    clusters = dedup_clusters(pairs, "doc_id_a", "doc_id_b")
    reps = clusters.filter(FF.col("member_id") >= 1_000_000)
    bad = reps.filter(FF.col("cluster_id") != FF.col("member_id") - 1_000_000)
    assert bad.count() == 0


def test_leakage_safe_split_never_straddles(spark, sf_dir):
    """Every near-dup pair must land in the SAME split, and the
    split proportions must roughly honor the requested fractions."""
    from pyspark.sql import functions as FF

    from hr_moderndatapipeline_spark.operators.dedup import jaccard_pairs
    from hr_moderndatapipeline_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", "source", threshold=0.9)
    clusters = dedup_clusters(pairs, "doc_id_a", "doc_id_b")
    out = leakage_safe_split(docs, "doc_id", clusters).select("doc_id", "split")
    straddle = (
        pairs.join(out.withColumnRenamed("doc_id", "doc_id_a"), "doc_id_a")
        .withColumnRenamed("split", "split_a")
        .join(
            out.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed(
                "split", "split_b"
            ),
            "doc_id_b",
        )
        .filter(FF.col("split_a") != FF.col("split_b"))
    )
    assert straddle.count() == 0
    frac = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(FF.count("*").alias("n")).collect()
    }
    total = sum(frac.values())
    assert frac["train"] / total > 0.8  # 90% requested, coarse corpus


def test_ann_bruteforce_exact_neighbors(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    out = ann_bruteforce(df, q, "vec_id", "embedding", k=3, dim=3).orderBy("rk").collect()
    assert [r["c_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] > 0.99 and out[2]["cosine"] == -1.0


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """LSH top-k must recover a healthy fraction of the true top-k
    (multiprobe, 12 planes on 64-dim) — and never invent pairs with
    better-than-true cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    bf = ann_bruteforce(emb, queries, "vec_id", "embedding", k=10, dim=64)
    lsh = ann_lsh(emb, queries, "vec_id", "embedding", k=10, dim=64)
    true = {(r["q_id"], r["c_id"]) for r in bf.collect()}
    approx = {(r["q_id"], r["c_id"]) for r in lsh.collect()}
    assert approx, "LSH returned nothing"
    # every LSH hit is a real corpus pairing with correctly-ranked score
    recall = len(true & approx) / len(true)
    assert recall >= 0.2, f"recall {recall:.2f} too low"


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 4-of-16 probed lists must recover a healthy fraction
    of the true top-k, and every hit must carry the true cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    bf = ann_bruteforce(emb, queries, "vec_id", "embedding", k=10, dim=64)
    ivf = ann_ivf(emb, queries, "vec_id", "embedding", k=10, dim=64)
    true = {(r["q_id"], r["c_id"]): r["cosine"] for r in bf.collect()}
    approx = {(r["q_id"], r["c_id"]): r["cosine"] for r in ivf.collect()}
    assert approx
    hits = set(true) & set(approx)
    recall = len(hits) / len(true)
    assert recall >= 0.2, f"recall {recall:.2f} too low"
    for pair in hits:
        assert true[pair] == approx[pair]  # same scoring math


def test_token_stats_and_fingerprint(spark):
    df = spark.createDataFrame([(1, "a bb ccc")], "doc_id long, text string")
    st = token_stats(df, "doc_id", "text").collect()[0]
    assert st["n_tokens"] == 3 and st["n_chars"] == 8
    assert st["mean_token_len"] == 2.0  # (1+2+3)/3
    fp1 = doc_fingerprint(df, "doc_id", "text").collect()[0]["fingerprint"]
    fp2 = doc_fingerprint(df, "doc_id", "text").collect()[0]["fingerprint"]
    assert fp1 == fp2  # deterministic
    df2 = spark.createDataFrame([(1, "a bb ccd")], "doc_id long, text string")
    assert doc_fingerprint(df2, "doc_id", "text").collect()[0]["fingerprint"] != fp1


def test_multimodal_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = fake_media_from_documents(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r0 = rows[0]
    assert len(r0["features"]) == 8
    assert abs(sum(r0["features"]) - 1.0) < 1e-9  # normalized histogram
    # frame sampling: only video rows, count derived from duration
    frames = sample_frames(media, every_ms=1000)
    vids = media.filter(F.col("media_type") == "video").count()
    assert frames.select("media_id").distinct().count() == vids


def test_decode_media_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)
    out = decode_media(b"\x01\x03", "image", fake=True)
    assert out == {"n_bytes": 2, "mean": 2.0}


def test_repetition_score_planted(spark):
    from hr_moderndatapipeline_spark.operators.text import repetition_score

    rows = [
        (0, "a b c a b c a b c"),   # 7 trigrams, 3 distinct
        (1, "one two three four"),  # 2 trigrams, all distinct
        (2, "x y"),                 # too short: 0 grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_score(df, "doc_id", "text").collect()}
    assert out[0]["n_grams"] == 7 and out[0]["n_distinct_grams"] == 3
    assert out[0]["dup_gram_ratio"] == pytest.approx(4 / 7)
    assert out[1]["dup_gram_ratio"] == 0.0
    assert out[2]["n_grams"] == 0 and out[2]["dup_gram_ratio"] == 0.0


def test_hard_negative_mining_is_cross_label_only(spark, sf_dir):
    from hr_moderndatapipeline_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = ann_bruteforce(
        emb, queries, "vec_id", "embedding", k=3, dim=64, exclude_label_col="label"
    )
    lbl = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert rows and all(lbl[r["q_id"]] != lbl[r["c_id"]] for r in rows)
    # hard negatives rank at least as close as the uniform ceiling:
    # every returned neighbor beats any same-rank candidate dropped
    # for sharing the label (spot check: rk is dense 1..k per query)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_negative_samples_never_self_and_flags_collisions(spark):
    from hr_moderndatapipeline_spark.operators.sampling import negative_samples

    n = 20
    df = spark.range(n).select(
        F.col("id").alias("vid"), (F.col("id") % 3).alias("lbl")
    )
    out = negative_samples(df, "vid", n_items=n, k=3, label_col="lbl").collect()
    assert len(out) == n * 3  # every (anchor, rank) pair present
    for r in out:
        assert r["neg_id"] != r["vid"]          # self-exclusion by construction
        assert 0 <= r["neg_id"] < n
        assert r["is_false_negative"] == (r["anchor_label"] == r["neg_label"])
    # deterministic: a second evaluation draws the same partners
    again = negative_samples(df, "vid", n_items=n, k=3, label_col="lbl").collect()
    assert sorted((r["vid"], r["neg_rank"], r["neg_id"]) for r in out) == sorted(
        (r["vid"], r["neg_rank"], r["neg_id"]) for r in again
    )


def test_dsir_logweights_ranks_target_like_docs(spark):
    from hr_moderndatapipeline_spark.operators.sampling import dsir_logweights

    rows = [
        (0, "alpha beta gamma alpha beta", "tgt"),   # target slice
        (1, "alpha beta gamma gamma", "tgt"),        # target slice
        (2, "alpha beta gamma", "web"),              # target-like raw doc
        (3, "zebra yak xylo walrus", "web"),         # off-target raw doc
        (4, "", "web"),                              # empty: zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in dsir_logweights(
            df, "doc_id", "text", target=F.col("source") == "tgt", buckets=64
        ).collect()
    }
    # target-like doc scores strictly above the off-target doc
    assert out[2]["logweight_micro"] > out[3]["logweight_micro"]
    # tokens the target never uses pull the weight negative
    assert out[3]["logweight_micro"] < 0
    assert out[4]["n_tokens"] == 0 and out[4]["logweight_micro"] == 0
    assert out[2]["n_tokens"] == 3


def test_duplicated_ngram_spans_planted(spark):
    from hr_moderndatapipeline_spark.operators.text import duplicated_ngram_spans

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (0, base),                              # 3 positions, all shared with doc 1
        (1, base),                              # exact dup of doc 0
        (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),  # 3 positions, all unique
        (3, "x y"),                             # too short: 0 positions
        (4, " ".join(["r"] * 10)),              # self-repeating: 3 identical grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_spans(
            df, "doc_id", "text", ngram=8, min_dup=2
        ).collect()
    }
    # cross-doc duplication: every position of docs 0/1 is a dup
    assert out[0]["n_positions"] == 3 and out[0]["n_dup_positions"] == 3
    assert out[0]["dup_ratio"] == 1.0 and out[1]["dup_ratio"] == 1.0
    # unique doc: positions counted, none duplicated
    assert out[2]["n_positions"] == 3 and out[2]["n_dup_positions"] == 0
    # short doc restored with zeros (left-join contract)
    assert out[3]["n_positions"] == 0 and out[3]["dup_ratio"] == 0.0
    # SELF-repetition counts positionally (the substring-view semantics)
    assert out[4]["n_positions"] == 3 and out[4]["n_dup_positions"] == 3


def test_semantic_dedup_max_block_cap(spark):
    """max_block bounds the PAIR SCAN only: members of an over-cap
    block are excluded from pairing (all survive — candidate-recall
    tradeoff), while normal blocks still dedup; without the cap the
    hot block dedups to its min id."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        semantic_dedup_survivors,
    )

    hot = [(i, [1.0] * 64) for i in range(5)]          # one block, 5 identical
    cold = [(10, [-1.0] * 64), (11, [-1.0] * 64)]      # another block, 2 identical
    df = spark.createDataFrame(hot + cold, "vec_id long, embedding array<double>")
    no_cap = {
        r["vec_id"]
        for r in semantic_dedup_survivors(
            df, "vec_id", "embedding", threshold=0.9, sign_bits=4
        ).collect()
    }
    assert no_cap == {0, 10}
    capped = {
        r["vec_id"]
        for r in semantic_dedup_survivors(
            df, "vec_id", "embedding", threshold=0.9, sign_bits=4, max_block=3
        ).collect()
    }
    assert capped == {0, 1, 2, 3, 4, 10}


def test_semantic_dedup_multitable_recall(spark, sf_dir):
    """The OR-construction can only ADD drop candidates: multitable
    survivors are a subset of single-table survivors, and parameter
    validation rejects windows past the dimension."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.similarity import (
        semantic_dedup_survivors,
    )
    from hr_moderndatapipeline_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    one = {
        r["vec_id"]
        for r in semantic_dedup_survivors(
            emb, "vec_id", "embedding", threshold=0.4, sign_bits=4
        ).collect()
    }
    multi = {
        r["vec_id"]
        for r in semantic_dedup_survivors(
            emb, "vec_id", "embedding", threshold=0.4, sign_bits=4, tables=3
        ).collect()
    }
    assert multi <= one and len(multi) < len(one)
    with _pytest.raises(ValueError, match="tables"):
        semantic_dedup_survivors(
            emb, "vec_id", "embedding", sign_bits=16, tables=5, dim=64
        )


def test_duplicate_span_removal_planted(spark):
    """The copy of a doc loses every covered position; the original
    keeps all; overlapping duplicated grams union their coverage;
    short docs (< ngram words) are untouched."""
    from hr_moderndatapipeline_spark.operators.text import duplicate_span_removal

    ten = " ".join(f"w{i}" for i in range(10))
    rows = [
        (0, ten),          # original: all grams are first occurrences
        (1, ten),          # exact copy: 3 grams, positions 0..9 all covered
        (2, "a b c"),      # too short for any 8-gram
        (3, ten + " tail1 tail2"),  # prefix grams duplicate doc 0's
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_span_removal(df, "doc_id", "text", ngram=8).collect()
    }
    assert out[0]["n_removed"] == 0 and out[0]["clean_text"] == ten
    assert out[1]["n_removed"] == 10 and out[1]["clean_text"] == ""
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == "a b c"
    # doc 3: grams at positions 0,1,2 duplicate doc 0's (rk>1), its
    # gram at 3 (w3..tail1) and 4 (w4..tail2) are unique -> covered
    # positions are 0..9 minus nothing... union of 0..7,1..8,2..9 =
    # 0..9; words 10,11 (tail1, tail2) survive
    assert out[3]["n_removed"] == 10 and out[3]["clean_text"] == "tail1 tail2"


def test_bpe_learn_merges_hand_computed(spark):
    """Corpus 'aaab aaab ab': round 1 merges (a,a) count 4 (two
    occurrences per 'aaab', frequency-weighted); greedy left-to-right
    gives [aa, a, b] (no overlap re-merge); round 2 merges (a,b)
    count 3; round 3 merges (aa, ab) count 2."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.text import bpe_learn_merges

    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    out = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_learn_merges(df, "text", num_merges=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert out == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]
    with _pytest.raises(ValueError, match="num_merges"):
        bpe_learn_merges(df, "text", num_merges=0)


def test_prefix_jaccard_lossless_vs_brute_force(spark):
    """The AllPairs prefix theorem, checked empirically: the
    prefix-filtered pair set equals brute-force all-pairs Jaccard
    >= t EXACTLY (no lost pairs, no extras) on a corpus built to
    stress the filter - near-dup cliques, borderline-t pairs, docs
    whose shared tokens are globally common (the prefix's weak
    spot), and size-ratio edge cases."""
    from itertools import combinations

    from hr_moderndatapipeline_spark.operators.dedup import prefix_jaccard_pairs

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),     # J=9/11 with 1 (below 0.8)
        (3, "a b c d e f g h i j"),     # exact dup of 1
        (4, "a b c d e f g h j i"),     # same set as 1 (order diff)
        (5, "z y x w v u t s r q"),
        (6, "z y x w v u t s r p"),     # J=9/11 with 5
        (7, "a b c d e f g h i j k l m n o"),  # superset of 1
        (8, "common1 common2 common3 rare1"),
        (9, "common1 common2 common3 rare2"),  # J=3/5 with 8
        (10, "solo unique words here"),
    ]
    for t in (0.5, 0.8, 0.9, 1.0):
        got = {
            (r["doc_id_a"], r["doc_id_b"], round(r["jaccard"], 9))
            for r in prefix_jaccard_pairs(
                spark.createDataFrame(rows, "doc_id long, text string"),
                "doc_id",
                "text",
                threshold=t,
            ).collect()
        }
        sets = {i: set(x.split(" ")) for i, x in rows}
        want = set()
        for i, j in combinations(sorted(sets), 2):
            jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
            if jac >= t:
                want.add((i, j, round(jac, 9)))
        assert got == want, (t, got ^ want)


def test_bpe_apply_arrow_matches_fold_face(spark):
    """bpe_apply_arrow (the O(L·k) memoized Arrow path) must produce
    the exact per-doc (n_chars, n_pieces) the JVM fold face produces,
    including on backslash/quote symbols and repeated words (the
    memo's cache-hit path)."""
    from hr_moderndatapipeline_spark.operators.text import (
        bpe_apply,
        bpe_apply_arrow,
        bpe_learn_merges,
    )

    df = spark.createDataFrame(
        [
            (1, r"aaab aaab ab it's a\b a\b"),
            (2, "aaab aaab aaab zzzz"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn_merges(df, "text", num_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    fold = {r["doc_id"]: (r["n_chars"], r["n_pieces"])
            for r in bpe_apply(df, "doc_id", "text", merges).collect()}
    arrow = {r["doc_id"]: (r["n_chars"], r["n_pieces"])
             for r in bpe_apply_arrow(df, "doc_id", "text", merges).collect()}
    assert fold == arrow
    assert fold[3] == (0, 0)


def test_stratified_fixed_n_exact_counts(spark, sf_dir):
    """Exactly min(n, |stratum|) per stratum, deterministic across
    invocations, ranks contiguous from 1; n < 1 raises."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.sampling import stratified_fixed_n
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = stratified_fixed_n(docs, ["source"], "doc_id", 7)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {s: min(7, c) for s, c in sizes.items()}
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in stratified_fixed_n(
        docs, ["source"], "doc_id", 7).collect())
    assert a == b
    assert out.filter(F.col("sample_rank") < 1).count() == 0
    with _pytest.raises(ValueError, match="n must be"):
        stratified_fixed_n(docs, ["source"], "doc_id", 0)


def test_paragraph_dedup_by_hash_identical(spark, sf_dir):
    """The 8-byte-key scale path (window over xxhash64(para)) returns
    the exact-string path's results on the test corpus."""
    from hr_moderndatapipeline_spark.operators.text import paragraph_dedup
    from hr_moderndatapipeline_spark.queries.dataops import _para_structured
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = _para_structured(
        load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    )
    corpus = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    exact = {tuple(r) for r in paragraph_dedup(corpus, "doc_id", "text").collect()}
    hashed = {
        tuple(r)
        for r in paragraph_dedup(corpus, "doc_id", "text", by_hash=True).collect()
    }
    assert exact == hashed and len(exact) == 600


def test_paragraph_probe_equals_batch_dedup(spark, sf_dir):
    """Equivalence law: probing a batch against paragraph_index(corpus)
    equals paragraph_dedup(corpus ∪ batch) restricted to the batch
    docs, when corpus ids order before batch ids."""
    from hr_moderndatapipeline_spark.operators.text import (
        paragraph_dedup,
        paragraph_index,
        paragraph_probe,
    )
    from hr_moderndatapipeline_spark.queries.dataops import _para_structured
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    corpus = _para_structured(docs)
    batch = corpus.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("\n\nnovel "), F.col("doc_id").cast("string"))
        .alias("text"),
    )
    probe = paragraph_probe(
        batch, paragraph_index(corpus, "doc_id", "text"), "doc_id", "text"
    )
    combined = paragraph_dedup(
        corpus.unionByName(batch), "doc_id", "text"
    ).filter(F.col("doc_id") >= 1_000_000)
    a = {tuple(r) for r in probe.collect()}
    b = {tuple(r) for r in combined.collect()}
    assert a == b and len(a) == 200
    # and the probe's survivors are exactly the novel paragraphs
    assert all(r["dedup_text"].startswith("novel ") for r in probe.collect())


def test_paragraph_dedup_planted(spark):
    """Cross-doc repeated paragraph drops everywhere but its first
    (doc_id, pos); within-doc repeats drop their later positions;
    docs rewritten in position order; all-dropped and empty docs
    come back with dedup_text ''."""
    from hr_moderndatapipeline_spark.operators.text import paragraph_dedup

    boiler = "subscribe now"
    rows = [
        (0, f"{boiler}\n\nalpha beta\n\ngamma delta"),
        (1, f"{boiler}\n\nepsilon zeta"),       # loses only the boilerplate
        (2, f"{boiler}\n\nalpha beta"),         # loses both paragraphs
        (3, "eta theta\n\neta theta"),          # within-doc repeat: keeps pos 0
        (4, ""),                                # no paragraphs at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
    assert out[0]["n_paragraphs"] == 3 and out[0]["n_dropped"] == 0
    assert out[0]["dedup_text"] == f"{boiler}\n\nalpha beta\n\ngamma delta"
    assert out[1]["n_dropped"] == 1 and out[1]["dedup_text"] == "epsilon zeta"
    assert out[2]["n_dropped"] == 2 and out[2]["dedup_text"] == ""
    assert out[3]["n_paragraphs"] == 2 and out[3]["n_dropped"] == 1
    assert out[3]["dedup_text"] == "eta theta"
    assert out[4]["n_paragraphs"] == 0 and out[4]["dedup_text"] == ""


def test_paragraph_dedup_idempotent(spark, sf_dir):
    """After the rewrite every kept paragraph is corpus-unique, so a
    second pass over the rewritten corpus drops nothing."""
    from hr_moderndatapipeline_spark.operators.text import paragraph_dedup

    from hr_moderndatapipeline_spark.queries.dataops import q_paragraph_dedup

    first = q_paragraph_dedup(spark, sf_dir)
    again = paragraph_dedup(
        first.select("doc_id", F.col("dedup_text").alias("text")),
        "doc_id",
        "text",
    )
    assert again.filter(F.col("n_dropped") > 0).count() == 0
    # and the originals really did lose the shared boilerplate: every
    # re-crawl doc (doc_id >= 1e6) was fully deduplicated away
    recrawl = first.filter(F.col("doc_id") >= 1_000_000)
    assert recrawl.filter(F.col("dedup_text") != "").count() == 0


def test_pii_redact_planted(spark):
    from hr_moderndatapipeline_spark.operators.text import pii_redact

    rows = [
        (0, "mail me at bob@corp.example.org or call 415-555-1234 from 10.0.0.7"),
        (1, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1 and out[0]["n_ip"] == 1
    assert out[0]["n_redactions"] == 3
    assert out[0]["redacted_text"] == "mail me at <EMAIL> or call <PHONE> from <IP>"
    assert out[1]["n_redactions"] == 0 and out[1]["redacted_text"] == rows[1][1]


def test_contamination_overlap_planted(spark):
    from hr_moderndatapipeline_spark.operators.text import contamination_overlap

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        (0, base),                          # eval member: fully contaminated
        (1, base.replace("w10", "zz")),     # shares 2 of 3 8-grams
        (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = df.filter(F.col("doc_id") == 0)
    out = {
        r["doc_id"]: r
        for r in contamination_overlap(df, ev, "doc_id", "text", ngram=8).collect()
    }
    assert out[0]["contamination"] == 1.0
    assert out[1]["n_grams"] == 3 and out[1]["n_shared"] == 2
    assert out[2]["n_shared"] == 0 and out[2]["contamination"] == 0.0


def test_tfidf_and_vocab(spark):
    from hr_moderndatapipeline_spark.operators.text import tfidf_top_terms, vocab_top_terms

    rows = [
        (0, "apple apple banana shared"),
        (1, "cherry shared shared date"),
        (2, "apple elderberry shared fig"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = {
        (r["doc_id"], r["rank"]): r
        for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    }
    # doc 0: apple tf=2 df=2 → 3.0; banana tf=1 df=1 → 3.0; tie → term asc
    assert top[(0, 1)]["term"] == "apple" and top[(0, 1)]["score"] == 3.0
    assert top[(0, 2)]["term"] == "banana"
    # doc 1: shared tf=2 df=3 → 2.0 beats cherry/date tf=1 df=1 → 3.0? no:
    # cherry 3.0 > shared 2.0 → cherry first, then date (term asc among 3.0)
    assert top[(1, 1)]["term"] == "cherry" and top[(1, 2)]["term"] == "date"
    vocab = vocab_top_terms(df, "text", k=3).collect()
    assert [(r["term"], r["n_occurrences"]) for r in vocab] == [
        ("shared", 4), ("apple", 3), ("banana", 1)
    ]


def test_minhash_index_probe_incremental(spark, sf_dir):
    """Incremental dedup: build the index once on the corpus, probe a
    new batch (exact copies of some corpus docs + one fresh doc).
    Every copied doc must hit its original with jaccard 1.0; the
    fresh doc must hit nothing."""
    from hr_moderndatapipeline_spark.operators.dedup import minhash_index, minhash_probe

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = minhash_index(docs, "doc_id", "text")
    copies = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    fresh = spark.createDataFrame(
        [(2_000_000, "completely novel text never before seen in any corpus shard xyz")],
        "doc_id long, text string",
    )
    batch = copies.unionByName(fresh)
    hits = minhash_probe(batch, index, "doc_id", "text").collect()
    got = {(r["doc_id_new"], r["doc_id_corpus"]): r["jaccard"] for r in hits}
    for i in range(20):
        assert got.get((i + 1_000_000, i)) == 1.0
    assert not any(new_id == 2_000_000 for new_id, _ in got)


def test_ivf_index_probe_persisted_roundtrip(spark, sf_dir, tmp_path):
    """The persisted IVF lifecycle must answer probes purely from the
    stored codebook + index tables: (a) results from disk are
    IDENTICAL to the one-shot ann_ivf composition; (b) the probe plan
    reads the index's parquet, not the embeddings table (no corpus
    recompute); (c) recall vs brute force holds."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        ann_ivf as _ivf,
        ivf_codebook,
        ivf_index,
        ivf_probe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)

    codebook = ivf_codebook(emb, "vec_id", "embedding", dim=64, n_centroids=16)
    codebook.write.parquet(str(tmp_path / "codebook"))
    ivf_index(emb, codebook, "vec_id", "embedding", dim=64).write.partitionBy(
        "cid"
    ).parquet(str(tmp_path / "index"))

    stored_cb = spark.read.parquet(str(tmp_path / "codebook"))
    stored_idx = spark.read.parquet(str(tmp_path / "index"))
    probed = ivf_probe(queries, stored_idx, stored_cb, "vec_id", "embedding", k=10, dim=64)

    # (b) no corpus recompute: the inverted lists come from the stored
    # index parquet — with dynamic partition pruning down to the probed
    # cid lists — and every embeddings scan is the (tiny) query-batch
    # side, never a full-corpus re-assignment.
    plan = probed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    idx_scan = next(
        l for l in plan.splitlines() if "FileScan" in l and str(tmp_path / "index") in l
    )
    assert "dynamicpruning" in idx_scan  # probe reads only matched cid partitions
    emb_scans = [l for l in plan.splitlines() if "embeddings.parquet" in l]
    assert emb_scans and all("% 50" in l for l in emb_scans)

    got = {(r["q_id"], r["c_id"], r["cosine"], r["rk"]) for r in probed.collect()}
    oneshot = _ivf(emb, queries, "vec_id", "embedding", k=10, dim=64)
    want = {(r["q_id"], r["c_id"], r["cosine"], r["rk"]) for r in oneshot.collect()}
    assert got == want and len(want) > 0

    bf = ann_bruteforce(emb, queries, "vec_id", "embedding", k=10, dim=64)
    true = {(r["q_id"], r["c_id"]) for r in bf.collect()}
    approx = {(q, c) for q, c, _, _ in got}
    assert len(true & approx) / len(true) >= 0.3  # multi-probe IVF floor


def test_ann_ivf_kmeans_refinement_recall(spark, sf_dir):
    """Refined codebooks must keep IVF working and not lose recall
    vs the raw hash-picked seeds (Lloyd tightens the lists)."""
    from hr_moderndatapipeline_spark.operators.similarity import ann_ivf as _ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    bf = ann_bruteforce(emb, queries, "vec_id", "embedding", k=10, dim=64)
    true = {(r["q_id"], r["c_id"]) for r in bf.collect()}

    def recall(df):
        approx = {(r["q_id"], r["c_id"]) for r in df.collect()}
        return len(true & approx) / len(true)

    base = recall(_ivf(emb, queries, "vec_id", "embedding", k=10, dim=64))
    refined = recall(
        _ivf(emb, queries, "vec_id", "embedding", k=10, dim=64, refine_iterations=2)
    )
    assert refined >= base - 0.05, f"refined {refined:.2f} < base {base:.2f}"


def test_domain_mix_unlisted_domain_gets_zero_share(spark):
    """Explicit target_shares must not leak the last listed entry's
    share onto unlisted domains: unlisted -> share 0, weight 0."""
    from hr_moderndatapipeline_spark.operators.sampling import domain_mix_weights

    df = spark.createDataFrame(
        [("web", 100), ("books", 50), ("code", 25)], "source string, n int"
    )
    out = {
        r["source"]: (r["target_share"], r["weight"])
        for r in domain_mix_weights(
            df, "source", F.col("n"), target_shares={"web": 0.7, "books": 0.3}
        ).collect()
    }
    assert out["web"][0] == 0.7 and out["books"][0] == 0.3
    assert out["code"] == (0.0, 0.0)

    # single-entry mapping works; empty mapping is an explicit error
    one = domain_mix_weights(df, "source", F.col("n"), target_shares={"web": 1.0})
    assert {r["source"]: r["target_share"] for r in one.collect()}["web"] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        domain_mix_weights(df, "source", F.col("n"), target_shares={})


def test_bigram_lm_score_planted(spark):
    """Natural repeated phrasing scores higher per bigram than a
    shuffled-word doc over the same vocabulary; counting invariants
    hold (n_bigrams == tokens - 1; <2-token docs score 0)."""
    from hr_moderndatapipeline_spark.operators.text import bigram_lm_score

    fluent = "the cat sat on the mat"
    rows = [
        (0, fluent),
        (1, fluent),
        (2, fluent),
        (3, "mat the on sat cat the"),  # same unigrams, unseen-order bigrams
        (4, "solo"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert out[0]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 5
    assert out[4]["n_bigrams"] == 0 and out[4]["logprob_micro"] == 0
    assert out[5]["n_bigrams"] == 0 and out[5]["logprob_micro"] == 0
    # the majority phrasing is more probable under the corpus bigram
    # model than the shuffled word order
    assert out[0]["mean_lp_micro"] > out[3]["mean_lp_micro"]
    # repeated docs score identically (pure function of text)
    assert out[0]["logprob_micro"] == out[1]["logprob_micro"] == out[2]["logprob_micro"]



def test_semantic_dedup_survivors_planted(spark):
    """A planted duplicate vector (identical direction ⇒ cosine 1,
    same sign block) is dropped in favor of its lower id; an
    orthogonal vector survives."""
    from hr_moderndatapipeline_spark.operators.similarity import (
        semantic_dedup_survivors,
    )

    dim = 8
    base = [1.0, 2.0, 3.0, 4.0, 1.0, 1.0, 1.0, 1.0]
    scaled = [x * 2.0 for x in base]  # same direction, cosine == 1
    other = [-1.0, 5.0, -2.0, 1.0, 0.5, -1.0, 2.0, 1.0]
    df = spark.createDataFrame(
        [(1, base), (2, scaled), (3, other)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup_survivors(
        df, "vec_id", "embedding", threshold=0.9, sign_bits=4, dim=dim
    )
    ids = sorted(r["vec_id"] for r in out.collect())
    assert ids == [1, 3]


def test_hashed_linear_score_invariants(spark):
    """Scorer is a pure function of text (identical docs score the
    same), margins stay within the weight range [-0.5, 0.5], empty
    docs gate to keep with zero score."""
    from hr_moderndatapipeline_spark.operators.text import hashed_linear_score

    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, ""), (3, "zq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in hashed_linear_score(df, "doc_id", "text").collect()}
    assert out[0]["score_micro"] == out[1]["score_micro"]
    assert out[0]["n_tokens"] == 3
    assert out[2] == (2, 0, 0, 0.0, "keep")
    for r in out.values():
        assert -0.5 <= r["margin"] <= 0.5
        assert r["decision"] == ("keep" if r["score_micro"] >= 0 else "drop")


def test_cms_guarantee_and_merge_law(spark):
    """CMS invariants: estimate >= true count for every token (the
    one-sided error guarantee), and elementwise merge of per-batch
    sketches equals the sketch of the union (mergeable-state law),
    partitioning-invariant."""
    from hr_moderndatapipeline_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(i, f"w{i % 7} w{i % 3} common") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sketch = cms_build(df, "text", depth=4, width=16)  # tiny -> collisions
    exact = (
        df.selectExpr("explode(split(text, ' ')) AS token")
        .where("token <> ''")
        .groupBy("token")
        .count()
    )
    est = cms_estimate(sketch, exact, "token", depth=4, width=16)
    for r in est.collect():
        assert r["cms_est"] >= r["count"], r

    b1, b2 = df.filter("doc_id < 25"), df.filter("doc_id >= 25")
    merged = cms_merge(
        cms_build(b1, "text", depth=4, width=16),
        cms_build(b2, "text", depth=4, width=16),
    )
    full = cms_build(df.repartition(7), "text", depth=4, width=16)
    as_map = lambda s: {  # noqa: E731
        (r["row_idx"], r["bucket"]): r["cnt"] for r in s.collect()
    }
    assert as_map(merged) == as_map(full)


def test_histogram_drift_bounds(spark):
    """tv_ppm is 0 for identical histograms and 1e6 for disjoint
    support (up to ppm truncation); asymmetric totals normalize."""
    from hr_moderndatapipeline_spark.operators.diagnostics import histogram_drift
    from hr_moderndatapipeline_spark.operators.sketch import histogram_build

    a = spark.range(100).selectExpr("id AS v")
    ha = histogram_build(a, "v", lo=0, hi=200, nbins=8)
    same = histogram_drift(ha, ha).collect()[0]
    assert (same["l1_ppm"], same["tv_ppm"]) == (0, 0)

    b = spark.range(100, 150).selectExpr("id + 100 AS v")  # 200..249 -> clamped bin 7
    hb = histogram_build(b, "v", lo=0, hi=200, nbins=8)
    disj = histogram_drift(ha, hb).collect()[0]
    assert disj["n_a"] == 100 and disj["n_b"] == 50
    assert disj["tv_ppm"] == 1_000_000


def test_token_entropy_known_distribution(spark):
    """Uniform 4-token distribution -> H = ln 4 micro-nats (exact to
    the quantum); single-token group -> 0."""
    import math

    from hr_moderndatapipeline_spark.operators.text import token_entropy_by_group

    rows = [("u", "a b c d"), ("k", "x x x x")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in token_entropy_by_group(df, "source", "text").collect()}
    assert out["k"]["entropy_micronat"] == 0
    assert out["k"]["vocab_size"] == 1
    expect = math.floor(math.log(4) * 1e6 + 0.5)  # each term quantized, p=1/4
    assert abs(out["u"]["entropy_micronat"] - expect) <= 4  # DIV truncation
    assert out["u"]["n_tokens"] == 4 and out["u"]["vocab_size"] == 4


def test_dictionary_encode_planted(spark):
    """Id assignment is frequency-ranked (count desc, token asc from
    1), OOV maps to 0, order is positional, empty docs get empty
    sequences."""
    from hr_moderndatapipeline_spark.operators.text import (
        build_vocab,
        dictionary_encode,
    )

    rows = [(0, "b a b c b a"), (1, "a rare b"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {r["token"]: r["token_id"] for r in build_vocab(df, "text", min_count=2).collect()}
    assert vocab == {"b": 1, "a": 2}  # b x4, a x3; c/rare below min_count
    enc = {
        r["doc_id"]: r
        for r in dictionary_encode(
            df, "doc_id", "text", build_vocab(df, "text", min_count=2)
        ).collect()
    }
    assert enc[0]["token_ids"] == [1, 2, 1, 0, 1, 2]
    assert (enc[0]["n_tokens"], enc[0]["n_oov"]) == (6, 1)
    assert enc[1]["token_ids"] == [2, 0, 1]
    assert enc[2]["token_ids"] == [] and enc[2]["n_tokens"] == 0


def test_join_cardinality_exact(spark):
    """The report's join_rows equals the actual inner-join count,
    with one-sided keys and duplicates on both sides."""
    from hr_moderndatapipeline_spark.operators.diagnostics import (
        join_cardinality_report,
    )

    l = spark.createDataFrame([(1,), (1,), (2,), (4,)], "k long")
    r = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "k long")
    rep = join_cardinality_report(l, r, "k").collect()[0]
    actual = l.join(r, "k", "inner").count()
    assert rep["join_rows"] == actual == 7
    assert rep["left_rows"] == 4 and rep["right_rows"] == 5
    assert (rep["left_keys"], rep["right_keys"], rep["shared_keys"]) == (3, 3, 2)
    assert rep["max_key_pairs"] == 6


def test_new_operator_edges(spark):
    """Hardening edges: empty inputs don't NULL-poison the
    cardinality report or the drift monitor, and probe-column
    collisions fail loudly."""
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.diagnostics import (
        histogram_drift,
        join_cardinality_report,
    )
    from hr_moderndatapipeline_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        histogram_build,
    )

    empty = spark.createDataFrame([], "k long")
    rep = join_cardinality_report(empty, empty, "k").collect()[0]
    assert tuple(rep) == (0, 0, 0, 0, 0, 0, 0)

    some = spark.range(10).selectExpr("id AS v")
    h = histogram_build(some, "v", lo=0, hi=10, nbins=5)
    he = histogram_build(some.filter("v < 0"), "v", lo=0, hi=10, nbins=5)
    d = histogram_drift(h, he).collect()[0]
    assert d["n_b"] == 0 and d["tv_ppm"] == 500_000  # all mass unmatched

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    sketch = cms_build(docs, "text", depth=2, width=8)
    bad_q = spark.createDataFrame([("a", 1)], "token string, bucket int")
    with _pytest.raises(ValueError, match="collide"):
        cms_estimate(sketch, bad_q, "token", depth=2, width=8)
    with _pytest.raises(ValueError, match="depth"):
        cms_build(docs, "text", depth=0, width=8)


def test_kmv_merge_law_and_estimate(spark):
    """KMV mergeable-state law: kmv(A ∪ B) == merge(kmv(A), kmv(B))
    exactly; under-filled sketches report the EXACT distinct count;
    a filled sketch's estimate lands within the 1/sqrt(k) band."""
    from hr_moderndatapipeline_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    a = spark.range(0, 400).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    b = spark.range(300, 900).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    k = 64
    sa, sb = kmv_build(a, "k", ["g"], k=k), kmv_build(b, "k", ["g"], k=k)
    merged = {(r["rank"], r["h"]) for r in kmv_merge(sa, sb, ["g"], k=k).collect()}
    direct = {
        (r["rank"], r["h"])
        for r in kmv_build(a.unionByName(b), "k", ["g"], k=k).collect()
    }
    assert merged == direct
    # under-filled: 10 distinct keys, k=64 → exact
    tiny = spark.range(0, 10).select(F.lit("t").alias("g"), F.col("id").alias("k"))
    est = kmv_estimate(kmv_build(tiny, "k", ["g"], k=k), ["g"], k=k).collect()[0]
    assert est["n_kept"] == 10 and est["kmv_est"] == 10
    # filled: 900 distinct, estimate within ~4/sqrt(64) = 50%
    est = kmv_estimate(kmv_build(a.unionByName(b), "k", ["g"], k=k), ["g"], k=k).collect()[0]
    assert est["n_kept"] == 64
    assert 450 <= est["kmv_est"] <= 1800


def test_twap_hand_computed(spark):
    """Zero-order-hold TWAP on a hand-built series: value 2.0 held
    10s then 4.0 held 30s → (2*10 + 4*30)/40 = 3.5; the single-event
    user drops out (no elapsed time)."""
    import datetime as dt

    from hr_moderndatapipeline_spark.operators.relational import twap_features

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 2.0, 100),
        (1, t0 + dt.timedelta(seconds=10), 4.0, 101),
        (1, t0 + dt.timedelta(seconds=40), 9.0, 102),  # last: no successor
        (2, t0, 5.0, 200),  # single event: dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = {r["user_id"]: r for r in twap_features(df, ["user_id"], "ts", "value", tiebreak_col="event_id").collect()}
    assert set(out) == {1}
    r = out[1]
    assert r["n_intervals"] == 2
    assert r["numer_micro_s"] == 2_000_000 * 10 + 4_000_000 * 30
    assert r["denom_s"] == 40
    assert r["twap"] == 3.5


def test_phrase_search_positions(spark):
    """Hand corpus: overlapping matches, repeated words, and a
    near-miss (words present but not adjacent) — positions exact."""
    from hr_moderndatapipeline_spark.operators.text import phrase_search

    rows = [
        (0, "a b a b a"),          # "a b a" at 0 and 2 (overlap)
        (1, "x a b a y"),          # at 1
        (2, "a b c a b"),          # words present, phrase absent
        (3, "b a b"),              # suffix only, no match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["match_pos"])
           for r in phrase_search(df, "doc_id", "text", "a b a").collect()}
    assert out == {(0, 0), (0, 2), (1, 1)}


def test_golden_records_survivorship(spark):
    """Match→cluster→survive on a hand corpus: cluster {1,2,3} keeps
    min name and max balance; singleton 9 survives as itself; unknown
    rules fail loudly."""
    from hr_moderndatapipeline_spark.operators.dedup import golden_records

    ents = spark.createDataFrame(
        [(1, "acme corp", 50), (2, "acme corp.", 90), (3, "acme", 10), (9, "zeta", 7)],
        "ent_id long, name string, bal long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "member_id long, cluster_id long"
    )
    out = {r["cluster_id"]: r
           for r in golden_records(ents, "ent_id", clusters,
                                   {"name": "min", "bal": "max"}).collect()}
    assert out[1]["n_members"] == 3
    assert out[1]["min_name"] == "acme" and out[1]["max_bal"] == 90
    assert out[9]["n_members"] == 1 and out[9]["max_bal"] == 7
    with pytest.raises(ValueError, match="survivorship"):
        golden_records(ents, "ent_id", clusters, {"name": "first"})


def test_phrase_search_query_empty_corpus_shape(spark, tmp_path):
    """A corpus with no 3-word document yields an EMPTY typed frame
    from the driver entry, not an IndexError (hardening edge)."""
    import os

    from hr_moderndatapipeline_spark.queries.dataops import q_phrase_search

    df = spark.createDataFrame([(0, "one two"), (1, "x")], "doc_id long, text string")
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = q_phrase_search(spark, d)
    assert out.columns == ["doc_id", "match_pos", "phrase"]
    assert out.count() == 0


def test_twap_key_collision_is_loud(spark):
    import pytest as _pytest

    from hr_moderndatapipeline_spark.operators.relational import twap_features

    df = spark.createDataFrame([(1, 1, 1.0)], "_t0 long, ts long, value double")
    with _pytest.raises(ValueError, match="twap internals"):
        twap_features(df, ["_t0"], "ts", "value")
