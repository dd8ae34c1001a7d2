"""Property pins for the round-8 de-globalized rank arithmetic.

The three re-planned queries (price_decile_stats,
customer_spend_percentile, customer_revenue_gini) replace SQL window
functions with closed-form arithmetic on a range-partitioned stable
id. The driver gate proves equality on the actual corpus; these
properties prove the ARITHMETIC equals the window semantics for
arbitrary sizes — DuckDB computes the window truth, plain Python
computes the repo's formulas, sizes and values are randomized.

Also: prefix-filter losslessness on seeded random corpora (the
fixed-corpus unit test can't explore the clique/size-ratio space).
"""

from __future__ import annotations

import random

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def _ntile_formula(j: int, n: int, q: int) -> int:
    """queries/core.py q_price_decile_stats bucket arithmetic
    (0-based rank j of n rows, q buckets)."""
    base, r = n // q, n % q
    cut = r * (base + 1)
    if j < cut:
        return j // (base + 1) + 1
    return r + (j - cut) // base + 1


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=400), st.integers(min_value=1, max_value=20))
def test_ntile_bucket_arithmetic_matches_duckdb(n, q):
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT i, ntile({q}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchall()
    )
    for j in range(n):
        assert _ntile_formula(j, n, q) == want[j], (j, n, q)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200
    )
)
def test_percent_rank_cume_dist_formulas_match_duckdb(values):
    """With a UNIQUE order-key set (value, index — the repo's
    (cents, custkey) discipline), percent_rank == stable_id/(n−1)
    and cume_dist == (stable_id+1)/n, as EXACT doubles."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT, k BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(v, i) for i, v in enumerate(values)]
    )
    rows = con.execute(
        "SELECT k, percent_rank() OVER (ORDER BY v, k),"
        "       cume_dist() OVER (ORDER BY v, k)"
        " FROM t"
    ).fetchall()
    n = len(values)
    order = sorted(range(n), key=lambda i: (values[i], i))
    sid = {k: s for s, k in enumerate(order)}
    for k, pr, cd in rows:
        want_pr = 0.0 if n == 1 else sid[k] / (n - 1)
        want_cd = (sid[k] + 1) / n
        assert pr == want_pr and cd == want_cd, (k, n)


def test_gini_rank_weighted_sum_matches_duckdb_window():
    """Σi·xᵢ from the sorted order (the assign_stable_ids path)
    equals the row_number-window formulation for random spend
    tables, including heavy ties."""
    rng = random.Random(8)
    con = duckdb.connect()
    for trial in range(20):
        n = rng.randint(1, 300)
        vals = [(k, rng.randint(0, 50)) for k in range(n)]
        con.execute("CREATE OR REPLACE TABLE s(k BIGINT, cents BIGINT)")
        con.executemany("INSERT INTO s VALUES (?, ?)", vals)
        want = con.execute(
            "SELECT sum(i * cents) FROM ("
            " SELECT cents, CAST(row_number() OVER (ORDER BY cents, k) AS BIGINT) AS i"
            " FROM s)"
        ).fetchone()[0]
        got = sum(
            (i + 1) * c
            for i, (_, c) in enumerate(sorted(vals, key=lambda t: (t[1], t[0])))
        )
        assert got == want, trial


def test_containment_lossless_on_random_corpora(spark):
    """One-sided prefix probing for asymmetric containment equals
    brute force (pairs ordered smaller→larger, ties by id) on seeded
    random corpora at two thresholds."""
    from itertools import permutations

    from hr_moderndatapipeline_spark.operators.dedup import containment_pairs

    rng = random.Random(44)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(rng.randint(8, 25))]
        docs = []
        for d in range(rng.randint(8, 30)):
            words = rng.sample(vocab, rng.randint(2, min(14, len(vocab))))
            if docs and rng.random() < 0.4:
                # embed an earlier doc inside this one (containment!)
                inner = list(dict.fromkeys(rng.choice(docs)[1].split(" ")))
                words = list(dict.fromkeys(inner + words))
            docs.append((d, " ".join(words)))
        sets = {i: set(t.split(" ")) for i, t in docs}
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for t in (0.7, 0.9):
            got = {
                (r["inner_id"], r["outer_id"])
                for r in containment_pairs(df, "doc_id", "text", t).collect()
            }
            want = set()
            for i, j in permutations(sorted(sets), 2):
                smaller = len(sets[i]) < len(sets[j]) or (
                    len(sets[i]) == len(sets[j]) and i < j
                )
                if smaller and len(sets[i] & sets[j]) / len(sets[i]) >= t:
                    want.add((i, j))
            assert got == want, (trial, t, got ^ want)


def test_prefix_jaccard_stop_df_ratio_semantics(spark):
    """stop_df_ratio removes ultra-common tokens from the SETS before
    similarity (documented semantics change): result must equal brute
    force over the stopword-FILTERED sets; docs reduced to nothing
    drop out."""
    from itertools import combinations

    from hr_moderndatapipeline_spark.operators.dedup import prefix_jaccard_pairs

    # 'the'/'of' appear in every doc (df ratio 1.0) and would glue
    # everything together; the content words are discriminative
    rows = [
        (1, "the of alpha beta gamma"),
        (2, "the of alpha beta delta"),
        (3, "the of zeta eta theta"),
        (4, "the of"),                    # all stopwords: drops out
        (5, "the of alpha beta gamma"),   # dup of 1 after filtering
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t, ratio = 0.6, 0.9
    got = {
        (r["doc_id_a"], r["doc_id_b"], round(r["jaccard"], 9))
        for r in prefix_jaccard_pairs(
            df, "doc_id", "text", t, stop_df_ratio=ratio
        ).collect()
    }
    n = len(rows)
    dfreq: dict = {}
    for _, text in rows:
        for w in set(text.split(" ")):
            dfreq[w] = dfreq.get(w, 0) + 1
    cutoff = int(ratio * n)
    sets = {
        i: {w for w in set(text.split(" ")) if dfreq[w] <= cutoff}
        for i, text in rows
    }
    sets = {i: ws for i, ws in sets.items() if ws}
    want = set()
    for i, j in combinations(sorted(sets), 2):
        jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
        if jac >= t:
            want.add((i, j, round(jac, 9)))
    assert got == want and (1, 5, 1.0) in got and 4 not in {
        a for a, _, _ in got
    } | {b for _, b, _ in got}


def test_prefix_filter_lossless_on_random_corpora(spark):
    """Prefix-filtered pairs == brute force on seeded random corpora
    (random vocab sizes, doc lengths, duplication rates) at two
    thresholds — the clique / size-ratio space the fixed unit corpus
    cannot cover."""
    from itertools import combinations

    from hr_moderndatapipeline_spark.operators.dedup import prefix_jaccard_pairs

    rng = random.Random(88)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(rng.randint(8, 30))]
        docs = []
        for d in range(rng.randint(10, 40)):
            if docs and rng.random() < 0.4:
                # near-dup of an earlier doc: drop/add a word
                base = list(dict.fromkeys(rng.choice(docs)[1].split(" ")))
                if rng.random() < 0.5 and len(base) > 2:
                    base.pop(rng.randrange(len(base)))
                else:
                    base.append(rng.choice(vocab))
                words = list(dict.fromkeys(base))
            else:
                words = rng.sample(vocab, rng.randint(2, min(12, len(vocab))))
            docs.append((d, " ".join(words)))
        sets = {i: set(t.split(" ")) for i, t in docs}
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for t in (0.6, 0.9):
            got = {
                (r["doc_id_a"], r["doc_id_b"])
                for r in prefix_jaccard_pairs(df, "doc_id", "text", t).collect()
            }
            want = {
                (i, j)
                for i, j in combinations(sorted(sets), 2)
                if len(sets[i] & sets[j]) / len(sets[i] | sets[j]) >= t
            }
            assert got == want, (trial, t, got ^ want)
