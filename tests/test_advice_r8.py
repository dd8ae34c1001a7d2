"""Round-8 ADVICE regression pins.

Each test encodes one r7-ADVICE finding as a failing-before /
passing-after behavior:

1. BPE symbols / funnel step names containing backslashes or single
   quotes were spliced into ``F.expr`` text with ANSI-style quoting,
   which Spark's default parser (backslash escapes + adjacent-literal
   concatenation) mangles — ``'it''s'`` parses as ``"its"``, ``'\'``
   eats the closing quote (functions/sqlesc.py).
2. ``stratified_fixed_n`` / ``det_bucket`` multiplied a raw BIGINT
   key by the Knuth constant — an ARITHMETIC_OVERFLOW throw under
   Spark 4's ANSI default for keys above ~3.47e9, and divergence
   from the HUGEINT DuckDB oracle. Fixed by reducing mod 2^31 first
   (bounded intermediate, identity for small keys), mirrored in the
   oracle texts.
3. A zero vector selected as an IVF seed made ``_assign_factory``
   divide by a zero norm → NaN/inf scores and engine-divergent
   assignments; now pinned to score 0.0 exactly (inf-norm guard),
   matching ORACLE_ANN_IVF's CASE branch.
"""

from __future__ import annotations

import typing

from pyspark.sql import functions as F


# ── 1. SQL-literal escaping (sqlesc) ──


def _ref_bpe_apply(word: str, merges) -> list[str]:
    """Pure-Python greedy left-to-right fold, one pass per merge —
    the semantics bpe_apply's chained aggregate() pins."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_survives_backslash_and_quote_symbols(spark):
    """A corpus of backslashed/quoted 'words' (code/web shapes) must
    learn and apply merges without ParseException and match the
    pure-Python fold exactly — including a column name with a space
    (sql_ident path in bpe_apply)."""
    from hr_moderndatapipeline_spark.operators.text import (
        bpe_apply,
        bpe_learn_merges,
    )

    corpus = [
        (1, r"a\b a\b it's it's C:\tmp"),
        (2, r"don't don't \\esc \\esc"),
    ]
    df = spark.createDataFrame(corpus, "id int, `my text` string")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learn_merges(df, "my text", num_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert merges, "no merges learned"
    out = {
        r["id"]: (r["n_chars"], r["n_pieces"])
        for r in bpe_apply(df, "id", "my text", merges).collect()
    }
    for doc_id, text in corpus:
        words = [w for w in text.split(" ") if w]
        want_chars = sum(len(w) for w in words)
        want_pieces = sum(len(_ref_bpe_apply(w, merges)) for w in words)
        assert out[doc_id] == (want_chars, want_pieces), doc_id


def test_funnel_steps_with_quoted_and_backslashed_names(spark):
    """Step names like "it's" and "buy\\now" must match their events
    (the old ANSI double-quote escaping silently produced "its")."""
    from hr_moderndatapipeline_spark.operators.relational import (
        funnel_step_times,
        funnel_steps,
        funnel_steps_windowed,
    )

    steps = ["it's", "buy\\now"]
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "it's"),
            (1, "2024-01-01 00:01:00", "buy\\now"),
            (2, "2024-01-01 00:00:00", "its"),  # the mangled form: no match
        ],
        "uid int, ts string, etype string",
    )
    f = {
        r["uid"]: (r["steps_completed"], r["converted"])
        for r in funnel_steps(ev, ["uid"], "ts", "etype", steps).collect()
    }
    assert f == {1: (2, 1), 2: (0, 0)}
    fw = {
        r["uid"]: r["converted"]
        for r in funnel_steps_windowed(
            ev, ["uid"], "ts", "etype", steps, window_seconds=3600
        ).collect()
    }
    assert fw == {1: 1, 2: 0}
    ft = {
        r["uid"]: r["steps_completed"]
        for r in funnel_step_times(ev, ["uid"], "ts", "etype", steps).collect()
    }
    assert ft == {1: 2, 2: 0}


def test_bpe_apply_type_hints_resolve():
    """ADVICE r7: ``Sequence`` was referenced in bpe_apply's signature
    but never imported — harmless under deferred annotations, broken
    for get_type_hints/linters."""
    from hr_moderndatapipeline_spark.operators import text

    hints = typing.get_type_hints(text.bpe_apply)
    assert "merges" in hints


# ── 2. key-mixing overflow (sampling) ──


def test_det_bucket_huge_keys_ansi_safe_and_oracle_parity(spark):
    """Keys beyond 2^31 (up to near 2^63) must neither overflow under
    ANSI mode nor diverge from the HUGEINT-exact DuckDB restatement
    of the reduced formula."""
    import duckdb

    from hr_moderndatapipeline_spark.operators.sampling import det_bucket

    keys = [0, 1, 7, 2**31 - 1, 2**31, 2**40 + 3, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", det_bucket(F.col("k")).alias("b")).collect()
    }
    con = duckdb.connect()
    for k in keys:
        want = con.execute(
            "SELECT (CAST(? AS HUGEINT) % 2147483648 * 2654435761)"
            " % 4294967296 % 100",
            [k],
        ).fetchone()[0]
        assert got[k] == want, k


def test_stratified_fixed_n_huge_keys_no_overflow(spark):
    """The per-stratum hash rank must survive keys near 2^63 (the old
    raw multiply threw ARITHMETIC_OVERFLOW under ANSI)."""
    from hr_moderndatapipeline_spark.operators.sampling import stratified_fixed_n

    rows = [("s", k) for k in (1, 2**31, 2**45, 2**63 - 1, 2**63 - 2)]
    df = spark.createDataFrame(rows, "src string, k long")
    out = stratified_fixed_n(df, ["src"], "k", 3).collect()
    assert len(out) == 3
    assert sorted(r["sample_rank"] for r in out) == [1, 2, 3]


def test_negative_samples_huge_ids_no_overflow(spark):
    """negative_samples' mixed draw must stay in-range for ids far
    beyond 2^31 (dense-id spaces at 100 TB are billions of rows)."""
    from hr_moderndatapipeline_spark.operators.sampling import negative_samples

    n_items = 2**35
    ids = [0, 1, 2**31, 2**34, n_items - 1]
    df = spark.createDataFrame([(i,) for i in ids], "vid long")
    out = negative_samples(df, "vid", n_items=n_items, k=2).collect()
    assert len(out) == len(ids) * 2
    for r in out:
        assert 0 <= r["neg_id"] < n_items
        assert r["neg_id"] != r["vid"]


# ── 3. IVF zero-norm seed guard (similarity) ──


def test_ivf_assign_zero_norm_centroid_scores_zero(spark):
    """A zero-vector centroid must yield finite scores (0.0 exactly)
    and a deterministic assignment — never NaN/inf argmax."""
    import numpy as np

    from hr_moderndatapipeline_spark.operators.similarity import _assign_factory

    codebook = np.array(
        [
            [0.0, 0.0, 0.0, 0.0],  # the degenerate seed
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
        ],
        dtype=np.float64,
    )
    assign = _assign_factory(codebook, n=2)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 2.0, 0.0, 0.0])],
        "vid int, v array<double>",
    )
    out = {
        r["vid"]: list(r["cells"])
        for r in df.select("vid", assign(F.col("v")).alias("cells")).collect()
    }
    # zero centroid scores 0.0; real centroids win where aligned, and
    # the zero cell ranks by ascending cluster id on the 0.0 tie.
    assert out[1][0] == 1 and out[2][0] == 2
    for cells in out.values():
        assert all(0 <= c < 3 for c in cells)
