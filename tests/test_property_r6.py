"""Round-6 property tests: PageRank agreement with a pure-Python
power iteration on random graphs, and skew-report accounting
invariants on random key distributions.

Spark-cheap strategy: hypothesis drives the INPUT generation, but
each case runs a bounded number of Spark jobs (examples are capped
low because a Spark round trip is ~100 ms, not ~1 µs)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st_

from hr_moderndatapipeline_spark.operators.diagnostics import key_skew_report
from hr_moderndatapipeline_spark.operators.graph import pagerank

_vertex = st_.integers(min_value=0, max_value=7)
_edges = st_.lists(
    st_.tuples(_vertex, _vertex), min_size=1, max_size=20
)


def _py_pagerank(edges, damping=0.85, iterations=8):
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    out: dict = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    rank = {v: 1.0 / n for v in verts}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in verts if v not in out)
        base = (1.0 - damping) / n + damping * dangling / n
        new = {v: base for v in verts}
        for s, ds in out.items():
            share = damping * rank[s] / len(ds)
            for d in ds:
                new[d] += share
        rank = new
    return rank


@settings(max_examples=10, deadline=None)
@given(_edges)
def test_pagerank_matches_reference_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    want = _py_pagerank(edges, iterations=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


@settings(max_examples=10, deadline=None)
@given(
    st_.lists(st_.integers(min_value=0, max_value=5), min_size=1, max_size=60)
)
def test_skew_report_accounting_invariants(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    rep = key_skew_report(df, "k", top=3, target_rows_per_task=10)
    from collections import Counter

    want = Counter(keys)
    assert rep["total_rows"] == len(keys)
    assert rep["n_keys"] == len(want)
    assert rep["max_count"] == max(want.values())
    assert rep["top_keys"][0]["count"] == max(want.values())
    assert rep["recommended_salt"] == -(-max(want.values()) // 10)
    # top keys are a true top slice of the histogram
    top_counts = sorted((k["count"] for k in rep["top_keys"]), reverse=True)
    assert top_counts == sorted(want.values(), reverse=True)[: len(top_counts)]


@settings(max_examples=5, deadline=None)
@given(
    st_.lists(
        st_.integers(min_value=-1_000_000, max_value=1_000_000),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    st_.integers(min_value=1, max_value=5),
)
def test_export_manifest_invariants_on_random_keys(spark, tmp_path_factory, keys, shards):
    from hr_moderndatapipeline_spark.sources.export import export_training_shards

    out = str(tmp_path_factory.mktemp("shards") / "out")
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    m = export_training_shards(df, out, key="k", num_shards=shards)
    assert m["total_rows"] == len(keys)
    assert sum(f["rows"] for f in m["files"]) == len(keys)
    # non-empty files' outward-rounded ranges never properly overlap
    ivs = sorted(
        (f["key_min"], f["key_max"]) for f in m["files"] if f["rows"]
    )
    for (_, hi1), (lo2, _) in zip(ivs, ivs[1:]):
        assert hi1 <= lo2 + 1
    # round trip preserves the key multiset
    back = spark.read.parquet(out)
    assert sorted(r["k"] for r in back.collect()) == sorted(keys)


_doc_texts = st_.lists(
    st_.lists(
        st_.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(_doc_texts)
def test_dup_ngram_spans_conservation_on_random_docs(spark, texts):
    """Position accounting must be conserved on ANY corpus: each doc
    emits max(len-n+1, 0) positions, dup positions never exceed
    positions, and a doc duplicated verbatim has dup_ratio 1 wherever
    it has positions at all (its twin matches every gram)."""
    from hr_moderndatapipeline_spark.operators.text import duplicated_ngram_spans

    n = 3
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (len(texts), texts[0])  # verbatim twin of doc 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_spans(df, "doc_id", "text", ngram=n).collect()
    }
    assert len(out) == len(rows)
    for i, t in rows:
        words = [w for w in t.split(" ") if w]
        expect_pos = max(len(words) - n + 1, 0)
        assert out[i]["n_positions"] == expect_pos
        assert 0 <= out[i]["n_dup_positions"] <= expect_pos
    if out[0]["n_positions"] > 0:
        assert out[0]["dup_ratio"] == 1.0 and out[len(texts)]["dup_ratio"] == 1.0


@settings(max_examples=8, deadline=None)
@given(_doc_texts)
def test_dsir_weight_accounting_on_random_docs(spark, texts):
    """DSIR invariants on any corpus: n_tokens matches the doc's
    whitespace token count, tokenless docs weigh 0, and with the
    target set to the WHOLE corpus every bucket has t_cnt == r_cnt
    and T == R, so each log-ratio is exactly ln(x)-ln(x) = 0 and
    every document's weight is exactly 0."""
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark.operators.sampling import dsir_logweights

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dsir_logweights(
            df, "doc_id", "text", target=F.lit(True), buckets=16
        ).collect()
    }
    for i, t in rows:
        n_tok = len([w for w in t.split(" ") if w])
        assert out[i]["n_tokens"] == n_tok
        if n_tok == 0:
            assert out[i]["logweight_micro"] == 0
        else:
            # target == raw corpus: ln(p_t/p_r) differs per bucket only
            # through identical counts, so lr == 0 exactly -> weight 0
            assert out[i]["logweight_micro"] == 0
