"""Fourth-session property tests: phrase-search agreement with a
brute-force Python scan, golden-record survivorship vs a dict fold,
and KMV order/partitioning invariance on random key sets.

Spark-cheap strategy (test_property_r6 precedent): hypothesis
generates inputs, examples are capped low because each case pays a
Spark round trip."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st_

from pyspark.sql import functions as F

_word = st_.sampled_from(["a", "b", "c", "d"])
_doc = st_.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st_.lists(_doc, min_size=1, max_size=8)
_phrase = st_.lists(_word, min_size=1, max_size=3).map(" ".join)


def _py_phrase_hits(texts, phrase):
    pw = phrase.split(" ")
    hits = set()
    for i, t in enumerate(texts):
        ws = t.split(" ")
        for p in range(len(ws) - len(pw) + 1):
            if ws[p : p + len(pw)] == pw:
                hits.add((i, p))
    return hits


@settings(max_examples=10, deadline=None)
@given(_corpus, _phrase)
def test_phrase_search_matches_bruteforce(spark, texts, phrase):
    from hr_moderndatapipeline_spark.operators.text import phrase_search

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {(r["doc_id"], r["match_pos"])
           for r in phrase_search(df, "doc_id", "text", phrase).collect()}
    assert got == _py_phrase_hits(texts, phrase)


_ents = st_.lists(
    st_.tuples(st_.integers(0, 9), st_.integers(-100, 100)),
    min_size=1, max_size=10, unique_by=lambda t: t[0],
)
_pairs = st_.lists(st_.tuples(st_.integers(0, 9), st_.integers(0, 9)), max_size=6)


@settings(max_examples=10, deadline=None)
@given(_ents, _pairs)
def test_golden_records_max_rule_matches_fold(spark, ents, pairs):
    """Survivorship max over each cluster == Python max over the same
    membership (clusters from dedup_clusters on random pairs among
    present ids; absent-pair entities survive as singletons)."""
    from hr_moderndatapipeline_spark.operators.dedup import (
        dedup_clusters,
        golden_records,
    )

    ids = {e[0] for e in ents}
    pairs = [(a, b) for a, b in pairs if a != b and a in ids and b in ids]
    edf = spark.createDataFrame(ents, "ent_id long, bal long")
    if pairs:
        pdf = spark.createDataFrame(pairs, "a long, b long")
        cl = dedup_clusters(pdf, "a", "b")
        membership = {r["member_id"]: r["cluster_id"] for r in cl.collect()}
    else:
        cl = spark.createDataFrame([], "member_id long, cluster_id long")
        membership = {}
    got = {r["cluster_id"]: (r["n_members"], r["max_bal"])
           for r in golden_records(edf, "ent_id", cl, {"bal": "max"}).collect()}
    want: dict = {}
    for eid, bal in ents:
        c = membership.get(eid, eid)
        n, m = want.get(c, (0, None))
        want[c] = (n + 1, bal if m is None else max(m, bal))
    assert got == want


_keys = st_.lists(st_.integers(0, 1000), min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(_keys)
def test_kmv_partitioning_invariance(spark, keys):
    """The sketch (and therefore the estimate) is identical under any
    input partitioning and duplication — KMV state depends only on
    the key SET."""
    from hr_moderndatapipeline_spark.operators.sketch import kmv_build

    df = spark.createDataFrame([(k,) for k in keys], "k long").withColumn(
        "g", F.lit("g")
    )
    a = {(r["rank"], r["h"]) for r in kmv_build(df, "k", ["g"], k=16).collect()}
    b = {(r["rank"], r["h"])
         for r in kmv_build(df.unionAll(df).repartition(7), "k", ["g"], k=16).collect()}
    assert a == b
