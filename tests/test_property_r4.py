"""Round-4 property tests: connected-components path parity on
random graphs, and schema-compatibility obedience to Avro resolution
on random record evolutions."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st_

from hr_moderndatapipeline_spark.functions.avro_codec import (
    _parse_schema,
    decode_record,
    encode_record,
)
from hr_moderndatapipeline_spark.functions.schema_registry import can_read
from hr_moderndatapipeline_spark.operators.dedup import dedup_clusters


def _components_naive(edges):
    """Reference labeling: BFS flood fill, min member per component."""
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label, seen = {}, set()
    for start in adj:
        if start in seen:
            continue
        comp, frontier = set(), {start}
        while frontier:
            n = frontier.pop()
            if n in comp:
                continue
            comp.add(n)
            frontier |= adj[n] - comp
        rep = min(comp)
        for n in comp:
            label[n] = rep
        seen |= comp
    return label


@settings(max_examples=8, deadline=None)
@given(
    edges=st_.lists(
        st_.tuples(st_.integers(0, 25), st_.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_clusters_both_paths_match_naive(spark, edges):
    """Property: for any random undirected edge list, the driver
    union-find path AND the distributed propagation path both equal
    the naive BFS labeling (self-loops are dropped by the operator,
    so drop them from the reference too)."""
    expect = _components_naive([(a, b) for a, b in edges if a != b])
    if not expect:
        return  # all self-loops: operator output is empty either way
    pairs = spark.createDataFrame(edges, "a long, b long")
    uf = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, "a", "b").collect()
    }
    assert uf == expect
    dist = {
        r["member_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, "a", "b", driver_threshold=0).collect()
    }
    assert dist == expect


@settings(max_examples=6, deadline=None)
@given(
    rows=st_.lists(
        st_.tuples(st_.integers(0, 4), st_.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    cuts=st_.lists(st_.integers(0, 59), min_size=0, max_size=3),
)
def test_incremental_fold_equals_full_recompute(spark, rows, cuts):
    """Property: folding ANY batch partition of the data through the
    aggregate state equals one full groupBy — the merge laws of the
    decomposable aggregates, end to end (count/sum/min/max/avg)."""
    from hr_moderndatapipeline_spark.operators.incremental import (
        aggregate_batch,
        finalize_aggs,
        incremental_fold,
    )

    df = spark.createDataFrame(rows, "k int, v long")
    aggs = {"v": "avg", "k": "count"}  # avg exercises the (sum, cnt) state pair
    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, prev = [], 0
    for c in [*bounds, len(rows)]:
        if c > prev:
            pieces.append(spark.createDataFrame(rows[prev:c], "k int, v long"))
            prev = c
    inc = {
        r["k"]: (r["v_avg"], r["k_count"])
        for r in finalize_aggs(
            incremental_fold(pieces, ["k"], aggs), aggs
        ).collect()
    }
    full = {
        r["k"]: (r["v_avg"], r["k_count"])
        for r in finalize_aggs(aggregate_batch(df, ["k"], aggs), aggs).collect()
    }
    assert inc == full


@settings(max_examples=6, deadline=None)
@given(
    left=st_.lists(
        st_.tuples(st_.integers(0, 4), st_.integers(0, 100)), min_size=0, max_size=25
    ),
    right=st_.lists(
        st_.tuples(st_.integers(0, 4), st_.integers(0, 100)), min_size=0, max_size=25
    ),
    n_salts=st_.integers(1, 8),
    how=st_.sampled_from(["inner", "left"]),
)
def test_salted_join_multiset_parity(spark, left, right, n_salts, how):
    """Property: salted join == plain join as a MULTISET (duplicate
    keys on both sides multiply matches identically), for any salt
    count and join type."""
    from hr_moderndatapipeline_spark.operators.relational import salted_join

    if not left:
        return  # empty left: trivially equal, createDataFrame needs schema rows
    l = spark.createDataFrame(left, "k int, lv int")
    r = spark.createDataFrame(right or [(None, None)], "k int, rv int").filter(
        "k IS NOT NULL"
    )
    got = sorted((x.k, x.lv, x.rv) for x in salted_join(l, r, ["k"], n_salts, how).collect())
    want = sorted((x.k, x.lv, x.rv) for x in l.join(r, "k", how).collect())
    assert got == want


def test_incremental_approx_distinct_sketch_state(spark):
    """COUNT DISTINCT is not decomposable — the HLL sketch state is:
    union-merged per batch, estimated on read. At small cardinality
    the sketch is in exact (sparse) mode, so the estimate must equal
    the true distinct count despite arriving in three batches with
    overlap."""
    from hr_moderndatapipeline_spark.operators.incremental import (
        finalize_aggs,
        incremental_fold,
    )

    batches = [
        spark.createDataFrame([(1, u) for u in (10, 11, 12)], "k int, user int"),
        spark.createDataFrame([(1, u) for u in (11, 12, 13)], "k int, user int"),
        spark.createDataFrame([(1, 14), (2, 99)], "k int, user int"),
    ]
    aggs = {"user": "approx_distinct"}
    out = {
        r.k: r.user_approx_distinct
        for r in finalize_aggs(
            incremental_fold(batches, ["k"], aggs), aggs
        ).collect()
    }
    assert out == {1: 5, 2: 1}  # {10..14} and {99}


_FIELD_POOL = [
    ("id", "long"),
    ("name", "string"),
    ("score", "double"),
    ("flag", "boolean"),
    ("extra", "string"),
]


@st_.composite
def _record_schema(draw):
    picked = draw(
        st_.lists(st_.sampled_from(range(len(_FIELD_POOL))), min_size=1, max_size=5, unique=True)
    )
    fields = []
    for i in sorted(picked):
        name, typ = _FIELD_POOL[i]
        has_default = draw(st_.booleans())
        f = {"name": name, "type": typ}
        if has_default:
            f["default"] = {"long": 0, "string": "", "double": 0.0, "boolean": False}[typ]
        fields.append(f)
    return {"type": "record", "name": "T", "fields": fields}


@settings(max_examples=25, deadline=None)
@given(writer=_record_schema(), reader=_record_schema())
def test_can_read_iff_decode_projects_cleanly(writer, reader):
    """Property: ``can_read(writer, reader)`` is TRUE exactly when a
    record encoded under the writer schema can be projected to every
    reader field (shared fields decode; missing ones need defaults)
    — the operational meaning of Avro resolution for flat records."""
    w_json, r_json = json.dumps(writer), json.dumps(reader)
    sample = {"id": 7, "name": "x", "score": 1.5, "flag": True, "extra": "y"}
    w_fields = _parse_schema(w_json)
    rec = decode_record(
        encode_record({f["name"]: sample[f["name"]] for f in writer["fields"]}, w_fields),
        w_fields,
    )
    writer_names = {f["name"] for f in writer["fields"]}
    projectable = all(
        f["name"] in writer_names or "default" in f for f in reader["fields"]
    )
    assert can_read(w_json, r_json) == projectable
    if projectable:
        projected = {
            f["name"]: rec.get(f["name"], f.get("default"))
            for f in reader["fields"]
        }
        for f in reader["fields"]:
            assert projected[f["name"]] is not None
