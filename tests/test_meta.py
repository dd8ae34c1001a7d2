"""Surface-contract meta-tests: standards every queries() entry must
meet, independent of its semantics."""

from __future__ import annotations

from hr_moderndatapipeline_spark.queries import oracle_sql, queries


def test_every_query_documented():
    """Docstrings carry the parity citations and scale notes the
    surface is reviewed by — an undocumented query is unreviewable."""
    thin = [
        name
        for name, fn in queries().items()
        if not (fn.__doc__ and len(fn.__doc__.strip()) > 60)
    ]
    assert not thin, f"undocumented queries: {thin}"


def test_bench_queries_subset_of_surface():
    import bench

    missing = [n for n in bench.BENCH_QUERIES if n not in queries()]
    assert not missing, f"bench names not in queries(): {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_oracles_reference_known_tables_only():
    """Oracle SQL may only name the driver's pre-registered views —
    a typo'd table fails at driver time, not review time."""
    import re

    from hr_moderndatapipeline_spark.sources.readers import TABLES

    known = set(TABLES)
    for name, sql in oracle_sql().items():
        for m in re.finditer(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b", sql, re.I):
            t = m.group(1).lower()
            # CTE names and derived-table keywords are fine; only
            # flag identifiers that LOOK like base tables but aren't
            if t in known or t in {"lateral", "unnest", "generate_series"}:
                continue
            assert t in sql.lower().split("with", 1)[-1] or t in known, (
                name,
                t,
            )


def test_rows_only_set_is_intentional():
    """Every oracle-less query must be one of the documented
    non-SQL classes (streaming execution, engine-native hashing,
    iterative) — additions to this set are a deliberate decision."""
    allowed = {
        # The whole ANN family is oracle-backed as of r8
        # (ann_ivf/ivf_probe in r7; pq/ivfpq in r8 via portable-hash
        # verification-mode codebooks + sequential ADC folds). The
        # remaining seven are streaming LIFECYCLES: each runs a real
        # micro-batch query (source → checkpointed sink → read-back),
        # and what DuckDB could check — the final table — is not what
        # the query exists to prove. Their invariants are pinned
        # STRONGER than a result-hash, per entry below; this is the
        # stable floor, not a backlog (VERDICT r8 task 6).
        #
        # incremental-offset resume: a second availableNow run reads
        # ONLY the file appended after the first drain (checkpointed
        # offsets, not results, are the subject)
        "streaming_custom_source",
        # two-integer funnel state: bit-equal to the batch funnel_steps
        # fold ACROSS a checkpoint restart (tests/test_streaming.py);
        # an oracle on the final counts would not exercise the restart
        "streaming_funnel_state",
        # watermarked dropDuplicates: exactness within the watermark
        # is the contract; the duplicate set spans micro-batches
        "streaming_dedup_events",
        # EWMA state: bitwise-equal fold across restart (order-
        # sensitive float fold — a SQL restatement would have to
        # replicate micro-batch boundaries to be meaningful)
        "streaming_ewma_state",
        # from_json valid/corrupt routing through TWO checkpointed
        # sinks; the subject is the split + sink replay safety
        "streaming_dlq_roundtrip",
        # dual-watermark leftOuter stream-stream join: null-padding
        # timing depends on watermark advancement, a streaming-only
        # semantic
        "streaming_join_enrichment",
        # foreachBatch SCD2 MERGE: two-phase close/insert replayed
        # idempotently across batches; the versioned snapshot is the
        # subject (unit-pinned), not the final aggregate
        "streaming_scd2_snapshot",
        # native session_window through the state store (complete
        # mode — Spark forbids update for session aggregations),
        # pinned equal to the one-shot batch session_window across a
        # checkpoint restart; the BATCH session_window_counts query
        # carries the cross-engine oracle for the session semantics
        "streaming_session_windows",
        # the PRODUCTION append-mode face of the same operator
        # (lifecycle #9, VERDICT r9 #3): watermark-driven exactly-once
        # session emission + state EVICTION — the subject is WHEN a
        # session flushes and that its state row leaves the store
        # (pinned via lastProgress numRowsTotal and the
        # finalized-vs-open partition against batch sessionization in
        # tests/test_streaming.py), not the final table's values
        "streaming_session_windows_append",
        # streaming incremental dedup: checkpointed foreachBatch
        # probe-then-absorb against the published MinHash index; the
        # subject is the accumulation law (union of per-batch pairs
        # == one-shot restricted, in ANY arrival order) and per-tag
        # replay idempotence, both pinned in tests/test_r12_ops.py —
        # a result-hash of the summary row would not exercise either
        "streaming_minhash_probe",
    }
    actual = set(queries()) - set(oracle_sql())
    assert actual == allowed, (
        f"rows-only drift: unexpected={actual - allowed}, "
        f"missing={allowed - actual}"
    )
