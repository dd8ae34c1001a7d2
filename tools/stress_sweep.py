"""Decade-scale stress sweep for the heavy dedup/ANN family
(VERDICT r6 task #4): generate a local ~sf1.0 documents/embeddings/
events set (10x sf0.1, NOT driver testdata) and run the heavy queries
at sf0.1 and the stress scale, asserting

- plan fingerprints UNCHANGED across the decade (no silent strategy
  flip: broadcast->SMJ, lost pushdown, a Python boundary appearing),
- zero spill at both scales (measured SQLMetrics, not claimed),
- wall-time growth ~linear in the data (the quadratic failure mode
  this sweep exists to catch).

Generation keeps the scale-up honest per family:
- documents: every word gets a per-copy suffix, so shingles/grams
  are DISJOINT across copies - each copy carries its own recrawl
  duplicate (the query unions one), but copies never near-match each
  other. Near-dup output grows linearly, not quadratically, and the
  measured time isolates the operator, not an artificial 10x-sized
  duplicate group.
- embeddings: the last dimension is shifted by the copy index, so
  copies are not mutually near-identical (SemDeDup blocks would
  otherwise grow 10x and pair work 100x); the fixed ANN query batch
  (vec_id < 5000) lives entirely in copy 0, matching the
  fixed-queries/growing-corpus production shape.
- events: ids/users shift per copy, the date range stays - per-day
  work grows 10x linearly.

Usage:
  python tools/stress_sweep.py --gen        # build /tmp/hr_mdp_stress_sf1 (~1 min)
  python tools/stress_sweep.py --gen --sf3  # build /tmp/hr_mdp_stress_sf3 (30 copies)
  python tools/stress_sweep.py              # sweep sf0.1 vs sf1.0, print JSON
  python tools/stress_sweep.py --sf3        # sweep sf0.1 vs sf3.0
  python tools/stress_sweep.py --relational # relational subset only
  python tools/stress_sweep.py --r7         # fold-heavy r7 family
  python tools/stress_sweep.py --gen --sf10 # spill-frontier scale (100 copies)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

BASE_DIR = "/root/testdata/sf0.1"
#: (dir, copies, per-copy doc offset). sf3's doc offset is 10M so the
#: queries' recrawl ids (doc_id + 1e6) stay disjoint from every other
#: copy's range (at 1e5 spacing, copy 10's ids would collide with
#: copy 0's recrawl).
SCALES = {
    "sf1.0": ("/tmp/hr_mdp_stress_sf1", 10, 100_000),
    "sf3.0": ("/tmp/hr_mdp_stress_sf3", 30, 10_000_000),
    # spill-frontier scale (VERDICT r7 task 3): 100 copies ≈ sf10.
    # All base keys are dense (o_orderkey < 150k, event_id < 100k),
    # so the per-copy offsets stay collision-free at 100 copies.
    "sf10": ("/tmp/hr_mdp_stress_sf10", 100, 10_000_000),
    # next frontier (VERDICT r9 task 5): 300 copies ≈ sf30 — where do
    # the 512 initial partitions stop being enough? Offsets stay
    # collision-free at 300 copies (orderkey 3e8 < 1e9 spacing head-
    # room, custkey/partkey bases < 1e5, suppkey base < 1e4).
    "sf30": ("/tmp/hr_mdp_stress_sf30", 300, 10_000_000),
}

#: The expensive tail VERDICT r6 names, plus the r7 paragraph census.
HEAVY_QUERIES = [
    "minhash_dedup_pairs",
    "simhash_near_pairs",
    "duplicate_ngram_spans",
    "semantic_dedup_survivors",
    "ivfpq_probe_topk",
    "rolling_weekly_active_users",
    "paragraph_dedup",
]

#: Round-7 additions (VERDICT r7 task 2): the fold-heavy family —
#: per-key collect_list funnels (prove per-key cardinality bounds
#: hold when the corpus grows but users multiply), the k-chained
#: BPE tokenize fold, the paragraph index/probe lifecycle, and the
#: two windowed aggregates over bounded spines.
R7_QUERIES = [
    "bpe_tokenize",
    "bigram_collocations",
    "event_transition_matrix",
    "funnel_conversion",
    "funnel_step_latency",
    "funnel_windowed_conversion",
    "funnel_restart_conversion",
    "paragraph_probe_dedup",
]

#: Spill-frontier set (VERDICT r7 task 3): the shuffle-heavy tail
#: only — zero-shuffle folds (bpe) and the documented quadratic are
#: excluded; the question at sf10 is WHERE the first spill appears
#: and which knob moves it.
FRONTIER_QUERIES = [
    "minhash_dedup_pairs",
    "simhash_near_pairs",
    "duplicate_ngram_spans",
    "paragraph_dedup",
    "rolling_weekly_active_users",
    "salted_lineitem_order_revenue",
    "pricing_summary",
    "part_profit_by_nation_year",
    "customer_order_distribution",
]

#: Relational-core extension (r7): joins, windows, and the skew path
#: over 10x TPC-H facts with consistent FK offsets.
RELATIONAL_QUERIES = [
    "pricing_summary",                # scan-heavy multi-aggregate
    "salted_lineitem_order_revenue",  # skew-salted big-big SMJ
    "part_profit_by_nation_year",     # Q9-shape 5-table join
    "customer_order_distribution",    # Q13 left-join double aggregation
    "cohort_retention",               # month-cohort self-join
    "user_hourly_resampled",          # window + grid explode
    "latest_order_per_customer",      # window dedup
]


def generate(stress_dir: str, copies: int, doc_offset: int) -> None:
    import duckdb

    os.makedirs(stress_dir, exist_ok=True)
    con = duckdb.connect()
    docs = " UNION ALL ".join(
        f"""SELECT doc_id + {k * doc_offset} AS doc_id,
               array_to_string(list_transform(str_split(text, ' '),
                                              w -> w || 'c{k}'), ' ') AS text,
               lang, source, n_chars
        FROM read_parquet('{BASE_DIR}/documents.parquet')"""
        for k in range(copies)
    )
    con.execute(f"COPY ({docs}) TO '{stress_dir}/documents.parquet' (FORMAT PARQUET)")
    emb = " UNION ALL ".join(
        f"""SELECT vec_id + {k * 100_000} AS vec_id,
               list_concat(list_slice(embedding, 1, 63),
                           [CAST(embedding[64] + {k} AS FLOAT)]) AS embedding,
               label
        FROM read_parquet('{BASE_DIR}/embeddings.parquet')"""
        for k in range(copies)
    )
    con.execute(f"COPY ({emb}) TO '{stress_dir}/embeddings.parquet' (FORMAT PARQUET)")
    ev = " UNION ALL ".join(
        f"""SELECT event_id + {k * 1_000_000} AS event_id, ts,
               user_id + {k * 10_000} AS user_id, event_type, value, props
        FROM read_parquet('{BASE_DIR}/events.parquet')"""
        for k in range(copies)
    )
    con.execute(f"COPY ({ev}) TO '{stress_dir}/events.parquet' (FORMAT PARQUET)")
    # TPC-H facts/dims with CONSISTENT FK offsets (orderkey +1e6·k,
    # custkey/partkey +1e5·k, suppkey +1e4·k per copy) so every join
    # path survives the scale-up with realistic fan-outs; nation and
    # region stay shared (all copies join the same 25/5 rows, exactly
    # how a 10x business would).
    shifted = {
        "orders": "o_orderkey + {ok} AS o_orderkey, o_custkey + {ck} AS o_custkey,"
                  " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
        "lineitem": "l_orderkey + {ok} AS l_orderkey, l_partkey + {pk} AS l_partkey,"
                    " l_suppkey + {sk} AS l_suppkey, l_linenumber, l_quantity,"
                    " l_extendedprice, l_discount, l_tax, l_returnflag,"
                    " l_linestatus, l_shipdate",
        "customer": "c_custkey + {ck} AS c_custkey, c_name, c_nationkey,"
                    " c_acctbal, c_mktsegment",
        "part": "p_partkey + {pk} AS p_partkey, p_name, p_brand, p_type,"
                " p_size, p_retailprice",
        "supplier": "s_suppkey + {sk} AS s_suppkey, s_name, s_nationkey, s_acctbal",
    }
    for tbl, proj in shifted.items():
        union = " UNION ALL ".join(
            "SELECT "
            + proj.format(
                ok=k * 1_000_000, ck=k * 100_000, pk=k * 100_000, sk=k * 10_000
            )
            + f" FROM read_parquet('{BASE_DIR}/{tbl}.parquet')"
            for k in range(copies)
        )
        con.execute(f"COPY ({union}) TO '{stress_dir}/{tbl}.parquet' (FORMAT PARQUET)")
    for tbl in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE_DIR}/{tbl}.parquet')) "
            f"TO '{stress_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    print(f"generated {stress_dir} ({copies} copies): "
          + ", ".join(f"{f}={os.path.getsize(f'{stress_dir}/{f}.parquet')//1024}KiB"
                      for f in ("documents", "embeddings", "events")))


def sweep(stress_tag: str, stress_dir: str) -> None:
    from hr_moderndatapipeline_spark import get_spark
    from hr_moderndatapipeline_spark import queries as qmod
    from hr_moderndatapipeline_spark.functions.execmetrics import executed_metrics
    from hr_moderndatapipeline_spark.plans.fingerprint import plan_fingerprint

    spark = get_spark("stress_sweep")
    allq = qmod.queries()

    def _scaled_semantic(spark_, sf_dir):
        # The quadratic remedy OPERATIONALIZED: the operator docstring's
        # scaling law sign_bits = max(4, ceil(log2(n_rows / 125)))
        # holds block POPULATION near the sf0.1@4bits reference (~125),
        # so growth should return to ~linear at any scale. Driver query
        # parameters stay pinned for the oracle; this entry exists only
        # to measure the law.
        import math

        from hr_moderndatapipeline_spark.operators.similarity import (
            semantic_dedup_survivors,
        )
        from hr_moderndatapipeline_spark.sources.readers import load_table

        emb = load_table(spark_, sf_dir, "embeddings")
        bits = max(4, math.ceil(math.log2(max(emb.count(), 1) / 125)))
        return semantic_dedup_survivors(
            emb, "vec_id", "embedding", threshold=0.4, sign_bits=bits
        )

    runnable = {**allq, "semantic_dedup_scaled_bits": _scaled_semantic}
    names = [*HEAVY_QUERIES, "semantic_dedup_scaled_bits", *RELATIONAL_QUERIES]
    if "--relational" in sys.argv[1:]:
        names = RELATIONAL_QUERIES
    if "--r7" in sys.argv[1:]:
        names = R7_QUERIES
    if "--frontier" in sys.argv[1:]:
        names = FRONTIER_QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            names = a.split("=", 1)[1].split(",")
    if stress_tag in ("sf3.0", "sf10", "sf30"):
        # fixed-4-bit semantic dedup is the DOCUMENTED quadratic
        # (x61.6 at 10x == ~25 min at 30x) - the law entry replaces it
        names = [n for n in names if n != "semantic_dedup_survivors"]
    out: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for tag, sf_dir in (("sf0.1", BASE_DIR), (stress_tag, stress_dir)):
            df = runnable[name](spark, sf_dir)
            fp = plan_fingerprint(df)
            # materialize via Arrow toPandas (falling back to collect):
            # both execute the df's OWN QueryExecution so
            # executed_metrics reads real counters (a noop write builds
            # its own execution and reads zeros), and Arrow transfer
            # keeps multi-million-row results from billing
            # row-conversion time to the engine. The clock starts
            # BEFORE re-construction: queries with eager
            # localCheckpoint stages (LPA, PageRank) do their real
            # work at construction and would otherwise time as ~0
            # (caught r10 — the LPA sf3 row in SCALING.md).
            t0 = time.time()
            df = runnable[name](spark, sf_dir)
            try:
                df.toPandas()
            except Exception:  # noqa: BLE001 — arrow-unfriendly types
                df.collect()
            dt = round(time.time() - t0, 2)
            m = executed_metrics(df)
            spark.catalog.clearCache()
            row[tag] = {
                "sec": dt,
                "fingerprint": fp,
                "spill_bytes": m["spill_bytes"],
                "shuffle_mib": round(m["shuffle_bytes"] / 1048576, 1),
            }
        row["growth"] = (
            round(row[stress_tag]["sec"] / row["sf0.1"]["sec"], 2)
            if row["sf0.1"]["sec"] > 0
            else None
        )
        row["plan_stable"] = (
            row["sf0.1"]["fingerprint"] == row[stress_tag]["fingerprint"]
        )
        out[name] = row
        print(
            f"{name}: {row['sf0.1']['sec']}s -> {row[stress_tag]['sec']}s "
            f"(x{row['growth']}, plan_stable={row['plan_stable']}, "
            f"spill={row[stress_tag]['spill_bytes']})",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    tag = (
        "sf30" if "--sf30" in sys.argv[1:]
        else "sf10" if "--sf10" in sys.argv[1:]
        else "sf3.0" if "--sf3" in sys.argv[1:]
        else "sf1.0"
    )
    sdir, copies, doc_off = SCALES[tag]
    if "--gen" in sys.argv[1:]:
        generate(sdir, copies, doc_off)
    else:
        if not os.path.isdir(sdir):
            print(f"{sdir} missing - run with --gen first", file=sys.stderr)
            sys.exit(2)
        sweep(tag, sdir)
