"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Emission contract (round 7 — VERDICT r6 "What's wrong" #1): the
driver captures only the LAST ~2,000 bytes of output, so the final
stdout line must stay compact. The FULL record — every query timing,
plan fingerprint, variant timings, errors — is written to a committed
side file ``BENCH_DETAIL_r<N>.json`` (N = next round, inferred from
existing ``BENCH_r*.json``), and the final printed line carries only
{"metric", "value", "unit", "sf", "queries": <the 21-query r1-anchor
subset>, "n_queries", "errors", "detail", "set"} — measured ≲1 KB.

``--core`` runs only the 45-query cross-round comparable core (the r5
bench list) for cheap solo iteration; the driver's default run is the
full set. BENCH_DETAIL records which set ran.

Results are written to a no-op sink (full plan execution, no driver
materialization cost), matching how a production job would behave.
Each query runs twice and reports the per-query minimum — the shared
host this runs on shows 2-3× ambient timing swings, and the minimum
is the standard steady-state estimator under external interference
(caches are cleared between runs, so the second run re-executes the
full plan rather than reading persisted blocks).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hr_moderndatapipeline_spark import get_spark
from hr_moderndatapipeline_spark import queries as qmod

#: Headline set: one representative per operator family (full
#: inventory correctness is the driver's t2 job; bench tracks the
#: throughput-critical shapes).
BENCH_QUERIES = [
    "pricing_summary",            # scan-heavy multi-aggregate
    "attrition_monthly",          # groupBy + conditional agg (flagship)
    "attrition_by_segment",       # broadcast join + agg
    "local_supplier_volume",      # 6-table join (reordering canary)
    "latest_order_per_customer",  # window dedup
    "cdc_upsert_current_orders",  # merge/upsert
    "scd2_user_state",            # SCD2 history build
    "asof_purchase_state",        # as-of range join
    "dq_violations_customer",     # DQ rules engine
    "user_sessions",              # sessionization windows
    "event_hourly_window",        # time-window agg
    "dedup_exact",                # exact dedup
    "minhash_dedup_pairs",        # MinHash+LSH near-dup (portable hash family)
    "minhash_probe_pairs",        # MinHash index/probe lifecycle (r12)
    "simhash_near_pairs",         # SimHash near-dup (portable 62-bit sign sums)
    "jaccard_pairs_by_source",    # blocked Jaccard verify
    "ann_bruteforce_topk",        # exact cosine top-k
    "ann_lsh_topk",               # LSH ANN
    "ann_ivf_topk",               # IVF ANN
    "ann_recall_eval",            # recall@10 of IVF+LSH vs brute force (r12)
    "pq_probe_topk",              # product-quantization ADC scan
    "gold_summary_sql",           # SQL model DAG
    "debezium_unwrap",            # CDC envelope handling
    "corpus_curation",            # composed curation: dedup+quality+lang, 1 shuffle
    "contamination_overlap",      # broadcast eval-gram join
    "tfidf_top_terms",            # tf-idf keyword extraction
    "error_window_clicks",        # bucketized interval join
    "training_shuffle",           # deterministic global shuffle
    "user_hourly_resampled",      # time-series resample + gap fill
    "token_stats",                # text analysis
    "doc_fingerprint",            # rolling-hash fingerprint
    "multimodal_features",        # mapInPandas feature extraction
    "supplier_name_neardups",     # (block, length-band) salted levenshtein join
    "quantity_quartiles",         # exact percentiles over full table
    "cohort_retention",           # month-cohort self-join retention
    "dedup_drop_survivors",       # dedup keep-one-per-cluster
    "incremental_orders_agg",     # batch-fold aggregate state maintenance
    "schema_evolution_read",      # registry wire decode (Arrow UDF path)
    "lineitem_unpivot",           # wide-to-long generate throughput
    "session_window_counts",      # native session_window sessionization
    "corpus_freq_quality",        # unigram-LM token-frequency scoring
    "quality_topk_per_source",    # per-domain top-k curation (window group limit)
    "weighted_doc_sample",        # deterministic quality-weighted sampling
    "bloom_filtered_supplier_revenue",  # bloom pre-shuffle join reduction
    "late_shipment_priority",     # correlated EXISTS decorrelation
    "stable_doc_ids",             # two-pass global row numbering
    "customer_running_spend",     # explicit ROWS-frame running total
    "daily_order_anomalies",      # z-score anomaly flags over daily counts
    "part_profit_by_nation_year", # Q9-shape 5-table join, LIKE-pruned fact
    "salted_lineitem_order_revenue",  # skew-salted big-big SMJ (salting cost ledger)
    "quality_zscore_by_source",   # per-source feature normalization (broadcast stats)
    "min_cost_supplier",          # Q2-shape correlated scalar-MIN decorrelation
    "nation_trade_volume",        # Q7-shape 5-join bilateral volume (broadcast dims)
    "large_volume_customers",     # Q18-shape HAVING semi-join + fact re-aggregation
    "ivfpq_probe_topk",           # IVF-PQ composed index build+persist+probe
    "duplicate_ngram_spans",      # corpus-wide positional n-gram dup census
    "event_type_pagerank",        # 10-step iterative power iteration
    "dsir_importance_weights",    # DSIR hashed-unigram importance weights
    "bucketed_colocated_revenue", # bucketBy publish + zero-exchange SMJ
    "hard_negative_mining",       # cross-label exact top-k (contrastive pairs)
    "classifier_quality_gate",    # hashed linear classifier application
    "cms_term_frequencies",       # count-min sketch build + readout
    "price_histogram_quantiles",  # mergeable histogram quantile readout
    "price_drift_by_era",         # histogram L1/TV drift monitor
    "source_token_entropy",       # per-source token entropy (micro-nats)
    "user_activity_streaks",      # gaps-and-islands streak rollup
    "ivm_order_customer_join",    # incremental join-view maintenance
    "keyword_search_conjunctive", # posting-intersection AND search
    "kmv_distinct_users",         # KMV distinct sketch (WindowGroupLimit rank)
    "user_value_twap",            # zero-order-hold time-weighted average
    "phrase_search",              # positional posting-list phrase intersection
    "snapshot_orders_diff",       # versioned-snapshot CDF classification
    "segment_priority_chisq",     # contingency grid + chi-square cells
    "supplier_golden_records",    # entity match→cluster→survivorship MDM
    "rolling_weekly_active_users",  # trailing-7d distinct via contribution explode
    "curation_decisions",         # per-doc drop-reason audit matrix
    "forecast_revenue_change",    # Q6 scan-only pushdown canary
    "customer_order_distribution",  # Q13 left-join residual double aggregation
    "paragraph_dedup",            # segment-level dedup census + survivor rewrite
    "duplicate_span_removal",     # word-level dup-span rewrite (recrawl corpus)
    "semantic_dedup_survivors",   # sign-bit blocked SemDeDup greedy keep
    "semantic_dedup_multitable",  # 3-table OR-construction recall remedy
    "bigram_collocations",        # integer-micro lift phrase detection
    "bpe_tokenize",               # BPE learn(5)+apply lifecycle
    "funnel_restart_conversion",  # last-anchor windowed funnel (r8)
    "bpe_tokenize_arrow",         # BPE apply on the Arrow memo path (r8)
    "dup_cluster_size_spectrum",  # duplicate-frequency spectrum (r8)
    "domain_top_p_coverage",      # nucleus-style source coverage (r8)
    "quality_calibration_curve",  # decile calibration via stable-id ntile (r8)
    "daily_order_cusum",          # per-series CUSUM drift alarm fold (r8)
    "fk_integrity_audit",         # 7-edge referential-integrity sweep (r8)
    "order_value_percentiles",    # grouped exact percentiles, range-run rank (r8)
    "daily_volume_mad",           # robust median/MAD outlier screen (r8)
    "session_funnel_conversion",  # session-scoped funnel composition (r8)
    "conversion_latency_histogram",  # censored time-to-convert buckets (r8)
    "conversion_survival_curve",  # Kaplan-Meier product-limit fold (r9)
    "weighted_order_sample",      # integer-exact A-Res weighted top-n (r9)
    "purchase_attribution",       # first/last/linear multi-touch credit (r9)
    "customer_supplier_communities",  # deterministic sync LPA, 5 rounds (r9/r10)
    "communities_published_edges",  # LPA from the published edge table (r12)
    "signup_conversion_survival",  # grouped Kaplan-Meier cohort curves (r9)
    "xml_roundtrip",              # native XML source/sink identity (r9)
    "ivfpq_rerank_topk",          # two-stage ANN: ADC shortlist + exact re-rank (r9)
    "winnowing_fingerprints",     # MOSS min-in-window fingerprint census (r10)
    "winnowing_dup_pairs",        # shared-fingerprint passage-match pairs (r10)
    "winnowing_probe_pairs",      # indexed passage-match probe lifecycle (r11)
    "bm25_search",                # BM25 query-targeted retrieval top-20 (r10)
    "kmeans_cluster_profile",     # Lloyd k-means, literal-centroid rounds (r10)
    "kmeans_balanced_selection",  # cluster-balanced curation top-25/cluster (r10)
    "hybrid_rrf_search",          # BM25 ⊕ dense-cosine RRF fusion top-20 (r10)
    "mmr_diverse_rerank",         # MMR diversified rerank of the dense head (r10)
    "spend_decile_woe",           # WOE/IV supervised feature binning (r10)
    "classifier_auc",             # exact rank-sum ROC-AUC, dual tie-break (r10)
    "did_experiment_readout",     # 2x2 diff-in-differences single-agg (r10)
    "conversion_logrank",  # log-rank O/E/V in the KM fold discipline (r10)
    "value_qte_readout",          # per-variant exact quantile treatment effects (r10)
    "price_psi_by_era",           # PSI drift scalar over matched histograms (r10)
    "event_value_ks_by_type",     # exact integer two-sample KS per metric (r10)
    "purchase_uplift_qini",       # cumulative-decile Qini uplift curve (r10)
    "bm25_multi_search",          # batched BM25: 3 queries, one corpus pass (r10)
    "bm25_index_probe",           # publish-once postings + pruned probe (r11)
    "retrieval_eval",             # judged MRR/P/R/nDCG retrieval readout (r11)
    "calibration_ece",            # fixed-bin reliability + exact ECE (r11)
    "rater_agreement_kappa",      # Cohen's kappa inter-rater readout (r11)
    "segment_fairness_audit",     # parity/equalized-odds gap audit (r11)
    "kmeans_silhouette",          # simplified-silhouette k readout (r11)
    "source_quantile_normalize",  # cross-source percent-rank remap (r11)
    "embedding_cohort_drift",     # vector-space cohort drift monitor (r11)
    "embedding_drift_merged",     # publish/merge lifecycle face (r11)
    "order_priority_ate",         # post-stratified ATE readout (r11)
    "quality_gate_pr_curve",      # gate-threshold PR/F1 calibration (r11)
    "hybrid_rrf_multi_search",    # batched hybrid RRF: 2 passes for 3 queries (r10)
    "conversion_hazard_curve",    # Nelson-Aalen cumulative hazard fold (r10)
    # streaming lifecycles stay OFF the bench list (checkpointed
    # micro-batch drives, not throughput shapes) — same policy as
    # every round since r7
    # prefix_jaccard_neardups / containment_dup_profile are driver
    # queries but NOT bench entries: the synthetic corpus's tiny
    # vocabulary defeats rare-first prefix discrimination (measured
    # 167s / 91s solo at sf0.1 — SCALING.md r8) and would dominate
    # the loop without measuring anything new per run.
]

#: The 21-query round-1 anchor subset (BASELINE.md comparison set).
#: This is what the compact driver-facing stdout line reports —
#: BENCH_DETAIL_r*.json carries the full per-query record.
ANCHOR_QUERIES = [
    "pricing_summary",
    "attrition_monthly",
    "attrition_by_segment",
    "latest_order_per_customer",
    "cdc_upsert_current_orders",
    "scd2_user_state",
    "asof_purchase_state",
    "dq_violations_customer",
    "user_sessions",
    "event_hourly_window",
    "dedup_exact",
    "minhash_dedup_pairs",
    "jaccard_pairs_by_source",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "gold_summary_sql",
    "debezium_unwrap",
    "token_stats",
    "doc_fingerprint",
    "multimodal_features",
]

#: The 45-query cross-round comparable core — EXACTLY the round-5
#: bench list (r6 inserted pq_probe_topk mid-list, so this is not a
#: prefix slice). ``--core`` runs only these, trimming solo-iteration
#: wall time; the long tail still runs on the driver's full run.
CORE_QUERIES = [
    n
    for n in BENCH_QUERIES[:46]
    if n != "pq_probe_topk"
]


def _next_round() -> int:
    """Infer the round number for the detail-file name from committed
    driver artifacts: max existing BENCH_r<N>.json + 1 (the driver
    writes BENCH_r<N>.json AFTER running this script)."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for f in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    core_only = "--core" in argv
    bench_set = CORE_QUERIES if core_only else BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # 1-minute loadavg at start (the bench's own load shows at end):
    # sustained ambient windows on this shared host inflate every
    # query together (round-6 measured a uniform 1.4x); recording the
    # context lets a cross-round diff distinguish load from code.
    load_start = round(os.getloadavg()[0], 1)
    spark = get_spark("bench")

    all_queries = qmod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Warm the JVM/codegen once on the flagship so per-query numbers
    # measure steady-state execution, not first-job startup.
    try:
        all_queries["attrition_monthly"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # noqa: BLE001 — warmup must never kill the bench
        print(f"warmup failed: {e}", file=sys.stderr)
    # Warm the Python/Arrow UDF worker pool with a trivial pandas_udf
    # job (forking the daemon workers + first Arrow exchange costs
    # seconds and would otherwise be billed entirely to whichever
    # UDF-bearing query happens to run first).
    from pyspark.sql import functions as F  # noqa: PLC0415

    def _identity(s: pd.Series) -> pd.Series:
        return s

    _warm = F.pandas_udf(_identity, "long")
    spark.range(32, numPartitions=32).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    def run_one(name: str) -> float:
        t0 = time.time()
        all_queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        # Queries are timed independently: drop any cache a query
        # persisted so storage memory doesn't bleed into the next
        # query's measurement.
        spark.catalog.clearCache()
        return dt

    # One crashing query must cost only ITS number, never the whole
    # bench (round 3 lost the entire measurement to one analysis
    # error): each sample is fault-isolated and failures are
    # reported in an `errors` field alongside the timings.
    samples: dict[str, list[float]] = {n: [] for n in bench_set}
    for _rep in range(2):
        for name in bench_set:
            if name in errors:
                continue
            try:
                samples[name].append(run_one(name))
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:500]
    for name in bench_set:
        if name in errors:
            continue
        # Host interference shows up as one sample several times the
        # other — or, in a sustained busy window, as BOTH samples
        # inflated together. A tie-breaking third run covers the
        # first case; expensive queries (where absolute noise
        # dominates) always get the third sample, time-separated
        # from the earlier two.
        if max(samples[name]) > 1.8 * min(samples[name]) or min(samples[name]) > 3.0:
            try:
                samples[name].append(run_one(name))
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                continue
        timings[name] = min(samples[name])

    # Plan fingerprints (VERDICT r5 task 5): one stable token per
    # query, hashing the operator skeleton + strategy counts at BENCH
    # scale. A strategy flip (broadcast→SMJ, lost pushdown, a Python
    # boundary appearing) changes the token even when timing noise
    # hides the regression — diff `plans` across BENCH_r*.json.
    from hr_moderndatapipeline_spark.plans.fingerprint import plan_fingerprint

    plans: dict[str, str] = {}
    for name in bench_set:
        if name in errors:
            continue
        try:
            plans[name] = plan_fingerprint(all_queries[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — fingerprints must never kill the bench
            plans[name] = f"ERROR: {type(e).__name__}"

    # Variant ledger (VERDICT r6 task #6): the driver-entry dedup
    # queries run the PORTABLE (oracle-verifiable) hash family; the
    # xxhash64 variants stay the raw-speed scale-path defaults. Time
    # the xxhash twins on the identical re-crawl input once per run so
    # the verification premium stays measured instead of assumed.
    variants: dict[str, float] = {}
    if not core_only:
        try:
            from hr_moderndatapipeline_spark.operators.dedup import (
                minhash_dedup_pairs,
                simhash_near_pairs,
            )
            from hr_moderndatapipeline_spark.sources.readers import load_table

            docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            recrawl = docs.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
            )
            for vname, build in (
                (
                    "minhash_dedup_pairs_xxhash",
                    lambda: minhash_dedup_pairs(recrawl, "doc_id", "text", shingle_n=3),
                ),
                (
                    "simhash_near_pairs_xxhash",
                    lambda: simhash_near_pairs(recrawl, "doc_id", "text", max_hamming=3),
                ),
            ):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                variants[vname] = round(time.time() - t0, 3)
                spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001 — the ledger must never kill the bench
            variants["ERROR"] = 0.0
            print(f"variant ledger failed: {e}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    load_end = round(os.getloadavg()[0], 1)

    # Full record → committed side file; compact line → stdout. The
    # driver's tail capture is 2,000 bytes, so the stdout line carries
    # only the r1-anchor subset (BENCH_r06.json's 5.5 KB line parsed
    # as null — never again).
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "plans": plans,
        "variants": variants,
        "sf": sf_val,
        "set": "core45" if core_only else "full",
        "n_queries": len(bench_set),
        "loadavg_start": load_start,
        "loadavg_end": load_end,
    }
    if errors:
        detail["errors"] = errors
    detail_name = f"BENCH_DETAIL_r{_next_round():02d}.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as e:
        print(f"detail write failed: {e}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "set": detail["set"],
        "n_queries": len(bench_set),
        "n_errors": len(errors),
        "detail": detail_name,
        "queries": {n: timings[n] for n in ANCHOR_QUERIES if n in timings},
        "loadavg_start": load_start,
        "loadavg_end": load_end,
    }
    line = json.dumps(out)
    if len(line) > 1800:  # hard guard: never exceed the tail window
        out.pop("queries", None)
        line = json.dumps(out)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
