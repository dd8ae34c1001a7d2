"""Whole-surface physical-plan antipattern sweep.

test_plan_quality.py pins named plans; this audit walks EVERY
``queries()`` entry and rejects the three patterns that are always
scale bugs unless explicitly justified:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — O(n·m) joins;
  every non-equi join in the repo is supposed to be bucketized,
  banded, or blocked into an equi-join first.
- ``BatchEvalPython`` — row-at-a-time Python UDFs on a data path
  (the serialization tax the attrition_fact fix removed);
  Arrow-batched eval (``ArrowEvalPython`` / ``mapInPandas``) is the
  sanctioned Python boundary and stays allowed.
- a ``Window`` fed by ``Exchange SinglePartition`` — the global
  window moves its whole input relation through ONE task (VERDICT
  r7: exactly this shape shipped three times over relations that
  GROW with the data — all orders / all customers — while the old
  audit only swept joins). Allowed only over aggregates whose
  cardinality is bounded by the SCHEMA or a FIXED parameter
  (O(#days)/O(#digits)/O(vocab)/O(#bins)), never by the row count;
  scaling relations must route through the range-partitioned-rank
  pattern (``assign_stable_ids``).

A query that legitimately needs an exception must be added to the
allowlist WITH a reason, so every future exception is a reviewed
decision, not an accident."""

from __future__ import annotations

import re

import pytest

from hr_moderndatapipeline_spark.queries import queries
from tests.test_plan_quality import plan_of, simple_plan_of

# name -> reason. Every entry here is a reviewed BuildRight broadcast
# of a provably tiny side (k rows / 1 row), where the "nested loop" IS
# the intended single-pass scan — not an accidental O(n·m) join.
NESTED_LOOP_ALLOWED: dict[str, str] = {
    "ann_bruteforce_topk": "k query vectors broadcast against the corpus; "
    "O(n*k) scoring is the brute-force baseline by definition",
    "hard_negative_mining": "same shape as ann_bruteforce_topk (it IS "
    "ann_bruteforce with a map-side label filter): fixed query batch "
    "broadcast against one corpus scan",
    "centroid_classify": "k centroids broadcast against the corpus; "
    "O(n*k) assignment is the operator",
    "tfidf_top_terms": "1-row corpus doc-count broadcast into the scorer",
    "bm25_search": "1-row (N, total-tokens) aggregate broadcast into the "
    "scorer — the avgdl/idf constants, same class as tfidf_top_terms",
    "bm25_multi_search": "the same 1-row totals broadcast as bm25_search "
    "(batched face, shared corpus pass)",
    "bm25_index_probe": "the same 1-row stats broadcast as bm25_search, "
    "crossed into the PRUNED postings (index/probe face)",
    "hybrid_rrf_multi_search": "bm25's 1-row totals broadcast + "
    "ann_bruteforce's 3-query-vector broadcast (both reviewed classes)",
    "hybrid_rrf_search": "bm25_rank's 1-row (N, total-tokens) broadcast "
    "(the bm25_search entry) inside the lexical arm",
    "embedding_cohort_drift": "10-row label-centroid table × 1-row global "
    "centroid cross join — both sides bounded aggregates "
    "(the tfidf_top_terms class)",
    "embedding_drift_merged": "the same bounded centroid × global cross "
    "join as embedding_cohort_drift (merged-state face)",
    "rater_agreement_kappa": "1-row totals × 1-row pe_num marginal-product "
    "aggregate cross join — both sides single-row by construction "
    "(the tfidf_top_terms class)",
    "monthly_order_spine": "recursive year spine (≈7 rows) crossed with a "
    "12-row literal month dim — bounded by the schema's date span",
    "conversion_survival_curve": "1-row corpus-horizon aggregate broadcast "
    "into the subject builder (the censoring cutoff)",
    "signup_conversion_survival": "same 1-row horizon broadcast as "
    "conversion_survival_curve (grouped face)",
    "conversion_logrank": "same 1-row horizon broadcast as "
    "conversion_survival_curve (log-rank face, identical subjects)",
    "conversion_hazard_curve": "same 1-row horizon broadcast as "
    "conversion_survival_curve (Nelson–Aalen face, identical subjects)",
    "ann_recall_eval": "composes the ann_bruteforce_topk and ann_lsh/"
    "ann_ivf legs verbatim, inheriting their reviewed bounded crosses "
    "(fixed query batch broadcast against one corpus scan; 16-centroid "
    "cell scoring); the eval's own joins are equi-joins on (q_id, c_id) "
    "over the k-row result lists",
    "event_type_pagerank": "r12: the per-iteration dangling-mass scalar is "
    "a 1-row aggregate broadcast-crossed into the rank update (one per "
    "power-iteration step) — the tfidf_top_terms 1-row-totals class; it "
    "replaced a blocking driver .first() per step",
}
PYTHON_ROW_EVAL_ALLOWED: dict[str, str] = {}

# name -> reason. Every entry is a reviewed global window over an
# aggregate whose row count is bounded by the SCHEMA or a FIXED
# operator parameter — NOT by the data volume. Nothing here may feed
# a relation that grows with the input (orders, customers, docs…):
# that class must use assign_stable_ids' range-partitioned rank
# (see price_decile_stats / customer_spend_percentile /
# customer_revenue_gini, de-globalized in r8).
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "benford_price_digits": "window over the 9-row leading-digit aggregate",
    "bigram_collocations": "corpus total carried over the O(vocab) unigram "
    "aggregate; the rank itself is TakeOrderedAndProject",
    "bigram_lm_score": "unigram-total window over the O(vocab) aggregate "
    "(micro-nat quantization of p(w))",
    "calibration_ece": "ECE-total window over the ≤10-row probability-bin "
    "aggregate (the spend_decile_woe class)",
    "cuped_experiment_readout": "pooled-moments window over the 2-row "
    "per-variant aggregate",
    "curation_funnel": "ppm-share window over the O(#reasons) aggregate "
    "(reason set is fixed by the rule list)",
    "daily_order_anomalies": "mean/σ window over the O(#days) daily "
    "aggregate — time span, not row count",
    "hybrid_rrf_search": "rank windows over the two n=50 retrieval lists "
    "ALREADY selected by upstream TakeOrderedAndProject limits "
    "(the weighted_order_sample class)",
    "spend_decile_woe": "pos/neg-totals window over the 10-row decile "
    "aggregate (the quality_calibration_curve class)",
    "dictionary_encode_digest": "frequency-rank window over the O(vocab) "
    "aggregate in build_vocab",
    "domain_mix_weights": "share window over the O(#domains) aggregate",
    "dsir_importance_weights": "log-ratio window over the fixed 4096-bucket "
    "hashed-unigram aggregate",
    "order_priority_ate": "ATE fold window over the 5-row per-stratum "
    "aggregate (the spend_decile_woe class)",
    "price_drift_by_era": "histogram L1 over the fixed 64-bin aggregate",
    "price_psi_by_era": "PSI terms over the fixed 64-bin aggregate "
    "(the price_drift_by_era class)",
    "quality_gate_pr_curve": "cumulative tp/fp windows over the ≤11-row "
    "score aggregate (score range fixed by the rule list — the "
    "spend_decile_woe class)",
    "purchase_uplift_qini": "cumulative window over the 10-row decile "
    "aggregate (the quality_calibration_curve class)",
    "segment_fairness_audit": "parity/EO gap windows over the 5-row "
    "per-segment confusion aggregate (the spend_decile_woe class)",
    "segment_priority_chisq": "expected-count window over the "
    "O(segments × priorities) contingency aggregate",
    "weekday_order_profile": "share window over the 7-row weekday aggregate",
    "weighted_order_sample": "rank window over the n=200 rows ALREADY "
    "selected by the upstream TakeOrderedAndProject limit",
}

_TREE_PREFIX = re.compile(r"^[\s:+\-*]*(\(\d+\)\s*)?")
_WINDOW_NODE = re.compile(r"(Window|WindowGroupLimit)\b")
_PASSTHROUGH = re.compile(r"(Sort|Project|WindowGroupLimit|Window)\b")


def has_singlepartition_window(simple_plan: str) -> bool:
    """True iff a Window node's child chain (through Sort/Project)
    reaches an ``Exchange SinglePartition`` — the one-task global
    window shape. Works on the "simple" explain string, where
    exchange arguments are inline in the tree."""
    lines = [_TREE_PREFIX.sub("", l) for l in simple_plan.splitlines()]
    for i, line in enumerate(lines):
        if _WINDOW_NODE.match(line):
            for j in range(i + 1, min(i + 5, len(lines))):
                nxt = lines[j]
                if nxt.startswith("Exchange SinglePartition"):
                    return True
                if _PASSTHROUGH.match(nxt):
                    continue
                break
    return False


_QUERIES = sorted(queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_no_plan_antipatterns(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    plan = plan_of(df)
    if name not in NESTED_LOOP_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    if name not in PYTHON_ROW_EVAL_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in GLOBAL_WINDOW_ALLOWED:
        assert not has_singlepartition_window(simple_plan_of(df)), (
            f"{name}: Window fed by Exchange SinglePartition — a one-task "
            "global window; use assign_stable_ids' range-partitioned rank, "
            "or allowlist with a bounded-aggregate reason"
        )
