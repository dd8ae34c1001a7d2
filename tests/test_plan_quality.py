"""Physical-plan quality gates (SURVEY.md §4, BASELINE 100 TB
posture): these assertions pin the *plan*, not the result — a
regression that silently drops predicate pushdown, column pruning,
or a broadcast would pass every value test and still be 100× slower
at scale."""

from __future__ import annotations

from hr_moderndatapipeline_spark.queries import core
from hr_moderndatapipeline_spark.queries import dataops


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan_of(df) -> str:
    """The "simple" explain string — unlike formatted mode, exchange
    arguments (``Exchange SinglePartition`` vs hashpartitioning) are
    inline in the tree, which the global-window audit needs."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_pricing_summary_pushes_filter_and_prunes(spark, sf_dir):
    plan = plan_of(core.q_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 needed columns reach the scan — not the 16-column table
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_broadcast_join_on_dimension(spark, sf_dir):
    plan = plan_of(core.q_attrition_by_segment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must not shuffle for the join


def test_snowflake_joins_all_broadcast(spark, sf_dir):
    plan = plan_of(core.q_supplier_by_region(spark, sf_dir))
    # two broadcast joins in the tree (each appears twice in
    # formatted output: tree + detail section)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = plan_of(core.q_top10_customers_by_revenue(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no full global sort for ORDER BY+LIMIT


def test_scalar_kit_stays_in_codegen(spark, sf_dir):
    plan = plan_of(core.q_lineitem_scalar_kit(spark, sf_dir))
    assert "codegen id" in plan  # whole-stage codegen spans present
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shipping_priority_plan(spark, sf_dir):
    """Q3 shape: the filtered customer dim must broadcast, the date
    filters must reach the scans, and the global top-10 must plan as
    TakeOrderedAndProject (no full sort of the aggregate)."""
    plan = plan_of(core.q_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan


def test_local_supplier_volume_broadcasts_small_dims(spark, sf_dir):
    """Q5 shape: nation and region must broadcast; the region filter
    must reach its scan. Fact-fact joins may shuffle — that's their
    honest cost — but never the small dims."""
    plan = plan_of(core.q_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_promo_share_single_agg_pass(spark, sf_dir):
    """Q14 shape: part dim broadcast; both conditional aggregates fold
    into ONE aggregation pass (one pair of HashAggregates), not a
    self-join of two aggregations."""
    plan = plan_of(core.q_promo_revenue_share(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_doc_chunks_stays_jvm_side(spark, sf_dir):
    plan = plan_of(dataops.q_doc_chunks(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # explode, map-side


def test_stratified_sample_is_pure_pushable_filter(spark, sf_dir):
    """Data mixing must stay a scan-side filter: no shuffle, no
    Python, no join."""
    plan = plan_of(dataops.q_stratified_sample_mix(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_packing_shuffles_only_on_shard_key(spark, sf_dir):
    plan = plan_of(dataops.q_token_packing(spark, sf_dir))
    # exactly one exchange: hashpartitioning on the shard key for the window
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan  # never a global window


def test_ann_bruteforce_no_shuffle_of_corpus_scoring(spark, sf_dir):
    """Queries broadcast; the only exchanges are the rebalance
    round-robin and the tiny per-query top-k window."""
    plan = plan_of(dataops.q_ann_bruteforce_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_contamination_broadcasts_eval_grams(spark, sf_dir):
    """The eval-set gram table must broadcast: the corpus is scanned
    once map-side with no corpus-sized shuffle of gram strings before
    the per-doc count aggregate."""
    plan = plan_of(dataops.q_contamination_overlap(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_vocab_top_terms_take_ordered(spark, sf_dir):
    plan = plan_of(dataops.q_vocab_top_terms(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_simhash_stays_jvm_side(spark, sf_dir):
    plan = plan_of(dataops.q_simhash_near_pairs(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_interval_join_never_nested_loop(spark, sf_dir):
    """The bucketized interval join must plan as a hash/merge
    EQUI-join on (user_id, bucket) — a range-only join would fall
    back to BroadcastNestedLoopJoin, O(points x intervals)."""
    plan = plan_of(core.q_error_window_clicks(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_curation_single_shuffle(spark, sf_dir):
    """The composed curation pass (dedup survivors + quality + lang
    filter) must stay ONE hash partition on text: per-row signals are
    computed inline, never joined back."""
    plan = plan_of(dataops.q_corpus_curation(spark, sf_dir))
    assert plan.count("+- Exchange") == 1
    assert "Join" not in plan


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """The two correlated scalar subqueries must rewrite to
    aggregate+join branches — no per-row subquery execution node
    survives in the physical plan."""
    plan = plan_of(core.q_orders_above_customer_avg(spark, sf_dir))
    assert "Subquery" not in plan
    assert "Join" in plan and "HashAggregate" in plan


def test_edit_distance_pairs_band_blocked_and_recall_safe(spark):
    """The Levenshtein self-join must be blocked on (block, length
    band, salt) — the equi-join keys in the plan include the band —
    and the banding must lose NO pairs vs the brute-force block join
    (edit distance ≤ d bounds length diff ≤ d)."""
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark.operators.dedup import edit_distance_pairs

    rows = [
        # one block, lengths spread across many bands
        (i, "blk", "x" * (1 + (i * 7) % 40) + ("y" if i % 3 == 0 else ""))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id: long, src: string, txt: string")

    out = edit_distance_pairs(df, "id", "txt", "src", max_dist=4)
    plan = plan_of(out)
    assert "_band" in plan  # band key participates in the equi-join
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    got = {(r.id_a, r.id_b, r.edit_dist) for r in out.collect()}
    a = df.toDF("id_a", "src", "txt_a")
    b = df.toDF("id_b", "src", "txt_b")
    brute = (
        a.join(b, "src")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("edit_dist") <= 4)
    )
    want = {(r.id_a, r.id_b, r.edit_dist) for r in brute.collect()}
    assert got == want and len(want) > 0

    # candidate-generation gate: the banded join must enumerate far
    # fewer pairs than the full within-block cross (60*59/2 = 1770);
    # with 40-wide lengths and width-5 bands, ≲3/8 of pairs survive.
    base = df.withColumn("_band", F.floor(F.length("txt") / 5))
    aa = base.toDF("id_a", "src", "txt_a", "_band")
    bb = base.toDF("id_b", "src", "txt_b", "_band_b")
    cands = (
        aa.join(
            bb.withColumn(
                "_band",
                F.explode(
                    F.array(F.col("_band_b") - 1, F.col("_band_b"), F.col("_band_b") + 1)
                ),
            ),
            ["src", "_band"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .count()
    )
    assert cands < 1770 * 0.5


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Grouped top-k must get the WindowGroupLimit pushdown: each
    task keeps only k rows per group BEFORE the shuffle, so the
    exchange carries O(groups*k), not the full table."""
    plan = plan_of(core.q_top3_orders_per_segment(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_salted_join_parity_and_spread(spark):
    """Salted join returns exactly the plain join's rows, and the
    physical join condition includes the salt key (so one hot key
    hashes across n_salts partitions instead of one)."""
    from pyspark.sql import functions as F

    from hr_moderndatapipeline_spark.operators.relational import salted_join

    # extreme skew: 9 of 10 left rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(9)] + [(2, 99)], "k int, lv int"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, rv string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.lv, r.rv)
            for r in salted_join(left, right, ["k"], n_salts=4, how=how).collect()
        )
        want = sorted(
            (r.k, r.lv, r.rv) for r in left.join(right, "k", how).collect()
        )
        assert got == want
    plan = plan_of(salted_join(left, right, ["k"], n_salts=4))
    assert "_salt" in plan  # the join key set physically includes the salt


def test_pit_join_broadcasts_features_spine_never_shuffles(spark, sf_dir):
    """Point-in-time enrichment: every feature table resolves via
    BroadcastHashJoin — the (large) spine side must not sort-merge
    for any of the feature joins."""
    from hr_moderndatapipeline_spark.queries import cdc_queries

    plan = plan_of(cdc_queries.q_pit_order_features(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # one per feature table
    assert "SortMergeJoin" not in plan


def test_leakage_split_broadcasts_clusters(spark, sf_dir):
    """The split assignment join must broadcast the (bounded) cluster
    map — the corpus side never shuffles for it. The near-dup pair
    detection upstream may shuffle; the gate is on the final
    assignment join specifically."""
    from hr_moderndatapipeline_spark.operators.sampling import leakage_safe_split
    from hr_moderndatapipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "member_id long, cluster_id long"
    )
    plan = plan_of(leakage_safe_split(docs, "doc_id", clusters))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_attrition_fact_no_python_udf(spark, sf_dir):
    """The attrition fact path must stay whole-stage-codegen column
    math (operators/facts.py feature_cols) — the r4 verdict flagged
    7 row-at-a-time Python UDFs here as the one remaining 100x-scale
    serialization tax. U1's SQL UDF surface stays registered for
    parity (test_cdc_dq.test_feature_udfs_match_columns) but must
    never appear in this plan."""
    from hr_moderndatapipeline_spark.queries import cdc_queries

    plan = plan_of(cdc_queries.q_attrition_fact(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_topk_uses_window_group_limit(spark, sf_dir):
    """Per-source top-k must plan as a WindowGroupLimit (k rows kept
    per partition pre-shuffle), not a full per-source sort."""
    plan = plan_of(dataops.q_quality_topk_per_source(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_corpus_freq_quality_stays_jvm_side(spark, sf_dir):
    """The unigram-LM frequency scorer is explode + two hash
    aggregations — all codegen, no Python, no broadcast of the
    corpus side."""
    plan = plan_of(dataops.q_corpus_freq_quality(spark, sf_dir))
    assert "HashAggregate" in plan  # map-side partials for both aggs
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_min_cost_supplier_single_lineitem_scan(spark, sf_dir):
    """The Q2 shape is written as window-over-CTE precisely so the
    fact table is scanned ONCE; the correlated-subquery form
    decorrelates to a second full scan + aggregate (measured: 2
    scans, 7 exchanges). Pin the single scan."""
    import re

    from hr_moderndatapipeline_spark.queries import tpch_extra

    plan = plan_of(tpch_extra.q_min_cost_supplier(spark, sf_dir))
    # formatted mode lists each scan operator once with its Location
    scans = re.findall(r"Location:[^\n]*lineitem", plan)
    assert len(scans) == 1, plan


def test_nation_trade_volume_fact_never_shuffled_for_joins(spark, sf_dir):
    """Q7 shape: all four dimension joins must broadcast; the only
    exchange below the aggregate is lineitem⋈orders traffic."""
    from hr_moderndatapipeline_spark.queries import tpch_extra

    plan = plan_of(tpch_extra.q_nation_trade_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_variant_extraction_stays_jvm_side(spark, sf_dir):
    """parse_json/variant_get are catalyst expressions, not UDFs —
    the payload never crosses into Python."""
    from hr_moderndatapipeline_spark.queries import core as _core

    plan = plan_of(_core.q_event_props_variant(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmv_rank_uses_window_group_limit(spark, sf_dir):
    """The KMV sketch's per-group k-smallest must plan as a
    WindowGroupLimit (each map partition forwards ≤ k rows per
    group), and the whole sketch stays JVM-side."""
    from hr_moderndatapipeline_spark.queries import core

    plan = plan_of(core.q_kmv_distinct_users(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_forecast_revenue_filters_reach_scan(spark, sf_dir):
    """Q6 is the pushdown canary: the date/discount/quantity
    predicates must appear as PushedFilters on the parquet scan, and
    the plan must contain no join."""
    from hr_moderndatapipeline_spark.queries import tpch_extra

    plan = plan_of(tpch_extra.q_forecast_revenue_change(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    assert "Join" not in plan


def test_returned_item_topk_avoids_full_sort(spark, sf_dir):
    """Q10's ORDER BY + LIMIT must plan as TakeOrderedAndProject
    over the aggregated rows, not a global Sort."""
    from hr_moderndatapipeline_spark.queries import tpch_extra

    plan = plan_of(tpch_extra.q_returned_item_customers(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_join_strategy_hints_respected(spark, sf_dir):
    """The three join-strategy hints must reach the physical plan:
    broadcast() → BroadcastHashJoin, merge → SortMergeJoin,
    shuffle_hash → ShuffledHashJoin (the knobs a 100 TB tuning pass
    actually turns when AQE's default pick is wrong)."""
    from pyspark.sql import functions as FF

    from hr_moderndatapipeline_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    jb = o.join(FF.broadcast(c), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in jb._jdf.queryExecution().executedPlan().toString()
    jm = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in jm._jdf.queryExecution().executedPlan().toString()
    jh = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in jh._jdf.queryExecution().executedPlan().toString()


def test_deglobalized_rank_queries_have_no_singlepartition_window(spark, sf_dir):
    """VERDICT r7 regression pin: the three rank/percentile/decile
    queries used to funnel a DATA-SCALED relation (all orders / all
    customers) through `ntile/percent_rank OVER (ORDER BY …)` — an
    Exchange SinglePartition + one-task sort. Re-planned in r8 onto
    assign_stable_ids' range-partitioned rank; this pin keeps them
    off the global-window path for good."""
    from tests.test_plan_audit_all import has_singlepartition_window

    for fn in (
        core.q_price_decile_stats,
        core.q_customer_spend_percentile,
        core.q_customer_revenue_gini,
    ):
        sp = simple_plan_of(fn(spark, sf_dir))
        assert not has_singlepartition_window(sp), fn.__name__


def test_singlepartition_window_detector_is_redable(spark):
    """The audit helper must actually fire on the shape it polices —
    a Window.partitionBy() (empty) global rank plans as Sort over
    Exchange SinglePartition and must be detected."""
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    from tests.test_plan_audit_all import has_singlepartition_window

    df = spark.range(100).withColumn(
        "r", FF.row_number().over(Window.partitionBy().orderBy("id"))
    )
    assert has_singlepartition_window(simple_plan_of(df))
