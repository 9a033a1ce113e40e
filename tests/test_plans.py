"""Physical-plan regression tests: the optimizations SURVEY §4 promises
(pushdown, pruning, broadcast, partial aggregation, codegen) asserted on
the executed/analyzed plans of the declared queries — so a refactor that
silently trades one of them away fails CI, not the 100 TB run.
"""

from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.plans.queries import QUERIES
from league_of_legends_data_pipeline_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown_and_column_pruning(spark):
    (lineitem,) = [load_tables(spark, SF_DIR, ["lineitem"])["lineitem"]]
    q = lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the parquet scan...
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # ...and the scan schema is pruned to exactly the two referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity" in plan


def test_q04_dimension_join_broadcasts(spark):
    plan = _executed(QUERIES["q04_broadcast_join_topk"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dim join must not shuffle the fact


def test_q01_aggregation_is_partial_then_final(spark):
    plan = _executed(QUERIES["q01_pricing_summary"].spark(spark, SF_DIR))
    # map-side combine: a partial HashAggregate below the exchange and a
    # final one above it
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial_count" in plan


def test_q01_stays_in_wholestage_codegen(spark):
    df = QUERIES["q01_pricing_summary"].spark(spark, SF_DIR)
    # collect() (not a cloned write plan) so AQE finalizes THIS df's plan —
    # codegen spans only appear on the final adaptive plan
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # WholeStageCodegen span marker in the simple string


def test_asof_join_single_exchange_per_side(spark):
    # union-sort as-of join: ONE exchange for the unioned stream (plus the
    # final sort's), never a per-key collect or nested loop
    plan = _executed(QUERIES["q22_asof_join"].spark(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_not_nested_loop(spark):
    plan = _executed(QUERIES["q23_range_join"].spark(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q53_repetition_filter_is_map_only(spark):
    # the Gopher repetition filter must stay a pure scan->project->filter:
    # no exchange anywhere except the final presentation orderBy's sort
    plan = _executed(QUERIES["q53_repetition_filter"].spark(spark, SF_DIR))
    # exactly the one range-partitioning exchange introduced by orderBy
    assert plan.count("Exchange") <= 1
    assert "rangepartitioning" in plan.lower()


def test_q52_sketch_and_exact_share_one_aggregate_pass(spark):
    # HLL sketch + exact distinct in one grouped aggregation: the plan may
    # expand for count(DISTINCT) but must not scan the source twice
    plan = _executed(QUERIES["q52_sketch_distinct"].spark(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1


def test_q59_pushdown_broadcast_and_topk(spark):
    plan = _executed(QUERIES["q59_shipping_priority"].spark(spark, SF_DIR))
    # both date predicates reach their parquet scans
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    # the filtered customer dim broadcasts; top-10 never materializes a
    # global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q60_scd2_reuses_one_window_exchange(spark):
    # lag (change detect) and lead (interval close) both partition by
    # user_id: Catalyst must plan ONE hash exchange for both window passes
    # (plus the presentation orderBy's range exchange)
    plan = _executed(QUERIES["q60_scd2_dimension"].spark(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 2


def test_q61_unpivot_is_one_scan(spark):
    # Expand emits all four (metric, val) rows per input row in ONE pass;
    # the UNION ALL formulation would scan lineitem four times
    plan = _executed(QUERIES["q61_unpivot_metrics"].spark(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan
    # 4x row expansion collapses map-side before the 4-group shuffle
    assert "partial_count" in plan or "partial_sum" in plan


def test_q62_merge_is_anti_join_not_full_outer(spark):
    plan = _executed(QUERIES["q62_merge_upsert"].spark(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "FullOuter" not in plan


def test_q64_having_filters_before_join(spark):
    # the HAVING must run on the aggregate output BEFORE the join-back.
    # executedPlan prints top-down (root first), so the aggregate feeding
    # the join appears AFTER the join node in the string
    plan = _executed(QUERIES["q64_large_order_customers"].spark(spark, SF_DIR))
    agg_pos = plan.find("HashAggregate")
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                   plan.find("ShuffledHashJoin"))
    assert -1 < join_pos < agg_pos
    # and the post-agg filter exists (HAVING not absorbed into the join)
    assert "(total_qty" in plan
    assert "TakeOrderedAndProject" in plan


def test_q65_exists_decorrelates_to_semi_and_anti(spark):
    plan = _executed(QUERIES["q65_correlated_exists"].spark(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q10_rank_filter_uses_window_group_limit(spark):
    # rank()<=1 over a window must trigger WindowGroupLimit: each input
    # partition keeps only its per-key top rows BEFORE the window shuffle,
    # so the exchange moves O(keys) rows, not the whole fact table
    plan = _executed(QUERIES["q10_latest_order_per_customer"].spark(spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_q71_fk_check_is_anti_join(spark):
    plan = _executed(QUERIES["q71_data_quality_audit"].spark(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q59_fact_join_degrades_to_sort_merge_without_broadcast(spark):
    # at 100 TB no side of the lineitem-orders join fits a broadcast; with
    # auto-broadcast off the plan must fall back to a shuffled sort-merge
    # join on the order key — never a nested loop
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(QUERIES["q59_shipping_priority"].spark(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q87_double_correlation_decorrelates(spark):
    # TPC-H Q21 shape: EXISTS -> semi, NOT EXISTS -> anti, never a
    # per-row subquery or nested loop
    plan = _executed(QUERIES["q87_waiting_suppliers"].spark(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q91_chunking_is_map_only(spark):
    # chunking must not shuffle: generator + array slice in-row (the
    # declared query's ORDER BY is presentation; the operator itself
    # introduces no exchange)
    from league_of_legends_data_pipeline_spark.operators.text import chunk_documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _executed(chunk_documents(docs, "doc_id", "text"))
    assert "Exchange" not in plan


def test_q93_scalar_subquery_with_joins_decorrelates(spark):
    # TPC-H Q2 shape: the correlated MIN subquery (which itself joins the
    # dim chain) must become an aggregate joined on the correlation key —
    # never a per-row nested loop
    plan = _executed(QUERIES["q93_min_cost_supplier"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # dim chain broadcasts


def test_q96_correlated_avg_decorrelates_to_aggregate_join(spark):
    # TPC-H Q17 shape: per-part avg joined back, fact scanned exactly twice
    plan = _executed(QUERIES["q96_small_quantity_revenue"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.split("== Initial Plan ==")[0].count("Scan parquet") <= 3


def test_q97_nested_in_becomes_semi_joins(spark):
    # TPC-H Q20 shape: both IN levels decorrelate to semi joins
    plan = _executed(QUERIES["q97_bulk_part_suppliers"].spark(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- cross-SF plan-shape snapshots (round-5 verdict item 8) ----------------
#
# The five most expensive declared queries must keep the SAME physical
# shape at sf0.001 and sf0.1 (a 100x data ratio): a join strategy that
# flips with stats, or an exchange that appears only at scale, is exactly
# the AQE/threshold regression that bench noise would otherwise hide.
# Join-strategy counts are pinned as goldens so a broadcast silently
# degrading to a shuffle join fails here, not in the 100 TB run;
# exchange counts are asserted EQUAL across SFs but not pinned absolute
# (they shift by one with the session's shuffle-partition config).
# (BroadcastNestedLoopJoin entries are the documented scalar-broadcast
# crossJoins — 1-row/k-row frames, not data joins.)

PLAN_SHAPE_GOLDENS = {
    # r13: edges come from per-order collect_set + explode and are
    # checkpoint-truncated, so the self-join SMJs and the repeated
    # edge-subtree joins fell out of the executed plan
    "q133_supplier_pagerank": {"SortMergeJoin": 2, "BroadcastHashJoin": 5,
                               "BroadcastNestedLoopJoin": 3},
    "q82_lsh_recall": {"SortMergeJoin": 1, "BroadcastHashJoin": 3,
                       "BroadcastNestedLoopJoin": 1},
    "q101_semantic_dedup": {"SortMergeJoin": 2, "BroadcastHashJoin": 2,
                            "BroadcastNestedLoopJoin": 3},
    "q44_dedup_clusters": {"SortMergeJoin": 3},
    "q103_duplicated_spans": {},
    # round-8: the q147-q155 sketch/layout/pairs tier (round-7 verdict
    # item 4) — the containment plan especially, whose bands=num_hashes
    # recall default must stay a capped broadcast-banded join, and the
    # HLL/CMS sketches, whose probes must stay broadcasts
    "q147_hll_cardinality": {"BroadcastHashJoin": 2},
    "q148_cms_heavy_hitters": {"BroadcastHashJoin": 2},
    "q149_zorder_locality": {},
    "q150_edit_distance_pairs": {"BroadcastHashJoin": 1},
    "q151_session_transitions": {"BroadcastHashJoin": 1},
    "q152_tfidf_cosine_pairs": {"BroadcastHashJoin": 7,
                                "BroadcastNestedLoopJoin": 4},
    "q153_containment_pairs": {"BroadcastHashJoin": 3},
    "q154_incremental_agg_merge": {},
    "q155_image_decode": {},
    "q156_jpeg_decode": {},
    "q157_audio_features": {},
    "q158_video_metadata": {},
    "q159_lsh_bucket_stats": {},
    # 2 BNLJ = the scalar-broadcast crossJoins attaching the two KMV
    # sketch rows to the exact-dual row; the r13 one-pass rewrite
    # collapsed the union-distinct/intersect branches (1 BHJ + 3 BNLJ)
    # into a single per-hash side-flag aggregate
    "q160_kmv_corpus_overlap": {"BroadcastNestedLoopJoin": 2},
    # round-8 cleaning tier: q161-q164 are map-only projections plus one
    # aggregate/window — zero joins by design; q165's only joins are the
    # candidate broadcast semi-join and the 1-row n_candidates broadcast
    "q161_html_text_extraction": {},
    "q162_url_canonical_dedup": {},
    "q163_pii_scrub_report": {},
    "q164_paragraph_dedup": {},
    "q165_heavy_hitters": {"BroadcastHashJoin": 1,
                           "BroadcastNestedLoopJoin": 1},
    # round-8 late tier: tokenizer/LM/statistics + the winnow/ntile/
    # profile/maintenance/perceptual additions. BNLJ entries are the
    # scalar 1-row broadcasts (N totals, chi2, winner rows); q185's
    # 60/14 join counts are the 3 unrolled label-propagation rounds
    # re-planning the growing lineage (the pagerank pattern).
    "q166_bpe_train": {"BroadcastNestedLoopJoin": 6},
    "q167_bigram_lm_scores": {"BroadcastHashJoin": 3,
                              "BroadcastNestedLoopJoin": 1},
    "q168_phrase_search": {"BroadcastHashJoin": 3},
    "q169_ddsketch_quantiles": {"BroadcastHashJoin": 1,
                                "BroadcastNestedLoopJoin": 6},
    "q170_poisson_bootstrap": {"BroadcastNestedLoopJoin": 3},
    "q171_entropy_scores": {"BroadcastHashJoin": 1},
    "q172_winnow_fingerprint_pairs": {"BroadcastHashJoin": 5},
    # q173's final plan is {} since the scored frame localCheckpoints
    # before ranking (the LM-scoring joins live upstream of the
    # checkpoint; re-deriving them 3x for exact_ntile's actions was 3x
    # the query cost)
    "q173_perplexity_buckets": {},
    "q174_code_detection": {},
    # q175's BHJ is the pruned exact-NDV per-column union broadcast onto
    # the single non-NDV stats aggregate (r9: replaced the expand plan)
    "q175_column_profile": {"BroadcastHashJoin": 1},
    "q176_compaction_plan": {"BroadcastHashJoin": 1},
    "q177_benford_scan": {"BroadcastNestedLoopJoin": 3,
                          "BroadcastHashJoin": 2},
    "q178_wht_perceptual_pairs": {"BroadcastHashJoin": 3},
    "q179_pmi_collocations": {"BroadcastNestedLoopJoin": 1,
                              "BroadcastHashJoin": 2},
    "q180_negative_samples": {"BroadcastHashJoin": 1},
    "q181_audio_fingerprint_pairs": {"BroadcastHashJoin": 3},
    "q182_scene_cuts": {},
    "q183_zone_map_pruning": {"BroadcastHashJoin": 1,
                              "BroadcastNestedLoopJoin": 1},
    "q184_cohort_retention": {"BroadcastHashJoin": 2},
    "q185_label_propagation": {"SortMergeJoin": 14,
                               "BroadcastHashJoin": 60},
    # round-8 similarity/graph/quality/privacy tier. q187_triangle_count
    # is deliberately NOT pinned: its wedge self-join and closing
    # semi-join sides grow with the graph, so AQE correctly flips them
    # between broadcast (sf0.001) and sort-merge (sf0.1) — pinning would
    # freeze the wrong strategy at one of the scales.
    # 3 BHJ: the hash->dfc attach + the two hashed-array verify joins;
    # the shingle and prefix relations are localCheckpoint-truncated
    # (r13), so the freq/window subtree no longer repeats per join side
    "q186_prefix_filter_pairs": {"BroadcastHashJoin": 3},
    "q188_mad_outliers": {"BroadcastHashJoin": 3},
    "q189_encoding_quality": {},
    "q190_dsir_selection": {"BroadcastHashJoin": 1,
                            "BroadcastNestedLoopJoin": 1},
    "q191_k_anonymity": {},
    "q192_chi2_tokens": {"WindowGroupLimit": 2, "BroadcastHashJoin": 2,
                         "BroadcastNestedLoopJoin": 2},
    "q193_woe_iv": {"BroadcastNestedLoopJoin": 3},
    # q197's pinned shape is the FINAL join only: each HITS round is
    # localCheckpoint-truncated, so the executed plan tree cannot grow
    # with iterations by construction.
    "q194_sorted_neighborhood": {"BroadcastHashJoin": 3},
    "q195_ks_drift": {"BroadcastNestedLoopJoin": 1},
    "q196_kcenter_coreset": {},
    # 2 SMJ since the r13 single-compute rewrite: the final node-set
    # left-join restoring zero-scored nodes, plus the hub<->authority
    # attach — both over checkpoint-truncated K-row frames
    "q197_hits_scores": {"SortMergeJoin": 2},
    "q198_mutual_knn": {"SortMergeJoin": 1, "WindowGroupLimit": 4,
                        "BroadcastNestedLoopJoin": 2},
    "q199_quantile_normalize": {},
    "q200_padding_efficiency": {},
    "q201_ngram_novelty": {"BroadcastHashJoin": 1},
    "q202_burstiness": {},
    "q203_source_overlap_matrix": {"BroadcastNestedLoopJoin": 1,
                                   "WindowGroupLimit": 4},
    "q204_dataset_card": {"BroadcastNestedLoopJoin": 3},
    "q205_vocab_coverage": {},
    "q206_threshold_sweep": {},
    "q207_template_detection": {"BroadcastNestedLoopJoin": 1},
    "q208_embedding_health": {},
    "q210_grouping_sets": {},
    "q211_dynamic_pivot": {},
    "q212_partition_digest_diff": {},
    # r13 shared-assignment rewrite: ONE checkpointed centroid
    # assignment + probe ranking feed all three curve points, so the
    # repeated per-nprobe IVF subtrees (11 BNLJ / 23 WindowGroupLimit)
    # collapse to the exact slate's hit joins + one query-vec broadcast
    "q213_ivf_nprobe_curve": {"BroadcastNestedLoopJoin": 1,
                              "SortMergeJoin": 6, "WindowGroupLimit": 6},
    "q214_weighted_median": {},
    # r13: the ntile chain now rides an eager localCheckpoint of the
    # user frame, so the boundary-broadcast BNLJ sits below the
    # truncation and the executed final plan shows no join
    "q215_rfm_segments": {},
    "q216_cusum_changepoint": {"BroadcastNestedLoopJoin": 1},
    "q217_selfjoin_size_estimate": {"BroadcastNestedLoopJoin": 1,
                                    "BroadcastHashJoin": 1},
    "q218_robust_scaling": {"BroadcastHashJoin": 1},
    "q219_last_touch_attribution": {"BroadcastNestedLoopJoin": 1},
    # round-9 tier: q220's one BHJ is the 7-row exact-NDV broadcast onto
    # the approx profile; q221's is the collected-key set broadcast onto
    # the generated probe range (AQE would flip it to SMJ once the key
    # table outgrows the broadcast threshold — correct at 100 TB, stable
    # at both test SFs)
    "q220_column_profile_approx": {"BroadcastHashJoin": 1},
    "q221_id_probe": {"BroadcastHashJoin": 1},
    # q222's one BHJ is the rank-offset neighborhood probe (pair volume
    # fixed at N x 5 by construction); q223 is scan + tiny windows
    "q222_record_linkage": {"BroadcastHashJoin": 1},
    "q223_seasonal_anomaly": {},
    # q224: 2 spine semi-joins + the est/exact day join (all day-sized);
    # q225: one key-only join per FK edge, parents broadcast at test SF
    "q224_rolling_active_users": {"BroadcastHashJoin": 3},
    "q225_fk_integrity_audit": {"BroadcastHashJoin": 5},
    # q226: the recursive-CTE walk executes inside Spark's UnionLoop
    # operator, whose per-step frontier joins don't surface in the outer
    # plan's join census — the pin asserts exactly that (no unexpected
    # top-level join materializes around the recursion); q227 is two
    # aggregates and one dimension-sized window, joinless by design
    "q226_bfs_reachability": {},
    "q227_classifier_auc": {},
    # q228 is one partial-aggregated groupBy (struct min/max replaces the
    # per-group window sort — no join, no WindowGroupLimit); q229's BNLJ
    # is the 1-row basket-universe broadcast, the five BHJs are the
    # frequent-item semi-join prune + pair/count attach joins (AQE would
    # shift them to SMJ when the frequent-item table outgrows broadcast)
    "q228_ohlc_bars": {},
    "q229_association_rules": {"BroadcastNestedLoopJoin": 1,
                               "BroadcastHashJoin": 5},
    # q230: each peel round ends in a localCheckpoint, so only the final
    # degree aggregate surfaces — the pin asserts the plan stays
    # round-count-invariant (the q197 HITS convention)
    "q230_kcore_peel": {},
    # q231's SMJ is the 9-row-per-side full-outer shard rollup join
    # (full outer cannot broadcast); the assignment itself is a pure
    # projection. q232 is explode + two bounded-domain aggregates.
    "q231_rendezvous_sharding": {"SortMergeJoin": 1},
    "q232_feature_hashing_audit": {},
    # q233's one BHJ is the frontier semi-join back onto parts (the
    # frontier is skyline-sized); the dominance check itself is the
    # window sweep, never a quadratic join. q234 is one aggregate plus
    # a per-group noise projection.
    "q233_skyline_parts": {"BroadcastHashJoin": 1},
    "q234_binomial_noise_counts": {},
    # q235 collapses to session bounds then delta minutes before its
    # windows — no join anywhere; q236's BNLJ is the 1-row [lo, hi]
    # bound-table broadcast onto the scan
    "q235_concurrency_sweep": {},
    "q236_equiwidth_histogram": {"BroadcastNestedLoopJoin": 1},
    # q237 is map-side regexp feature extraction + one grouped agg;
    # q238's one BHJ is the day-keyed self-join of the days x types
    # panel (dimension-sized after the first aggregate); q239 collapses
    # to a 2-row arm table before its pivot — joinless
    "q237_readability_scores": {},
    "q238_metric_correlation_matrix": {"BroadcastHashJoin": 1},
    "q239_ab_test_zscore": {},
    # q240: every PPR iteration is localCheckpoint-truncated, so only
    # the final deg/is_seed attach joins surface (the q197 convention;
    # without truncation this plan measured 148 repeated joins);
    # q241's BHJs are the 7-row lag-dimension broadcast and the
    # day-panel shifted self-join
    "q240_personalized_pagerank": {"SortMergeJoin": 2},
    "q241_daily_autocorrelation": {"BroadcastHashJoin": 1,
                                   "BroadcastNestedLoopJoin": 1},
    # q242: one user-keyed journey aggregate + map-side regex — joinless
    "q242_sequence_pattern_funnel": {},
    # q243: score-bin aggregate + dimension-sized cumulative windows —
    # joinless; q244's BNLJ is the 1-row Gini-totals broadcast onto the
    # ranked customer table (the global_rank exchanges are hash, never
    # a single-partition sort)
    "q243_roc_curve": {},
    "q244_lorenz_gini": {"BroadcastNestedLoopJoin": 1},
    # q245: every Bellman-Ford round ends in a localCheckpoint, so only
    # the final min aggregate surfaces (the q197/q230/q240 convention —
    # the pin asserts the plan stays round-count-invariant)
    "q245_weighted_sssp": {},
    # q246: the corpus collapses to a localCheckpointed day panel, so the
    # surfaced joins are panel-sized only — 2 explicit broadcasts in
    # theil_sen_trend (pair join + slope join) and the 1-row d0 cross
    # join appearing in each of the operator's three lineage branches
    "q246_theil_sen_trend": {"BroadcastHashJoin": 2,
                             "BroadcastNestedLoopJoin": 3},
    # q247: join-free attribution — the only join is the 1-row
    # share-total broadcast onto the checkpointed channel aggregate
    "q247_position_attribution": {"BroadcastNestedLoopJoin": 1},
    # q248: the fold runs over a checkpointed panel; the one BHJ is the
    # per-group mu/sigma stats join (group-dimension-sized)
    "q248_ewma_control_chart": {"BroadcastHashJoin": 1},
    # q249: spans checkpoint truncates the corpus; the BNLJs are the
    # 1-row horizon/total broadcasts onto duration-dimension frames
    "q249_kaplan_meier": {"BroadcastNestedLoopJoin": 3},
    # q250/q251: 1-row scalar broadcasts (d0 date / pooled theta) onto
    # conditional-aggregate outputs — the corpus stage is one scan
    "q250_cuped_adjustment": {"BroadcastNestedLoopJoin": 1},
    "q251_diff_in_diff": {"BroadcastNestedLoopJoin": 1},
    # q252: panel-broadcast pair join + the 1-row S join onto the fused
    # ties/n aggregate; the checkpointed panel keeps the corpus out of
    # every branch
    "q252_mann_kendall": {"BroadcastHashJoin": 2},
    # q253: the orders x customer dim join is truncated behind the span
    # checkpoint; only the 1-row horizon broadcast surfaces
    "q253_logrank_test": {"BroadcastNestedLoopJoin": 1},
    # q254: user cells + 33-row replica DiD both checkpointed; the BNLJs
    # assemble the 1-row point/CI readout
    "q254_bootstrap_did_ci": {"BroadcastNestedLoopJoin": 2},
    # q255: 1-row d0 broadcast onto the user aggregate
    "q255_experiment_power": {"BroadcastNestedLoopJoin": 1},
    # q257: joinless — day groupBy + per-group fold; q258's one BHJ is
    # the weekday-dimension train-mean broadcast onto the test days
    "q257_holt_linear": {},
    "q258_forecast_backtest": {"BroadcastHashJoin": 1},
    # q259: checkpointed source-mass panel + 1-row broadcasts; the
    # corpus-total cross join appears in both lineage branches of the
    # 20-row shares frame (z + final select) plus the normalizer join
    "q259_temperature_mixture": {"BroadcastNestedLoopJoin": 3},
    # q260: joinless — one corpus aggregate to the checkpointed day
    # panel, then two same-spec single-partition windows (cumulative
    # counts + running max) that share ONE exchange over the
    # day-dimension panel
    "q260_msprt_always_valid": {},
    # q261: joinless — distinct-user shuffle + 1-row arm rollup
    "q261_srm_check": {},
    # q262: the BNLJs are the 1-row totals/mean/variance broadcasts onto
    # the checkpointed D-row day panel (totals appears in two lineage
    # branches: pseudo and the final readout)
    "q262_jackknife_ratio_metric": {"BroadcastNestedLoopJoin": 4},
    # q263: one corpus scan to per-arm trials; the BHJ is the 2-row
    # percentile-cut table broadcast back onto the trials
    "q263_winsorized_arm_means": {"BroadcastHashJoin": 1},
    # q264: target side + both side-dimension k-mean tables broadcast
    # (explicitly — Catalyst cannot size aggregates above the
    # checkpointed pair frame); argmax-per-src runs as WindowGroupLimit
    "q264_bitext_margin_mining": {"BroadcastHashJoin": 2,
                                  "WindowGroupLimit": 2},
    # q265: one corpus aggregate to the checkpointed value-domain
    # support panel; the BNLJ is the 1-row totals broadcast
    "q265_distribution_drift": {"BroadcastNestedLoopJoin": 1},
    # q266: one user-day corpus aggregate to the checkpointed 10-row
    # bin panel; the BNLJ is the 1-row (N, gapsum) broadcast
    "q266_calibration_ece": {"BroadcastNestedLoopJoin": 1},
    # q267/q268: joinless — one corpus aggregate to the (type, user) /
    # user-day panel, then panel-partitioned windows / a 7-row rollup
    "q267_spearman_rank_corr": {},
    "q268_cohens_kappa": {},
    # q269: edges / deg / oriented are eager-checkpointed (each is
    # consumed by several joins in one action — lazy checkpoints left
    # the compiled plan re-deriving them: 25 SMJ / 51 exchanges before
    # the rewrite, 3 / 7 after); the SMJs are the two deg attaches +
    # the wedge self-join, correctly NOT broadcast (node dimension is
    # unbounded at scale). q270 is deliberately unpinned: its
    # checkpointed-RDD size stats flip BHJ<->SMJ across SFs.
    "q269_clustering_coefficient": {"SortMergeJoin": 3},
    # q271: basket self-join + two n_ord attaches all broadcast at both
    # SFs (part dimension); per-anchor top-5 runs as WindowGroupLimit
    "q271_item_cf_cosine": {"BroadcastHashJoin": 3,
                            "WindowGroupLimit": 2},
    # q272: checkpointed day panel — pair join, cut range-join and the
    # n_days attach are panel-sized broadcasts; argmax per type is a
    # WindowGroupLimit
    "q272_pettitt_changepoint": {"BroadcastHashJoin": 3,
                                 "WindowGroupLimit": 2},
    # q273/q274/q275: one corpus/edge aggregate to a checkpointed
    # dimension panel; the BNLJ is the 1-row totals broadcast
    "q273_cramers_v": {"BroadcastNestedLoopJoin": 1},
    "q274_post_stratification": {"BroadcastNestedLoopJoin": 1},
    "q275_graph_modularity": {"BroadcastNestedLoopJoin": 1},
    # q276: fact-dim broadcast join to the segment rollup; the BNLJ is
    # the 1-row global-rate broadcast
    "q276_target_encoding": {"BroadcastNestedLoopJoin": 1,
                             "BroadcastHashJoin": 2},
    # q277: one corpus window pass to the checkpointed transition
    # panel; per-iteration joins are panel-sized broadcasts that end in
    # a checkpoint each, so only the final attach joins surface
    "q277_markov_stationary": {"BroadcastNestedLoopJoin": 1,
                               "BroadcastHashJoin": 1,
                               "SortMergeJoin": 1},
    # q278: joinless — one corpus aggregate to the checkpointed support
    # panel, cumulative windows over the panel only
    "q278_gini_split": {},
    # q279: the q265 support-panel shape; the BNLJ is the 1-row totals
    # broadcast
    "q279_cramer_von_mises": {"BroadcastNestedLoopJoin": 1},
    # q282: the fact-dim join is truncated behind the checkpointed
    # segment rollup; the BNLJ is the 1-row totals broadcast
    "q282_anova_f": {"BroadcastNestedLoopJoin": 1},
    # q283: forward-filled ECDF over the checkpointed (source, length)
    # support panel — never a range join; the SMJ is the panel-sized
    # grid pair join, the BHJs the totals attaches
    "q283_source_drift_matrix": {"SortMergeJoin": 1,
                                 "BroadcastHashJoin": 2},
    # round-10 tier. q284: every join broadcasts a type-dimension frame
    # (tr/caln/q/tst are <=5 rows each) onto split-filtered branches of
    # the checkpointed base — the count is branches x tiny frames, no
    # corpus-sided join anywhere
    "q284_conformal_interval": {"BroadcastHashJoin": 12},
    # q285: 3 attribute pipelines x (cells->margins joins + 1-row N
    # broadcasts); all cell-dimension-sized
    "q285_mutual_information": {"BroadcastNestedLoopJoin": 18,
                                "BroadcastHashJoin": 6},
    # q286: joinless — the GD iterations and the IPW readout are each
    # ONE aggregate over the checkpointed user panel (weights travel as
    # literals, the q128 convention)
    "q286_ipw_ate": {},
    # q287: bin-panel (<=20 rows) self-joins for the PAV minimax
    # enumeration; the BNLJs are range-condition bin joins
    "q287_isotonic_calibration": {"BroadcastHashJoin": 1,
                                  "BroadcastNestedLoopJoin": 2},
    # r13 driver-matvec rewrite, r14 Gram rewrite: the corpus-sized
    # Gram/cov pass is ONE fused nested-posexplode aggregate collected
    # inside the build (no self-join, no checkpoint — the one pass that
    # must scale is joinless too); the 64-double matvec rounds run on
    # the driver, so the final executed plan is a joinless 64-row
    # literal projection
    "q288_pca_power_iteration": {},
    # q289: one corpus aggregate to the 35-cell family; the BNLJ is the
    # 1-row k* broadcast back onto the checkpointed ranked panel
    "q289_fdr_bh": {"BroadcastNestedLoopJoin": 1},
    # q290: fit-frame broadcasts (5 rows) onto the checkpointed day
    # panel, one per IRLS stage
    "q290_huber_irls": {"BroadcastHashJoin": 3},
    # q291: the BNLJs are the 100-row checkpointed top panel's pair
    # join (pa < pb range condition) and the 1-row k broadcast
    "q291_rank_stability": {"BroadcastNestedLoopJoin": 2},
    # round-10 governance/retrieval tier. q292: pure map-side regex +
    # one segment rollup — joinless by design
    "q292_pii_scan_redaction": {},
    # q293: the BNLJ is the 1-row total-rows broadcast onto the
    # class-bucket rollup; the customer<-orders rollup rides the
    # groupBy exchange
    "q293_k_anonymity": {"BroadcastNestedLoopJoin": 1},
    # q294: the BNLJ is the 12-row slate pairwise self-join (inequality
    # condition); the BHJ is the slate<-sim_maps left join (r11: built
    # from CAND so a 1-doc slate still picks — r10 ADVICE)
    "q294_mmr_rerank": {"BroadcastHashJoin": 1,
                        "BroadcastNestedLoopJoin": 1},
    # q295 (r11 contingency-frame rewrite): joinless — tie term and
    # rank-sum ride ONE aggregate over the value-domain support frame;
    # the only windows are prefix sums on that bounded frame
    "q295_mann_whitney_u": {},
    # q297: prev/next axis attaches by score (dimension-sized BHJs);
    # the BNLJ is the 1-row counts broadcast
    "q297_nn_matching_att": {"BroadcastHashJoin": 2,
                             "BroadcastNestedLoopJoin": 1},
    # q298: centroid array travels as the single-row data-plane
    # broadcast (BNLJ), the q86 shape
    "q298_silhouette_score": {"BroadcastNestedLoopJoin": 1},
    # q299 (r11 contingency-frame rewrite): the BHJ is the value-domain
    # ranked-axis broadcast back onto the (cents x segment) contingency
    # frame; the BNLJ is the 1-row tie-term broadcast
    "q299_kruskal_wallis": {"BroadcastHashJoin": 1,
                            "BroadcastNestedLoopJoin": 1},
    # q300: vocabulary-sized degree/score joins broadcast at every SF
    # (vocab is bounded); 3 unrolled rounds x (deg + score) = 6 BHJs
    "q300_textrank_keywords": {"BroadcastHashJoin": 6},
    # q301: four unioned grouped-percentile aggregates — joinless
    "q301_quantile_treatment_effects": {},
    # q302: every Weiszfeld stage is ONE 1-row aggregate over the
    # checkpointed corpus with the iterate as a literal — joinless and
    # exchange-free (the driver holds only the 64-double iterate)
    "q302_geometric_median": {},
    # q303: duration-panel stages — the BNLJs are the 1-row horizon /
    # total broadcasts (q249's shape, additive so no fold)
    "q303_nelson_aalen": {"BroadcastNestedLoopJoin": 3},
    # q304: one map-combined 1-row moment reduce; no joins at all
    "q304_welch_ttest": {},
    # q305: the BNLJs are the 1-row totals + best-F1 broadcasts onto
    # the checkpointed bin panel
    "q305_average_precision": {"BroadcastNestedLoopJoin": 2},
    # q306 (r11 top-k rewrite + r13 posexplode slates): the BNLJs are
    # the derived-q' single-row broadcast onto the checkpointed score
    # frame and the query-vector re-attach to the exploded slate sums;
    # the BHJ is the 10-row original-slate flag join; slates come from
    # TakeOrderedAndProject, never a corpus rank window
    "q306_rocchio_prf": {"BroadcastHashJoin": 1,
                         "BroadcastNestedLoopJoin": 2},
    # q307: edge blocking + two customer-dimension attaches (broadcast
    # at these SFs; size-adaptive like q296's degree joins)
    "q307_fellegi_sunter": {"BroadcastHashJoin": 3},
    # q308 (r11 top-k rewrite): the BNLJ is the 1-row IDCG broadcast;
    # the BHJ is the 10-row grades attach; both rank prefixes come from
    # TakeOrderedAndProject, never a corpus rank window
    "q308_quantization_ndcg": {"BroadcastHashJoin": 1,
                               "BroadcastNestedLoopJoin": 1},
    # q309: 1-row brier/tot/terms broadcasts over the 10-bin panel
    "q309_brier_decomposition": {"BroadcastNestedLoopJoin": 4},
    # round-11 tier. q311: the BNLJ is the 30-row slate pairwise
    # self-join (inequality condition); the corpus scoring pass lives
    # upstream of the slate's localCheckpoint (the q173 convention)
    "q311_kendall_tau_rank_agreement": {"BroadcastNestedLoopJoin": 1},
    # q312: the BNLJ is the 1-row calendar-bounds broadcast onto the
    # event stream before the user rollup
    "q312_mcnemar_paired": {"BroadcastNestedLoopJoin": 1},
    # q313: 1-row trend-statistic broadcast back onto the 4-row tiers
    "q313_cochran_armitage": {"BroadcastNestedLoopJoin": 1},
    # q314: 1-row d0 / fit / sums broadcasts around the day panel (the
    # residual lag window rides the AGGREGATED panel — sp-win 0)
    "q314_durbin_watson": {"BroadcastNestedLoopJoin": 5},
    # q315: 7-row lag dimension (BNLJ) + the shifted-day equi-join (BHJ)
    # + 1-row moments broadcast; q_cum windows the 7-row acf frame
    "q315_ljung_box": {"BroadcastHashJoin": 1,
                       "BroadcastNestedLoopJoin": 2},
    # q316: d0/mid/pooled 1-row broadcasts around the 2-segment moments
    "q316_chow_break": {"BroadcastNestedLoopJoin": 5},
    # q317: 1-row token-totals broadcast onto the vocab counts (twice)
    "q317_js_divergence": {"BroadcastNestedLoopJoin": 2},
    # q318: four independent count-distinct rollups, unioned — joinless
    "q318_fd_audit": {},
    # q319: single query-row broadcast, map-only scoring, 1-row cells
    "q319_mcc_report": {"BroadcastNestedLoopJoin": 1},
    # q320: map-side raters + ONE 1-row reduce — joinless, 1 exchange
    "q320_fleiss_kappa": {},
    # q321: customer-dimension broadcast onto the user rollup
    "q321_mantel_haenszel": {"BroadcastHashJoin": 1},
    # q322: trial projection + 2-row arm rollup — joinless
    "q322_wilson_intervals": {},
    # q323: 1-row beta-prior broadcast back for the map-side shrink
    "q323_eb_shrinkage": {"BroadcastNestedLoopJoin": 1},
    # q324: joinless — day panel + ONE F.aggregate fold per group
    "q324_holt_winters_seasonal": {},
}

_SHAPE_OPS = (r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
              r"BroadcastNestedLoopJoin|CartesianProduct|WindowGroupLimit)\b")


def _plan_shape(spark, name: str, sf_dir: str) -> dict:
    import re
    from collections import Counter

    plan = QUERIES[name].spark(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    c = Counter(re.findall(_SHAPE_OPS, plan))
    c["Exchange"] = len(re.findall(
        r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)",
        plan))
    return {k: v for k, v in c.items() if v}


def test_expensive_query_plan_shapes_stable_across_sf(spark):
    for name, want in PLAN_SHAPE_GOLDENS.items():
        small = _plan_shape(spark, name, "/root/testdata/sf0.001")
        large = _plan_shape(spark, name, "/root/testdata/sf0.1")
        assert small == large, \
            f"{name} shape differs across SF: {small} vs {large}"
        joins = {k: v for k, v in small.items() if k != "Exchange"}
        assert joins == want, f"{name} join strategies drifted: {joins}"


# ---------------------------------------------------------------------------
# q256 streaming micro-batch snapshot (the one PLANS.md row that was a
# placeholder): pins the stateful plan the way batch plans are pinned.
# ---------------------------------------------------------------------------

def test_q256_streaming_plan_and_state_snapshot(spark):
    """Behavior/plan snapshot for the q256 stateful micro-batch, at both
    SFs (the cross-SF convention of the batch golden table):

    - exactly ONE input micro-batch (availableNow over one parquet file
      — the precondition for the each-key-drains-in-one-batch ordering
      contract the oracle recursion relies on);
    - state schema is the (z double, seeded long, last_day string)
      triple, one state row per event_type key;
    - the only exchange is the REQUIRED_BY_STATEFUL_OPERATOR hash
      partitioning on the grouping key (no extra shuffles);
    - no AdaptiveSparkPlan: AQE must not re-plan a stateful streaming
      query (partitioning is pinned by the state store);
    - the scan is pruned to exactly (ts, event_type).
    """
    import os

    from league_of_legends_data_pipeline_spark.plans.queries import _t
    from league_of_legends_data_pipeline_spark.streaming.stateful import (
        ewma_state,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        _t(spark, sf_dir, "events")  # pins nanosAsLong + UTC session tz
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        stream = (spark.readStream.schema(raw.schema)
                  .option("pathGlobFilter", "events.parquet")
                  .parquet(sf_dir))
        ts = F.col("ts")
        if dict(raw.dtypes)["ts"] == "bigint":
            ts = F.expr("timestamp_micros(ts div 1000)")
        stream = stream.select(
            "event_type",
            F.date_format(ts.cast("timestamp"), "yyyy-MM-dd").alias("day"))
        n_keys = raw.select("event_type").distinct().count()

        q = (ewma_state(stream, ["event_type"], "day", lam=0.2)
             .writeStream.format("memory")
             .queryName(f"q256_snap_{os.path.basename(sf_dir).replace('.', '_')}")
             .outputMode("append").trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(240), f"stream did not drain ({sf_dir})"
            plan = q._jsq.explainInternal(False)
        finally:
            q.stop()

        prog = [p for p in q.recentProgress if p]
        input_batches = [p for p in prog if p["numInputRows"] > 0]
        assert len(input_batches) == 1, \
            f"{sf_dir}: expected one input micro-batch, got {len(input_batches)}"
        (so,) = input_batches[0]["stateOperators"]
        assert so["operatorName"] == "applyInPandasWithState"
        assert so["numRowsTotal"] == n_keys, \
            f"{sf_dir}: state rows {so['numRowsTotal']} != {n_keys} keys"

        assert "FlatMapGroupsInPandasWithState" in plan
        assert ("[StructField(z,DoubleType,true), "
                "StructField(seeded,LongType,true), "
                "StructField(last_day,StringType,true)]") in plan, \
            "state struct drifted from (z double, seeded long, last_day string)"
        assert plan.count("Exchange ") == 1
        assert "REQUIRED_BY_STATEFUL_OPERATOR" in plan
        assert "AdaptiveSparkPlan" not in plan
        assert "ReadSchema: struct<ts:" in plan and "event_type:string" in plan
        for unread in ("event_id", "user_id", "value", "props"):
            assert unread not in plan.split("ReadSchema:")[1], \
                f"{sf_dir}: scan not pruned — reads {unread}"


def test_q296_degree_joins_scale_adaptively(spark):
    """q296 assortativity: the edge->degree attachment must BROADCAST
    while the node panel is provably small (sf0.001) and be ALLOWED to
    flip to a shuffled join when it grows (sf0.1 — degree panels scale
    with the node universe, so force-broadcasting them would be the
    100 TB bug). Pin both behaviors so neither a regression to
    all-SMJ-at-any-size nor a forced broadcast sneaks in."""
    small = _plan_shape(spark, "q296_degree_assortativity",
                        "/root/testdata/sf0.001")
    large = _plan_shape(spark, "q296_degree_assortativity",
                        "/root/testdata/sf0.1")
    assert small.get("SortMergeJoin", 0) == 0, \
        f"tiny node panel must broadcast: {small}"
    assert "CartesianProduct" not in small and \
        "CartesianProduct" not in large
    # the 1-row n_nodes attach stays a broadcast at every SF
    assert small.get("BroadcastNestedLoopJoin") == 1
    assert large.get("BroadcastNestedLoopJoin") == 1


# ---------------------------------------------------------------------------
# r11: the single-partition-window guard (VERDICT r10 #3). An unpartitioned
# window over a per-row frame moves the WHOLE input to one partition — the
# scale-killer found in q295/q299/q306/q308. The detector must flag exactly
# that shape and sanction the three safe ones (aggregated frame, limited
# frame, partitioned window).
# ---------------------------------------------------------------------------

def _audit_count(df):
    from league_of_legends_data_pipeline_spark.plans.audit import (
        count_unbounded_global_windows,
    )
    df.collect()
    return count_unbounded_global_windows(
        df._jdf.queryExecution().executedPlan().toString())


def test_unbounded_global_window_detector_semantics(spark):
    from pyspark.sql import Window

    # 10k rows: above the literal-Range bounded threshold (4096), so the
    # range stand-in behaves like a raw corpus to the detector
    base = spark.range(10_000).select((F.col("id") % 7).alias("k"),
                                      F.col("id").alias("v"))
    # the regression class: unpartitioned rank straight over raw rows
    assert _audit_count(
        base.select(F.rank().over(Window.orderBy("v")).alias("r"))) == 1
    # sanctioned: same window over an AGGREGATED (domain-bounded) frame —
    # the q265/q295 value-domain support pattern
    assert _audit_count(
        base.groupBy("v").count()
        .select(F.rank().over(Window.orderBy("v")).alias("r"))) == 0
    # sanctioned: window over an already-LIMITED frame (orderBy().limit()
    # = TakeOrderedAndProject, the q306/q308 slate pattern)
    assert _audit_count(
        base.orderBy("v").limit(5)
        .select(F.rank().over(Window.orderBy("v")).alias("r"))) == 0
    # sanctioned: an immediate rank filter fires WindowGroupLimit, which
    # prunes per input partition before the single-partition exchange
    wgl = (base.select("k", "v",
                       F.rank().over(Window.orderBy("v")).alias("r"))
           .filter("r <= 1"))
    wgl.collect()
    plan = wgl._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    from league_of_legends_data_pipeline_spark.plans.audit import (
        count_unbounded_global_windows,
    )
    assert count_unbounded_global_windows(plan) == 0
    # sanctioned: partitioned windows (ordered or not) never flag
    assert _audit_count(base.select(
        F.rank().over(Window.partitionBy("k").orderBy("v"))
        .alias("r"))) == 0
    assert _audit_count(base.select(
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("c"))) == 0
    # NOT sanctioned: an aggregate on the BROADCAST (build) side of a
    # join does not bound the streamed corpus the window sorts — the
    # 1-row totals broadcast onto raw rows is this repo's most common
    # join shape, and it must NOT launder a corpus window
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    assert _audit_count(
        base.crossJoin(F.broadcast(tot))
        .select(F.rank().over(Window.orderBy("v")).alias("r"))) == 1


def test_shuffled_join_does_not_launder_window_bound(spark):
    """r11 ADVICE: an aggregate on the NON-STREAMED side of a SHUFFLED
    join must not bound a window above the join — a raw corpus
    sort-merge-joined to a tiny aggregated frame is still corpus-sized.
    r12 ADVICE mirrored the rule to the LEFT branch (the r13 pinned
    false negative, flipped in r14): an aggregated LEFT inner-joined to
    a raw corpus RIGHT fans back out to corpus size, so a shuffled join
    bounds its output only when BOTH branches are bounded."""
    from pyspark.sql import Window

    base = spark.range(10_000).select((F.col("id") % 7).alias("k"),
                                      F.col("id").alias("v"))
    agg = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # aggregate on the RIGHT of the shuffled join: the window's
        # streamed lineage is the raw corpus — must flag
        assert _audit_count(
            base.join(agg, "k")
            .select(F.rank().over(Window.orderBy("v")).alias("r"))) == 1
        # aggregate on the LEFT, raw corpus on the RIGHT: the join output
        # is still corpus-sized — must flag too (r12 ADVICE mirror)
        assert _audit_count(
            agg.join(base.withColumnRenamed("v", "w"), "k")
            .select(F.rank().over(Window.orderBy("n")).alias("r"))) == 1
        # BOTH branches aggregated: genuinely domain-bounded — sanctioned
        agg2 = base.groupBy("k").agg(F.max("v").alias("mx"))
        assert _audit_count(
            agg.join(agg2, "k")
            .select(F.rank().over(Window.orderBy("n")).alias("r"))) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bnl_cartesian_detector_semantics(spark):
    """r11 verdict #4: BNL joins with an unbounded build side and
    cartesians with neither side bounded are the O(N*M) sibling of the
    single-partition window — the detector must flag exactly those and
    sanction the 1-row/slate broadcast attaches the repo relies on."""
    from league_of_legends_data_pipeline_spark.plans.audit import (
        count_unbounded_bnl_cartesian,
    )

    def bnl_count(df, execute=True):
        if execute:
            df.collect()
        return count_unbounded_bnl_cartesian(
            df._jdf.queryExecution().executedPlan().toString())

    base = spark.range(10_000).select((F.col("id") % 7).alias("k"),
                                      F.col("id").alias("v"))
    other = spark.range(10_000).select(F.col("id").alias("w"))
    one = base.agg(F.max("v").alias("mx"))
    # sanctioned: 1-row aggregate broadcast attach (q288/q296-class)
    assert bnl_count(base.crossJoin(F.broadcast(one))) == 0
    # sanctioned: limited slate broadcast under a non-equi condition
    assert bnl_count(base.join(F.broadcast(other.orderBy("w").limit(5)),
                               F.col("v") > F.col("w"))) == 0
    # sanctioned: a literal small Range (lag/replicate axes) is provably
    # bounded; a large one is not
    assert bnl_count(base.join(F.broadcast(
        spark.range(8).select(F.col("id").alias("lag"))),
        F.col("v") > F.col("lag"))) == 0
    assert bnl_count(base.join(F.broadcast(
        spark.range(10_000_000).select(F.col("id").alias("lag"))),
        F.col("v") > F.col("lag"))) == 1
    # flagged: raw corpus broadcast as BNL build side
    assert bnl_count(base.join(F.broadcast(other),
                               F.col("v") > F.col("w"))) == 1
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # flagged: cartesian with neither side bounded (plan shape only —
        # executing the 10k x 10k product would be the very cliff)
        assert bnl_count(base.crossJoin(
            other.withColumnRenamed("w", "u")), execute=False) == 1
        # sanctioned: cartesian with one side limited
        assert bnl_count(base.crossJoin(
            other.orderBy("w").limit(5).withColumnRenamed("w", "u")),
            execute=False) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_r10_offenders_have_no_unbounded_global_windows(spark):
    # the four queries the round-10 verdict flagged, rewritten in r11
    # (q295/q299 rank from the value-domain contingency frame; q306/q308
    # take slates via orderBy().limit(k)), plus the four OLDER queries the
    # new detector then caught in the same class (q55/q100 migrated to
    # exact_ntile, q132 to global_rank, q169 to the value-domain prefix
    # sum). Their executed plans must never again sort a per-row corpus
    # frame on one partition.
    for name in ("q295_mann_whitney_u", "q299_kruskal_wallis",
                 "q306_rocchio_prf", "q308_quantization_ndcg",
                 "q55_ntile_deciles", "q100_approx_ntile_agreement",
                 "q132_hybrid_retrieval_rrf", "q169_ddsketch_quantiles"):
        df = QUERIES[name].spark(spark, SF_DIR)
        assert _audit_count(df) == 0, f"{name} reintroduced a " \
            "single-partition window over a per-row frame"


def test_checkpointed_panel_window_allowlist_is_exact(spark):
    """Every CHECKPOINTED_PANEL_WINDOWS entry must match its query's
    executed plan EXACTLY: the allowance exists because localCheckpoint
    hides the aggregate that bounds those panels, so the pin is the only
    thing distinguishing a documented bounded-panel window from a new
    corpus-sized one (the original q306 bug was a window over a
    checkpointed CORPUS frame — that shape must keep failing)."""
    from league_of_legends_data_pipeline_spark.plans.audit import (
        CHECKPOINTED_PANEL_WINDOWS, count_unbounded_global_windows,
    )

    for name, allowed in CHECKPOINTED_PANEL_WINDOWS.items():
        df = QUERIES[name].spark(spark, SF_DIR)
        df.collect()
        raw = count_unbounded_global_windows(
            df._jdf.queryExecution().executedPlan().toString())
        assert raw == allowed, \
            f"{name}: {raw} unbounded windows vs allowance {allowed}"


def test_all_queries_sweep_spwin_and_bnl_net_of_pins(spark):
    """r13 verdict item #3: the allowlist-exactness tests below only
    iterate PINNED queries, so a flagged join/window in an UNPINNED query
    (the r13 q306 bnl=+1 case) was invisible to the suite and surfaced
    only in the committed PLANS.md. This sweep executes EVERY declared
    non-streaming query and asserts the raw detector counts net of pins
    are zero — no unpinned scale-killer can ship again."""
    from league_of_legends_data_pipeline_spark.plans.audit import (
        CHECKPOINTED_PANEL_WINDOWS, PINNED_BOUNDED_BNL,
        count_unbounded_bnl_cartesian, count_unbounded_global_windows,
    )

    bad = []
    for name, spec in QUERIES.items():
        if "streaming" in name or "stream_" in name or name in (
                "q46_stateful_quota", "q58_streaming_sessions",
                "q63_stream_stream_join", "q41_streaming_tumbling"):
            continue  # micro-batch plans differ; covered by test_streaming
        df = spec.spark(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        net_win = (count_unbounded_global_windows(plan)
                   - CHECKPOINTED_PANEL_WINDOWS.get(name, 0))
        net_bnl = (count_unbounded_bnl_cartesian(plan)
                   - PINNED_BOUNDED_BNL.get(name, 0))
        if net_win or net_bnl:
            bad.append((name, net_win, net_bnl))
    assert bad == [], \
        f"(query, sp-win, bnl) net of pins nonzero — unpinned " \
        f"scale-killer or allowlist drift: {bad}"


def test_pinned_bounded_bnl_allowlist_is_exact(spark):
    """Every PINNED_BOUNDED_BNL entry must match its query's executed
    plan EXACTLY — the pin is what distinguishes a verified bounded build
    side (unique-id query slate, checkpointed k-slate/panel) from a new
    corpus-sized one, so drift in either direction must fail."""
    from league_of_legends_data_pipeline_spark.plans.audit import (
        PINNED_BOUNDED_BNL, count_unbounded_bnl_cartesian,
    )

    for name, allowed in PINNED_BOUNDED_BNL.items():
        df = QUERIES[name].spark(spark, SF_DIR)
        df.collect()
        raw = count_unbounded_bnl_cartesian(
            df._jdf.queryExecution().executedPlan().toString())
        assert raw == allowed, \
            f"{name}: {raw} unbounded BNL/cartesians vs allowance {allowed}"
