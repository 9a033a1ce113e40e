"""Scale-up probe: does the engine's time grow like the data, or worse?

Synthesizes an N-times replica of the sf0.1 tables (FK-preserving key
shifts, so joins keep their selectivity) under /tmp, then times a set of
headline queries at both scales and reports the per-query scaling factor
(time_N / time_1). A factor near N is linear scan/shuffle behavior; a
factor near N**2 flags a quadratic operator. Usage:

    python scripts/scale_probe.py [N] [query ...]   # default 10, all probe queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
PROBE_QUERIES = [
    # scans + aggregation + window + joins + text scans: the shapes that
    # must scale linearly. (Quadratic-by-design all-pairs formulations
    # are excluded — q34 runs the blocked matmul, and q42/q35 are the
    # sub-quadratic scale paths.)
    "q01_pricing_summary",
    "q59_shipping_priority",
    "q64_large_order_customers",
    "q10_latest_order_per_customer",
    "q24_exact_dedup",
    "q30_lang_id",
    "q53_repetition_filter",
    "q66_time_range_window",
    "q68_pii_redaction",
    "q35_minhash_lsh_pairs",
    "q25_ngram_jaccard",
    "q44_dedup_clusters",
    "q82_lsh_recall",
    "q98_signlsh_recall",
    # SemDeDup composition: pair work must stay ~linear (cluster count
    # grows with N at fixed stride). q102's harness is excluded: its
    # probe-pair set is quadratic in the sample by design; the operator
    # itself (random_projection) is a map-only scan.
    "q101_semantic_dedup",
    # windowed exact-substring dedup: window count ∝ total characters,
    # so the factor must track the data ratio
    "q103_duplicated_spans",
    # bloom-pruned decontamination: bitmap build + probe are both linear
    # scans; only survivors reach the verify join
    "q104_bloom_decontamination",
    # PQ: codebook capped at 32 codewords (max_codewords) so C is
    # constant and encode is linear in N; scoring is a broadcast-LUT
    # map join. The uncapped form measured factor 106 at 10x — the cap
    # IS the production design, not a benchmark dodge.
    "q105_pq_recall",
    # aHash fingerprint scan + banded hamming join: linear fingerprints,
    # candidate volume governed by bucket sizes (capped)
    "q107_media_neardup",
    # one hash shuffle + per-shard sort; must track the data ratio
    "q108_training_shuffle",
    # round-5 additions:
    # rolling-CDC chunk stats: map-only after one id exchange; the scan
    # is O(bytes), so the factor must track the data ratio
    "q117_cdc_rolling",
    # duplicated-span REMOVAL: window count ∝ characters (same span
    # groupBy as q103) + per-doc interval merge whose rows are int pairs
    "q118_span_removal",
    # bipartite minhash decontamination: both corpora hash linearly;
    # candidate volume governed by band collisions, never a self-join
    "q120_cross_corpus_neardup",
    # round-5 late additions:
    # BM25: term-filtered explode + broadcast stats — linear in corpus
    # tokens, shuffle volume bounded by matching (doc, term) pairs
    "q124_bm25_retrieval",
    # gram heavy hitters: fused Arrow gram pass + count aggregation;
    # linear in tokens, shuffle carries (gram, count)
    "q125_boilerplate_ngrams",
    # classifier training: 3 GD iterations = 3 linear corpus aggregates
    "q128_quality_classifier",
    # the 5-stage funnel: every stage is a linear scan/shuffle; AQE
    # exchange reuse must keep the branch count from multiplying cost
    "q129_curation_funnel",
    # PageRank: edge build is one self-join on the order key; each
    # iteration joins (node, rank) onto edges — linear in edges
    "q133_supplier_pagerank",
    # tokenizer encode: posexplode + broadcast vocab + positional
    # reassembly — linear in tokens
    "q137_tokenize_encode",
    # round-6 probes for the round-5 tail:
    # SCD2 as-of join: sorted merge within user partitions; rows are
    # (user, ts) pairs — must track the event count
    "q138_point_in_time_join",
    # 3 chained user-keyed min aggregates; stage outputs are users-sized
    "q139_funnel_analysis",
    # bounded probe set (vec_id < 10): corpus side scans linearly, the
    # per-probe top-k is a fixed-size heap over the scan
    "q140_retrieval_eval",
    # cross-source gram co-occurrence: candidate volume bounded by the
    # per-gram fan-out cap — watch this one (bounded self-join)
    "q141_cross_source_dup_matrix",
    # calendar spine × key set sequence-explode + left join — linear in
    # (key, day) cells
    "q142_calendar_gap_fill",
    # snapshot-vs-batch digest anti-join: digests shuffle, never text —
    # watch the digest join's growth
    "q143_incremental_snapshot_dedup",
    # per-partition volume stats + robust flags: one groupBy of date
    # cells
    "q144_ingest_anomaly_scan",
    # policy rule scan is map-side over docs; attribution is one groupBy
    "q145_policy_filter_report",
    # CC + histogram: the q44 machinery plus one extra groupBy
    "q146_cluster_size_histogram",
    # round-6 additions:
    # HLL: one partial-aggregated groupBy; register table fixed-size
    "q147_hll_cardinality",
    # CMS: fixed-size table build + broadcast probe
    "q148_cms_heavy_hitters",
    # z-order audit: map-only bit math + one groupBy
    "q149_zorder_locality",
    # levenshtein verifier over blocked candidates: candidate volume
    # governed by block sizes (guarded) — watch like q25
    "q150_edit_distance_pairs",
    # one lead() window + two aggregates
    "q151_session_transitions",
    # inverted-index cosine: posting-list-bounded term join — watch the
    # df-cap's effectiveness
    "q152_tfidf_cosine_pairs",
    # blocked containment verifier — same watch as q25
    "q153_containment_pairs",
    # round-8 additions:
    # partial-state merge: two chained groupBys, states not events
    "q154_incremental_agg_merge",
    # constant-width (54-byte) Arrow decode stage — must be pure-linear
    "q155_image_decode",
    # per-row codec/parser stages (JPEG entropy, WAV features, MP4 box
    # walk): constant work per row, must track the row count
    "q156_jpeg_decode",
    "q157_audio_features",
    "q158_video_metadata",
    # banded-minhash groupBy, no pair join — linear by construction
    "q159_lsh_bucket_stats",
    # two TakeOrdered bottom-k scans + k-array set math; output fixed
    "q160_kmv_corpus_overlap",
    # round-8 cleaning tier:
    # regex pipeline + entity decode: map-only, O(bytes)
    "q161_html_text_extraction",
    # regexp_extract/array canonicalization + per-domain aggregate
    "q162_url_canonical_dedup",
    # 5 detectors + Luhn transform/aggregate + redaction chain: map-only
    "q163_pii_scrub_report",
    # span explode + one window on span key + per-doc re-aggregate:
    # shuffle volume is the span stream — must track characters
    "q164_paragraph_dedup",
    # two-phase heavy hitters: (bucket, token) partial agg + broadcast
    # semi-join recount — shuffle rows are vocab x buckets, not tokens
    "q165_heavy_hitters",
    # one corpus word-freq aggregate, then merge rounds on the bounded
    # vocab table — factor should track distinct-word growth, not rows
    "q166_bpe_train",
    # map-only pair build + (token,long)/(pair,long) model joins: linear
    "q167_bigram_lm_scores",
    # term-filtered positional postings + (doc,pos) equi-joins: bounded
    # by query-term document frequency
    "q168_phrase_search",
    # fixed 128-bucket sketch aggregate + merge: output constant
    "q169_ddsketch_quantiles",
    # 40 replicate weighted sums in one aggregate: linear scan
    "q170_poisson_bootstrap",
    # two explode+groupBy passes over (doc, symbol) counts
    "q171_entropy_scores",
    # map-only winnow selection; df-capped fingerprint pair join
    "q172_winnow_fingerprint_pairs",
    # q167 scoring + range-partitioned exact ntile (counts-only driver)
    "q173_perplexity_buckets",
    # map-only signal arithmetic + one groupBy per corpus
    "q174_code_detection",
    # ONE expand aggregate over 7 columns (exact NDV widens the scan)
    "q175_column_profile",
    # metadata-sized listing + per-group window cumsum
    "q176_compaction_plan",
    # 9-group digit count + broadcast literals
    "q177_benford_scan",
    # Arrow WHT hash stage + pigeonhole chunk join with bucket caps
    "q178_wht_perceptual_pairs",
    # pair/unigram aggregates + two marginal joins + top-k
    "q179_pmi_collocations",
    # rank once (counts-only driver) + explode k + one rank equi-join
    "q180_negative_samples",
    # WAV codec Arrow stage + pigeonhole chunk join
    "q181_audio_fingerprint_pairs",
    # JVM frame explode + Arrow byte-sum + per-video lag window
    "q182_scene_cuts",
    # metadata zone-map agg + one conditional-sum pass
    "q183_zone_map_pruning",
    # two user-keyed aggregates + one user equi-join
    "q184_cohort_retention",
    # 3 rounds of label join + count agg + struct argmax
    "q185_label_propagation",
    # prefix-token equi-join + exact verify; output grows with true dups
    "q186_prefix_filter_pairs",
    # degree agg + wedge self-join + closing semi-join
    "q187_triangle_count",
    # two exact grouped medians + two broadcast joins
    "q188_mad_outliers",
    # map-only regex ratios + one source aggregate
    "q189_encoding_quality",
    # explode + 256-bucket agg + broadcast score join + per-doc sum
    "q190_dsir_selection",
    # one QI groupBy + one tiny aggregate
    "q191_k_anonymity",
    # explode-distinct + three linear aggregates + QUALIFY top-k
    "q192_chi2_tokens",
    # exact-ntile (boundary agg + count agg + bucketed window) + bin agg
    "q193_woe_iv",
    # slim (id,key) global rank + w-fold rank-offset equi-join + verify
    "q194_sorted_neighborhood",
    # one (value,group) agg + distinct-value-domain CDF window
    "q195_ks_drift",
    # k corpus scans (argmax aggregate + map-side running min each)
    "q196_kcenter_coreset",
    # 3 checkpointed rounds: join + agg per direction, literal max divisors
    "q197_hits_scores",
    # group-partitioned percent_rank window
    "q199_quantile_normalize",
    # CASE-ladder projection + len(buckets)-group aggregate
    "q200_padding_efficiency",
    # explode + gram->min-id agg + join back
    "q201_ngram_novelty",
    # per-key lag window + integer moment aggregate
    "q202_burstiness",
    # gram explode + per-group bottom-k window + sketch-only pair join
    "q203_source_overlap_matrix",
    # union of linear aggregates over three tables
    "q204_dataset_card",
    # token-count agg + slim global rank + one conditional-sum agg
    "q205_vocab_coverage",
    # one conditional-sum grouped aggregate (all thresholds in one scan)
    "q206_threshold_sweep",
    # map-only shape fingerprint + digest groupBy
    "q207_template_detection",
    # posexplode + (label, dim) BIGINT sums
    "q208_embedding_health",
    # one Expand-widened grouped scan (4 grouping shapes)
    "q210_grouping_sets",
    # distinct-values collect (bounded) + one grouped Expand pivot
    "q211_dynamic_pivot",
    # two digest sums in one grouped scan
    "q212_partition_digest_diff",
    # 3 IVF passes + exact baseline over the fixed query slice
    "q213_ivf_nprobe_curve",
    # group-partitioned cumulative-weight window
    "q214_weighted_median",
    # one user aggregate + three exact ntiles + cell rollup
    "q215_rfm_segments",
    # day-grouped count + bounded-domain window + TakeOrdered(1)
    "q216_cusum_changepoint",
    # CMS build (fixed table) + sketch-row inner product + exact dual
    "q217_selfjoin_size_estimate",
    # exact-percentile group agg + broadcast clip/scale projection
    "q218_robust_scaling",
    # one user-partitioned window + touch-grouped rollup
    "q219_last_touch_attribution",
    # round-9 additions:
    # approx-NDV profile (one HLL aggregate) + pruned exact-NDV union
    # agreement join — every branch a column-pruned linear scan
    "q220_column_profile_approx",
    # generated probe range + one equi-join against the key set
    "q221_id_probe",
    # FS scoring on sorted-neighborhood candidates: global rank + N x 5
    # rank-offset equi-join — pair volume linear by construction
    "q222_record_linkage",
    # one day-keyed corpus aggregate + windows over the days table
    "q223_seasonal_anomaly",
    # deduped (day, user) pair explode + daily HLL register merge —
    # shuffle volume 7x the deduped pairs, registers fixed-size
    "q224_rolling_active_users",
    # five key-only FK joins, parent sides distinct-then-broadcast
    "q225_fk_integrity_audit",
    # round-9 late additions:
    # bounded-round frontier BFS: each hop is one edge equi-join on the
    # visited frontier; edge table linear in orders
    "q226_bfs_reachability",
    # Mann-Whitney AUC: one global rank (counts-only driver) + two
    # group-sum aggregates
    "q227_classifier_auc",
    # one partial-aggregated day/part groupBy (struct-argmax open/close)
    "q228_ohlc_bars",
    # pair explode bounded by per-basket item cap + support joins on the
    # bounded item dimension
    "q229_association_rules",
    # k-core peel: bounded rounds, each a degree agg + semi-join,
    # localCheckpoint-truncated lineage
    "q230_kcore_peel",
    # map-side rendezvous hash ladder + 9-row shard rollup join
    "q231_rendezvous_sharding",
    # token explode + two bounded-domain (bucket) aggregates
    "q232_feature_hashing_audit",
    # sweep-line skyline: one sort + running-min window, frontier
    # semi-join back — never a quadratic dominance join
    "q233_skyline_parts",
    # one grouped aggregate + deterministic hash-noise projection
    "q234_binomial_noise_counts",
    # session bounds collapse + delta-minute explode + running-sum
    # window — shuffle rows are session endpoints, not minutes
    "q235_concurrency_sweep",
    # [lo,hi] 1-row broadcast + width_bucket-style projection + one
    # bounded-domain (bin) aggregate
    "q236_equiwidth_histogram",
    # map-side regexp syllable/word features + one grouped aggregate
    "q237_readability_scores",
    # day-keyed panel aggregate (dimension-sized) + one self-join over
    # the days x types panel
    "q238_metric_correlation_matrix",
    # two conditional-sum aggregates collapsed to one scan
    "q239_ab_test_zscore",
    # PPR: per-iteration edge join + rank agg, checkpoint-truncated;
    # linear in edges per round
    "q240_personalized_pagerank",
    # 7-row lag-dimension broadcast over the daily aggregate
    "q241_daily_autocorrelation",
    # one user-keyed journey string aggregate + map-side regex — joinless
    "q242_sequence_pattern_funnel",
    # score-bin aggregate + bounded-domain cumulative windows
    "q243_roc_curve",
    # per-customer revenue agg + distributed exact rank + one aggregate
    "q244_lorenz_gini",
    # 4 Bellman-Ford rounds: edge equi-join + min agg per round
    "q245_weighted_sssp",
    # day-panel checkpoint + calendar-bounded pairwise slopes: the only
    # corpus stage is the first groupBy
    "q246_theil_sen_trend",
    # join-free windows over one user-clustered partitioning
    "q247_position_attribution",
    # day groupBy + checkpointed panel fold: corpus stage is the scan
    "q248_ewma_control_chart",
    # customer-keyed span aggregate + duration-dimension fold
    "q249_kaplan_meier",
    # one user-keyed conditional aggregate + 2-row moments rollup
    "q250_cuped_adjustment",
    # one conditional aggregate to the 2x2 cell table
    "q251_diff_in_diff",
    # checkpointed day panel + broadcast pairwise-sign join
    "q252_mann_kendall",
    # span aggregate behind a checkpoint + duration-panel windows
    "q253_logrank_test",
    # user-cell aggregate + 33x user-dim replica explode (never events)
    "q254_bootstrap_did_ci",
    # one user-keyed aggregate + 2-row moments rollup
    "q255_experiment_power",
    # joinless day groupBy + calendar-bounded (l, b) fold
    "q257_holt_linear",
    # day groupBy + weekday-dim train broadcast join
    "q258_forecast_backtest",
    # one source-grouped aggregate + map-side re-weighting
    "q259_temperature_mixture",
    "q260_msprt_always_valid",
    "q261_srm_check",
    "q262_jackknife_ratio_metric",
    "q263_winsorized_arm_means",
    "q264_bitext_margin_mining",
    "q265_distribution_drift",
    # round-10 additions:
    # one user-day corpus aggregate + 10-row bin rollup
    "q266_calibration_ece",
    # (type, user) panel aggregate + panel-partitioned rank windows
    "q267_spearman_rank_corr",
    # one user-day corpus aggregate + 7-row weekday rollup
    "q268_cohens_kappa",
    # degree-ordered wedge join (eager-checkpointed e/deg/oriented) +
    # corner explode — wedge volume bounded by oriented out-degree
    "q269_clustering_coefficient",
    # shared-neighbor wedge self-join + anti-join; RA micro-unit sums
    "q270_link_prediction",
    # basket self-join bounded by per-order item count + top-5 window
    "q271_item_cf_cosine",
    # checkpointed day panel: pairwise sign join + cut range-join —
    # days^3 PANEL rows, corpus-size-invariant past the first aggregate
    "q272_pettitt_changepoint",
    # one corpus window pass to the transition panel + 3 panel-sized
    # iteration joins
    "q277_markov_stationary",
    # one corpus aggregate to the support panel + cumulative windows
    "q278_gini_split",
    # q265's support-panel machinery with squared-gap terms
    "q279_cramer_von_mises",
    # one user-day aggregate to the 16-mask panel + lattice joins
    "q280_shapley_attribution",
    # two user aggregates + exact decile ntile + 10-row cumulative panel
    "q281_qini_uplift",
    # fact-dim broadcast join + k-row HUGEINT moment rollup
    "q282_anova_f",
    # support-panel ECDF forward fill + C(sources,2) x grid pair join
    "q283_source_drift_matrix",
    # round-10 tier: one corpus scan into split-filtered aggregates +
    # a per-type order statistic (exact rank window over the cal split)
    "q284_conformal_interval",
    # 3 attribute (x,y) count aggregates; margins cells-sized
    "q285_mutual_information",
    # user-panel build + 3 GD aggregates + 1 IPW aggregate
    "q286_ipw_ate",
    # user-day aggregate + 20-bin rollup; PAV enumeration bin-cubed
    "q287_isotonic_calibration",
    # Gram self-join on vec_id (the corpus-sized stage) + 64-dim matvecs
    "q288_pca_power_iteration",
    # one corpus aggregate to the 35-cell test family
    "q289_fdr_bh",
    # day panel + 3 grouped WLS aggregates
    "q290_huber_irls",
    # fact aggregate + top-100 cut + 4950-row pair join
    "q291_rank_stability",
    # round-10 tier: map-side regex + segment rollup
    "q292_pii_scan_redaction",
    # r11: value-domain contingency frame + prefix sum (no per-row window)
    "q295_mann_whitney_u",
    # edge build + degree joins (size-adaptive) + 1-row moment reduce
    "q296_degree_assortativity",
    # corpus->user panel + sorted-score-axis windows
    "q297_nn_matching_att",
    # r11: (cents x segment) contingency frame + prefix sum
    "q299_kruskal_wallis",
    # map-side pair zip + vocab-bounded iteration joins
    "q300_textrank_keywords",
    # four grouped percentiles over the trial panel
    "q301_quantile_treatment_effects",
    # two corpus scans per Weiszfeld pair, 1-row aggregates
    "q302_geometric_median",
    # one moment reduce
    "q304_welch_ttest",
    # bin-panel windows after one corpus groupBy
    "q305_average_precision",
    # r11 rewrites: slates via TakeOrderedAndProject (no corpus windows)
    "q306_rocchio_prf",
    "q308_quantization_ndcg",
    # r11 additions: broadcast scoring + 30-row pair join; token explode
    # -> vocab groupBy + nano-term reduce
    "q311_kendall_tau_rank_agreement",
    "q317_js_divergence",
    # r11 migrations off single-partition windows: exact_ntile (range
    # buckets + offsets), global_rank RRF, value-domain exact quantiles
    "q55_ntile_deciles",
    "q132_hybrid_retrieval_rrf",
    "q169_ddsketch_quantiles",
]

# key columns to shift per replica so PK/FK relationships replicate
# instead of colliding (each replica is a disjoint consistent universe)
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],   # dims stay identical (every universe shares geography)
    "nation": [],
}


def _caesar_text(rep_col, text_col):
    """Per-replica Caesar shift of the latin letters in ``text_col``.

    The plain replica duplicates document TEXT verbatim, so every doc
    gains n-1 exact copies and the TRUE near-dup pair set grows ~n^2 by
    construction — a dedup query probed on it measures truth-set growth,
    not engine scaling. Shifting each replica's alphabet by ``rep % 26``
    makes the copies' shingle sets disjoint (length, whitespace and
    repetition structure preserved), so near-dup truth grows ~linearly
    and the probe isolates the ENGINE's behavior.
    """
    import string

    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    expr = None
    for r in range(26):
        shifted = (lower[r:] + lower[:r]) + (upper[r:] + upper[:r])
        t = F.translate(F.col(text_col), lower + upper, shifted)
        cond = rep_col % 26 == r
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    return expr


def synthesize(spark, out_dir: str, n: int, salt_text: bool = False) -> None:
    from league_of_legends_data_pipeline_spark.session import load_tables

    tables = load_tables(spark, BASE)
    os.makedirs(out_dir, exist_ok=True)
    for name, df in tables.items():
        shift_cols = SHIFTS.get(name, [])
        if not shift_cols:
            df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
            continue
        offsets = {c: int(df.agg(F.max(c)).collect()[0][0]) + 1 for c in shift_cols}
        # one scan, n-fold Expand: cross-join the replica-id range
        reps = spark.range(n).withColumnRenamed("id", "__rep")
        out = df.crossJoin(reps)
        for c in shift_cols:
            out = out.withColumn(c, F.col(c) + F.col("__rep") * offsets[c])
        if salt_text and name == "documents":
            out = out.withColumn("text", _caesar_text(F.col("__rep"), "text"))
        (out.drop("__rep")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet")))


def time_queries(spark, sf_dir: str,
                 queries: list[str] | None = None) -> dict[str, float]:
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    out = {}
    for name in (queries or PROBE_QUERIES):
        t0 = time.time()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    from league_of_legends_data_pipeline_spark.session import get_spark

    args = sys.argv[1:]
    salt = "--salt-text" in args
    args = [a for a in args if a != "--salt-text"]
    n = int(args.pop(0)) if args and args[0].isdigit() else 10
    queries = [q for q in args if q in PROBE_QUERIES] or list(PROBE_QUERIES)
    out_dir = f"/tmp/spark_graft_scale_x{n}" + ("_salted" if salt else "")
    spark = get_spark("scale_probe")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        t0 = time.time()
        synthesize(spark, out_dir, n, salt_text=salt)
        print(f"synthesized x{n} replica in {time.time()-t0:.1f}s", file=sys.stderr)

    base = time_queries(spark, BASE, queries)
    base2 = time_queries(spark, BASE, queries)  # warm pass: steadier baseline
    base = {k: min(base[k], base2[k]) for k in base}
    big = time_queries(spark, out_dir, queries)
    big2 = time_queries(spark, out_dir, queries)  # min-of-two on BOTH scales:
    big = {k: min(big[k], big2[k]) for k in big}  # one GC hiccup at x10
    # would otherwise inflate a factor 2-3x and read as super-linearity
    report = {
        q: {"sf0.1_s": base[q], f"x{n}_s": big[q],
            "factor": round(big[q] / max(base[q], 1e-9), 1)}
        for q in queries
    }
    print(json.dumps({"replica": n, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
