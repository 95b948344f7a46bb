package graft.queries

import graft.etl.EtlSpecBase

/** Partition-count invariance: a result that changes with
  * `spark.sql.shuffle.partitions` depends on physical data layout —
  * the bug class (hash-order mode ties, per-partition sampling, LSH
  * bucket iteration order) that passes every fixed-config test locally
  * and silently breaks on a 1000-executor cluster. Representative
  * layout-sensitive queries must produce byte-identical ordered results
  * at 1, 7, and 32 shuffle partitions.
  */
class PartitionInvarianceSpec extends EtlSpecBase {

  private val sf = "/root/testdata/sf0.001"

  // one per risk class: categorical rare-fold collect (q05), mode
  // tie-break (q07), LSH banding + hot-band handling (q20), iterative
  // cluster label propagation (q51), hash-gated sampling (q57),
  // seeded shuffle-shard (q66), per-shard prefix-sum packing (q71),
  // rounded-score window rank ties (q79), float-sum-turned-integer-sum
  // top-k boundary (q81), LSH pair relabeling + rollup (q82),
  // collect_list line-rebuild order (q90), integer-sum top-k over a
  // generated chunk corpus (q92), composed quota-rank + shard-window
  // pipeline (q97), micro-grid log-term fold over two count joins
  // (q106), iterative integer-grid rank propagation (q108), k-row
  // limit boundary on count ties (q111), micro-grid ranked top-k
  // with >2^53 double products (q116), global rank-sum moments (q119),
  // collect_list window frame order (q104), kernel-hashed shingle
  // min-census (q110), best-match window rank ties (q105), per-user
  // lag over a (ts, event_id) total order (q113), struct-max_by pick
  // order (q125), min-over-bucket-rows + top-k count ties (q126)
  private val queries = Seq("q05_clean_categorical", "q07_impute_mode",
    "q20_minhash_lsh", "q51_dup_clusters", "q57_stratified_sample",
    "q66_shuffle_shard", "q71_pack_sequences", "q79_tfidf_topk",
    "q81_bm25_search", "q82_source_leakage", "q90_boilerplate_lines",
    "q92_rag_retrieval", "q97_incremental_pipeline",
    "q106_bigram_surprisal", "q108_pagerank", "q111_vocab_coverage",
    "q116_pmi_collocations", "q119_gini_revenue", "q104_ewma_revenue",
    "q110_trigram_novelty", "q105_fuzzy_match", "q113_markov_transitions",
    "q125_cdc_apply", "q126_cms_topk", "q127_bucketed_join",
    "q128_weighted_sample", "q129_partition_prune",
    "q130_pct_calibrate", "q131_k_anonymity", "q132_stream_cms",
    "q133_scd2_asof", "q134_stream_state_sessions", "q135_kmv_overlap",
    "q136_gapfill_daily", "q137_benford_audit", "q138_substring_dedup",
    "q139_token_budget", "q140_pca_power", "q141_psi_drift",
    "q144_embedding_drift",
    // round-10b: degree-orientation join order (q146), absent-source
    // algebra over a checkpointed cell frame (q147), percentile-cut
    // scoring (q148), day-grain cumulative window + argmax tie (q149),
    // frontier distinct/anti-join order (q150)
    "q146_triangle_census", "q147_t_closeness", "q148_rfm_segments",
    "q149_cusum_changepoint", "q150_bfs_levels",
    // round-10c: lift-tie top-k boundary (q151), iterated argmax
    // tie-break + replace chain (q152), per-round peel counts (q153),
    // rank-tie hit join (q154)
    "q151_assoc_rules", "q152_bpe_merges", "q153_kcore_peel",
    "q154_ann_recall",
    // round-10d: census count ties at the vocab top-k boundary
    // (q155), LSH pair set vs truth set joins (q157)
    "q155_bpe_vocab", "q157_neardup_eval",
    // round-10e: hash-keyed noise projection (q158), per-round label
    // argmax ties (q159), lag-join moment sums (q160), median-cut
    // confusion counts (q161)
    "q158_dp_counts", "q159_label_prop", "q160_acf_daily",
    "q161_confusion_f1",
    // round-10f: digest-shard census (q162), dual ignore-null window
    // scan (q163), merge-order of bloom partials (q164), partial-state
    // union merge (q165)
    "q162_content_hash", "q163_linear_interp", "q164_bloom_fpr",
    "q165_partial_merge",
    // round-10g: bucket-boundary value ties (q166), split-hash train
    // membership (q167), census ties at the top-k boundary (q168),
    // per-user window tie order (q169)
    "q166_global_rank", "q167_heldout_surprisal", "q168_zipf_slope",
    "q169_position_attribution",
    // round-10h: top-10 revenue ties (q170), grouping-set expand
    // (q171), range-frame peers (q172), null-safe key matching
    // (q173), digest sums + full-outer drill (q174)
    "q170_tpch_q3", "q171_grouping_sets", "q172_range_window",
    "q173_nullsafe_join", "q174_merkle_diff",
    // round-10i: integer-mean backtest joins (q175), per-user rank
    // fold + census top-k ties (q176), Wilson-grid rank boundary
    // (q177)
    "q175_forecast_backtest", "q176_path_census", "q177_wilson_topk",
    // round-10j: cross-bucket sweep carry (q178), per-user lead order
    // (q179), equi-depth boundary ties (q180)
    "q178_skyline", "q179_twap", "q180_equidepth_stats",
    // round-10k: day-grain lag frames (q181), smoothing divisions
    // (q182), slot census + distinct fold (q183)
    "q181_lag_features", "q182_target_encoding", "q183_feature_hashing",
    // round-10l: integer-grid centroid moments (q184), key-census
    // percentiles (q185)
    "q184_source_centroids", "q185_join_skew_stats",
    // round-10m: distinct-side token sums (q186), bucketed-rank
    // percentile ties (q187)
    "q186_dedup_savings", "q187_quantile_norm",
    // round-11: sketch-vs-exact gates (q188/q189 — the GK/HLL merge
    // order varies with partitioning; the gate booleans must not),
    // key-census squares (q190), kernel-vs-reason router (q191),
    // sim²-tie top-k boundary (q193), rank-cut pivot census (q194)
    "q188_equidepth_approx", "q189_mad_approx", "q190_join_size_preflight",
    "q191_quarantine_channel", "q193_item_recs", "q194_top_revenue_share",
    // round-11b/c: streaming census state merge (q195), per-key lead
    // interval build + residual range join (q196), per-source census
    // (q197), marker-walk census (q198), anti/semi purge counts
    // (q199), dedup-rep min + median cut + xor digest (q200)
    "q195_stream_quarantine", "q196_temporal_dim_join",
    "q197_sentence_stats", "q198_jpeg_metadata", "q199_erasure_audit",
    "q200_freeze_manifest",
    // round-11d: global-df prefix rank ties (q201), per-stratum hash
    // order rank cuts (q202)
    "q201_prefix_simjoin", "q202_stratified_split",
    // round-11e: frontier improve/min merge order (q203), per-part
    // size-desc prefix-sum bin folds (q204), bucketed prefix-max
    // carry + within-bucket window order (q205)
    "q203_sssp_census", "q204_compaction_plan", "q205_lateness_census",
    // round-11f: FD cell-census merge order (q206), day-grain window
    // + broadcast residual join (q207), flag census (q208)
    "q206_fd_profile", "q207_seasonal_decompose", "q208_mojibake_census",
    // round-11g: key-census + anti-join merge order (q209), (token,
    // doc) census + top-25 df ties (q210), milli-grid census (q211)
    "q209_ri_audit", "q210_inverted_index", "q211_readability",
    // round-11h: per-subspace Lloyd trajectory + code census (q212),
    // bucket mean merge order (q213), micro-nat term fold (q214)
    "q212_pq_codebook", "q213_median_of_means", "q214_info_gain",
    // round-11i: iterated restart-walk inflow sums + top-k rank ties
    // (q215), global-df prefix ranks probing the full index (q216)
    "q215_ppr_cohort", "q216_containment_join",
    // round-11j: span prefix-sum order + draw census (q217), per-user
    // lag + model argmax ties (q218), stream-stream outer state
    // eviction order (q219)
    "q217_neg_sampling", "q218_markov_eval", "q219_stream_outer_join",
    // round-11k: nested-box kernel census (q220), rank-family window
    // grid (q221), decimal-fit broadcast + grid sums (q222)
    "q220_mp4_metadata", "q221_analytic_suite", "q222_cuped_ab",
    // round-11l: census prefix carry + tie moments (q223), file-stats
    // fold + probe algebra (q224)
    "q223_mann_whitney", "q224_skipping_stats",
    // round-11m: triple census top-k ties (q225), group census +
    // fold rollup (q226)
    "q225_supplier_triples", "q226_group_kfold",
    // round-11n: confusion census + broadcast rollups (q227), day-grain
    // pair expansion + exact median (q228)
    "q227_langid_eval", "q228_theil_sen",
    // round-11o: 6-table join rollup (q229), IVF-PQ code census + LUT
    // joins (q230), bucketed rank prefix + grid terms (q231),
    // dual-ranking full-outer merge (q232)
    "q229_tpch_q5", "q230_ivfpq_adc", "q231_kruskal_wallis",
    "q232_rrf_fusion",
    // round-11p: iterated integer half-step normalization (q233),
    // decile census + micro-unit moments (q234), hash split + exact
    // percentile radius (q235)
    "q233_hits_rank", "q234_calibration", "q235_conformal",
    // round-12: joint-census mid-rank joins (q236), bucketed decile
    // pivot + rank moments (q237), per-group carry frames + boundary
    // order-statistic picks (q238), day-grain pair sign fold (q239),
    // truth-vs-IVF rank-tie hit join (q240), top-k revenue ties
    // (q241), HAVING census + top-100 boundary (q242), per-replica
    // weighted sums + 32-row percentile (q243), cosine-rank label
    // joins (q244), dense-spine margin joins (q245), rank-picked bin
    // edges + bin census (q246), dow census + gridded log terms
    // (q247), double global-rank composition (q248), kernel header
    // census (q249), stratum sign folds (q250)
    "q236_spearman", "q237_gini_lorenz", "q238_trimmed_means",
    "q239_kendall_tau", "q240_ivf_recall", "q241_tpch_q10",
    "q242_tpch_q18", "q243_bootstrap_ci", "q244_label_noise",
    "q245_cramers_v", "q246_woe_iv", "q247_js_divergence",
    "q248_pr_auc", "q249_bmp_metadata", "q250_simpson_check",
    // round-12 second half: slope census + dow trunc-div means +
    // small-frame MAD cut (q251), sketch-ranked top-k ties (q252),
    // decorrelated aggregate joins (q253), null-aware anti counts
    // (q254)
    "q251_robust_anomaly", "q252_cms_rank_fidelity",
    "q253_correlated_subquery", "q254_null_aware_anti",
    // round-12 TPC-H completeness: grid sums + integer-div averages
    // (q255), one-row conjunctive-filter partial (q256), broadcast
    // nation-pair residual filter (q257), per-year ppm share (q258),
    // left-join count histogram (q259), CASE-gated ppm (q260),
    // argmax-tie equality refilter (q261), correlated-average
    // cross-mult cut (q262)
    "q255_tpch_q1", "q256_tpch_q6", "q257_tpch_q7", "q258_tpch_q8",
    "q259_tpch_q13", "q260_tpch_q14", "q261_tpch_q15", "q262_tpch_q17",
    // round-12 eval wave: integer NDCG discounts (q263), RA wedge
    // census + LIMIT tiebreak (q264), symmetric-marginal Pearson
    // (q265), oriented triangle corner census (q266), kappa/MCC over
    // a percentile cut (q267), token frequency-of-frequencies (q268),
    // discordant-pair cells (q269)
    "q263_ndcg_eval", "q264_link_predict", "q265_assortativity",
    "q266_clustering_coeff", "q267_kappa_mcc", "q268_vocab_richness",
    "q269_mcnemar",
    // n4+sqrt integer distance grids over the Lloyd trajectory (q270)
    "q270_davies_bouldin",
    // round-12 testing kit: integer-div ANOVA terms (q271/q272),
    // bucketed dominance census (q273), fixed-expression effect
    // sizes over DECIMAL partials (q274)
    "q271_anova_f", "q272_brown_forsythe", "q273_cliffs_delta",
    "q274_cohens_d",
    // day-census micro-grid terms (q275), first-relevant-rank picks
    // over the broadcast top-k (q276)
    "q275_logrank", "q276_mrr_hitk",
    // bounded-collect greedy over the broadcast top-k (q277), banded
    // candidate census on a dense decile spine (q278)
    "q277_mmr_rerank", "q278_jaccard_sweep",
    // round-12 TPC-H completion: derived-partsupp tie-min join-back
    // (q279), +30-day semi join (q280), DECIMAL profit partials
    // (q281), self-normalizing HAVING cross-mult (q282), CASE-count
    // rollup (q283), anti-joined distinct count (q284), disjunctive
    // residual (q285), aggregate-threshold semi chain (q286),
    // semi+anti sole-late logic (q287), scalar-mean cross-mult +
    // date-pruned anti join (q288)
    "q279_tpch_q2", "q280_tpch_q4", "q281_tpch_q9", "q282_tpch_q11",
    "q283_tpch_q12", "q284_tpch_q16", "q285_tpch_q19", "q286_tpch_q20",
    "q287_tpch_q21", "q288_tpch_q22",
    // round-12 time-series inference: compile-time trig literals over
    // the day census (q289), day-pair sign sums + tie census (q290),
    // month^3 minimax expansion (q291), lag-spine Pearson over two
    // censuses (q292)
    "q289_periodogram", "q290_mann_kendall", "q291_isotonic_trend",
    "q292_ccf_leadlag",
    // round-12 wave n: kernel integer projections + dense-spine
    // census (q293), per-term-gridded log-likelihood cells (q294),
    // one-aggregate stack reshape (q295), +k-key error self-joins +
    // DECIMAL cross-mult ratio (q296)
    "q293_jl_distortion", "q294_llr_collocations",
    "q295_unpivot_profile", "q296_mase_backtest",
    // round-12 wave o: bounded-collect ppm recursion over the
    // transition census (q297), hash-assigned arm census + gridded
    // chi-square terms (q298), replayed randomized response +
    // sign-safe debias (q299), customer-keyed interval residual join
    // (q300)
    "q297_markov_attribution", "q298_srm_check", "q299_ldp_freq",
    "q300_interval_overlap",
    // round-12 wave p: one-aggregate DiD cells + trunc-div means
    // (q301), ppb hazard prefix over the event-day frame (q302),
    // per-doc gaps-and-islands + token-keyed scores (q303),
    // largest-remainder apportionment over the strata frame (q304)
    "q301_did_estimator", "q302_nelson_aalen", "q303_rake_keyphrases",
    "q304_neyman_alloc",
    // round-12 wave q: bit_or word masks + word-keyed intersections
    // (q305), packed bit-field kernel parse (q306), triple census
    // with consistent-denominator ppm conditionals (q307)
    "q305_bitmap_days", "q306_gif_metadata", "q307_markov2_lift",
    // round-13 wave: sequential trunc-div ppb product over the user
    // census (q308), prefix-slice cosine deltas over the pair spine
    // (q309), dual-endian / octal-checksum kernel parses (q310/q311),
    // KN backoff over the packed-fingerprint bigram census (q312)
    "q308_pass_at_k", "q309_matryoshka_audit", "q310_tiff_metadata",
    "q311_tar_catalog", "q312_kneser_ney",
    // per-unit ppb trunc terms over the rater census (q313), window
    // over the bucket spine + hash first-seen census (q314), span
    // islands summed per doc then per source (q315)
    "q313_krippendorff_alpha", "q314_heaps_fit", "q315_dup_span_coverage",
    // bucket-stats census + predicate algebra (q316), full-outer
    // partial merge (q317), per-source flag census (q318), fixed-
    // offset format/parse roundtrip census (q319)
    "q316_zone_map_audit", "q317_ivm_merge", "q318_encoding_audit",
    "q319_fixed_width",
    // per-cell exact rational encoding (q320), 2-hop broadcast semi
    // propagation (q321), map-side window expansion + count distinct
    // (q322)
    "q320_loo_target_encoding", "q321_deletion_audit", "q322_dau_mau",
    // round-13 wave e: cell-keyed pair census (q323), top-20 count
    // ties + min over broadcast sketch cells (q324), within-rowgroup
    // lag order (q325), bit_or mask census + lattice joins (q326)
    "q323_grid_close_pairs", "q324_cms_audit", "q325_storage_advisor",
    "q326_shapley_attribution",
    // round-13 wave f: day-grain lag moments + sign-safe grid (q327),
    // kernel variable-length walk (q328), cell-census rank pick +
    // per-cell trunc-div sums (q329), supplier-grain square sums
    // (q330)
    "q327_autocorr_diagnostics", "q328_gzip_metadata",
    "q329_ips_policy_eval", "q330_hhi_concentration",
    // round-13 wave g: tiny-census self-join grids (q331), confusion
    // census + reference cross join (q332), array-literal ring probe
    // + cell census (q333), per-lang token census (q334)
    "q331_welch_ttest", "q332_fairness_audit", "q333_consistent_hashing",
    "q334_tokenizer_fertility",
    // round-13 wave h: centroid dim census + nearest-tie pick (q335),
    // per-doc running-cut window + fingerprint census (q336),
    // iterated argmax-with-tie + broadcast-literal distance (q337),
    // distinct-count stats onto a literal perm frame (q338)
    "q335_nearest_centroid", "q336_cdc_chunking", "q337_kcenter_coreset",
    "q338_join_order_cost",
    // round-13 wave i: kernel backwards-scan parse (q339), two-level
    // census reduces (q340), cumulative bucket census + gain-tie rank
    // (q341), key-join + priority census (q342)
    "q339_zip_catalog", "q340_als_step", "q341_decision_stump",
    "q342_business_days",
    // round-13 wave j: value-grain census bytes (q343), ntile over a
    // total order + cumulative decile frame (q344), conditional-agg
    // pivot + sign-safe bridge (q345), log2 census + rank picks
    // (q346)
    "q343_dict_advisor", "q344_qini_uplift", "q345_price_volume_mix",
    "q346_hdr_percentiles",
    // round-13 wave k: two-hop core-flag joins over the pair frame
    // (q347), per-arm cumulative crossing pick (q348), cohort min +
    // cumulative age frame (q349), cell-census SS rollups (q350)
    "q347_dbscan_census", "q348_sprt_monitor", "q349_ltv_triangle",
    "q350_twoway_anova",
    // round-13 wave l: moments broadcast onto a literal grid + mse
    // rank (q351), top-(K+1) boundary + gridded logs (q352), census ×
    // literal MDE grid (q353), part-grain cumulative-share cut (q354)
    "q351_ridge_sweep", "q352_hill_tail", "q353_power_calc",
    "q354_abc_classes",
    // round-13 wave m: per-flag value-grain cut picks (q355), dual
    // ntile full-outer census (q356), per-point rank-3 cut + left join
    // (q357), user-census component folds (q358)
    "q355_weighted_median", "q356_decile_migration", "q357_spatial_knn",
    "q358_design_effect",
    // round-13 wave n: edge census + nation rollups (q359), explode +
    // full-outer month censuses (q360), rank-cut membership joins
    // (q361), per-(type, day) lag windows (q362)
    "q359_modularity", "q360_rev_recognition", "q361_rich_club",
    "q362_heartbeat_gaps",
    // round-13 wave o: side-conditioned moment folds (q363), two-pass
    // percentile-k weighted moments (q364), consequent-census status
    // cut (q365), day-census dispersion folds (q366)
    "q363_regression_discontinuity", "q364_huber_irls", "q365_fd_repair",
    "q366_dispersion_test",
    // round-13 wave p: bigram-parity census (q367), merged-spine cum
    // + lead gaps (q368), oriented triangle explode + reverse-cum
    // (q369), per-fraction centroid builds + eval rank ties (q370)
    "q367_watermark_detect", "q368_wasserstein_1d", "q369_ktruss_support",
    "q370_learning_curve",
    // round-13 wave q: perm-census rank counting + BH window (q371),
    // 25-cell pooled folds (q372), day-pair percentile chain (q373)
    "q371_permutation_fdr", "q372_james_stein", "q373_sn_scale",
    // round-13 wave r: joint-census marginal joins + gridded logs
    // (q374), alphabet-census log folds (q375), per-level rank pick
    // (q376)
    "q374_mi_matrix", "q375_char_entropy", "q376_hierarchy_rollup",
    // round-13 wave s: vote pivot + weighted re-vote rank ties (q377)
    "q377_dawid_skene")

  private def fingerprint(name: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    // queries end in a total ORDER BY -> the collected row sequence is
    // the canonical result; toString flattens nested arrays/structs
    df.collect().toSeq.map(_.toString)
  }

  for (name <- queries) test(s"$name is invariant under shuffle.partitions in {1, 7, 32}") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "32")
      val at32 = fingerprint(name)
      assert(at32.nonEmpty)
      for (n <- Seq(1, 7)) {
        spark.conf.set(key, n.toString)
        val atN = fingerprint(name)
        assert(atN == at32,
          s"$name result depends on shuffle partition count ($n vs 32)")
      }
    } finally spark.conf.set(key, saved)
  }
}
