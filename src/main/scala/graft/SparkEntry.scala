package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Dedup, Ingest, Multimodal, Relational, Similarity, Tables, TextOps, UrlOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named `(SparkSession, sfDir) => DataFrame`, with a DuckDB-runnable
  * ANSI SQL oracle where the semantics are SQL-expressible. The
  * driver's compare sorts columns by NAME and hashes values, so each
  * computed column is aliased identically in the Spark query and the
  * oracle SQL, and every query ends with a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.2 minimum slice: ingest + partition-column derivation (S2/P1/P2/F1-F4)
    "q_ingest_partition" -> Ingest.eventsPartitioned _,
    // §2.4 aggregations
    "q1_pricing" -> Relational.q1PricingSummary _,
    "q2_pushdown" -> Relational.q2FilterPushdown _,
    "q_having" -> Relational.qHaving _,
    "q_count_distinct" -> Relational.qCountDistinct _,
    "q_approx_distinct" -> Relational.qApproxDistinct _,
    "q_rollup" -> Relational.qRollup _,
    "q_cube" -> Relational.qCube _,
    // §2.3 joins
    "q3_shipping" -> Relational.q3ShippingPriority _,
    "q5_local_revenue" -> Relational.q5LocalRevenue _,
    "q_semi_join" -> Relational.qSemiJoin _,
    "q_anti_join" -> Relational.qAntiJoin _,
    "q_outer_counts" -> Relational.qOuterCounts _,
    "q_broadcast_dim" -> Relational.qBroadcastDim _,
    "q_scalar_subquery" -> Relational.qScalarSubquery _,
    "q_asof_join" -> Relational.qAsofJoin _,
    // §2.5 window functions
    "q_window_rank" -> Relational.qWindowRank _,
    "q_window_running" -> Relational.qWindowRunning _,
    "q_window_lag_lead" -> Relational.qWindowLagLead _,
    "q_window_range" -> Relational.qWindowRange _,
    // §2.6 sort / limit / set ops
    "q_percentiles" -> Relational.qPercentiles _,
    "q_sessionize_batch" -> Relational.qSessionizeBatch _,
    "q_funnel" -> Relational.qFunnel _,
    "q_time_bucket" -> Relational.qTimeBucket _,
    // hopping (sliding) windows: 1h every 15min — each event in 4
    // overlapping windows via Expand before the partial agg
    "q_hop_window" -> Relational.qHopWindow _,
    // trending: per-row 2^(23-age_h) decay anchored at corpus max ts
    // — a plain monoid hash-agg, no window/recursion; exact BIGINT
    "q_decay_trend" -> Relational.qDecayTrend _,
    // leaderboard MV: topk(A∪B) = topk(topk(A)∪topk(B)) for row-level
    // metrics — O(groups·k) merge input, history never rescanned
    "q_topk_incremental" -> Relational.qTopkIncremental _,
    // materialized-view maintenance: stored partials + new batch
    // merge-agg ≡ the full recompute (the oracle IS the full pass)
    "q_agg_incremental" -> Relational.qAggIncremental _,
    // the sketch member of the MV family: COUNT(DISTINCT) maintained
    // by HLL-sketch union, 3% bound asserted vs the exact count
    "q_distinct_incremental" -> Relational.qDistinctIncremental _,
    // the join member of the MV family: delta-join decomposition,
    // merged rollup ≡ the full join recompute (the oracle IS it)
    "q_join_incremental" -> Relational.qJoinIncremental _,
    // market-basket co-purchase pairs (in-row pair generation,
    // zero self-joins — plan-guarded)
    "q_copurchase" -> Relational.qCopurchase _,
    // A-priori frequent triples (L1-pruned in-row fan, no self-join)
    "q_itemsets3" -> Relational.qItemsets3 _,
    // RFM quintile segmentation within nation (deterministic ntile)
    "q_rfm" -> Relational.qRfm _,
    // (x,y)->z confidence/lift rules from the frequent triples
    "q_assoc_rules" -> Relational.qAssocRules _,
    // anti-entropy diff vs a derived drifted replica (which keys)
    "q_snapshot_diff" -> Relational.qSnapshotDiff _,
    // mergeable histogram-quantile MV (rank-bounded median bucket)
    "q_hist_quantile" -> Relational.qHistQuantile _,
    // Benford first-digit drift, exact fixed-point expectation
    "q_benford" -> Relational.qBenford _,
    // per-group (order-year) Benford chi^2 screen, ranked worst-first
    "q_benford_by" -> Relational.qBenfordBy _,
    // CUSUM change-point screen: the prefix-sum/running-min closed
    // form of the max(0, s+d) recursion, integer-scaled (r16)
    "q_cusum" -> Relational.qCusum _,
    // PSI value-distribution drift between half-range windows, exact
    // fixed-point terms in 2^-16 bits * A*B units (r16)
    "q_psi" -> Relational.qPsi _,
    // correlation-aware 2-D outliers: adjugate Mahalanobis as exact
    // integer ratios, top-20 by the quadratic form (r16)
    "q_mahalanobis" -> Relational.qMahalanobis _,
    // time-weighted average per user: exact decimal hold-products,
    // one IEEE division at the end (r16)
    "q_twa" -> Relational.qTwa _,
    // nearest-within-tolerance as-of (merge_asof direction='nearest'),
    // one union+window pass feeding both directions (r16)
    "q_asof_nearest" -> Relational.qAsofNearest _,
    // strict (allow_exact_matches=false) as-of: side tags swapped so
    // same-bucket features are invisible — the leakage-safe lookup
    "q_asof_strict" -> Relational.qAsofStrict _,
    // Lorenz-Gini revenue concentration; global rank via the sharded
    // prefix scan, one integral division (r16)
    "q_gini_concentration" -> Relational.qGiniConcentration _,
    // skew-proof salted join: oracle is the PLAIN join — salting must
    // be row-invisible (r16)
    "q_salted_join" -> Relational.qSaltedJoin _,
    // Morton-interleave clustering key + 2-D box probe; oracle
    // recomputes the 16-bit interleave in BIGINT (r16)
    "q_zorder" -> Relational.qZorder _,
    // exact weighted median per group over the collapsed value domain
    "q_weighted_median" -> Relational.qWeightedMedian _,
    // p25/p50/p75 equal-frequency bands in the same one-window pass
    "q_weighted_quantiles" -> Relational.qWeightedQuantiles _,
    // per-doc character-entropy gibberish screen (FixLog2, one ladder
    // per frame — never chained)
    "q_char_entropy" -> TextOps.qCharEntropy _,
    // PMI bigram collocation mining (integer log2 over the bigram vocab)
    "q_collocations" -> TextOps.qCollocations _,
    // Flesch reading-ease in exact milli-units (regexp_count only)
    "q_readability" -> TextOps.qReadability _,
    // held-out bigram cross-entropy (CCNet-style perplexity filter);
    // exact code lengths off one FixLog2 ladder per MODEL frame
    "q_bigram_ppl" -> TextOps.qBigramPpl _,
    // hashing-trick vectorizer: 1024 signed md5 buckets, vocabulary-
    // free and merge-free across shards
    "q_feature_hash" -> TextOps.qFeatureHash _,
    // Chao1 vocabulary-richness estimate per source (bias-corrected,
    // milli-scaled BIGINT cross-multiplication)
    "q_chao1" -> TextOps.qChao1 _,
    // MinHash estimate-error audit over the verified pair set (the
    // fourth sketch-audit: HLL/GK/CMS/MinHash)
    "q_minhash_err" -> Dedup.qMinhashErr _,
    // 2-D Pareto frontier via a sharded distributed prefix scan;
    // oracle is the independent NOT EXISTS domination formulation
    "q_skyline" -> Relational.qSkyline _,
    // first-order Markov transition counts + row probabilities over
    // the per-user event stream
    "q_transition_matrix" -> Relational.qTransitionMatrix _,
    // SCD Type-2 history build: state-change collapse + validity
    // intervals over the event change stream
    "q_scd2" -> Relational.qScd2 _,
    // the SCD2 consumer: every user's state as of a fixed instant
    "q_scd2_snapshot" -> Relational.qScd2Snapshot _,
    // order-independent per-table checksums (replication verification;
    // the DuckDB oracle IS the cross-engine check)
    "q_table_checksum" -> Relational.qTableChecksum _,
    // checksum maintenance from stored partials + delta (the MV-merge
    // family) — oracle = the full recompute, so merged ≡ full
    "q_checksum_incremental" -> Relational.qChecksumIncremental _,
    // sweep-line open-interval concurrency (step function at change
    // days) via the sharded prefix scan
    "q_interval_sweep" -> Relational.qIntervalSweep _,
    // most-common ordered event paths (WindowGroupLimit-pruned
    // first-8 steps, sort_array per-user sequences)
    "q_top_journeys" -> Relational.qTopJourneys _,
    // mean/sigma from exact decimal moments + mu±3sigma counts
    "q_outliers" -> Relational.qOutliers _,
    // CMS-inner-product join-size estimate vs the executed join —
    // the relational sketch build, est/exact/bounds all hash-exact
    "q_join_card" -> Relational.qJoinCard _,
    // Pearson r from exact decimal moments (the hashable corr)
    "q_correlation" -> Relational.qCorrelation _,
    // per-type OLS trend (slope/day, intercept, r^2), same discipline
    "q_ols_trend" -> Relational.qOlsTrend _,
    // Welch two-sample t per event type, hash-bucketed arms, one
    // conditional-agg pass (no self-join)
    "q_ab_test" -> Relational.qAbTest _,
    // last-touch conversion attribution with a 72h lookback (the
    // as-of carry applied to marketing touches)
    "q_attribution" -> Relational.qAttribution _,
    // dbt-style declared-constraint suite: one row per check with
    // its violation count (PK / FK / null / ranges)
    "q_dq_checks" -> Relational.qDqChecks _,
    // median/MAD robust outliers (50% breakdown vs qOutliers' moments)
    "q_outliers_robust" -> Relational.qOutliersRobust _,
    // seasonal volume-anomaly detection: zero-filled hourly counts vs
    // an hour-of-day median/MAD baseline (outage- and spike-aware)
    "q_anomaly_series" -> Relational.qAnomalySeries _,
    // Gini-Simpson source diversity per language + overall (the
    // rational, oracle-expressible alternative to entropy)
    "q_diversity" -> TextOps.qDiversity _,
    // χ² divergence of each source's language mix vs the corpus mix
    // (pico-quantized — distribution-drift QA)
    "q_chi2_divergence" -> TextOps.qChi2Divergence _,
    // deterministic PPS systematic sampling by token count (md5
    // order, sharded prefix scan, integer step crossings)
    "q_sample_pps" -> TextOps.qSamplePps _,
    // self-trained bigram LM score (add-one smoothed, pico-quantized
    // rational probs — no ln): the perplexity-proxy quality filter
    "q_bigram_lm" -> TextOps.qBigramLm _,
    // Shannon entropy of each source's language mix via the exact
    // fixed-point log2 (no libm) — the information-theoretic
    // diversity twin of q_diversity's Gini-Simpson
    "q_entropy_mix" -> TextOps.qEntropyMix _,
    // I(lang; source) in exact fixed-point bits: per-source rows sum
    // to the corpus MI (mixture-redundancy diagnostic)
    "q_mutual_info" -> TextOps.qMutualInfo _,
    // trained multinomial Naive Bayes language classifier: even-doc
    // train split, fixed-point log posteriors, packed argmax
    "q_nb_classify" -> TextOps.qNbClassify _,
    // priority sampling (Duffield–Lund–Thorup): top-k md5-derived
    // priorities + unbiased max(w, tau) weight estimates
    "q_priority_sample" -> TextOps.qPrioritySample _,
    // mergeable-sketch MV maintenance: stored top-(k+1) + batch
    // top-(k+1) re-ranked; must equal the full recompute
    "q_priority_incremental" -> TextOps.qPriorityIncremental _,
    "q_topk" -> Relational.qTopK _,
    "q_distinct" -> Relational.qDistinct _,
    "q_set_ops" -> Relational.qSetOps _,
    "q_union" -> Relational.qUnion _,
    "q_case_buckets" -> Relational.qCaseBuckets _,
    "q_pivot" -> Relational.qPivot _,
    "q_grouping_sets" -> Relational.qGroupingSets _,
    "q_range_join" -> Relational.qRangeJoin _,
    "q_approx_err" -> Relational.qApproxErr _,
    "q_approx_pct" -> Relational.qApproxPct _,
    "q_profile" -> Relational.qProfile _,
    // join-key skew diagnostic (the salting/AQE decision input)
    "q_skew_report" -> Relational.qSkewReport _,
    // cohort retention (first-event cohorts × months-since activity)
    "q_cohort_retention" -> Relational.qCohortRetention _,
    "q_topk_grouped" -> Relational.qTopKGrouped _,
    "q_sql_correlated" -> Relational.qSqlCorrelated _,
    // SQL surface: recursive month spine (gap-filled time series),
    // LATERAL correlated top-n, UNPIVOT (the qPivot inverse)
    "q_month_spine" -> Relational.qMonthSpine _,
    "q_lateral_topn" -> Relational.qLateralTopN _,
    "q_unpivot" -> Relational.qUnpivot _,
    "q_token_hist" -> TextOps.qTokenHist _,
    "q_pack_sequences" -> TextOps.qPackSequences _,
    "q_holdout_split" -> TextOps.qHoldoutSplit _,
    // cluster-aware split: near-dup clusters move train/val/test as a
    // unit, so duplicates can never straddle the eval boundary
    "q_split_leakage_safe" -> TextOps.qSplitLeakageSafe _,
    "q_source_stats" -> TextOps.qSourceStats _,
    // §2.9 north-star: text analysis
    "q_text_stats" -> TextOps.qTextStats _,
    "q_lang_id" -> TextOps.qLangId _,
    "q_fingerprint" -> TextOps.qFingerprint _,
    "q_winnow_fingerprint" -> TextOps.qWinnowFingerprint _,
    "q_term_freq" -> TextOps.qTermFreq _,
    "q_tfidf_topterms" -> TextOps.qTfidfTopTerms _,
    // Okapi BM25 retrieval (rational idf — the linear-idf precedent),
    // integer-microunit summed contributions
    "q_bm25" -> TextOps.qBm25 _,
    // sketch-candidates + exact-verify frequent terms
    "q_heavy_hitters" -> TextOps.qHeavyHitters _,
    // Count-Min point-query bound over the exact top-30 terms
    "q_cms_err" -> TextOps.qCmsErr _,
    // PII-style two-pass redaction (emails, long digit runs)
    "q_redact" -> TextOps.qRedact _,
    // overlapping token-window chunking (retrieval/context windows)
    "q_chunk" -> TextOps.qChunk _,
    // content-defined chunking (rolling-window md5 boundary rule)
    "q_cdc_chunk" -> TextOps.qCdcChunk _,
    // per-vector symmetric int8 embedding quantization
    "q_embed_quantize" -> Similarity.qEmbedQuantize _,
    // JL random projection 64 -> 16 (cheap similarity pre-filter)
    "q_embed_project" -> Similarity.qEmbedProject _,
    // §2.9 north-star: deduplication
    "q_dedup_exact" -> Dedup.qDedupExact _,
    // incremental ingest: new batch vs historical corpus, Bloom-pruned
    "q_dedup_incremental" -> Dedup.qDedupIncremental _,
    "q_jaccard_pairs" -> Dedup.qJaccardPairs _,
    // AllPairs/PPJoin prefix filter: the same exact J>=0.8 pair set
    // from a ~5x smaller index (completeness is a theorem) — shares
    // the q_jaccard_pairs oracle verbatim
    "q_jaccard_prefix" -> Dedup.qJaccardPrefix _,
    // directed containment |Sa∩Sb|/|Sa| >= 0.9 (quote/subset
    // detection): contained-side prefix filter x full inverted index
    "q_containment" -> Dedup.qContainment _,
    // idf-weighted cosine all-pairs (Bayardo AllPairs, weighted):
    // fixed-point-log2 idf weights, norm-suffix prefix filter, exact
    // rational (5·dot)² >= 16·|a|²·|b|² verify
    "q_idf_cosine_pairs" -> Dedup.qIdfCosinePairs _,
    // record linkage: corrupted probe names re-linked by striped
    // pigeonhole blocking + exact levenshtein verify
    "q_fuzzy_join" -> Dedup.qFuzzyJoin _,
    // Jaro-Winkler re-score of the same blocked candidates (the
    // native graft_jw expression vs DuckDB's built-in, bit-exact)
    "q_fuzzy_jw" -> Dedup.qFuzzyJw _,
    // indel corruption (delete + insert, alignment-shifting) re-linked
    // through symmetric-delete blocking — complete for lev ≤ 2, so
    // its oracle is the plain brute-force cross join
    "q_fuzzy_indel" -> Dedup.qFuzzyIndel _,
    // lev<=3 via PassJoin-style segment blocking (3-edit corruption)
    "q_fuzzy_lev3" -> Dedup.qFuzzyLev3 _,
    "q_dedup_minhash" -> Dedup.qDedupMinhash _,
    "q_dedup_clusters" -> Dedup.qDedupClusters _,
    // per-cluster golden record: packed-argmax survivor + conflict
    // signals (the entity-resolution canonicalization step)
    "q_golden_record" -> Dedup.qGoldenRecord _,
    "q_dedup_clusters_dist" -> Dedup.qDedupClustersDist _,
    // MV-merge for clusters: stored labels-as-star-forest + delta
    // edges -> merged labels, history never rescanned (r18)
    "q_dedup_clusters_incremental" -> Dedup.qDedupClustersIncremental _,
    "q_dedup_keep" -> Dedup.qDedupKeep _,
    "q_contamination" -> Dedup.qContamination _,
    "q_contamination_bloom" -> Dedup.qContaminationBloom _,
    // per-source-pair distinct shared 3-gram shingles (dataset QA)
    "q_cross_source_overlap" -> Dedup.qCrossSourceOverlap _,
    "q_curate" -> TextOps.qCurate _,
    "q_simhash_pairs" -> Dedup.qSimhashPairs _,
    // §2.9 north-star: embedding similarity
    "q_cosine_topk" -> Similarity.qCosineTopK _,
    // MMR diversity re-rank over the exact-cosine shortlist
    // (Carbonell-Goldstein greedy, driver-side over m=32 candidates)
    "q_mmr_rerank" -> Similarity.qMmrRerank _,
    // hard-negative mining: top-5 most-similar NON-positives, with
    // positives = the anchor's transitive near-dup cluster
    "q_hard_negatives" -> Similarity.qHardNegatives _,
    "q_embed_neardup" -> Similarity.qEmbedNearDup _,
    // the candidate-generation twin: LSH-bucket collisions + exact
    // verify — the near-dup path that scales past the all-pairs join
    // (guarded like every oracle that embeds the plane literals)
    "q_embed_neardup_ann" -> ((s, d) => { lshOracleGuard(s, d)
      Similarity.qEmbedNearDupAnn(s, d) }),
    "q_ann_lsh" -> ((s, d) => { lshOracleGuard(s, d)
      Similarity.qAnnLsh(s, d) }),
    "q_ann_ivf" -> Similarity.qAnnIvf _,
    // one oracle, both codegen paths per index (the q_kmeans_assign
    // pattern): the LSH twin forces the unrolled literal-plane
    // signature the shipped index no longer selects (the loop
    // expression is the default at every width since r10 — see
    // lshSignature); the IVF twin forces the literal argmax the
    // n-derived cell counts skip
    "q_ann_lsh_lit" -> ((s, d) => { lshOracleGuard(s, d)
      Similarity.qAnnLshLit(s, d) }),
    "q_ann_ivf_lit" -> Similarity.qAnnIvfLit _,
    // ORACLE-BACKED since r17: the quantizer is the integer Lloyd
    // (the q_embed_cluster lattice), so cells/probes/ranks all replay
    // as DuckDB CTEs; the spec still re-derives the ranked list
    "q_ann_ivf_km" -> Similarity.qAnnIvfKm _,
    // reciprocal-rank fusion of the two ANN lists — duckAnnLsh rides
    // inside this oracle (and the recall audit's) as a CTE, so both
    // carry the same width guard as the direct LSH queries: past the
    // embedded plane count they must fail fast with the regrow
    // instruction, not silently hash-mismatch
    "q_ann_fused" -> ((s, d) => { lshOracleGuard(s, d)
      Similarity.qAnnFused(s, d) }),
    // recall@3 of all three ANN paths vs exact ground truth — the
    // metric that makes "approximate" a measured claim
    "q_ann_recall" -> ((s, d) => { lshOracleGuard(s, d)
      Similarity.qAnnRecall(s, d) }),
    // per-label centroids — the oracle that first proved the
    // quantized vector-mean machinery the k-means family builds on
    "q_label_centroids" -> Similarity.qLabelCentroids _,
    // fixed-centroid argmin (the k-means assignment expression with
    // the iterative fixpoint factored out) — both codegen paths,
    // each hash-checked against the same DuckDB oracle
    "q_kmeans_assign" -> Similarity.qKmeansAssign _,
    "q_kmeans_assign_expr" -> Similarity.qKmeansAssignExpr _,
    // ORACLE-BACKED since r17: per-subspace integer-lattice Lloyd
    // codebooks + exact-integer ADC — the last Lloyd-derived query to
    // gain a full hash oracle
    "q_ann_pq" -> Similarity.qAnnPq _,
    // fixed-codebook PQ encode — the oracle-checked twin of the
    // fitted path, both codegen paths against one oracle
    "q_pq_assign" -> Similarity.qPqAssign _,
    "q_pq_assign_expr" -> Similarity.qPqAssignExpr _,
    // ORACLE-BACKED since r17: the 1e−6-lattice integer Lloyd makes
    // the 3-iteration fixpoint an exact relational recurrence, so the
    // oracle unrolls it as DuckDB CTEs (the q_pagerank integerization
    // move; the spec still re-derives the fixpoint driver-side)
    "q_embed_cluster" -> Similarity.qEmbedCluster _,
    // ORACLE-BACKED since r17: integer Lloyd cells + integer cosine
    // test + a recursive min-label closure replay the keep-list
    "q_semdedup_keep" -> Similarity.qSemdedupKeep _,
    // §2.9 north-star: multimodal binary columns
    "q_media_meta" -> Multimodal.qMediaMeta _,
    "q_media_frames" -> Multimodal.qMediaFrames _,
    "q_media_resize" -> Multimodal.qMediaResize _,
    "q_media_features" -> Multimodal.qMediaFeatures _,
    // REAL PNG encode+decode round-trip (javax.imageio), verified
    // relationally via the losslessness of gray PNG
    "q_media_decode" -> Multimodal.qMediaDecode _,
    // REAL WAV round-trip (javax.sound.sampled, uncompressed PCM)
    "q_media_wav" -> Multimodal.qMediaWav _,
    // REAL per-frame video round-trip (RIFF-AVI/MPNG container,
    // every frame a genuine javax.imageio encode+decode)
    "q_media_video" -> Multimodal.qMediaVideo _,
    // aHash perceptual hash over the real PNG round-trip, and the
    // image near-dup pairs it feeds (pigeonhole + exact Hamming)
    "q_media_phash" -> Multimodal.qMediaPhash _,
    "q_media_phash_pairs" -> Multimodal.qMediaPhashPairs _,
    // audio envelope fingerprint over the real WAV round-trip, and
    // the audio near-dup pairs it feeds
    "q_media_afp" -> Multimodal.qMediaAfp _,
    "q_media_afp_pairs" -> Multimodal.qMediaAfpPairs _,
    "q_quality_filter" -> TextOps.qQualityFilter _,
    "q_repetition_stats" -> TextOps.qRepetitionStats _,
    "q_passage_dedup" -> TextOps.qPassageDedup _,
    "q_substring_dedup" -> TextOps.qSubstringDedup _,
    // real pinned-merge-table BPE (vs the roughBpeCount regex proxy):
    // subword counts + stream fingerprint, and the packing twin that
    // re-runs sequence packing on the real tokenizer arithmetic
    "q_bpe_tokens" -> TextOps.qBpeTokens _,
    "q_pack_bpe" -> TextOps.qPackBpe _,
    // the TRAINING half of the BPE surface — ORACLE-BACKED since r17:
    // the 16 argmax rounds unroll as DuckDB CTE stages (per round: a
    // pair-count aggregate, a deterministic top-1, and a
    // replace-to-fixpoint rewrite — the q_bpe_tokens recursive-CTE
    // trick applied to TRAINING), on top of TextOpsSpec's independent
    // classic-trainer re-derivation; plus the forced-distributed twin
    // exercising the rounds path on real data (same output, same
    // oracle — the q_dedup_clusters_dist pattern)
    "q_bpe_train" -> TextOps.qBpeTrain _,
    "q_bpe_train_dist" -> TextOps.qBpeTrainDist _,
    // MOSS-style character-level near-dup via shared winnow
    // fingerprints (stop-fingerprint capped)
    "q_winnow_neardup" -> TextOps.qWinnowNearDup _,
    "q_unigram_score" -> TextOps.qUnigramScore _,
    // DSIR-style target-vs-raw importance weight (data selection)
    "q_importance_ratio" -> TextOps.qImportanceRatio _,
    "q_train_mix" -> TextOps.qTrainMix _,
    // exact-quota per-source sampling (eval-set builder)
    "q_sample_stratified" -> TextOps.qSampleStratified _,
    // token-denominated training mix (running-budget window)
    "q_token_budget_mix" -> TextOps.qTokenBudgetMix _,
    // alpha=1/2 temperature rebalance: per-lang isqrt-share budgets
    // (low-resource upsampling), md5-order greedy fill
    "q_temperature_mix" -> TextOps.qTemperatureMix _,
    // per-source percent_rank calibration of the quality score
    "q_quality_calibrated" -> TextOps.qQualityCalibrated _,
    // the 100 TB twin: two-pass histogram-quantile cut, same kept
    // set, no per-source single-task window (r18)
    "q_quality_calibrated_cut" -> TextOps.qQualityCalibratedCut _,
    // the FULL 100 TB twin: per-row pct via sharded tie-class rank,
    // row-identical to the flat window, same oracle (r19)
    "q_quality_calibrated_sharded" -> TextOps.qQualityCalibratedSharded _,
    // per-doc unique-shingle ratio (dedup triage / boilerplate rank)
    "q_ngram_novelty" -> Dedup.qNgramNovelty _,
    // integer-scaled PageRank over the near-dup graph (3 unrolled
    // iterations — hash-exact where a double fixpoint would drift)
    "q_pagerank" -> Dedup.qPagerank _,
    // per-node triangle counts over the same graph (id-oriented
    // wedge join — local clustering density of each near-dup
    // neighborhood)
    "q_triangles" -> Dedup.qTriangles _,
    // k-hop BFS blast radius from the mod-5 seed set (frontier form)
    "q_bfs_hops" -> Dedup.qBfsHops _,
    // CDC MERGE: update/insert/keep via the Delta-style decomposition
    "q_merge_upsert" -> Relational.qMergeUpsert _,
    "q_window_pct" -> Relational.qWindowPct _,
    // 100 TB twins of the low-cardinality-partition windows: sharded
    // exact rank (balanced value-range cuts) recomputes pct/ntile —
    // row-identical, so each twin rides its original's oracle (r18)
    "q_window_pct_sharded" -> Relational.qWindowPctSharded _,
    "q_rfm_sharded" -> Relational.qRfmSharded _,
    "q_date_funcs" -> Relational.qDateFuncs _,
    "q_string_funcs" -> Relational.qStringFuncs _,
    "q_json_funcs" -> Relational.qJsonFuncs _,
    // URL/domain canonicalization (C4/RefinedWeb curation stage):
    // rules 1-7 over derived URLs with every hazard planted (r18)
    "q_url_canonical" -> UrlOps.qUrlCanonical _,
    // registered-domain rollup + literal blocklist broadcast anti-join
    "q_domain_rollup" -> UrlOps.qDomainRollup _,
    // same-page-many-spellings collapse keyed (domain, path)
    "q_url_dedup" -> UrlOps.qUrlDedup _,
  )

  /** Priority-sampling oracle (full-corpus recompute): identical
    * integer priority (w·2³²)//(h+1), rank split at k, threshold τ
    * joined back for est_w. Shared verbatim by `q_priority_sample`
    * and `q_priority_incremental` — the incremental merge must equal
    * the full recompute. */
  private lazy val duckPrioritySample: String = {
    val hex8 = (0 until 8).map(i =>
      s"(strpos('0123456789abcdef', substring(h, ${i + 1}, 1)) - 1)" +
        s" * ${math.pow(16, 7 - i).toLong}")
      .mkString("(", " + ", ")")
    val k = TextOps.prioritySampleK
    s"""WITH nn AS (SELECT doc_id, coalesce(text, '') AS text
       |            FROM documents),
       |d AS (SELECT doc_id,
       |        greatest(CAST(len($duckTokens) AS BIGINT), 1) AS n_tok,
       |        md5(CAST(doc_id AS VARCHAR)) AS h
       |      FROM nn),
       |p AS (SELECT doc_id, n_tok,
       |        (n_tok * 4294967296) // ($hex8 + 1) AS prio
       |      FROM d),
       |r AS (SELECT doc_id, n_tok, prio,
       |        row_number() OVER (ORDER BY prio DESC, doc_id) AS rn
       |      FROM p),
       |t AS (SELECT prio AS tau FROM r WHERE rn = ${k + 1})
       |SELECT r.doc_id, r.n_tok, r.prio, t.tau,
       |  greatest(r.n_tok, t.tau) AS est_w
       |FROM r, t WHERE r.rn <= $k
       |ORDER BY r.doc_id""".stripMargin
  }

  /** Shared oracle fragments (DuckDB dialect). */
  private val duckTokens =
    "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')"
  private val duckNorm =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  /** The winnowing fingerprint derivation as a CTE chain ending in
    * `wfp` = distinct (doc_id, fp) — shared by the fingerprint dump
    * and the MOSS-style near-dup pair oracle. */
  private val duckWinnowCte =
    """t AS (SELECT doc_id, text FROM documents WHERE length(text) >= 8),
      |g AS (SELECT doc_id, text,
      |        unnest(range(1, length(text) - 3)) AS pos
      |      FROM t),
      |h AS (SELECT doc_id, pos,
      |        (ord(substring(text, CAST(pos AS INTEGER), 1)) * 4294967296
      |       + ord(substring(text, CAST(pos + 1 AS INTEGER), 1)) * 16777216
      |       + ord(substring(text, CAST(pos + 2 AS INTEGER), 1)) * 65536
      |       + ord(substring(text, CAST(pos + 3 AS INTEGER), 1)) * 256
      |       + ord(substring(text, CAST(pos + 4 AS INTEGER), 1))) % 2147483647
      |          AS kh
      |      FROM g),
      |wins AS (SELECT doc_id, pos,
      |           MIN(kh) OVER (PARTITION BY doc_id ORDER BY pos
      |                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |             AS wmin
      |         FROM h),
      |wfp AS (SELECT DISTINCT doc_id, CAST(wmin AS BIGINT) AS fp
      |        FROM wins
      |        WHERE pos >= 4)""".stripMargin

  /** The pinned BPE merge table as a VALUES list — generated from
    * [[TextOps.bpeMerges]] so the oracle can never drift from the
    * engine's table. */
  private val duckBpeMergeRows = TextOps.bpeMerges.zipWithIndex
    .map { case ((a, b), i) => s"(${i + 1}, '$a', '$b')" }.mkString(", ")
  /** Shared CTE chain recomputing the BPE encode in pure SQL: each
    * word becomes a chr(31)-delimited symbol string, and a recursive
    * CTE walks the merge table in rank order, replacing the current
    * rule's delimited pair until it no longer occurs (CASE keeps the
    * rank while `contains`, advances when exhausted — DuckDB's
    * `replace` only rewrites non-overlapping occurrences left to
    * right, so repeating to fixpoint is what equals the engine's
    * left-to-right merge pass). Rows exit the recursion when their
    * rank passes the table's end; the finished state per word is the
    * row at rank n+1. Domain note: the chr(31) delimiter assumes
    * U+001F never appears inside a token — true of the printable-
    * ASCII fixture corpus (the same assumption the sha256/substring
    * oracles document); the ENGINE has no such restriction (it
    * treats U+001F as an ordinary symbol). */
  private val duckBpeCte =
    s"""m(r, a, b) AS (VALUES $duckBpeMergeRows),
      |t AS (SELECT doc_id, source, $duckTokens AS tk FROM documents),
      |tok AS (SELECT doc_id, source, unnest(tk) AS word,
      |          unnest(range(len(tk))) AS j
      |        FROM t WHERE len(tk) > 0),
      |v AS (SELECT DISTINCT word FROM tok),
      |enc(word, s, r) AS (
      |  SELECT word,
      |    chr(31) || regexp_replace(word, '(.)', concat('\\1', chr(31)), 'g'),
      |    1
      |  FROM v
      |  UNION ALL
      |  SELECT e.word,
      |    CASE WHEN contains(e.s, chr(31)||m.a||chr(31)||m.b||chr(31))
      |         THEN replace(e.s, chr(31)||m.a||chr(31)||m.b||chr(31),
      |                      chr(31)||m.a||m.b||chr(31))
      |         ELSE e.s END,
      |    CASE WHEN contains(e.s, chr(31)||m.a||chr(31)||m.b||chr(31))
      |         THEN e.r ELSE e.r + 1 END
      |  FROM enc e JOIN m ON m.r = e.r),
      |wb AS (SELECT word,
      |         replace(substring(s, 2, length(s) - 2), chr(31), ' ')
      |           AS bpe_str,
      |         length(s) - length(replace(s, chr(31), '')) - 1 AS n_bpe
      |       FROM enc WHERE r = ${TextOps.bpeMerges.length + 1})""".stripMargin
  /** The BPE TRAINER re-derived in pure SQL — the [[duckBpeCte]]
    * encode trick applied to training (the r16 verdict's inversion
    * note): the vocabulary starts as per-word chr(31)-delimited
    * code-point symbol strings with corpus counts, and each of the
    * nMerges rounds is three UNROLLED CTE stages —
    *
    *  1. `p_r`: adjacent-pair counts (overlaps included, the Sennrich
    *     get_stats convention) via str_split + positional unnest;
    *  2. `w_r`: the round's winner under the engine's deterministic
    *     tie-break ORDER BY n DESC, a, b LIMIT 1 (ASCII corpus ⇒
    *     DuckDB's byte order ≡ the JVM's UTF-16 order);
    *  3. `rw_r`/`v_r`: the vocabulary rewrite — a per-round recursive
    *     CTE repeating the non-overlapping `replace` to fixpoint,
    *     which equals the engine's left-to-right mergePass (the
    *     duckBpeCte-proven equivalence).
    *
    * Rounds with no pairs left go empty and stay empty (cross joins
    * with the empty `w_r`), matching the engine's early stop. All
    * non-recursive CTEs are MATERIALIZED — each `v_r` is referenced
    * by both the next pair count and the next rewrite, so default
    * inlining would re-derive the whole prefix per round (the
    * duckLloydCtes lesson). Same oracle for the driver-fit and
    * forced-distributed queries: both paths share mergePass, so their
    * outputs are row-identical by construction. */
  private lazy val duckBpeTrainOracle: String = {
    val nm = TextOps.bpeTrainMerges
    def pat(w: String) = s"chr(31)||$w.a||chr(31)||$w.b||chr(31)"
    def rep(w: String) = s"chr(31)||$w.a||$w.b||chr(31)"
    val head =
      s"""tok0 AS MATERIALIZED (SELECT unnest($duckTokens) AS word
         |  FROM documents),
         |v0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         |  chr(31) || regexp_replace(word, '(.)', concat('\\1', chr(31)), 'g')
         |    AS s
         |  FROM tok0 GROUP BY word)""".stripMargin
    val rounds = (1 to nm).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT ss[j] AS a, ss[j+1] AS b, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt, ss, unnest(range(2, len(ss)-1)) AS j
         |        FROM (SELECT cnt, str_split(s, chr(31)) AS ss
         |              FROM v${r - 1}))
         |  GROUP BY 1, 2),
         |w$r AS MATERIALIZED (
         |  SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |rw$r AS (
         |  SELECT word, cnt, s FROM v${r - 1}
         |  UNION ALL
         |  SELECT t.word, t.cnt, replace(t.s, ${pat("w")}, ${rep("w")})
         |  FROM rw$r t, w$r w
         |  WHERE contains(t.s, ${pat("w")})),
         |v$r AS MATERIALIZED (
         |  SELECT t.word, t.cnt, t.s FROM rw$r t, w$r w
         |  WHERE NOT contains(t.s, ${pat("w")}))""".stripMargin
    }
    val union = (1 to nm).map(r =>
      s"SELECT CAST($r AS BIGINT) AS rank, a, b, n AS pair_count FROM w$r")
      .mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE
       |${(head +: rounds).mkString(",\n")}
       |SELECT * FROM (
       |  $union)
       |ORDER BY rank""".stripMargin
  }

  /** The TextOps.qualityScore formula over (text, tk) — kept verbatim
    * in both oracles that use it. */
  private val duckQuality =
    """least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
      |    + least((CASE WHEN len(tk) = 0 THEN 0.0
      |             ELSE CAST(len(list_filter(tk, x -> list_contains(['the','a','an','and','or','of','to','in','is','that'], x))) AS DOUBLE) / len(tk) END) * 5.0, 1.0) * 0.4
      |    + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
      |                    ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) END) * 10.0, 1.0)) * 0.2""".stripMargin
  /** One oracle, two Spark codegen paths (`q_kmeans_assign` /
    * `q_kmeans_assign_expr`): fixed-centroid squared-distance argmin. */
  private val kmeansAssignOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
      |s AS (SELECT e.vec_id, c.cid,
      |        -2 * list_inner_product(e.v, c.cv)
      |          + list_inner_product(c.cv, c.cv) AS d2
      |      FROM e CROSS JOIN c),
      |r AS (SELECT vec_id, cid,
      |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |      FROM s)
      |SELECT vec_id, CAST(cid AS BIGINT) AS cid FROM r
      |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** One oracle, two Spark codegen paths (`q_pq_assign` /
    * `q_pq_assign_expr`): per-subspace fixed-codeword squared-
    * distance argmin over 1-based contiguous sub-slices — the
    * [[kmeansAssignOracle]] arithmetic replayed in each of the m = 8
    * subspaces (codewords = the first 16 corpus vectors' slices). */
  private val pqAssignOracle = {
    val codeCols = (0 until 8).map(j =>
      s"  CAST(MAX(CASE WHEN j = $j THEN cid END) AS INTEGER) AS c$j")
      .mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
       |js AS (SELECT unnest(range(0, 8)) AS j),
       |s AS (SELECT e.vec_id, js.j, c.cid,
       |        -2 * list_inner_product(e.v[js.j*8+1 : js.j*8+8],
       |                                c.cv[js.j*8+1 : js.j*8+8])
       |          + list_inner_product(c.cv[js.j*8+1 : js.j*8+8],
       |                               c.cv[js.j*8+1 : js.j*8+8]) AS d2
       |      FROM e CROSS JOIN c CROSS JOIN js),
       |r AS (SELECT vec_id, j, cid,
       |        row_number() OVER (PARTITION BY vec_id, j
       |                           ORDER BY d2, cid) AS rn
       |      FROM s)
       |SELECT vec_id,
       |$codeCols
       |FROM r WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** Integer-exact Lloyd as an unrolled DuckDB CTE chain — the oracle
    * for the quantized k-means family ([[graft.engine.Similarity
    * .kmeansCentroidsQuantFrom]]): vectors quantize onto the 1e−6
    * lattice with the engine-identical round(x·1e6) (HALF_UP in both
    * engines), seeds are the k lowest vec_ids (cid = vec_id rank − 1),
    * each iteration assigns by the exact-integer −2·x·c + |c|² argmin
    * (ties to the lowest cid) and re-rounds the cell mean onto the
    * lattice as (2s+n)//(2n) — DuckDB's truncating `//` ≡ the engine's
    * Scala Long division; empty cells keep their centroid. All values
    * stay below 2⁵³, so the DOUBLE-list arithmetic is exact on both
    * sides. Emits CTEs e (quantized corpus), u (per-dim unnest), kk
    * (cell count), c0..c`iters` (centroids) and af (the FINAL
    * assignment). Valid in the fixture regime where the engine's
    * hash-spaced fit sample is the whole corpus (n < 2·128·k — every
    * SF fixture for both callers; see kmeansCentroidsQuantCached).
    * Every CTE is MATERIALIZED: each c\_i is referenced twice (the
    * next assignment and the empty-cell LEFT JOIN), so DuckDB's
    * default inlining re-evaluates the chain 2^iters times — measured
    * live: sf0.01 passes in seconds, sf0.1 burned 50+ CPU-minutes
    * before the hint. */
  private def duckLloydCtes(kSql: String, iters: Int): String = {
    val dims = Similarity.embDim
    def assign(name: String, cents: String): String =
      s"""$name AS MATERIALIZED (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY -2*list_inner_product(e.vq, c.cq)
         |               + list_inner_product(c.cq, c.cq), c.cid) AS rn
         |  FROM e CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    val head =
      s"""e AS MATERIALIZED (SELECT vec_id,
         |       list_transform(embedding::DOUBLE[],
         |                      x -> round(x * 1000000.0)) AS vq
         |     FROM embeddings),
         |u AS MATERIALIZED (SELECT vec_id, unnest(vq) AS x,
         |        unnest(range(1, ${dims + 1})) AS d FROM e),
         |kk AS MATERIALIZED (SELECT $kSql AS k FROM e LIMIT 1),
         |c0 AS MATERIALIZED (SELECT rn - 1 AS cid, vq AS cq FROM
         |        (SELECT vq, row_number() OVER (ORDER BY vec_id) AS rn
         |         FROM e), kk
         |       WHERE rn <= kk.k)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${assign(s"a$i", s"c${i - 1}")},
         |s$i AS MATERIALIZED (SELECT a.cid, u.d, CAST(count(*) AS BIGINT) AS n,
         |          CAST(sum(u.x) AS BIGINT) AS s
         |        FROM a$i a JOIN u USING (vec_id) GROUP BY a.cid, u.d),
         |n$i AS MATERIALIZED (SELECT cid,
         |          list(CAST((2*s + n) // (2*n) AS DOUBLE) ORDER BY d)
         |            AS cq
         |        FROM s$i GROUP BY cid),
         |c$i AS MATERIALIZED (SELECT p.cid, coalesce(f.cq, p.cq) AS cq
         |        FROM c${i - 1} p LEFT JOIN n$i f USING (cid))""".stripMargin
    }
    (head +: rounds :+ assign("af", s"c$iters")).mkString(",\n")
  }

  /** The k-means fixpoint oracle (k = 8, 3 Lloyd iterations). */
  private lazy val embedClusterOracle: String =
    s"""WITH ${duckLloydCtes("8", iters = 3)}
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM af
       |ORDER BY vec_id""".stripMargin

  /** The Lloyd-fitted IVF oracle (r17, previously rows-only): the
    * integer Lloyd chain at k = ⌈√n⌉ floor 16 (the engine's ivfCells)
    * — its final assignment `af` IS the posting-list index; per-query
    * probes are the same exact-integer d2 argmin kept to the top 2
    * (≡ the engine's augmented inner-product TopCells order, ties to
    * the lowest cid); the cosine re-rank runs on the RAW double
    * vectors exactly like the first-k IVF oracle. */
  private lazy val annIvfKmOracle: String =
    s"""WITH ${duckLloydCtes(
        "greatest(16, CAST(ceil(sqrt(count(*))) AS BIGINT))", iters = 3)},
       |er AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v
       |      FROM embeddings),
       |pq AS (SELECT vec_id AS qid, vq FROM e WHERE vec_id < 50),
       |pc AS (SELECT qid, cid FROM (
       |    SELECT pq.qid, c.cid, row_number() OVER (PARTITION BY pq.qid
       |      ORDER BY -2*list_inner_product(pq.vq, c.cq)
       |               + list_inner_product(c.cq, c.cq), c.cid) AS rn
       |    FROM pq CROSS JOIN c3 c) WHERE rn <= 2),
       |cand AS (SELECT qid, a2.vec_id AS nid FROM pc JOIN af a2 USING (cid)
       |         WHERE a2.vec_id <> qid),
       |s AS (SELECT qid, nid,
       |        list_inner_product(eq.v, en.v)
       |          / (sqrt(list_inner_product(eq.v, eq.v))
       |             * sqrt(list_inner_product(en.v, en.v))) AS score
       |      FROM cand
       |      JOIN er eq ON eq.vec_id = qid
       |      JOIN er en ON en.vec_id = nid),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid
       |                           ORDER BY score DESC, nid) AS rank
       |      FROM s)
       |SELECT qid, nid, rank, score FROM r
       |WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** The IVF-PQ oracle (r17, previously rows-only — the LAST
    * Lloyd-derived query to gain one): per-subspace integer Lloyd
    * codebooks ([[graft.engine.Similarity.pqCodebooksQuantFrom]]'s
    * recurrence as unrolled CTEs over the (j, cid) state table),
    * lattice encode, the first-⌈√n⌉ raw-vector IVF probe (shared with
    * duckAnnIvf), EXACT-INTEGER ADC (query quantized onto the same
    * lattice ⇒ every per-subspace distance and the 8-term sum are
    * integers < 2⁵³), shortlist 32 by (adc, nid), exact raw cosine
    * top-3. */
  private lazy val annPqOracle: String = {
    val m = Similarity.pqSubspaces
    val sd = Similarity.pqSubDim
    val ks = Similarity.pqCodebookSize
    val iters = 3
    def d2(x: String, c: String) =
      s"-2*list_inner_product($x, $c) + list_inner_product($c, $c)"
    def sub(v: String, j: String) = s"$v[$j*$sd+1 : $j*$sd+$sd]"
    val head =
      s"""eq AS MATERIALIZED (SELECT vec_id,
         |  list_transform(embedding::DOUBLE[],
         |                 x -> round(x * 1000000.0)) AS vq
         |  FROM embeddings),
         |er AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v
         |  FROM embeddings),
         |squ AS MATERIALIZED (SELECT vec_id, (d0-1)//$sd AS j,
         |    (d0-1)%$sd + 1 AS d, x
         |  FROM (SELECT vec_id, unnest(vq) AS x,
         |          unnest(range(1, ${m * sd + 1})) AS d0 FROM eq)),
         |js AS (SELECT unnest(range(0, $m)) AS j),
         |sds AS (SELECT rn - 1 AS cid, vq FROM
         |        (SELECT vq, row_number() OVER (ORDER BY vec_id) AS rn
         |         FROM eq) WHERE rn <= $ks),
         |b0 AS MATERIALIZED (SELECT js.j, sds.cid,
         |    ${sub("sds.vq", "js.j")} AS cw
         |  FROM sds CROSS JOIN js)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pa$i AS MATERIALIZED (SELECT vec_id, j, cid FROM (
         |  SELECT eq.vec_id, b.j, b.cid,
         |    row_number() OVER (PARTITION BY eq.vec_id, b.j
         |      ORDER BY ${d2(sub("eq.vq", "b.j"), "b.cw")}, b.cid) AS rn
         |  FROM eq CROSS JOIN b${i - 1} b) WHERE rn = 1),
         |ps$i AS (SELECT a.j, a.cid, s.d, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(s.x) AS BIGINT) AS sm
         |  FROM pa$i a JOIN squ s ON s.vec_id = a.vec_id AND s.j = a.j
         |  GROUP BY 1, 2, 3),
         |pn$i AS (SELECT j, cid,
         |    list(CAST((2*sm + n) // (2*n) AS DOUBLE) ORDER BY d) AS cw
         |  FROM ps$i GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT p.j, p.cid,
         |    coalesce(f.cw, p.cw) AS cw
         |  FROM b${i - 1} p LEFT JOIN pn$i f
         |    ON f.j = p.j AND f.cid = p.cid)""".stripMargin
    }
    val tail =
      s"""pcodes AS MATERIALIZED (SELECT vec_id, j, cid AS code FROM (
         |  SELECT eq.vec_id, b.j, b.cid,
         |    row_number() OVER (PARTITION BY eq.vec_id, b.j
         |      ORDER BY ${d2(sub("eq.vq", "b.j"), "b.cw")}, b.cid) AS rn
         |  FROM eq CROSS JOIN b$iters b) WHERE rn = 1),
         |c AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM er
         |  WHERE vec_id < (SELECT greatest(16,
         |    CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM er)),
         |a AS (SELECT er.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY er.vec_id
         |      ORDER BY list_inner_product(er.v, c.cv) DESC, c.cid) AS rn
         |  FROM er CROSS JOIN c),
         |assign AS MATERIALIZED (SELECT vec_id, cid FROM a WHERE rn = 1),
         |p AS (SELECT er.vec_id AS qid, c.cid,
         |    row_number() OVER (PARTITION BY er.vec_id
         |      ORDER BY list_inner_product(er.v, c.cv) DESC, c.cid) AS rn
         |  FROM er CROSS JOIN c
         |  WHERE er.vec_id < ${Similarity.recallMaxQid}),
         |probes AS MATERIALIZED (SELECT qid, cid FROM p WHERE rn <= 2),
         |qq AS MATERIALIZED (SELECT vec_id AS qid, vq FROM eq
         |  WHERE vec_id < ${Similarity.recallMaxQid}),
         |cand AS (SELECT pr.qid, a2.vec_id AS nid
         |  FROM probes pr JOIN assign a2 USING (cid)
         |  WHERE a2.vec_id <> pr.qid),
         |adc AS MATERIALIZED (SELECT cd.qid, cd.nid, SUM(
         |    list_inner_product(${sub("qq.vq", "pc.j")},
         |                       ${sub("qq.vq", "pc.j")})
         |  - 2*list_inner_product(${sub("qq.vq", "pc.j")}, b.cw)
         |  + list_inner_product(b.cw, b.cw)) AS adc
         |  FROM cand cd
         |  JOIN pcodes pc ON pc.vec_id = cd.nid
         |  JOIN b$iters b ON b.j = pc.j AND b.cid = pc.code
         |  JOIN qq ON qq.qid = cd.qid
         |  GROUP BY 1, 2),
         |short AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |    ORDER BY adc, nid) AS rn FROM adc)
         |  WHERE rn <= ${Similarity.pqShortlist}),
         |sc AS (SELECT s.qid, s.nid,
         |    list_inner_product(eqv.v, env.v)
         |      / (sqrt(list_inner_product(eqv.v, eqv.v))
         |         * sqrt(list_inner_product(env.v, env.v))) AS score
         |  FROM short s
         |  JOIN er eqv ON eqv.vec_id = s.qid
         |  JOIN er env ON env.vec_id = s.nid),
         |r AS (SELECT qid, nid, score,
         |    row_number() OVER (PARTITION BY qid
         |                       ORDER BY score DESC, nid) AS rank
         |  FROM sc)
         |SELECT qid, nid, rank, score FROM r
         |WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin
    s"""WITH ${(head +: rounds :+ tail).mkString(",\n")}""".stripMargin
  }

  /** The SemDeDup keep-list oracle: the Lloyd chain at k = ⌈√n⌉
    * (floor 8, the engine's semdedupCells), within-cell pairs kept by
    * the INTEGER cosine test (cos ≥ 2/5 ⟺ dq ≥ 0 ∧ 25·dq² ≥
    * 4·|a|²·|b|², HUGEINT ≡ the engine's decimal(38,0)), a recursive
    * min-label closure over the undirected edge set (each id reaches
    * its whole component, so min(reached) < id ⟺ id is not its
    * component's minimum), and the survivors in vec_id order. */
  private lazy val semdedupKeepOracle: String =
    s"""WITH RECURSIVE ${duckLloydCtes(
        "greatest(8, CAST(ceil(sqrt(count(*))) AS BIGINT))", iters = 3)},
       |nq AS MATERIALIZED (SELECT vec_id,
       |         CAST(list_inner_product(vq, vq) AS HUGEINT) AS n2
       |       FROM e),
       |pr AS MATERIALIZED (SELECT a.vec_id AS ida, b.vec_id AS idb,
       |         CAST(list_inner_product(ea.vq, eb.vq) AS HUGEINT) AS dq,
       |         na.n2 AS na2, nb.n2 AS nb2
       |       FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |       JOIN e ea ON ea.vec_id = a.vec_id
       |       JOIN e eb ON eb.vec_id = b.vec_id
       |       JOIN nq na ON na.vec_id = a.vec_id
       |       JOIN nq nb ON nb.vec_id = b.vec_id),
       |ed AS MATERIALIZED (SELECT ida, idb FROM pr
       |       WHERE dq >= 0 AND 25*dq*dq >= 4*na2*nb2),
       |bi AS MATERIALIZED (SELECT ida AS s, idb AS t FROM ed
       |       UNION ALL SELECT idb, ida FROM ed),
       |reach(id, lbl) AS (
       |  SELECT s, t FROM bi
       |  UNION
       |  SELECT r.id, bi.t FROM reach r JOIN bi ON bi.s = r.lbl),
       |drp AS (SELECT id FROM (SELECT id, min(lbl) AS m FROM reach
       |                        GROUP BY id) WHERE m < id)
       |SELECT e.vec_id FROM e LEFT JOIN drp ON drp.id = e.vec_id
       |WHERE drp.id IS NULL ORDER BY vec_id""".stripMargin

  /** Shared CTE chain ending in the verified J ≥ 0.8 near-dup `pairs`
    * — consumed by the pair queries and the recursive clusters oracle. */
  private val duckShingleBody =
    s"""t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
       |s AS (SELECT doc_id, list_distinct(list_transform(
       |        range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |      FROM t WHERE len(tk) >= 3),
       |idx AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
       |sizes AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
       |           FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |pairs AS (SELECT ida, idb,
       |            CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS jaccard
       |          FROM common
       |          JOIN sizes na ON na.doc_id = ida
       |          JOIN sizes nb ON nb.doc_id = idb
       |          WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.8)""".stripMargin
  private val duckShingleCte =
    s"""WITH $duckShingleBody
       |SELECT ida, idb, jaccard FROM pairs
       |ORDER BY ida, idb""".stripMargin
  /** Connected components of the near-dup graph by transitive closure
    * (min reachable id = the component label). */
  /** The near-dup cluster-label CTE chain (shingles → verified pairs
    * → undirected closure → min-label per doc), ending in
    * `cl(doc_id, cluster_id)` — shared by the cluster dumps and the
    * golden-record survivorship oracle. */
  private val duckClusterBody =
    s"""$duckShingleBody,
       |und AS (SELECT ida AS a, idb AS b FROM pairs
       |        UNION ALL SELECT idb, ida FROM pairs),
       |reach(a, b) AS (SELECT DISTINCT a, a FROM und
       |                UNION
       |                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
       |cl AS (SELECT a AS doc_id, MIN(b) AS cluster_id
       |       FROM reach GROUP BY a)""".stripMargin

  private val duckClusters =
    s"""WITH RECURSIVE $duckClusterBody
       |SELECT doc_id, cluster_id FROM cl
       |ORDER BY doc_id""".stripMargin

  /** Integer-scaled PageRank oracle: the same verified near-dup pairs
    * (shared CTE chain), then [[Dedup.pagerankIters]] UNROLLED
    * iterations of the micro-unit recurrence — every operation an
    * integer floor division or integer sum, so the fixpoint steps are
    * engine-exact (DuckDB `//` = Spark `div` on positive BIGINTs; the
    * HUGEINT widening of DuckDB's SUM never overflows the values, and
    * the final cast restores the BIGINT schema). */
  private val duckPagerank: String = {
    val s = Dedup.pagerankScale
    def iter(t: Int): String =
      s"""c$t AS (SELECT u.b AS node, SUM(r${t - 1}.r // d.deg) AS s
         |        FROM und u JOIN r${t - 1} ON u.a = r${t - 1}.node
         |        JOIN deg d ON d.node = u.a GROUP BY u.b),
         |r$t AS (SELECT nodes.node,
         |          (15 * ($s // nn.n)) // 100
         |            + (85 * COALESCE(c$t.s, 0)) // 100 AS r
         |        FROM nodes CROSS JOIN nn
         |        LEFT JOIN c$t ON c$t.node = nodes.node)""".stripMargin
    s"""WITH $duckShingleBody,
       |und AS (SELECT ida AS a, idb AS b FROM pairs
       |        UNION ALL SELECT idb, ida FROM pairs),
       |deg AS (SELECT a AS node, count(*) AS deg FROM und GROUP BY a),
       |nodes AS (SELECT DISTINCT a AS node FROM und),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, $s // nn.n AS r FROM nodes CROSS JOIN nn),
       |${(1 to Dedup.pagerankIters).map(iter).mkString(",\n")}
       |SELECT node AS doc_id, CAST(r AS BIGINT) AS pr
       |FROM r${Dedup.pagerankIters}
       |ORDER BY doc_id""".stripMargin
  }

  /** k-hop BFS oracle: unrolled MIN-relaxation rounds (Bellman–Ford
    * on the uniform-weight graph) — equal to the engine's frontier
    * BFS because first-reached IS min-hop under unit weights. */
  private val duckBfsHops: String = {
    def round(t: Int): String =
      s"""r$t AS (SELECT node, MIN(dist) AS dist FROM (
         |          SELECT node, dist FROM r${t - 1}
         |          UNION ALL
         |          SELECT e0.dst AS node, r${t - 1}.dist + 1 AS dist
         |          FROM r${t - 1} JOIN e0 ON e0.src = r${t - 1}.node)
         |        GROUP BY node)""".stripMargin
    s"""WITH $duckShingleBody,
       |e0 AS (SELECT ida AS src, idb AS dst FROM pairs
       |       UNION ALL SELECT idb, ida FROM pairs),
       |nd AS (SELECT DISTINCT src AS node FROM e0),
       |r0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM nd
       |       WHERE node % ${Dedup.bfsSeedMod} = 0),
       |${(1 to Dedup.bfsMaxHops).map(round).mkString(",\n")}
       |SELECT node AS doc_id, dist FROM r${Dedup.bfsMaxHops}
       |ORDER BY doc_id""".stripMargin
  }

  /** Join-cardinality oracle: the relational CMS build reproduced
    * verbatim (md5 bucket hashes, per-depth inner products, min) —
    * est, exact, and both guarantee booleans hash-exact. */
  private val duckJoinCard: String = {
    def hex8(v: String): String =
      (0 until 8).map(i =>
        s"(strpos('0123456789abcdef', substring($v, ${i + 1}, 1)) - 1) * ${math.pow(16, 7 - i).toLong}")
        .mkString("(", " + ", ")")
    def legs(src: String): String = (0 until 5).map(r =>
      s"""SELECT $r AS r,
         |  ${hex8(s"md5('$r|' || CAST(k AS VARCHAR))")} % 8192 AS b
         |FROM $src""".stripMargin).mkString("\nUNION ALL ")
    s"""WITH ek AS (SELECT user_id AS k FROM events),
       |ok AS (SELECT o_custkey AS k FROM orders),
       |sa AS (SELECT r, b, count(*) AS c FROM (${legs("ek")}) GROUP BY 1, 2),
       |sb AS (SELECT r, b, count(*) AS c2 FROM (${legs("ok")}) GROUP BY 1, 2),
       |p AS (SELECT sa.r, SUM(sa.c * sb.c2) AS ip
       |      FROM sa JOIN sb ON sa.r = sb.r AND sa.b = sb.b GROUP BY 1),
       |e AS (SELECT CAST(MIN(ip) AS BIGINT) AS est FROM p),
       |x AS (SELECT count(*) AS exact FROM ek JOIN ok ON ek.k = ok.k),
       |s AS (SELECT (SELECT count(*) FROM ek) AS na,
       |             (SELECT count(*) FROM ok) AS nb)
       |SELECT est, exact,
       |  est >= exact AS never_under,
       |  est <= exact + 8.0 * na * nb / 8192 AS within_bound
       |FROM e CROSS JOIN x CROSS JOIN s""".stripMargin
  }

  /** Fuzzy-join oracle: rebuilds the deterministic prefix corruption,
    * the striped pigeonhole blocking chunks, and the levenshtein
    * verification — the shared-machinery convention of the LSH
    * oracles (the blocking is part of the operator's contract: it is
    * complete for the substitution class, see [[graft.engine.Dedup.qFuzzyJoin]]). */
  private val duckFuzzyCtes: String = {
    def hex4(v: String, s: Int): String =
      (0 until 4).map(k =>
        s"(strpos('0123456789abcdef', substring($v, ${s + k}, 1)) - 1) * ${math.pow(16, 3 - k).toInt}")
        .mkString("(", " + ", ")")
    def chunk(nm: String, j: Int): String =
      (0 until 18).collect { case p if p % 3 == j =>
        s"substring($nm, ${p + 1}, 1)" }.mkString(" || ")
    val prefixChars = (0 until 9).map { i =>
      s"""CASE WHEN p2 = $i THEN substring('abcdefghijklmnopqrstuvwxyz', i2 + 1, 1)
         |       WHEN p1 = $i THEN substring('abcdefghijklmnopqrstuvwxyz', i1 + 1, 1)
         |       ELSE substring(c_name, ${i + 1}, 1) END""".stripMargin
    }.mkString(" || ")
    s"""WITH c AS (SELECT c_custkey, c_name FROM customer),
       |hb AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS hx FROM c),
       |bkt AS (SELECT c_custkey FROM hb WHERE ${hex4("hx", 1)} % 100 < 50),
       |hc AS (SELECT c_custkey, md5('fz|' || CAST(c_custkey AS VARCHAR)) AS hx
       |       FROM c),
       |par AS (SELECT c_custkey,
       |          ${hex4("hx", 1)} % 9 AS p1, ${hex4("hx", 5)} % 9 AS p2,
       |          ${hex4("hx", 9)} % 26 AS i1, ${hex4("hx", 13)} % 26 AS i2
       |        FROM hc),
       |probe AS (SELECT c.c_custkey AS probe_id,
       |            ($prefixChars) || substring(c_name, 10, 9) AS probe_name
       |          FROM c JOIN par ON par.c_custkey = c.c_custkey
       |          JOIN bkt ON bkt.c_custkey = c.c_custkey),
       |pk AS (${(0 until 3).map(j =>
        s"SELECT probe_id, $j AS j, ${chunk("probe_name", j)} AS v FROM probe")
        .mkString("\n       UNION ALL ")}),
       |ck AS (${(0 until 3).map(j =>
        s"SELECT c_custkey AS match_id, $j AS j, ${chunk("c_name", j)} AS v FROM c")
        .mkString("\n       UNION ALL ")}),
       |cand AS (SELECT DISTINCT probe_id, match_id
       |         FROM pk JOIN ck ON pk.j = ck.j AND pk.v = ck.v)""".stripMargin
  }

  private val duckFuzzy: String =
    s"""$duckFuzzyCtes
       |SELECT probe_id, match_id,
       |  CAST(levenshtein(probe_name, c_name) AS BIGINT) AS dist
       |FROM cand JOIN probe USING (probe_id)
       |JOIN c ON c.c_custkey = cand.match_id
       |WHERE levenshtein(probe_name, c_name) <= 2
       |ORDER BY probe_id, match_id""".stripMargin

  /** Jaro-Winkler re-score of the SAME blocked candidate set —
    * DuckDB's built-in `jaro_winkler_similarity` is the pinned
    * bit-exact twin of [[graft.functions.JaroWinkler]], so the full
    * double score column hash-checks. */
  private val duckFuzzyJw: String =
    s"""$duckFuzzyCtes
       |SELECT probe_id, match_id,
       |  jaro_winkler_similarity(probe_name, c_name) AS jw
       |FROM cand JOIN probe USING (probe_id)
       |JOIN c ON c.c_custkey = cand.match_id
       |WHERE jaro_winkler_similarity(probe_name, c_name) >= 0.9
       |ORDER BY probe_id, match_id""".stripMargin

  /** Brute-force oracle for the INDEL fuzzy join — deliberately NO
    * blocking to mirror (unlike [[duckFuzzy]]): the deletion-
    * neighborhood blocking is COMPLETE for levenshtein ≤ 2, so
    * DuckDB's independent cross-join + levenshtein answer must equal
    * the blocked result exactly — the oracle double-checks the
    * completeness theorem every round, not just the arithmetic. */
  private val duckFuzzyIndel: String = {
    def hex4(v: String, s: Int): String =
      (0 until 4).map(k =>
        s"(strpos('0123456789abcdef', substring($v, ${s + k}, 1)) - 1) * ${math.pow(16, 3 - k).toInt}")
        .mkString("(", " + ", ")")
    s"""WITH c AS (SELECT c_custkey, c_name FROM customer),
       |hb AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS hx
       |       FROM c),
       |bkt AS (SELECT c_custkey FROM hb WHERE ${hex4("hx", 1)} % 100 < 10),
       |hc AS (SELECT c_custkey, md5('fzi|' || CAST(c_custkey AS VARCHAR))
       |         AS hx
       |       FROM c),
       |par AS (SELECT c_custkey,
       |          ${hex4("hx", 1)} % 9 AS pd, ${hex4("hx", 5)} % 9 AS pi,
       |          ${hex4("hx", 9)} % 26 AS il
       |        FROM hc),
       |pr0 AS (SELECT c.c_custkey, c_name, pi, il,
       |          substring(c_name, 1, pd) ||
       |          substring(c_name, pd + 2, length(c_name)) AS delname
       |        FROM c JOIN par ON par.c_custkey = c.c_custkey
       |        JOIN bkt ON bkt.c_custkey = c.c_custkey),
       |probe AS (SELECT c_custkey AS probe_id,
       |            substring(delname, 1, pi)
       |              || substring('abcdefghijklmnopqrstuvwxyz', il + 1, 1)
       |              || substring(delname, pi + 1, length(delname))
       |              AS probe_name
       |          FROM pr0)
       |SELECT p.probe_id, c.c_custkey AS match_id,
       |  CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
       |FROM probe p CROSS JOIN c
       |WHERE levenshtein(p.probe_name, c.c_name) <= 2
       |ORDER BY probe_id, match_id""".stripMargin
  }

  /** 3-edit corruption brute-force oracle: the engine's segment
    * blocking is completeness-proven, so DuckDB independently
    * recomputes the FULL cross-join answer with no blocking to
    * mirror (the duckFuzzyIndel convention at a bucket<5 probe set,
    * which keeps the deliberate quadratic bounded). */
  private val duckFuzzyLev3: String = {
    def hex4(v: String, s: Int): String =
      (0 until 4).map(k =>
        s"(strpos('0123456789abcdef', substring($v, ${s + k}, 1)) - 1) * ${math.pow(16, 3 - k).toInt}")
        .mkString("(", " + ", ")")
    s"""WITH c AS (SELECT c_custkey, c_name FROM customer),
       |hb AS (SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS hx
       |       FROM c),
       |bkt AS (SELECT c_custkey FROM hb WHERE ${hex4("hx", 1)} % 100 < 5),
       |hc AS (SELECT c_custkey, md5('fz3|' || CAST(c_custkey AS VARCHAR))
       |         AS hx
       |       FROM c),
       |par AS (SELECT c_custkey,
       |          ${hex4("hx", 1)} % 9 AS pd, ${hex4("hx", 5)} % 9 AS pi,
       |          ${hex4("hx", 9)} % 26 AS il,
       |          ${hex4("hx", 13)} % 26 AS sl,
       |          ${hex4("hx", 17)} % 12 AS ps
       |        FROM hc),
       |pr0 AS (SELECT c.c_custkey, c_name, pi, il, sl, ps,
       |          substring(c_name, 1, pd) ||
       |          substring(c_name, pd + 2, length(c_name)) AS delname
       |        FROM c JOIN par ON par.c_custkey = c.c_custkey
       |        JOIN bkt ON bkt.c_custkey = c.c_custkey),
       |pr1 AS (SELECT c_custkey, sl, ps,
       |          substring(delname, 1, pi)
       |            || substring('abcdefghijklmnopqrstuvwxyz', il + 1, 1)
       |            || substring(delname, pi + 1, length(delname))
       |            AS insname
       |        FROM pr0),
       |probe AS (SELECT c_custkey AS probe_id,
       |            substring(insname, 1, ps)
       |              || substring('abcdefghijklmnopqrstuvwxyz', sl + 1, 1)
       |              || substring(insname, ps + 2, length(insname))
       |              AS probe_name
       |          FROM pr1)
       |SELECT p.probe_id, c.c_custkey AS match_id,
       |  CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
       |FROM probe p CROSS JOIN c
       |WHERE levenshtein(p.probe_name, c.c_name) <= 3
       |ORDER BY probe_id, match_id""".stripMargin
  }

  /** Perceptual-hash (aHash) oracle CTEs ending in
    * `s` = (doc_id, c0..c3): gray-PNG losslessness means decoded
    * pixels ≡ payload bytes (zero-padded to the 16-wide raster), so
    * every 8×8-pool cell sum is an `ord(substring(...))` window sum,
    * and each bit is the integer cross-multiplied mean comparison
    * ([[Multimodal.ahashChunks]]) — 64 generated cell expressions,
    * the `duckSimhash` build pattern. */
  private val duckPhashCtes: String = {
    def o(k: String) =
      s"(CASE WHEN $k <= nb THEN ord(substring(text, CAST($k AS INTEGER), 1)) ELSE 0 END)"
    def cellBit(i: Int, j: Int): String = {
      val r0 = s"($i * ht) // 8"
      val r1 = s"(${i + 1} * ht) // 8"
      val sm = s"COALESCE(list_sum(list_transform(range($r0, $r1), " +
        s"r -> ${o(s"r*16+${2 * j + 1}")} + ${o(s"r*16+${2 * j + 2}")})), 0)"
      s"CASE WHEN $sm * np > psum * ((($r1) - ($r0)) * 2) THEN 1 ELSE 0 END"
    }
    val chunkExprs = (0 until 4).map { k =>
      "CAST((" + (0 until 16).map { b =>
        val idx = 16 * k + b
        s"(${cellBit(idx / 8, idx % 8)}) * ${1 << b}"
      }.mkString("\n         + ") + s") AS INTEGER) AS c$k"
    }.mkString(",\n       ")
    s"""m AS (SELECT doc_id, text, length(text) AS nb,
       |        greatest(1, CAST(ceil(length(text) / 16.0) AS BIGINT)) AS ht,
       |        16 * greatest(1, CAST(ceil(length(text) / 16.0) AS BIGINT))
       |          AS np,
       |        COALESCE(list_sum(list_transform(range(1, length(text) + 1),
       |          i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0)
       |          AS psum
       |      FROM documents WHERE doc_id % 3 = 0),
       |s AS (SELECT doc_id, $chunkExprs FROM m)""".stripMargin
  }

  private val duckMediaPhash: String =
    s"""WITH $duckPhashCtes
       |SELECT doc_id, c0, c1, c2, c3 FROM s ORDER BY doc_id""".stripMargin

  /** Shared pigeonhole + exact-Hamming pair tail over any CTE chain
    * ending in `s` = (doc_id, c0..c3) — consumed by the image-aHash
    * and audio-envelope near-dup oracles (and structurally identical
    * to the simhash oracle's own tail). */
  private def duckChunkPairs(ctes: String): String = {
    val bandRows = (0 until 4).map(k =>
      s"SELECT doc_id, $k AS ck, c$k AS cv FROM s").mkString("\n       UNION ALL ")
    val hamming = (0 until 4).map(k =>
      s"bit_count(xor(sa.c$k, sb.c$k))").mkString(" + ")
    s"""WITH $ctes,
       |b AS ($bandRows),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b2.doc_id AS idb
       |      FROM b a JOIN b b2
       |        ON a.ck = b2.ck AND a.cv = b2.cv AND a.doc_id < b2.doc_id)
       |SELECT ida, idb, CAST($hamming AS BIGINT) AS hamming
       |FROM p JOIN s sa ON sa.doc_id = ida JOIN s sb ON sb.doc_id = idb
       |WHERE $hamming <= 3
       |ORDER BY ida, idb""".stripMargin
  }

  private val duckMediaPhashPairs: String = duckChunkPairs(duckPhashCtes)

  /** Audio envelope-fingerprint oracle CTEs ending in
    * `s` = (doc_id, c0..c3): 8-bit PCM WAV is lossless, so decoded
    * samples ≡ payload bytes with NO padding (n = nb) and each of
    * the 64 window sums is a 1-D `ord(substring(...))` range sum;
    * bits by the same integer cross-multiplied mean comparison
    * ([[Multimodal.afpChunks]]). */
  private val duckAfpCtes: String = {
    def winBit(w: Int): String = {
      val a = s"($w * nb) // 64"
      val b = s"(${w + 1} * nb) // 64"
      val sm = s"COALESCE(list_sum(list_transform(range($a, $b), " +
        "i -> ord(substring(text, CAST(i + 1 AS INTEGER), 1)))), 0)"
      s"CASE WHEN $sm * nb > psum * (($b) - ($a)) THEN 1 ELSE 0 END"
    }
    val chunkExprs = (0 until 4).map { k =>
      "CAST((" + (0 until 16).map { b =>
        s"(${winBit(16 * k + b)}) * ${1 << b}"
      }.mkString("\n         + ") + s") AS INTEGER) AS c$k"
    }.mkString(",\n       ")
    s"""m AS (SELECT doc_id, text, length(text) AS nb,
       |        COALESCE(list_sum(list_transform(range(1, length(text) + 1),
       |          i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0)
       |          AS psum
       |      FROM documents WHERE doc_id % 3 = 1),
       |s AS (SELECT doc_id, $chunkExprs FROM m)""".stripMargin
  }

  private val duckMediaAfp: String =
    s"""WITH $duckAfpCtes
       |SELECT doc_id, c0, c1, c2, c3 FROM s ORDER BY doc_id""".stripMargin

  private val duckMediaAfpPairs: String = duckChunkPairs(duckAfpCtes)

  /** SimHash oracle: rebuild the 4 × 16-bit chunk signatures from
    * substrings of md5(token) — the exact hash the Spark side uses
    * (leading 8 digest bytes, frequency-weighted bit votes), then the
    * same pigeonhole chunk-join + hamming ≤ 3 verification. Generated
    * (64 vote sums / 4 chunk reassemblies) rather than hand-written. */
  private val duckSimhash: String = {
    def hp(p: Int) = s"(strpos('0123456789abcdef', substring(hx, $p, 1)) - 1)"
    val chunkExprs = (0 until 4).map { k =>
      val b = 4 * k + 1
      s"CAST(${hp(b)} * 4096 + ${hp(b + 1)} * 256 + ${hp(b + 2)} * 16 + " +
        s"${hp(b + 3)} AS INTEGER) AS h$k"
    }.mkString(",\n       ")
    val voteExprs = (0 until 4).flatMap { k => (0 until 16).map { i =>
      s"SUM(CASE WHEN (h$k >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s${k}_$i"
    }}.mkString(",\n       ")
    val sigExprs = (0 until 4).map { k =>
      "(" + (0 until 16).map(i =>
        s"CASE WHEN s${k}_$i > 0 THEN ${1 << i} ELSE 0 END")
        .mkString(" + ") + s") AS c$k"
    }.mkString(",\n       ")
    val bandRows = (0 until 4).map(k =>
      s"SELECT doc_id, $k AS ck, c$k AS cv FROM s").mkString("\n       UNION ALL ")
    val hamming = (0 until 4).map(k =>
      s"bit_count(xor(sa.c$k, sb.c$k))").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
       |h AS (SELECT doc_id, md5(tok) AS hx FROM t),
       |c AS (SELECT doc_id, $chunkExprs FROM h),
       |v AS (SELECT doc_id, $voteExprs FROM c GROUP BY doc_id),
       |s AS (SELECT doc_id, $sigExprs FROM v),
       |b AS ($bandRows),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b2.doc_id AS idb
       |      FROM b a JOIN b b2
       |        ON a.ck = b2.ck AND a.cv = b2.cv AND a.doc_id < b2.doc_id)
       |SELECT ida, idb, CAST($hamming AS BIGINT) AS hamming
       |FROM p JOIN s sa ON sa.doc_id = ida JOIN s sb ON sb.doc_id = idb
       |WHERE $hamming <= 3
       |ORDER BY ida, idb""".stripMargin
  }

  /** ANN-LSH oracle: the hyperplanes are pure functions of
    * (plane index, dim) — [[Similarity.planeVals]] — so they embed as
    * literal DOUBLE arrays and DuckDB reproduces the exact signatures
    * (list_inner_product is bit-identical to the Spark-side sequential
    * dot product), bucket join, and cosine re-rank. The signature
    * WIDTH is n-derived ([[Similarity.lshBits]]: bit length of
    * ⌊(n−1)/16⌋, floor 4 — integer arithmetic both engines compute
    * identically via `length(bin(x))`), so the oracle pre-embeds
    * `oracleMaxBits` planes per table and gates each bit on j < bits;
    * 24 embedded planes cover corpora to 16·2²⁴ ≈ 268M vectors, and
    * this GENERATED text regrows mechanically beyond that. */
  /** Hyperplanes embedded per table in [[duckAnnLsh]] — covers corpora
    * to 16·2²⁴ ≈ 268M vectors; [[lshOracleGuard]] fails fast (with the
    * regrow instruction) if a fixture ever outgrows it, instead of the
    * oracle silently truncating signatures into an opaque hash
    * mismatch. */
  private val lshOracleMaxBits = 24

  /** Verify-time guard tying the oracle's embedded plane count to the
    * Scala-side width knob [[Similarity.lshBits]]. */
  private def lshOracleGuard(s: SparkSession, dir: String): Unit = {
    val n = Tables.memoizedCount(s, dir, "embeddings")
    val bits = Similarity.lshBits(n)
    require(bits <= lshOracleMaxBits,
      s"lshBits($n) = $bits exceeds the $lshOracleMaxBits hyperplanes " +
        "embedded per table in the duckAnnLsh oracle - regrow the " +
        "generated plane list (SparkEntry.lshOracleMaxBits)")
  }

  /** The LSH index rebuilt relationally — CTEs (e, w, sg, b):
    * embeddings as double vectors, the n-derived signature width,
    * per-table signatures from the embedded plane literals, and the
    * exploded (vec_id, tbl, sig) bucket rows. Shared prefix of every
    * LSH-derived oracle ([[duckAnnLsh]], the near-dup candidate
    * twin) so the index definition cannot drift between them. */
  /** One [[Similarity.planeVals]] hyperplane as a DuckDB literal. */
  private def duckPlaneLit(j: Int): String =
    graft.engine.Similarity.planeVals(j, 64)
      .mkString("[", ", ", "]::DOUBLE[]")

  private val duckLshIndexCtes: String = {
    val oracleMaxBits = lshOracleMaxBits
    val tables = Similarity.lshTables
    val stride = graft.engine.Similarity.lshPlaneStride
    def planeLit(j: Int): String = duckPlaneLit(j)
    val sigExprs = (0 until tables).map { t =>
      "CAST(" + (0 until oracleMaxBits).map { j =>
        s"CASE WHEN $j < w.bits AND " +
          s"list_inner_product(v, ${planeLit(t * stride + j)}) >= 0 " +
          s"THEN ${1L << j} ELSE 0 END"
      }.mkString("\n         + ") + s" AS BIGINT) AS s$t"
    }.mkString(",\n       ")
    val bandRows = (0 until tables).map(t =>
      s"SELECT vec_id, $t AS tbl, s$t AS sig FROM sg").mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |w AS (SELECT least(63, greatest(4,
       |         length(bin((count(*) - 1) // 16)))) AS bits FROM e),
       |sg AS (SELECT vec_id, $sigExprs FROM e CROSS JOIN w),
       |b AS ($bandRows)""".stripMargin
  }

  private val duckAnnLsh: String =
    s"""$duckLshIndexCtes,
       |q AS (SELECT vec_id AS qid, tbl,
       |        unnest(list_prepend(sig, list_transform(range(w.bits),
       |          j -> xor(sig, CAST(1 AS BIGINT) << CAST(j AS INTEGER)))))
       |          AS psig
       |      FROM b CROSS JOIN w WHERE vec_id < 50),
       |cand AS (SELECT DISTINCT q.qid, b.vec_id AS nid
       |         FROM b JOIN q ON b.tbl = q.tbl AND b.sig = q.psig
       |                      AND b.vec_id <> q.qid),
       |s AS (SELECT qid, nid,
       |        list_inner_product(eq.v, en.v)
       |          / (sqrt(list_inner_product(eq.v, eq.v))
       |             * sqrt(list_inner_product(en.v, en.v))) AS score
       |      FROM cand
       |      JOIN e eq ON eq.vec_id = qid
       |      JOIN e en ON en.vec_id = nid),
       |r AS (SELECT qid, nid, score,
       |        row_number() OVER (PARTITION BY qid
       |                           ORDER BY score DESC, nid) AS rank
       |      FROM s)
       |SELECT qid, nid, rank, score FROM r
       |WHERE rank <= 3
       |ORDER BY qid, rank""".stripMargin

  /** LSH-candidate near-dup oracle: pairs within Hamming distance 1
    * in any table (exact bucket + single-bit probe fan on one side),
    * exact cosine, the shared [[Similarity.nearDupCosFloor]] cut —
    * the same index CTEs as [[duckAnnLsh]]. The fan is the near-dup
    * Hamming-≤2 one ([[Similarity.lshNearDupFan]]): exact bucket,
    * every single-bit flip, every two-bit flip (j > k). */
  private val duckEmbedNearDupAnn: String =
    s"""$duckLshIndexCtes,
       |pb AS (SELECT vec_id, tbl,
       |        unnest(list_concat(list_prepend(sig,
       |          list_transform(range(w.bits),
       |            j -> xor(sig, CAST(1 AS BIGINT) << CAST(j AS INTEGER)))),
       |          flatten(list_transform(range(1, w.bits), j ->
       |            list_transform(range(j), k ->
       |              xor(sig, (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
       |                       | (CAST(1 AS BIGINT) << CAST(k AS INTEGER))))))))
       |          AS psig
       |       FROM b CROSS JOIN w),
       |cand AS (SELECT DISTINCT x.vec_id AS ida, pb.vec_id AS idb
       |         FROM b x JOIN pb ON x.tbl = pb.tbl AND x.sig = pb.psig
       |                         AND x.vec_id < pb.vec_id),
       |s AS (SELECT ida, idb,
       |        list_inner_product(ea.v, eb.v)
       |          / (sqrt(list_inner_product(ea.v, ea.v))
       |             * sqrt(list_inner_product(eb.v, eb.v))) AS cos
       |      FROM cand
       |      JOIN e ea ON ea.vec_id = ida
       |      JOIN e eb ON eb.vec_id = idb)
       |SELECT ida, idb, cos FROM s
       |WHERE cos >= ${Similarity.nearDupCosFloor}
       |ORDER BY ida, idb""".stripMargin

  /** ANN-IVF oracle (shared with the RRF fusion oracle). The cell
    * count is n-derived — ⌈√n⌉, floor 16 ([[Similarity.ivfCells]]) —
    * recomputed as a scalar subquery on the same double sqrt both
    * engines evaluate identically; the literal-path twin
    * (`q_ann_ivf_lit`) pins k = 16, the largest width the unrolled
    * literal argmax auto-selects. */
  private val duckAnnIvfTail: String =
    """
      |a AS (SELECT e.vec_id, c.cid,
      |        row_number() OVER (PARTITION BY e.vec_id
      |          ORDER BY list_inner_product(e.v, c.cv) DESC, c.cid) AS rn
      |      FROM e CROSS JOIN c),
      |assign AS (SELECT vec_id, cid FROM a WHERE rn = 1),
      |p AS (SELECT e.vec_id AS qid, c.cid,
      |        row_number() OVER (PARTITION BY e.vec_id
      |          ORDER BY list_inner_product(e.v, c.cv) DESC, c.cid) AS rn
      |      FROM e CROSS JOIN c WHERE e.vec_id < 50),
      |probes AS (SELECT qid, cid FROM p WHERE rn <= 2),
      |cand AS (SELECT qid, a2.vec_id AS nid
      |         FROM probes JOIN assign a2 USING (cid)
      |         WHERE a2.vec_id <> qid),
      |s AS (SELECT qid, nid,
      |        list_inner_product(eq.v, en.v)
      |          / (sqrt(list_inner_product(eq.v, eq.v))
      |             * sqrt(list_inner_product(en.v, en.v))) AS score
      |      FROM cand
      |      JOIN e eq ON eq.vec_id = qid
      |      JOIN e en ON en.vec_id = nid),
      |r AS (SELECT qid, nid, score,
      |        row_number() OVER (PARTITION BY qid
      |                           ORDER BY score DESC, nid) AS rank
      |      FROM s)
      |SELECT qid, nid, rank, score FROM r
      |WHERE rank <= 3
      |ORDER BY qid, rank""".stripMargin

  private def duckAnnIvfWithK(kSql: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |c AS (SELECT vec_id AS cid, v AS cv FROM e
      |      WHERE vec_id < $kSql),""".stripMargin + duckAnnIvfTail
  private val duckAnnIvf: String = duckAnnIvfWithK(
    "(SELECT greatest(16,\n" +
      "        CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM e)")
  // interpolated from the Scala knob, NOT hardcoded: retuning
  // literalArgminMaxK must move the oracle with the qAnnIvfLit twin
  private val duckAnnIvf16: String =
    duckAnnIvfWithK(Similarity.literalArgminMaxK.toString)

  /** RRF-fusion oracle — both ANN oracles ride along as CTEs; shared
    * by `q_ann_fused` and the recall audit. */
  private val duckAnnFused: String =
    s"""WITH lsh AS ($duckAnnLsh),
      |ivf AS ($duckAnnIvf),
      |u AS (SELECT qid, nid, rank FROM lsh
      |      UNION ALL SELECT qid, nid, rank FROM ivf),
      |sc AS (SELECT qid, nid,
      |         SUM(1.0::DOUBLE / (rank + 60)) AS rrf
      |       FROM u GROUP BY 1, 2),
      |r AS (SELECT qid, nid, rrf,
      |        row_number() OVER (PARTITION BY qid
      |                           ORDER BY rrf DESC, nid) AS rank
      |      FROM sc)
      |SELECT qid, nid, rank, rrf FROM r
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Media-features oracle: payloads are the UTF-8 bytes of the
    * (pure-ASCII) document text, so `ord()` per character recomputes
    * the decode stub's byte sums and 16-bin histogram exactly. */
  private val duckMediaFeatures: String = {
    val histSel = (0 until 16).map(i =>
      s"CAST(SUM(h$i) AS BIGINT) AS h$i").mkString(",\n       ")
    val histPer = (0 until 16).map(i =>
      s"len(list_filter(bs, x -> x // 16 = $i)) AS h$i").mkString(",\n       ")
    s"""WITH m AS (
       |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1]
       |           AS media_type,
       |         length(text) AS nb,
       |         list_transform(range(1, length(text) + 1),
       |           i -> ord(substring(text, CAST(i AS INTEGER), 1))) AS bs
       |  FROM documents),
       |p AS (SELECT media_type, nb,
       |        COALESCE(list_sum(bs), 0) AS bsum,
       |       $histPer
       |      FROM m)
       |SELECT media_type, COUNT(*) AS n,
       |  CAST(SUM(nb) AS BIGINT) AS total_bytes,
       |  CAST(SUM(bsum) AS BIGINT) AS sum_bytes,
       |  CAST(SUM(bsum) AS DOUBLE) / SUM(nb) AS mean_byte,
       |  $histSel
       |FROM p
       |GROUP BY media_type
       |ORDER BY media_type""".stripMargin
  }

  /** DuckDB oracle SQL per query key (same parquet tables, registered
    * by table name). Complete since r18: every registered query has
    * an oracle (the HLL sketch row ships its error bound as a
    * boolean the oracle asserts from the exact side).
    */
  def oracleSql: Map[String, String] = {
    val m = oracleSqlBase
    // the r18 sharded twins are row-identical to their flat-window
    // originals BY CONSTRUCTION — they ride the same oracle, so any
    // decomposition slip (lost carry, wrong tie order, ntile formula
    // drift) breaks the hash against the independent window form
    m ++ Map(
      "q_window_pct_sharded" -> m("q_window_pct"),
      "q_rfm_sharded" -> m("q_rfm"),
      "q_quality_calibrated_sharded" -> m("q_quality_calibrated"))
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q_simhash_pairs" -> duckSimhash,
    "q_ann_lsh" -> duckAnnLsh,
    "q_embed_neardup_ann" -> duckEmbedNearDupAnn,
    "q_media_features" -> duckMediaFeatures,
    // the real-codec round-trip: a 16-wide zero-padded grayscale PNG
    // is lossless, so decoded raster stats ≡ payload byte stats —
    // recomputable from the text with ord() like q_media_features
    "q_media_decode" ->
      """WITH m AS (
        |  SELECT doc_id, length(text) AS nb,
        |    COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0) AS psum
        |  FROM documents WHERE doc_id % 3 = 0),
        |d AS (SELECT doc_id, psum,
        |        greatest(1, CAST(ceil(nb / 16.0) AS BIGINT)) AS ht
        |      FROM m)
        |SELECT doc_id, CAST(16 AS INTEGER) AS width,
        |  CAST(ht AS INTEGER) AS height,
        |  16 * ht AS n_pixels,
        |  CAST(psum AS BIGINT) AS pixel_sum,
        |  CAST(psum AS DOUBLE) / (16 * ht) AS mean_px
        |FROM d ORDER BY doc_id""".stripMargin,
    // the real per-frame video round-trip: per-frame gray-PNG
    // losslessness means pixel_sum ≡ payload byte sum, and n_pixels
    // follows from the container geometry alone — 64-byte frames as
    // 16-wide rasters, the last (or only) frame zero-padded to a
    // whole row, an empty payload one blank 16×1 frame
    "q_media_video" ->
      """WITH m AS (
        |  SELECT doc_id, length(text) AS nb,
        |    COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0) AS psum
        |  FROM documents WHERE doc_id % 3 = 2),
        |d AS (SELECT doc_id, psum,
        |        greatest(1, CAST(ceil(nb / 64.0) AS BIGINT)) AS nf, nb
        |      FROM m),
        |p AS (SELECT doc_id, psum, nf,
        |        (nf - 1) * 64 + 16 * greatest(1,
        |          CAST(ceil((nb - (nf - 1) * 64) / 16.0) AS BIGINT)) AS np
        |      FROM d)
        |SELECT doc_id, nf AS n_frames, np AS n_pixels,
        |  CAST(psum AS BIGINT) AS pixel_sum,
        |  CAST(psum AS DOUBLE) / np AS mean_px
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_media_phash" -> duckMediaPhash,
    "q_media_phash_pairs" -> duckMediaPhashPairs,
    "q_media_afp" -> duckMediaAfp,
    "q_media_afp_pairs" -> duckMediaAfpPairs,
    "q_ingest_partition" ->
      """SELECT event_id, user_id, event_type, value,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  strftime(ts, '%Y-%m-%d') AS logday,
        |  strftime(ts, '%H') AS h,
        |  strftime(ts, '%M') AS m
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_having" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 1000
        |ORDER BY l_partkey""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(DISTINCT l_suppkey) AS nd_supps,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
        |  COALESCE(o_orderstatus, 'ALL') AS st,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY seg, st""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_counts" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_broadcast_dim" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |WHERE p_retailprice >
        |  (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |   FROM part) * 1.05
        |ORDER BY p_partkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders
        |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  NTILE(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS od,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY epoch_us(o_orderdate) // 86400000000
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS rev_30d
        |FROM orders
        |ORDER BY o_custkey, od, o_orderkey""".stripMargin,
    "q_asof_join" ->
      """WITH o AS (SELECT o_custkey AS k,
        |             epoch_us(o_orderdate) // 1000000 AS t,
        |             max(o_orderkey) AS oid
        |           FROM orders GROUP BY 1, 2),
        |e AS (SELECT user_id AS k,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t, event_id
        |      FROM events)
        |SELECT e.event_id, e.k, o.oid
        |FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t >= o.t
        |ORDER BY event_id""".stripMargin,
    "q_gini_concentration" ->
      """WITH s AS (SELECT user_id,
        |         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |           AS s
        |       FROM events GROUP BY 1),
        |r AS (SELECT s,
        |        row_number() OVER (ORDER BY s, user_id) AS i FROM s),
        |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(s) AS HUGEINT) AS ssum,
        |        CAST(sum(CAST(i AS HUGEINT) * s) AS HUGEINT) AS sis
        |      FROM r)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST(ssum AS BIGINT) AS total_milli,
        |  CAST((1000000 * (2 * sis - (n + 1) * ssum)) // (n * ssum)
        |    AS BIGINT) AS gini_micro
        |FROM a""".stripMargin,
    // independent formulation: TWO DuckDB ASOF joins (backward >=,
    // strictly-forward <) against the engine's one-pass union+window
    "q_asof_nearest" ->
      """WITH ev AS (SELECT user_id AS k,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t,
        |         event_id, event_type
        |       FROM events),
        |o AS (SELECT k, t, max(event_id) AS oid FROM ev
        |      WHERE event_type = 'click' GROUP BY 1, 2),
        |e AS (SELECT k, t, event_id FROM ev
        |      WHERE event_type = 'purchase'),
        |p AS (SELECT e.event_id, e.k, e.t, o.t AS pt, o.oid AS poid
        |      FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t >= o.t),
        |nx AS (SELECT e.event_id, o.t AS nt, o.oid AS noid
        |       FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t < o.t),
        |j AS (SELECT p.event_id, p.k,
        |        p.t - p.pt AS dtp, nx.nt - p.t AS dtn, p.poid, nx.noid
        |      FROM p JOIN nx USING (event_id)),
        |d AS (SELECT *,
        |        (dtp IS NOT NULL AND dtp <= 14400 AND
        |         (dtn IS NULL OR dtp <= dtn OR dtn > 14400)) AS pick_prev,
        |        (dtn IS NOT NULL AND dtn <= 14400) AS maybe_next
        |      FROM j)
        |SELECT event_id, k,
        |  CASE WHEN pick_prev THEN poid
        |       WHEN maybe_next THEN noid END AS oid,
        |  CASE WHEN pick_prev THEN -dtp
        |       WHEN maybe_next THEN dtn END AS dt_sec
        |FROM d ORDER BY event_id""".stripMargin,
    // strict as-of: DuckDB's native ASOF LEFT JOIN with the `>`
    // comparator — the engine's swapped-side-tag carry, independently
    // formulated; 10-minute buckets keep the exact-boundary branch
    // live at every SF
    "q_asof_strict" ->
      """WITH ev AS (SELECT user_id AS k,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 600000000 AS t,
        |         event_id, event_type
        |       FROM events),
        |o AS (SELECT k, t, max(event_id) AS oid FROM ev
        |      WHERE event_type = 'click' GROUP BY 1, 2),
        |e AS (SELECT k, t, event_id FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT e.event_id, e.k, o.oid
        |FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.t > o.t
        |ORDER BY event_id""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
        |  percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // epoch_us // 1000000 truncates like Spark's timestamp→long cast
    // (CAST(epoch(ts) AS BIGINT) would ROUND and shift gap boundaries)
    "q_sessionize_batch" ->
      """WITH e AS (SELECT user_id, event_id,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s
        |           FROM events),
        |m AS (SELECT user_id, event_id, s,
        |        CASE WHEN LAG(s) OVER w IS NULL OR s - LAG(s) OVER w > 1800
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
        |x AS (SELECT user_id, s,
        |        SUM(ns) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM m)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
        |  min(s) AS start_s, max(s) - min(s) AS dur_s
        |FROM x
        |GROUP BY user_id, sess
        |ORDER BY user_id, sess""".stripMargin,
    // ts comparisons (here and in q_funnel below) work on the
    // ns→µs-truncated timestamps on both sides (same contract as
    // q_sessionize_batch)
    "q_time_bucket" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS bucket,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    // decay anchored at corpus max ts; BIGINT µs floor-division ages,
    // shifted-power-of-two weights, centi-unit values — all integer,
    // so the sum is engine- and order-exact (CAST per the HUGEINT ban)
    "q_decay_trend" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS tu FROM events)
        |SELECT event_type, count(*) AS n_recent,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)
        |    * (CAST(1 AS BIGINT)
        |       << CAST(23 - (tu - epoch_us(ts)) // 3600000000 AS INTEGER)))
        |    AS BIGINT) AS score
        |FROM events, m
        |WHERE (tu - epoch_us(ts)) // 3600000000 < 24
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // the oracle is the FULL single-pass leaderboard — equality with
    // the stored-k ∪ batch-k re-rank IS the mergeability claim
    "q_topk_incremental" ->
      """SELECT event_type, rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rank
        |  FROM events) t
        |WHERE rank <= 3
        |ORDER BY event_type, rank""".stripMargin,
    // integer month index (year*12+month) keeps the cell keys exact —
    // fractional month arithmetic would not round identically
    "q_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
        |           GROUP BY user_id),
        |c AS (SELECT user_id,
        |        strftime(date_trunc('month', first_ts), '%Y-%m') AS cohort,
        |        year(first_ts) * 12 + month(first_ts) AS m0
        |      FROM f)
        |SELECT c.cohort,
        |  CAST(year(e.ts) * 12 + month(e.ts) - c.m0 AS BIGINT) AS age,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort, age""".stripMargin,
    // the same integer-packed argmax (f·10^10 − key) as the Spark
    // side — neither engine's native arg_max pins its tie-break
    "q_skew_report" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
      val parts = cols.map { k =>
        s"""(SELECT '$k' AS key_col,
           |  CAST(sum(f) AS BIGINT) AS n_rows,
           |  count(*) AS n_keys,
           |  CAST(max(f) AS BIGINT) AS max_freq,
           |  CAST(max(f * 10000000000 - key) AS BIGINT) AS pk
           | FROM (SELECT $k AS key, count(*) AS f FROM lineitem
           |       GROUP BY 1))""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT key_col, n_rows, n_keys,
         |  max_freq * 10000000000 - pk AS hottest_key, max_freq,
         |  CAST(max_freq AS DOUBLE) * n_keys / n_rows AS skew_ratio
         |FROM ($parts)
         |ORDER BY key_col""".stripMargin
    },
    "q_month_spine" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |spine(m) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE)
        |  FROM spine, bounds WHERE m < hi),
        |agg AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           AS sum_price
        |  FROM orders GROUP BY 1)
        |SELECT CAST(spine.m AS VARCHAR) AS month,
        |  COALESCE(agg.n, 0) AS n,
        |  COALESCE(agg.sum_price, 0.0) AS sum_price
        |FROM spine LEFT JOIN agg ON spine.m = agg.m
        |ORDER BY month""".stripMargin,
    "q_lateral_topn" ->
      """SELECT p.o_orderpriority, l.o_orderkey, l.o_totalprice
        |FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_orderpriority = p.o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |ORDER BY p.o_orderpriority, l.o_totalprice DESC, l.o_orderkey"""
        .stripMargin,
    "q_unpivot" ->
      """SELECT rf, m AS measure, v AS value FROM (
        |  SELECT l_returnflag AS rf,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc
        |  FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (v FOR m IN (qty, price, disc))
        |ORDER BY rf, measure""".stripMargin,
    // the bound-query convention: exact distinct counts + TRUE — a
    // sketch-union regression breaks the hash
    "q_distinct_incremental" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS nd_users,
        |  TRUE AS within_3pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // the MV-merge must equal the FULL single-pass rollup — that
    // equality IS the view-maintenance correctness claim, so the
    // oracle is deliberately the full pass, not a partials rebuild
    "q_agg_incremental" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS bucket,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    // each event replicated into its 4 overlapping hop windows
    "q_hop_window" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - t.j * INTERVAL '15 minutes' AS w,
        |         event_type, value
        |  FROM events CROSS JOIN range(4) AS t(j))
        |SELECT CAST(w AS VARCHAR) AS bucket, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    // the maintenance claim: merged MV partials ≡ the full one-pass
    // join-agg — so the oracle is deliberately the full recompute
    "q_join_incremental" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY month, o_orderpriority""".stripMargin,
    // deliberately the quadratic NOT EXISTS formulation — an oracle
    // that shares none of the prefix-scan machinery
    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part a
        |  WHERE a.p_retailprice <= b.p_retailprice
        |    AND a.p_size >= b.p_size
        |    AND (a.p_retailprice < b.p_retailprice
        |         OR a.p_size > b.p_size))
        |ORDER BY p_partkey""".stripMargin,
    // flat global-window recompute of the sweep step function — the
    // Spark side's sharded scan shares none of this
    "q_interval_sweep" ->
      """WITH span AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
        |         CAST(max(l_shipdate) AS DATE) AS e
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |d AS (SELECT s AS day, 1 AS delta FROM span
        |      UNION ALL SELECT e + 1, -1 FROM span),
        |g AS (SELECT day, sum(delta) AS delta FROM d GROUP BY 1)
        |SELECT CAST(day AS VARCHAR) AS day,
        |  CAST(sum(delta) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
        |FROM g ORDER BY day""".stripMargin,
    "q_join_card" -> duckJoinCard,
    // χ² per-source language-mix divergence: present-rows-only via
    // χ² = 1 + Σ_present[(p−q)²/q − q], pico-quantized per term
    // before the integer sum (the q_correlation discipline)
    "q_chi2_divergence" ->
      """WITH sl AS (SELECT source, lang, count(*) AS c
        |            FROM documents GROUP BY 1, 2),
        |bs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
        |       FROM sl GROUP BY 1),
        |bl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nl
        |       FROM sl GROUP BY 1),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |t0 AS (SELECT sl.source, bs.ns,
        |         CAST(sl.c AS DOUBLE) / CAST(bs.ns AS DOUBLE) AS p,
        |         CAST(bl.nl AS DOUBLE) / CAST(nn.n_docs AS DOUBLE) AS q
        |       FROM sl JOIN bs USING (source) JOIN bl USING (lang)
        |       CROSS JOIN nn),
        |t AS (SELECT source, ns,
        |        CAST(round(((p - q) * (p - q) / q - q)
        |          * 1000000000000.0) AS BIGINT) AS t
        |      FROM t0)
        |SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) + 1000000000000 AS chi2_pico
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q_diversity" ->
      """WITH s AS (SELECT lang, source, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |pl AS (SELECT lang, SUM(c) AS n,
        |         SUM(CAST(c AS HUGEINT) * c) AS c2,
        |         count(*) AS n_sources
        |       FROM s GROUP BY 1),
        |ov AS (SELECT '*' AS lang, SUM(c) AS n,
        |         SUM(CAST(c AS HUGEINT) * c) AS c2,
        |         count(*) AS n_sources
        |       FROM (SELECT source, SUM(c) AS c FROM s GROUP BY 1)),
        |u AS (SELECT * FROM pl UNION ALL SELECT * FROM ov)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs, n_sources,
        |  1 - CAST(c2 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS diversity
        |FROM u ORDER BY lang""".stripMargin,
    "q_outliers_robust" ->
      """WITH med AS (
        |  SELECT event_type,
        |    percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS median
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, m.median,
        |    percentile_cont(0.5) WITHIN GROUP
        |      (ORDER BY abs(e.value - m.median)) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY 1, 2)
        |SELECT e.event_type, m.median, m.mad,
        |  CAST(SUM(CASE WHEN abs(e.value - m.median) > 3 * 1.4826 * m.mad
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM events e JOIN mad m ON e.event_type = m.event_type
        |GROUP BY 1, 2, 3
        |ORDER BY e.event_type""".stripMargin,
    // Seasonal volume anomalies: zero-filled hour spine, hour-of-day
    // median/MAD baseline; counts are integers so every percentile
    // interpolation is an exact .5 multiple in both engines.
    "q_anomaly_series" ->
      """WITH ev AS (SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
        |       FROM events),
        |rng AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |spine AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
        |          FROM ty, rng),
        |cnt AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
        |        FROM ev GROUP BY 1, 2),
        |ser AS (SELECT s.event_type, s.h, COALESCE(cnt.c, 0) AS c,
        |          s.h % 24 AS hod
        |        FROM spine s LEFT JOIN cnt
        |          ON cnt.event_type = s.event_type AND cnt.h = s.h),
        |med AS (SELECT event_type, hod,
        |          percentile_cont(0.5) WITHIN GROUP (ORDER BY c) AS med
        |        FROM ser GROUP BY 1, 2),
        |mad AS (SELECT ser.event_type, ser.hod, med.med,
        |          percentile_cont(0.5) WITHIN GROUP
        |            (ORDER BY abs(c - med)) AS mad
        |        FROM ser JOIN med USING (event_type, hod)
        |        GROUP BY 1, 2, 3)
        |SELECT ser.event_type, ser.h, ser.c, mad.med, mad.mad,
        |  (abs(ser.c - mad.med) > 3 * 1.4826 * mad.mad) AS is_anom
        |FROM ser JOIN mad
        |  ON mad.event_type = ser.event_type AND mad.hod = ser.hod
        |ORDER BY ser.event_type, ser.h""".stripMargin,
    "q_dq_checks" ->
      """WITH checks AS (
        |  SELECT 'pk_orders_unique' AS "check",
        |    count(*) - count(DISTINCT o_orderkey) AS n_bad FROM orders
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders',
        |    (SELECT count(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM orders
        |                       WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'not_null_custkey',
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'range_quantity',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_quantity <= 0 OR l_quantity > 100)
        |  UNION ALL
        |  SELECT 'range_discount',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_discount < 0 OR l_discount >= 1))
        |SELECT "check", CAST(n_bad AS BIGINT) AS n_bad,
        |  n_bad = 0 AS passed
        |FROM checks ORDER BY "check"""".stripMargin,
    // integer-quantized moments (X = round(100x), Y = round(1e4*y)):
    // exact HUGEINT accumulation, correctly-rounded double casts,
    // one fixed IEEE expression — no per-row double->decimal cast
    // whose rounding the engines could disagree on
    "q_correlation" ->
      """WITH b AS (SELECT l_returnflag,
        |             CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |             CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |                  AS BIGINT) AS y
        |           FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |        CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        |      FROM b GROUP BY 1),
        |mm AS (SELECT l_returnflag, n,
        |         n * sxy - sx * sy AS num,
        |         sqrt(greatest(n * sxx - sx * sx, 0)
        |              * greatest(n * syy - sy * sy, 0)) AS den
        |       FROM m)
        |SELECT l_returnflag, n,
        |  CASE WHEN den = 0 THEN NULL ELSE num / den END AS r
        |FROM mm ORDER BY l_returnflag""".stripMargin,
    // OLS trend: the same exact-moment discipline; X = epoch seconds
    // since 2024-01-01, Y = round(1e4*value); slope/day, intercept,
    // r^2 are fixed IEEE expressions over the exact sums
    "q_ols_trend" ->
      """WITH b AS (SELECT event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |               - 1704067200 AS x,
        |             CAST(round(value * 10000) AS BIGINT) AS y
        |           FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |        CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        |      FROM b GROUP BY 1),
        |mm AS (SELECT event_type, n,
        |         n * sxy - sx * sy AS num,
        |         n * sxx - sx * sx AS denx,
        |         n * syy - sy * sy AS deny, sx, sy
        |       FROM m)
        |SELECT event_type, n,
        |  CASE WHEN denx <= 0 THEN NULL
        |       ELSE num / denx * 86400.0 / 10000.0 END AS slope_per_day,
        |  CASE WHEN denx <= 0 THEN NULL
        |       ELSE (sy - num / denx * sx) / n / 10000.0 END AS intercept,
        |  CASE WHEN denx <= 0 OR deny <= 0 THEN NULL
        |       ELSE num * num / (denx * deny) END AS r2
        |FROM mm ORDER BY event_type""".stripMargin,
    // Welch t: same exact-moment discipline, arms by user parity,
    // FILTER counts (BIGINT by construction), fixed IEEE t/df
    "q_ab_test" ->
      """WITH b AS (SELECT event_type, user_id % 2 AS arm,
        |             CAST(round(value * 10000) AS BIGINT) AS y
        |           FROM events),
        |m AS (SELECT event_type,
        |        count(*) FILTER (WHERE arm = 0) AS n0,
        |        count(*) FILTER (WHERE arm = 1) AS n1,
        |        CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS DOUBLE)
        |          AS s0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS DOUBLE)
        |          AS s1,
        |        CAST(SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y
        |                 ELSE 0 END) AS DOUBLE) AS ss0,
        |        CAST(SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y
        |                 ELSE 0 END) AS DOUBLE) AS ss1
        |      FROM b GROUP BY 1),
        |mm AS (SELECT event_type, n0, n1,
        |         s0 / n0 AS m0, s1 / n1 AS m1,
        |         (ss0 - s0 * s0 / n0) / (n0 - 1) AS v0,
        |         (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1
        |       FROM m),
        |z AS (SELECT event_type, n0, n1, m0, m1, v0, v1,
        |        v0 / n0 + v1 / n1 AS se2
        |      FROM mm)
        |SELECT event_type, n0, n1,
        |  CASE WHEN n0 = 0 THEN NULL ELSE m0 / 10000.0 END AS mean_a,
        |  CASE WHEN n1 = 0 THEN NULL ELSE m1 / 10000.0 END AS mean_b,
        |  CASE WHEN n0 <= 1 OR n1 <= 1 OR se2 <= 0 THEN NULL
        |       ELSE (m0 - m1) / sqrt(se2) END AS t_welch,
        |  CASE WHEN n0 <= 1 OR n1 <= 1 OR se2 <= 0 THEN NULL
        |       ELSE se2 * se2
        |            / (v0 / n0 * (v0 / n0) / (n0 - 1)
        |               + v1 / n1 * (v1 / n1) / (n1 - 1)) END AS df_welch
        |FROM z ORDER BY event_type""".stripMargin,
    // Last-touch attribution: the strictly-prior ignore-nulls carry,
    // epoch-micros times, integer-div gap, whole-row staleness cut
    "q_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
        |           FROM events),
        |c AS (SELECT *,
        |        last_value(CASE WHEN event_type IN ('click', 'view')
        |                        THEN event_id END IGNORE NULLS)
        |          OVER w AS touch_id,
        |        last_value(CASE WHEN event_type IN ('click', 'view')
        |                        THEN event_type END IGNORE NULLS)
        |          OVER w AS touch_type,
        |        last_value(CASE WHEN event_type IN ('click', 'view')
        |                        THEN t_us END IGNORE NULLS)
        |          OVER w AS touch_t_us
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT *, touch_id IS NOT NULL
        |        AND t_us - touch_t_us <= ${Relational.attributionWindowSec}000000
        |          AS fresh
        |      FROM c WHERE event_type = 'purchase')
        |SELECT event_id AS purchase_id, user_id, t_us AS purchase_t_us,
        |  value,
        |  CASE WHEN fresh THEN touch_id END AS touch_id,
        |  CASE WHEN fresh THEN touch_type END AS touch_type,
        |  CASE WHEN fresh THEN (t_us - touch_t_us) // 1000000 END AS gap_s
        |FROM p ORDER BY purchase_id""".stripMargin,
    // SCD2: state-change collapse + validity intervals; epoch-micros
    // BIGINT bounds (the no-raw-TIMESTAMP oracle convention)
    "q_scd2" ->
      """WITH c AS (SELECT user_id, event_type, ts, event_id,
        |        lag(event_type) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS prev_state
        |      FROM events),
        |f AS (SELECT user_id, event_type, ts, event_id FROM c
        |      WHERE prev_state IS NULL OR event_type <> prev_state),
        |s AS (SELECT user_id, event_type AS state,
        |        epoch_us(ts) AS valid_from_us,
        |        epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id))
        |          AS valid_to_us
        |      FROM f)
        |SELECT user_id, state, valid_from_us, valid_to_us,
        |  valid_to_us IS NULL AS is_current
        |FROM s ORDER BY user_id, valid_from_us""".stripMargin,
    // the SCD2 point-in-time consumer: state as of a fixed UTC
    // instant, pure integer micros comparisons
    "q_scd2_snapshot" ->
      """WITH c AS (SELECT user_id, event_type, ts, event_id,
        |        lag(event_type) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS prev_state
        |      FROM events),
        |f AS (SELECT user_id, event_type, ts, event_id FROM c
        |      WHERE prev_state IS NULL OR event_type <> prev_state),
        |s AS (SELECT user_id, event_type AS state,
        |        epoch_us(ts) AS valid_from_us,
        |        epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id))
        |          AS valid_to_us
        |      FROM f)
        |SELECT user_id, state, valid_from_us FROM s
        |WHERE valid_from_us <= 1705276800000000
        |  AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
        |ORDER BY user_id""".stripMargin,
    // order-independent 48-bit-hash-sum checksums; the strpos
    // polynomial reproduces conv(substr(md5, 1, 12), 16, 10)
    "q_table_checksum" -> {
      val terms = (0 until 12).map(k =>
        s"(strpos('0123456789abcdef', substring(hx, ${k + 1}, 1)) - 1) * " +
          (1L << (4 * (11 - k))).toString)
        .mkString("(", "\n        + ", ")")
      s"""WITH cu AS (SELECT md5(concat_ws('|', c_custkey, c_name)) AS h
         |            FROM customer),
         |li AS (SELECT md5(concat_ws('|', l_orderkey, l_linenumber,
         |         l_returnflag, strftime(l_shipdate, '%Y-%m-%d'))) AS h
         |       FROM lineitem),
         |os AS (SELECT md5(concat_ws('|', o_orderkey, o_custkey,
         |         o_orderstatus, strftime(o_orderdate, '%Y-%m-%d'))) AS h
         |       FROM orders),
         |u AS (SELECT 'customer' AS table_name, substring(h, 1, 12) AS hx
         |        FROM cu
         |      UNION ALL
         |      SELECT 'lineitem', substring(h, 1, 12) FROM li
         |      UNION ALL
         |      SELECT 'orders', substring(h, 1, 12) FROM os),
         |v AS (SELECT table_name,
         |        $terms AS hv
         |      FROM u)
         |SELECT table_name, count(*) AS n_rows,
         |  CAST(SUM(hv) % 2305843009213693952 AS BIGINT) AS checksum
         |FROM v GROUP BY table_name ORDER BY table_name""".stripMargin
    },
    // incremental checksum: the oracle is deliberately the FULL
    // single-pass recompute — equality IS the maintenance claim
    "q_checksum_incremental" -> {
      val terms = (0 until 12).map(k =>
        s"(strpos('0123456789abcdef', substring(hx, ${k + 1}, 1)) - 1) * " +
          (1L << (4 * (11 - k))).toString)
        .mkString("(", "\n        + ", ")")
      s"""WITH li AS (SELECT substring(md5(concat_ws('|', l_orderkey,
         |         l_linenumber, l_returnflag,
         |         strftime(l_shipdate, '%Y-%m-%d'))), 1, 12) AS hx
         |       FROM lineitem),
         |v AS (SELECT $terms AS hv FROM li)
         |SELECT 'lineitem' AS table_name, count(*) AS n_rows,
         |  CAST(SUM(hv) % 2305843009213693952 AS BIGINT) AS checksum
         |FROM v""".stripMargin
    },
    "q_top_journeys" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |j AS (SELECT user_id,
        |        array_to_string(list(event_type ORDER BY ts, event_id), '>')
        |          AS journey
        |      FROM r WHERE rn <= 8 GROUP BY user_id)
        |SELECT journey, count(*) AS n_users FROM j GROUP BY 1
        |ORDER BY n_users DESC, journey
        |LIMIT 50""".stripMargin,
    // integer-quantized moments (V = round(1e4*v)) — exact HUGEINT
    // accumulation, the q_correlation discipline
    "q_outliers" ->
      """WITH b AS (SELECT event_type,
        |             CAST(round(value * 10000) AS BIGINT) AS v
        |           FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |        CAST(SUM(v) AS DOUBLE) AS sv,
        |        CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS svv
        |      FROM b GROUP BY 1),
        |mm AS (SELECT event_type, n, sv / n AS muv,
        |         sqrt(greatest(svv / n - (sv / n) * (sv / n), 0)) AS sigv
        |       FROM m)
        |SELECT b.event_type, mm.n, mm.muv / 10000.0 AS mu,
        |  mm.sigv / 10000.0 AS sigma,
        |  CAST(SUM(CASE WHEN abs(b.v - mm.muv) > 3 * mm.sigv
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM b JOIN mm ON b.event_type = mm.event_type
        |GROUP BY 1, 2, 3, 4
        |ORDER BY b.event_type""".stripMargin,
    "q_sample_pps" ->
      s"""WITH nn AS (SELECT doc_id, coalesce(text, '') AS text
         |            FROM documents),
         |d AS (SELECT doc_id,
         |        CAST(len($duckTokens) AS BIGINT) AS n_tok,
         |        md5(CAST(doc_id AS VARCHAR)) AS h
         |      FROM nn),
         |c AS (SELECT doc_id, n_tok,
         |        sum(n_tok) OVER (ORDER BY h, doc_id
         |          ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM d)
         |SELECT doc_id, n_tok, CAST(cum AS BIGINT) AS cum FROM c
         |WHERE cum // 1000 > (cum - n_tok) // 1000
         |ORDER BY doc_id""".stripMargin,
    // Self-trained bigram LM: add-one smoothed conditional prob per
    // bigram, pico-quantized to an integer BEFORE the per-doc sum
    // (exact in any order — the no-ln discipline), one IEEE division
    // for the mean.
    "q_bigram_lm" ->
      s"""WITH nn AS (SELECT doc_id, coalesce(text, '') AS text
         |            FROM documents),
         |t AS (SELECT doc_id, $duckTokens AS tk FROM nn),
         |bi AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
         |         unnest(tk[2:len(tk)]) AS w2
         |       FROM t WHERE len(tk) >= 2),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok) AS v
         |      FROM (SELECT unnest(tk) AS tok FROM t)),
         |p AS (SELECT c2.w1, c2.w2,
         |        CAST(round(1e12 * (c2.c2 + 1) / (c1.c1 + v.v))
         |          AS BIGINT) AS p_pico
         |      FROM c2 JOIN c1 USING (w1), v),
         |s AS (SELECT bi.doc_id, count(*) AS n_bi,
         |        CAST(SUM(p.p_pico) AS BIGINT) AS sum_pico
         |      FROM bi JOIN p ON bi.w1 = p.w1 AND bi.w2 = p.w2
         |      GROUP BY 1)
         |SELECT doc_id, n_bi, sum_pico,
         |  CAST(sum_pico AS DOUBLE) / n_bi AS avg_pico
         |FROM s ORDER BY doc_id""".stripMargin,
    // Shannon entropy of the per-source language mix: the identical
    // 16-step fixed-point log2 ladder (FixLog2.ctesSql) re-derives
    // every c·L(n, c) term — hash-exact including h_q and h_bits.
    "q_entropy_mix" -> {
      val (fx, fxz) = graft.functions.FixLog2.ctesSql("fx", "b", "n", "c")
      s"""WITH s AS (SELECT source, lang, count(*) AS c
         |           FROM documents GROUP BY 1, 2),
         |u AS (SELECT * FROM s
         |      UNION ALL
         |      SELECT '*' AS source, lang, CAST(SUM(c) AS BIGINT) AS c
         |      FROM s GROUP BY lang),
         |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
         |      FROM u GROUP BY 1),
         |b AS (SELECT u.source, u.lang, u.c, n.n
         |      FROM u JOIN n USING (source)),
         |$fx,
         |h AS (SELECT source, MAX(n) AS n_docs, count(*) AS n_langs,
         |        CAST(SUM(CAST(c AS HUGEINT) * fx_out) AS BIGINT) AS h_q
         |      FROM $fxz GROUP BY 1)
         |SELECT source, n_docs, n_langs, h_q,
         |  CAST(h_q AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 65536.0)
         |    AS h_bits
         |FROM h ORDER BY source""".stripMargin
    },
    // Mutual information I(lang; source): per-cell fixed-point
    // log2(N*c_ls / (c_l*c_s)), integer-weighted sum per source —
    // the ladder is sign-correct for under-represented cells
    "q_mutual_info" -> {
      val (fx, fxz) = graft.functions.FixLog2
        .ctesSql("fx", "b", "n_tot * c", "c_l * c_s")
      s"""WITH s AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
         |           FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2),
         |cl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS c_l
         |       FROM s GROUP BY 1),
         |cs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS c_s
         |       FROM s GROUP BY 1),
         |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM s),
         |b AS (SELECT s.source, s.lang, s.c, cl.c_l, cs.c_s, nt.n_tot
         |      FROM s JOIN cl USING (lang) JOIN cs USING (source), nt),
         |$fx,
         |h AS (SELECT source, MAX(c_s) AS n_docs, MAX(n_tot) AS n_tot,
         |        count(*) AS n_cells,
         |        CAST(SUM(CAST(c AS HUGEINT) * fx_out) AS BIGINT) AS mi_q
         |      FROM $fxz GROUP BY 1)
         |SELECT source, n_docs, n_cells, mi_q,
         |  CAST(mi_q AS DOUBLE) / (CAST(n_tot AS DOUBLE) * 65536.0)
         |    AS mi_bits
         |FROM h ORDER BY source""".stripMargin
    },
    // Naive Bayes: DuckDB retrains the model (counts + two log2
    // ladders) and re-walks every posterior and the packed argmax.
    "q_nb_classify" -> {
      val (fx, fxz) = graft.functions.FixLog2
        .ctesSql("fx", "pp0", "c + 1", "n_l + v")
      val (pr, prz) = graft.functions.FixLog2
        .ctesSql("pr", "dx", "d_l", "d_tot")
      s"""WITH doc AS (SELECT doc_id, lang, $duckTokens AS tk
         |             FROM documents
         |             WHERE lang IS NOT NULL AND text IS NOT NULL),
         |docs AS (SELECT * FROM doc WHERE len(tk) > 0),
         |tr AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
         |te AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
         |trt AS (SELECT lang, unnest(tk) AS term FROM tr),
         |ctl AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
         |        FROM trt GROUP BY 1, 2),
         |nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l
         |       FROM ctl GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
         |       FROM trt),
         |dl AS (SELECT lang, CAST(count(*) AS BIGINT) AS d_l
         |       FROM tr GROUP BY 1),
         |dt AS (SELECT CAST(count(*) AS BIGINT) AS d_tot FROM tr),
         |dx AS (SELECT dl.lang, dl.d_l, dt.d_tot FROM dl, dt),
         |tet AS (SELECT doc_id, lang AS lang_true, term,
         |          CAST(count(*) AS BIGINT) AS tf
         |        FROM (SELECT doc_id, lang, unnest(tk) AS term FROM te)
         |        GROUP BY 1, 2, 3),
         |tv AS (SELECT DISTINCT term FROM tet),
         |pp0 AS (SELECT tv.term, nl.lang, nl.n_l,
         |          COALESCE(ctl.c, 0) AS c, vv.v
         |        FROM tv CROSS JOIN nl
         |        LEFT JOIN ctl ON ctl.term = tv.term
         |          AND ctl.lang = nl.lang
         |        CROSS JOIN vv),
         |$fx,
         |pp AS (SELECT term, lang, fx_out AS l_tl FROM $fxz),
         |$pr,
         |pri AS (SELECT lang, pr_out AS l_prior FROM $prz),
         |lc AS (SELECT lang,
         |         CAST(row_number() OVER (ORDER BY lang) AS BIGINT)
         |           AS code
         |       FROM nl),
         |s1 AS (SELECT tet.doc_id, tet.lang_true, pp.lang,
         |         CAST(SUM(tet.tf * pp.l_tl) AS BIGINT) AS s_terms
         |       FROM tet JOIN pp USING (term) GROUP BY 1, 2, 3),
         |s2 AS (SELECT s1.doc_id, s1.lang_true,
         |         ((-(s1.s_terms + pri.l_prior)) * 256 + lc.code) AS pk
         |       FROM s1 JOIN pri USING (lang) JOIN lc USING (lang)),
         |mx AS (SELECT doc_id, lang_true, MIN(pk) AS mp
         |       FROM s2 GROUP BY 1, 2)
         |SELECT mx.doc_id, mx.lang_true AS lang, lc.lang AS pred,
         |  CAST(-((mp - (mp % 256)) // 256) AS BIGINT) AS score_q,
         |  (mx.lang_true = lc.lang) AS correct
         |FROM mx JOIN lc ON lc.code = (mp % 256)
         |ORDER BY doc_id""".stripMargin
    },
    // Priority sampling: identical integer priority (w·2^32 // (h+1)),
    // rank split at k, threshold tau joined back for est_w.
    "q_priority_sample" -> duckPrioritySample,
    // The incremental merge must EQUAL the full-corpus recompute —
    // the same oracle re-proves the top-(k+1) merge law every round.
    "q_priority_incremental" -> duckPrioritySample,
    "q_transition_matrix" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |         event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, count(*) AS n FROM tr
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n,
        |  CAST(c.n AS DOUBLE) / t.tot AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type
        |ORDER BY c.prev_type, c.next_type""".stripMargin,
    "q_copurchase" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        |          FROM items a JOIN items b
        |            ON a.l_orderkey = b.l_orderkey
        |           AND a.l_partkey < b.l_partkey)
        |SELECT part_a, part_b, count(*) AS n_orders
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 100""".stripMargin,
    // Frequent triples: the oracle is the naive 3-way self-join over
    // L1-restricted items (A-priori monotonicity makes the L1 cut
    // output-invariant, so both formulations agree exactly)
    "q_itemsets3" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem),
        |l1 AS (SELECT l_partkey FROM items GROUP BY 1
        |       HAVING count(*) >= ${Relational.itemsetMinSupport}),
        |e2 AS (SELECT i.l_orderkey, i.l_partkey
        |       FROM items i JOIN l1 USING (l_partkey)),
        |t AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |        c.l_partkey AS part_c
        |      FROM e2 a
        |      JOIN e2 b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      JOIN e2 c ON b.l_orderkey = c.l_orderkey
        |        AND b.l_partkey < c.l_partkey)
        |SELECT part_a, part_b, part_c, count(*) AS n_orders
        |FROM t GROUP BY 1, 2, 3
        |HAVING count(*) >= ${Relational.itemsetMinSupport}
        |ORDER BY n_orders DESC, part_a, part_b, part_c""".stripMargin,
    // RFM: decimal-exact monetary sums order the quintile sort
    // identically; ntile ties broken by custkey (total order)
    "q_rfm" ->
      """WITH per AS (SELECT o_custkey AS custkey,
        |        max(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 1000000)
        |          AS r_s,
        |        count(*) AS f,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |          AS m
        |      FROM orders GROUP BY 1),
        |j AS (SELECT per.*, c.c_nationkey AS nationkey
        |      FROM per JOIN customer c ON c.c_custkey = per.custkey),
        |q AS (SELECT custkey, nationkey, r_s, f, m,
        |        ntile(5) OVER (PARTITION BY nationkey
        |          ORDER BY r_s, custkey) AS r_q,
        |        ntile(5) OVER (PARTITION BY nationkey
        |          ORDER BY f, custkey) AS f_q,
        |        ntile(5) OVER (PARTITION BY nationkey
        |          ORDER BY m, custkey) AS m_q
        |      FROM j)
        |SELECT custkey, nationkey, r_s, f, m, r_q, f_q, m_q,
        |  r_q * 100 + f_q * 10 + m_q AS segment
        |FROM q ORDER BY custkey""".stripMargin,
    // Association rules: the same naive-join support CTEs, three
    // rules per frequent triple, fixed IEEE conf/lift divisions
    "q_assoc_rules" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey
        |               FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
        |         AS n_baskets FROM items),
        |isup AS (SELECT l_partkey AS cons, count(*) AS s_cons
        |         FROM items GROUP BY 1),
        |psup AS (SELECT a.l_partkey AS ant_a, b.l_partkey AS ant_b,
        |           count(*) AS s_ant
        |         FROM items a JOIN items b
        |           ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey
        |         GROUP BY 1, 2),
        |l1 AS (SELECT l_partkey FROM items GROUP BY 1
        |       HAVING count(*) >= ${Relational.itemsetMinSupport}),
        |e2 AS (SELECT i.l_orderkey, i.l_partkey
        |       FROM items i JOIN l1 USING (l_partkey)),
        |tri AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |          c.l_partkey AS pc, count(*) AS s3
        |        FROM e2 a
        |        JOIN e2 b ON a.l_orderkey = b.l_orderkey
        |          AND a.l_partkey < b.l_partkey
        |        JOIN e2 c ON b.l_orderkey = c.l_orderkey
        |          AND b.l_partkey < c.l_partkey
        |        GROUP BY 1, 2, 3
        |        HAVING count(*) >= ${Relational.itemsetMinSupport}),
        |rules AS (SELECT pa AS ant_a, pb AS ant_b, pc AS cons, s3
        |            FROM tri
        |          UNION ALL
        |          SELECT pa, pc, pb, s3 FROM tri
        |          UNION ALL
        |          SELECT pb, pc, pa, s3 FROM tri)
        |SELECT r.ant_a, r.ant_b, r.cons, r.s3, p.s_ant, i.s_cons,
        |  CAST(r.s3 AS DOUBLE) / p.s_ant AS confidence,
        |  CAST(r.s3 AS DOUBLE) / p.s_ant * nb.n_baskets / i.s_cons
        |    AS lift
        |FROM rules r
        |JOIN psup p ON p.ant_a = r.ant_a AND p.ant_b = r.ant_b
        |JOIN isup i ON i.cons = r.cons
        |CROSS JOIN nb
        |ORDER BY confidence DESC, lift DESC, r.ant_a, r.ant_b,
        |  r.cons""".stripMargin,
    // Snapshot diff: the oracle re-derives the md5-bucket drift model
    // and the full-outer compare (corruption-model convention)
    "q_snapshot_diff" -> {
      def hex4(v: String): String =
        (0 until 4).map(k =>
          s"(strpos('0123456789abcdef', substring($v, ${k + 1}, 1)) - 1)" +
            s" * ${math.pow(16, 3 - k).toInt}")
          .mkString("(", " + ", ")")
      s"""WITH o AS (SELECT o_orderkey AS k, o_custkey AS ck,
        |             o_totalprice AS p FROM orders),
        |hb AS (SELECT k, ck, p,
        |         ${hex4("md5(CAST(k AS VARCHAR))")} % 100 AS b
        |       FROM o),
        |snap AS (SELECT k, ck, p + 1.0 AS p FROM hb WHERE b < 4
        |         UNION ALL SELECT k, ck, p FROM hb WHERE b >= 8
        |         UNION ALL SELECT k + 1000000000, ck, p FROM hb
        |         WHERE b >= 96),
        |d AS (SELECT coalesce(o.k, s.k) AS k, o.ck AS ck_old,
        |        s.ck AS ck_new, o.p AS p_old, s.p AS p_new
        |      FROM o FULL OUTER JOIN snap s ON o.k = s.k)
        |SELECT k,
        |  CASE WHEN p_old IS NULL THEN 'added'
        |       WHEN p_new IS NULL THEN 'removed'
        |       ELSE 'changed' END AS op,
        |  p_old, p_new
        |FROM d
        |WHERE p_old IS NULL OR p_new IS NULL
        |   OR p_old <> p_new OR ck_old <> ck_new
        |ORDER BY k""".stripMargin
    },
    // Histogram MV: the oracle is the FULL single-pass histogram —
    // equality IS the merge claim (the MV-family convention); window
    // sums carry the HUGEINT-ban casts
    "q_hist_quantile" ->
      """WITH b AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |h AS (SELECT event_type, v // 1000 AS bkt, count(*) AS cnt
        |      FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, bkt, cnt,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bkt
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY event_type)
        |          AS BIGINT) AS n
        |      FROM h)
        |SELECT event_type, bkt, cnt, cum,
        |  (cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2)
        |    AS is_median_bucket
        |FROM c ORDER BY event_type, bkt""".stripMargin,
    // Benford: the same two log2 ladders re-derived in CTEs; all
    // BIGINT arithmetic, no transcendental anywhere
    "q_benford" -> {
      val (ld, ldz) = graft.functions.FixLog2
        .ctesSql("ld", "base", "d + 1", "d")
      val (lt, ltz) = graft.functions.FixLog2
        .ctesSql("lt", ldz, "10", "1")
      s"""WITH vv AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |              AS v
        |            FROM orders),
        |ob AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
        |         AS d, count(*) AS n_d
        |       FROM vv WHERE v >= 1 GROUP BY 1),
        |nn AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM ob),
        |base AS (SELECT ob.d, ob.n_d, nn.n FROM ob, nn),
        |$ld,
        |$lt,
        |fin AS (SELECT d, n_d, (n * ld_out) // lt_out AS exp_d
        |        FROM $ltz)
        |SELECT d, n_d, exp_d,
        |  (100 * ((n_d - exp_d) * (n_d - exp_d))) // exp_d
        |    AS chi2_centi
        |FROM fin ORDER BY d""".stripMargin
    },
    // Per-group Benford: ONE ld ladder over the completed
    // group x digit domain; L(10,1) is the same driver-side constant
    // the engine folds (FixLog2.ref — bit-identical by FixLog2Spec)
    "q_benford_by" -> {
      val (ld, ldz) = graft.functions.FixLog2
        .ctesSql("ld", "base", "d + 1", "d")
      val l10 = graft.functions.FixLog2.ref(10L, 1L)
      s"""WITH vv AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |              CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |            FROM orders),
        |ob AS (SELECT yr,
        |         CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
        |           AS d, count(*) AS n_d
        |       FROM vv WHERE v >= 1 GROUP BY 1, 2),
        |nn AS (SELECT yr, CAST(SUM(n_d) AS BIGINT) AS n FROM ob
        |       GROUP BY 1 HAVING SUM(n_d) >= 50),
        |dg AS (SELECT CAST(range AS INTEGER) AS d FROM range(1, 10)),
        |base AS (SELECT nn.yr, dg.d, nn.n,
        |           COALESCE(ob.n_d, 0) AS n_d
        |         FROM nn CROSS JOIN dg
        |         LEFT JOIN ob ON ob.yr = nn.yr AND ob.d = dg.d),
        |$ld,
        |fin AS (SELECT yr, n, n_d, (n * ld_out) // $l10 AS exp_d
        |        FROM $ldz)
        |SELECT yr, MAX(n) AS n_orders,
        |  CAST(SUM((100 * ((n_d - exp_d) * (n_d - exp_d))) // exp_d)
        |    AS BIGINT) AS chi2_centi
        |FROM fin GROUP BY yr
        |ORDER BY chi2_centi DESC, yr""".stripMargin
    },
    // milli-units keep num < 2^53: DuckDB's HUGEINT->double is not
    // correctly rounded past 2^53 (the 1-ulp class this query hit
    // live at micro-units); below it both conversions are exact
    "q_twa" ->
      """WITH ev AS (SELECT user_id, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS t,
        |         CAST(round(value * 1000) AS BIGINT) AS vq
        |       FROM events),
        |l AS (SELECT user_id, t, vq,
        |        lead(t) OVER (PARTITION BY user_id
        |          ORDER BY t, event_id) AS t_next
        |      FROM ev),
        |a AS (SELECT user_id,
        |        CAST(sum((t_next - t) * vq) AS BIGINT) AS num,
        |        CAST(sum(t_next - t) AS BIGINT) AS den
        |      FROM l WHERE t_next IS NOT NULL GROUP BY 1)
        |SELECT user_id, den AS span_millis,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS twa_milli
        |FROM a ORDER BY user_id""".stripMargin,
    // int128 (HUGEINT) internally — exact like Spark's DECIMAL(38,0);
    // only BIGINT/boolean columns reach the output
    "q_mahalanobis" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |         CAST(round(l_quantity) AS BIGINT) AS x,
        |         CAST(round(l_extendedprice) AS BIGINT) AS y
        |       FROM lineitem),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx0,
        |        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy0,
        |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy0
        |      FROM li),
        |c AS (SELECT n, sx, sy,
        |        n * sxx0 - sx * sx AS mxx,
        |        n * syy0 - sy * sy AS myy,
        |        n * sxy0 - sx * sy AS mxy
        |      FROM m),
        |q AS (SELECT li.l_orderkey, li.l_linenumber, li.x, li.y,
        |        myy * (n*x - sx) * (n*x - sx)
        |          - 2 * mxy * (n*x - sx) * (n*y - sy)
        |          + mxx * (n*y - sy) * (n*y - sy) AS qq,
        |        mxx * myy - mxy * mxy AS dd
        |      FROM li, c)
        |SELECT l_orderkey, l_linenumber, x, y, (qq > 9 * dd) AS flagged
        |FROM q ORDER BY qq DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "q_psi" -> {
      val (lq, lqz) = graft.functions.FixLog2
        .ctesSql("lq", "base", "a * tb", "b * ta")
      s"""WITH ev AS (SELECT
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |         CAST(round(value * 1e6) AS BIGINT) AS vq
        |       FROM events),
        |bounds AS (SELECT MIN(vq) AS lo, MAX(vq) AS hi,
        |             MIN(h) AS h0, MAX(h) AS h1 FROM ev),
        |binned AS (SELECT
        |    least(9, ((vq - lo) * 10) // (hi - lo + 1)) AS bin,
        |    (h < (h0 + h1 + 1) // 2) AS is_ref
        |  FROM ev, bounds),
        |cnts AS (SELECT bin,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ref,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_cur
        |  FROM binned GROUP BY 1),
        |dom AS (SELECT CAST(range AS BIGINT) AS bin,
        |    COALESCE(n_ref, 0) + 1 AS a, COALESCE(n_cur, 0) + 1 AS b
        |  FROM range(0, 10) LEFT JOIN cnts ON cnts.bin = range),
        |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS ta,
        |          CAST(SUM(b) AS BIGINT) AS tb FROM dom),
        |base AS (SELECT dom.bin, dom.a, dom.b, tot.ta, tot.tb
        |         FROM dom CROSS JOIN tot),
        |$lq
        |SELECT bin, a - 1 AS n_ref, b - 1 AS n_cur,
        |  (a * tb - b * ta) * lq_out AS psi_term_scaled
        |FROM $lqz ORDER BY bin""".stripMargin
    },
    "q_cusum" ->
      """WITH ev AS (SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
        |       FROM events),
        |rng AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |spine AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
        |          FROM ty, rng),
        |cnt AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
        |        FROM ev GROUP BY 1, 2),
        |ser AS (SELECT s.event_type, s.h, COALESCE(cnt.c, 0) AS c
        |        FROM spine s LEFT JOIN cnt
        |          ON cnt.event_type = s.event_type AND cnt.h = s.h),
        |tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS t,
        |          CAST(count(*) AS BIGINT) AS nh
        |        FROM ser GROUP BY 1),
        |pp AS (SELECT ser.event_type, ser.h, ser.c, tot.t,
        |         CAST(SUM(ser.c * tot.nh - tot.t) OVER
        |           (PARTITION BY ser.event_type ORDER BY ser.h
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS p
        |       FROM ser JOIN tot USING (event_type)),
        |ss AS (SELECT event_type, h, c, t,
        |         p - least(CAST(0 AS BIGINT), CAST(MIN(p) OVER
        |           (PARTITION BY event_type ORDER BY h
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT)) AS cusum_scaled
        |       FROM pp)
        |SELECT event_type, h, c, cusum_scaled,
        |  (cusum_scaled > 3 * t) AS alarm
        |FROM ss ORDER BY event_type, h""".stripMargin,
    // The salted join's arbiter is the UNSALTED join: any row lost or
    // duplicated by the salt breaks the hash.
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_zorder" -> {
      val terms = (0 until 16).map(i =>
        s"(((an >> $i) & 1) << ${2 * i}) | " +
          s"(((bn >> $i) & 1) << ${2 * i + 1})").mkString(" | ")
      s"""WITH b AS (SELECT CAST(min(l_partkey) AS BIGINT) AS plo,
        |             CAST(max(l_partkey) AS BIGINT) AS phi,
        |             CAST(min(l_suppkey) AS BIGINT) AS slo,
        |             CAST(max(l_suppkey) AS BIGINT) AS shi
        |           FROM lineitem),
        |f AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |        plo, phi, slo, shi
        |      FROM lineitem, b
        |      WHERE l_partkey <= plo + (phi - plo) // 4
        |        AND l_suppkey <= slo + (shi - slo) // 4),
        |n AS (SELECT l_orderkey, l_linenumber,
        |        CASE WHEN phi = plo THEN 0 ELSE least(65535, greatest(0,
        |          ((l_partkey - plo) * 65535) // (phi - plo))) END AS an,
        |        CASE WHEN shi = slo THEN 0 ELSE least(65535, greatest(0,
        |          ((l_suppkey - slo) * 65535) // (shi - slo))) END AS bn
        |      FROM f)
        |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS z
        |FROM n ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_weighted_median" ->
      """WITH g AS (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |               AS vw
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v,
        |        sum(vw) OVER (PARTITION BY l_returnflag ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(vw) OVER (PARTITION BY l_returnflag) AS tot
        |      FROM g)
        |SELECT l_returnflag, min(v) AS median_cents,
        |  CAST(min(tot) AS BIGINT) AS total_w
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_quantiles" ->
      """WITH g AS (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |               AS vw
        |           FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, v,
        |        sum(vw) OVER (PARTITION BY l_returnflag ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(vw) OVER (PARTITION BY l_returnflag) AS tot
        |      FROM g)
        |SELECT l_returnflag,
        |  min(CASE WHEN cum * 4 >= tot THEN v END) AS p25_cents,
        |  min(CASE WHEN cum * 2 >= tot THEN v END) AS p50_cents,
        |  min(CASE WHEN cum * 4 >= tot * 3 THEN v END) AS p75_cents,
        |  CAST(min(tot) AS BIGINT) AS total_w
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Two FixLog2 ladders on DIFFERENT frames (per-(doc,char) counts,
    // then per-doc totals) joined by doc_id — the engine mirrors this
    // shape exactly (one ladder per frame, never chained).
    "q_char_entropy" -> {
      val (lc, lcz) = graft.functions.FixLog2.ctesSql("lc", "cnt", "c", "1")
      val (ln, lnz) = graft.functions.FixLog2
        .ctesSql("ln", "s", "n_chars_seen", "1")
      s"""WITH ix AS (SELECT doc_id, text,
        |        unnest(generate_series(1, CAST(length(text) AS INTEGER)))
        |          AS i
        |      FROM documents),
        |ch AS (SELECT doc_id, substr(text, i, 1) AS ch FROM ix),
        |cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
        |$lc,
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_seen,
        |        CAST(sum(c * lc_out) AS BIGINT) AS s_clc
        |      FROM $lcz GROUP BY 1),
        |$ln
        |SELECT doc_id, n_chars_seen,
        |  (n_chars_seen * ln_out - s_clc) // n_chars_seen AS ent_q16,
        |  ((n_chars_seen * ln_out - s_clc) // n_chars_seen) < 196608
        |    AS low_entropy
        |FROM $lnz ORDER BY doc_id""".stripMargin
    },
    "q_collocations" -> {
      val (pm, pmz) = graft.functions.FixLog2
        .ctesSql("pm", "pos", "c_xy * n_bi", "c_x * c_y")
      s"""WITH t AS (SELECT $duckTokens AS tk FROM documents),
        |uni AS (SELECT w, count(*) AS cu FROM
        |          (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
        |px AS (SELECT tk,
        |        unnest(generate_series(1, CAST(len(tk) - 1 AS INTEGER)))
        |          AS i
        |       FROM t WHERE len(tk) >= 2),
        |p AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM px),
        |bi AS (SELECT w1, w2, count(*) AS c_xy FROM p GROUP BY 1, 2
        |       HAVING count(*) >= 3),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM p),
        |base AS (SELECT b.w1, b.w2, b.c_xy, ux.cu AS c_x, uy.cu AS c_y,
        |           nb.n_bi
        |         FROM bi b
        |         JOIN uni ux ON b.w1 = ux.w
        |         JOIN uni uy ON b.w2 = uy.w
        |         CROSS JOIN nb),
        |pos AS (SELECT * FROM base WHERE c_xy * n_bi > c_x * c_y),
        |$pm
        |SELECT w1, w2, c_xy, pm_out AS pmi_q16 FROM $pmz
        |ORDER BY pmi_q16 DESC, w1, w2 LIMIT 100""".stripMargin
    },
    "q_chao1" ->
      s"""WITH tf AS (SELECT source, w, count(*) AS c FROM
        |    (SELECT source, unnest($duckTokens) AS w FROM documents)
        |    GROUP BY 1, 2),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS s_obs,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM tf GROUP BY 1)
        |SELECT source, s_obs, f1, f2,
        |  1000 * s_obs + (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1))
        |    AS chao1_milli
        |FROM agg ORDER BY source""".stripMargin,
    "q_feature_hash" -> {
      def hex(v: String, p: Int): String =
        s"(strpos('0123456789abcdef', substring($v, $p, 1)) - 1)"
      val h4 = (0 until 4).map(k =>
        s"${hex("h", 1 + k)} * ${math.pow(16, 3 - k).toInt}")
        .mkString("(", " + ", ")")
      s"""WITH t AS (SELECT doc_id, unnest($duckTokens) AS w
        |           FROM documents),
        |hh AS (SELECT doc_id, md5('fh|' || w) AS h FROM t),
        |f AS (SELECT doc_id, $h4 % 1024 AS bucket,
        |        CASE WHEN ${hex("h", 5)} % 2 = 0 THEN 1 ELSE -1 END AS s
        |      FROM hh)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(sum(s) AS BIGINT) AS weight
        |FROM f GROUP BY 1, 2 HAVING sum(s) <> 0
        |ORDER BY doc_id, bucket""".stripMargin
    },
    // Three independent ladder CTE sets (pair / context / default
    // model frames); the held-out bigram stream joins the finished
    // tables — the engine mirrors this one-ladder-per-frame shape.
    "q_bigram_ppl" -> {
      def hex4(v: String): String =
        (0 until 4).map(k =>
          s"(strpos('0123456789abcdef', substring($v, ${1 + k}, 1)) - 1)" +
            s" * ${math.pow(16, 3 - k).toInt}")
          .mkString("(", " + ", ")")
      val bucket = hex4("md5(CAST(doc_id AS VARCHAR))") + " % 100"
      val (pc, pcz) = graft.functions.FixLog2
        .ctesSql("pc", "pj", "c1 + v", "c2 + 1")
      val (cc, ccz) = graft.functions.FixLog2
        .ctesSql("cc", "c1v", "c1 + v", "1")
      val (dc, dcz) = graft.functions.FixLog2
        .ctesSql("dc", "vv", "v", "1")
      s"""WITH t AS (SELECT doc_id,
        |        $duckTokens AS tk,
        |        $bucket AS bkt
        |      FROM (SELECT doc_id, coalesce(text, '') AS text
        |            FROM documents)),
        |btr AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM
        |          (SELECT tk, unnest(generate_series(1,
        |             CAST(len(tk) - 1 AS INTEGER))) AS i
        |           FROM t WHERE bkt < 80 AND len(tk) >= 2)),
        |c2t AS (SELECT w1, w2, count(*) AS c2 FROM btr GROUP BY 1, 2),
        |c1t AS (SELECT w1, count(*) AS c1 FROM btr GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM
        |         (SELECT unnest(tk) AS tok FROM t WHERE bkt < 80)),
        |pj AS (SELECT c2t.w1, c2t.w2, c2t.c2, c1t.c1, vv.v
        |       FROM c2t JOIN c1t USING (w1) CROSS JOIN vv),
        |$pc,
        |c1v AS (SELECT c1t.w1, c1t.c1, vv.v FROM c1t CROSS JOIN vv),
        |$cc,
        |$dc,
        |bhe AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM
        |          (SELECT doc_id, tk, unnest(generate_series(1,
        |             CAST(len(tk) - 1 AS INTEGER))) AS i
        |           FROM t WHERE bkt >= 80 AND len(tk) >= 2)),
        |j AS (SELECT b.doc_id,
        |        COALESCE(p.pc_out, c.cc_out, d.dc_out) AS cost
        |      FROM bhe b
        |      LEFT JOIN $pcz p ON b.w1 = p.w1 AND b.w2 = p.w2
        |      LEFT JOIN $ccz c ON b.w1 = c.w1
        |      CROSS JOIN $dcz d)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bi,
        |  CAST(sum(cost) AS BIGINT) AS nll_q16,
        |  CAST(sum(cost) AS BIGINT) // CAST(count(*) AS BIGINT)
        |    AS xent_q16
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_readability" ->
      """WITH b AS (SELECT doc_id, lang,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |    AS words,
        |  greatest(CAST(1 AS BIGINT),
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
        |    AS sents,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS syll
        |FROM documents)
        |SELECT doc_id, lang, words, sents, syll,
        |  206835 - (1015 * words) // sents - (84600 * syll) // words
        |    AS flesch_milli
        |FROM b WHERE words >= 1 ORDER BY doc_id""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |      GROUP BY 1)
        |SELECT stage, count(*) AS users FROM (
        |  SELECT 'l1_view' AS stage, user_id FROM v
        |  UNION ALL SELECT 'l2_click', user_id FROM c
        |  UNION ALL SELECT 'l3_purchase', user_id FROM p)
        |GROUP BY stage
        |ORDER BY stage""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_set_ops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q_union" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS side
        |FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS side
        |FROM supplier
        |ORDER BY nationkey, side""".stripMargin,
    "q_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
        |FROM orders
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $duckTokens AS tk FROM documents)
        |SELECT doc_id,
        |  len(tk) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish,
        |  length(text) AS len_chars,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk)
        |  END AS mean_tok_len,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text)
        |  END AS punct_ratio,
        |  CASE WHEN len(tk) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(tk, x -> list_contains(['the','a','an','and','or','of','to','in','is','that'], x))) AS DOUBLE) / len(tk)
        |  END AS stopword_ratio,
        |$duckQuality
        |    AS quality
        |FROM t
        |ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH t AS (SELECT lang, $duckTokens AS tk FROM documents),
        |c AS (SELECT lang,
        |  len(list_filter(tk, x -> list_contains(['the','and','of','to','is','that','with'], x))) AS c_en,
        |  len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','nicht','mit'], x))) AS c_de,
        |  len(list_filter(tk, x -> list_contains(['el','la','los','las','es','que','para'], x))) AS c_es,
        |  len(list_filter(tk, x -> list_contains(['le','la','les','et','est','que','pour'], x))) AS c_fr,
        |  len(list_filter(tk, x -> list_contains(['的','了','是','在','我','有','他'], x))) AS c_zh
        |FROM t)
        |SELECT lang,
        |  CASE
        |    WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
        |    WHEN c_de > 0 AND c_de > c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
        |    WHEN c_es > 0 AND c_es > c_en AND c_es > c_de AND c_es >= c_fr AND c_es >= c_zh THEN 'es'
        |    WHEN c_fr > 0 AND c_fr > c_en AND c_fr > c_de AND c_fr > c_es AND c_fr >= c_zh THEN 'fr'
        |    WHEN c_zh > 0 AND c_zh > c_en AND c_zh > c_de AND c_zh > c_es AND c_zh > c_fr THEN 'zh'
        |    ELSE 'und' END AS pred,
        |  count(*) AS n
        |FROM c
        |GROUP BY lang, pred
        |ORDER BY lang, pred""".stripMargin,
    "q_fingerprint" ->
      s"""SELECT doc_id, md5($duckNorm) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // winnowing: same polynomial rolling hash (base 256 over ASCII
    // codes, mod 2^31-1), same w=4 window minima, distinct per doc
    "q_winnow_fingerprint" ->
      s"""WITH $duckWinnowCte
        |SELECT doc_id, fp
        |FROM wfp
        |ORDER BY doc_id, fp""".stripMargin,
    // MOSS-style near-dup pairs: stop-fingerprint df cap, then the
    // capped self-join + shared-count threshold (both knobs from
    // TextOps so the oracle can't drift)
    "q_winnow_neardup" ->
      s"""WITH $duckWinnowCte,
        |rare AS (SELECT fp FROM wfp
        |         GROUP BY fp HAVING count(*) <= ${TextOps.winnowMaxDf}),
        |k AS (SELECT doc_id, fp FROM wfp JOIN rare USING (fp))
        |SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS n_shared
        |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= ${TextOps.winnowMinShared}
        |ORDER BY ida, idb""".stripMargin,
    "q_term_freq" ->
      s"""WITH t AS (SELECT $duckTokens AS tk FROM documents)
        |SELECT term, count(*) AS n
        |FROM (SELECT unnest(tk) AS term FROM t)
        |GROUP BY term
        |ORDER BY n DESC, term
        |LIMIT 100""".stripMargin,
    // the sketch is candidates-only (lossy counting, w = 2·denom ⇒
    // candidate superset is provable); the OUTPUT is exact counts ≥
    // N/denom, so the oracle is a plain exact HAVING
    "q_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($duckTokens) AS term FROM documents),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT term, count(*) AS n FROM t
        |GROUP BY term
        |HAVING count(*) >= greatest(1, (SELECT n // 500 FROM tot))
        |ORDER BY n DESC, term""".stripMargin,
    // same two-pass order as the Spark side (emails first, so digit
    // runs inside addresses are consumed); 'g' = Spark's replace-all
    "q_redact" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '[0-9]{6,}')) AS n_numbers,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g')) AS redacted_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // W=64 / S=48 overlapping windows; starts stop at len-17 (a
    // later window would sit entirely inside its predecessor);
    // duckdb range() excludes the end like Spark's inclusive
    // sequence(0, greatest(len-17, 0), 48), and list_slice clamps
    // the tail like Spark's slice
    "q_chunk" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |s AS (SELECT doc_id, tk,
        |        unnest(range(0, greatest(len(tk) - 16, 1), 48)) AS start
        |      FROM t WHERE len(tk) > 0)
        |SELECT doc_id,
        |  start // 48 AS chunk_id,
        |  CAST(start AS BIGINT) AS start,
        |  CAST(least(64, len(tk) - start) AS BIGINT) AS n_tok,
        |  md5(array_to_string(list_slice(tk, start + 1, start + 64), ' '))
        |    AS chunk_md5
        |FROM s
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // audio rows are doc_id % 3 = 1; PCM WAV is uncompressed, so the
    // decoded sample stream equals the payload bytes (8 kHz mono
    // comes from the encoder constants)
    "q_media_wav" ->
      """WITH m AS (
        |  SELECT doc_id, length(text) AS nb,
        |    COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |      i -> ord(substring(text, CAST(i AS INTEGER), 1)))), 0) AS ssum
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id, CAST(nb AS BIGINT) AS n_frames,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(ssum AS BIGINT) AS sample_sum,
        |  CASE WHEN nb = 0 THEN 0.0
        |       ELSE CAST(ssum AS DOUBLE) / nb END AS mean_sample
        |FROM m ORDER BY doc_id""".stripMargin,
    // floor-based half-up rounding evaluates identically in Java and
    // DuckDB (round() would not: HALF_EVEN); integer sums are
    // order-independent, scale is one exact division
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |w AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS m
        |      FROM e),
        |q AS (SELECT vec_id, m,
        |        CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |             ELSE list_transform(v,
        |               x -> CAST(floor(x * 127 / m + 0.5) AS BIGINT)) END AS qs
        |      FROM w)
        |SELECT vec_id, m / 127 AS scale,
        |  CAST(list_sum(qs) AS BIGINT) AS qsum,
        |  CAST(list_min(qs) AS INTEGER) AS qmin,
        |  CAST(list_max(qs) AS INTEGER) AS qmax
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_tfidf_topterms" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |dt AS (SELECT doc_id, unnest(tk) AS term FROM t),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |        CAST(tf AS DOUBLE) * n_docs / df AS score
        |      FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tf, df, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, term) AS rank
        |      FROM s)
        |SELECT doc_id, term, tf, df, score, rank FROM r
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // Okapi BM25 (k1=1.2, b=0.75, rational idf — see TextOps.qBm25):
    // per-term contributions are one fixed IEEE expression quantized
    // to integer micro-units per row, then integer-summed — the
    // q_correlation discipline, so the iterative-free retrieval
    // scores hash-check exactly
    "q_bm25" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |dt AS (SELECT doc_id, unnest(tk) AS term,
        |         generate_subscripts(tk, 1) AS pos FROM t),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
        |qt AS (SELECT doc_id, term,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY min_pos, term) AS rn
        |       FROM (SELECT doc_id, term, min(pos) AS min_pos
        |             FROM dt WHERE doc_id < 8 GROUP BY 1, 2)),
        |q AS (SELECT doc_id AS qid, term FROM qt WHERE rn <= 4),
        |dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n_docs FROM documents),
        |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS tot_tokens FROM tf),
        |m AS (SELECT q.qid, tf.doc_id,
        |        CAST(round(((CAST((nn.n_docs - dfv.df) AS DOUBLE) + 0.5)
        |              / (CAST(dfv.df AS DOUBLE) + 0.5) + 1.0)
        |            * (CAST(tf.tf AS DOUBLE) * 2.2)
        |            / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |              * CAST(dl.dl AS DOUBLE)
        |              / (CAST(tot.tot_tokens AS DOUBLE)
        |                / CAST(nn.n_docs AS DOUBLE))))
        |            * 1000000.0) AS BIGINT) AS c
        |      FROM q JOIN tf USING (term) JOIN dfv USING (term)
        |      JOIN dl ON dl.doc_id = tf.doc_id
        |      CROSS JOIN nn CROSS JOIN tot
        |      WHERE tf.doc_id <> q.qid),
        |s AS (SELECT qid, doc_id, CAST(SUM(c) AS BIGINT) AS score_micro
        |      FROM m GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id, score_micro,
        |        row_number() OVER (PARTITION BY qid
        |                           ORDER BY score_micro DESC, doc_id)
        |          AS rank
        |      FROM s)
        |SELECT qid, doc_id, CAST(rank AS BIGINT) AS rank, score_micro
        |FROM r WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,
    // Gopher repetition signals: integer n-gram counts on both sides,
    // fractions as the same exact-int double division → hash-exact.
    // Docs too short for an n-gram LEFT-JOIN to NULL, matching the
    // Spark side's None.
    "q_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |         i -> tk[i] || ' ' || tk[i+1])) AS g FROM t),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |bstat AS (SELECT doc_id,
        |            CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
        |          FROM bgc GROUP BY doc_id),
        |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)-1),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g FROM t),
        |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
        |tstat AS (SELECT doc_id,
        |            CAST(COALESCE(sum(c) FILTER (WHERE c >= 2), 0) AS DOUBLE)
        |              / sum(c) AS dup_trigram_frac
        |          FROM tgc GROUP BY doc_id)
        |SELECT doc_id, len(tk) AS n_tokens, top_bigram_frac, dup_trigram_frac
        |FROM t
        |LEFT JOIN bstat USING (doc_id)
        |LEFT JOIN tstat USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT md5($duckNorm) AS fp, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY fp
        |ORDER BY keep_id""".stripMargin,
    "q_dedup_incremental" ->
      s"""WITH b AS (SELECT doc_id, md5($duckNorm) AS fp
        |           FROM documents WHERE source = 'src0'),
        |h AS (SELECT DISTINCT md5($duckNorm) AS fp
        |      FROM documents WHERE source <> 'src0')
        |SELECT fp, min(doc_id) AS keep_id, count(*) AS n_batch_copies
        |FROM b ANTI JOIN h USING (fp)
        |GROUP BY fp
        |ORDER BY keep_id""".stripMargin,
    "q_jaccard_pairs" -> duckShingleCte,
    "q_jaccard_prefix" -> duckShingleCte,
    // Weighted cosine pairs: DuckDB re-derives the idf weights with
    // the same fixed-point log2 ladder and re-walks every dot/norm
    // through the FULL inverted join (no prefix filter) — equality
    // re-proves the norm-suffix bound's completeness every round.
    "q_idf_cosine_pairs" -> {
      val (fx, fxz) = graft.functions.FixLog2
        .ctesSql("fx", "w0", "n_docs", "df")
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
         |s AS (SELECT doc_id, list_distinct(list_transform(
         |        range(1, len(tk)-1),
         |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
         |      FROM t WHERE len(tk) >= 3),
         |idx AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         |dfx AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
         |        FROM idx GROUP BY 1),
         |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |       FROM idx),
         |w0 AS (SELECT dfx.shingle, dfx.df, nn.n_docs FROM dfx, nn
         |       WHERE dfx.df < nn.n_docs),
         |$fx,
         |wt AS (SELECT shingle, fx_out AS w FROM $fxz),
         |vec AS (SELECT doc_id, idx.shingle, w
         |        FROM idx JOIN wt USING (shingle)),
         |n2 AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS n2
         |       FROM vec GROUP BY 1),
         |dt AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
         |         CAST(SUM(a.w*b.w) AS BIGINT) AS dot_q
         |       FROM vec a JOIN vec b
         |         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT ida, idb, dot_q,
         |  CAST(dot_q AS DOUBLE)
         |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |FROM dt
         |JOIN n2 na ON na.doc_id = ida
         |JOIN n2 nb ON nb.doc_id = idb
         |WHERE (CAST(dot_q AS HUGEINT) * dot_q) * 25
         |  >= (CAST(na.n2 AS HUGEINT) * nb.n2) * 16
         |ORDER BY ida, idb""".stripMargin
    },
    // directed pairs, asymmetric |Sa∩Sb|/|Sa| denominator — string
    // shingles vs the engine's 64-bit hashes, same collision argument
    "q_containment" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
         |s AS (SELECT doc_id, list_distinct(list_transform(
         |        range(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
         |      FROM t WHERE len(tk) >= 3),
         |idx AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
         |sizes AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
         |common AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
         |           FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
         |           GROUP BY 1, 2)
         |SELECT ida, idb, CAST(inter AS DOUBLE) / na.n AS containment
         |FROM common JOIN sizes na ON na.doc_id = ida
         |WHERE CAST(inter AS DOUBLE) / na.n >= 0.9
         |ORDER BY ida, idb""".stripMargin,
    "q_fuzzy_join" -> duckFuzzy,
    "q_fuzzy_jw" -> duckFuzzyJw,
    "q_fuzzy_indel" -> duckFuzzyIndel,
    "q_fuzzy_lev3" -> duckFuzzyLev3,
    // (shingle, source)-distinct inverted index, then a source-keyed
    // self-join — 1-based tk[i..i+2] over i = 1..len-2 mirrors
    // shinglesFromTokens' sequence(0, size-3) exactly
    "q_cross_source_overlap" ->
      s"""WITH t AS (SELECT source, $duckTokens AS tk FROM documents),
        |sh AS (SELECT DISTINCT source, unnest(
        |         list_transform(range(1, len(tk) - 1),
        |           i -> tk[CAST(i AS INTEGER)] || ' '
        |             || tk[CAST(i AS INTEGER) + 1] || ' '
        |             || tk[CAST(i AS INTEGER) + 2])) AS shingle
        |       FROM t)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  count(*) AS n_shared
        |FROM sh a JOIN sh b ON a.shingle = b.shingle
        |  AND a.source < b.source
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_dedup_clusters" -> duckClusters,
    "q_pagerank" -> duckPagerank,
    "q_bfs_hops" -> duckBfsHops,
    // canonical edges make each triangle x<y<z appear exactly once as
    // e(x,y) ⋈ e(y,z) closed by e(x,z) — same shared pair CTEs
    "q_triangles" ->
      s"""WITH $duckShingleBody,
         |e AS (SELECT ida, idb FROM pairs),
         |tri AS (SELECT e1.ida AS x, e1.idb AS y, e2.idb AS z
         |        FROM e e1 JOIN e e2 ON e2.ida = e1.idb
         |        WHERE EXISTS (SELECT 1 FROM e e3
         |                      WHERE e3.ida = e1.ida AND e3.idb = e2.idb)),
         |n AS (SELECT x AS doc_id FROM tri
         |      UNION ALL SELECT y FROM tri
         |      UNION ALL SELECT z FROM tri)
         |SELECT doc_id, count(*) AS n_tri FROM n
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same oracle — the distributed large-star/small-star branch must
    // produce byte-identical labels to the driver union-find branch
    "q_dedup_clusters_dist" -> duckClusters,
    // same oracle again — the qAggIncremental convention: the
    // incremental merge (stored labels ∪ delta edges, history never
    // rescanned) must equal the FULL recompute, re-proving the
    // star-forest merge law at every SF
    "q_dedup_clusters_incremental" -> duckClusters,
    // Golden-record survivorship: same cluster chain, per-cluster
    // packed argmax (max n_chars, ties -> min doc_id) + membership
    // and conflict-signal counts.
    "q_golden_record" ->
      s"""WITH RECURSIVE $duckClusterBody,
         |j AS (SELECT cl.cluster_id, d.doc_id, d.source, d.lang,
         |        d.n_chars
         |      FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
         |SELECT cluster_id, count(*) AS n_members,
         |  CAST(max(n_chars) * 10000000000 -
         |    max(n_chars * 10000000000 - doc_id) AS BIGINT)
         |    AS survivor_doc,
         |  CAST(max(n_chars) AS BIGINT) AS survivor_chars,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM j GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,
    "q_dedup_keep" ->
      s"""WITH RECURSIVE $duckShingleBody,
        |und AS (SELECT ida AS a, idb AS b FROM pairs
        |        UNION ALL SELECT idb, ida FROM pairs),
        |reach(a, b) AS (SELECT DISTINCT a, a FROM und
        |                UNION
        |                SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |labels AS (SELECT a AS doc_id, MIN(b) AS cluster_id
        |           FROM reach GROUP BY a)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id NOT IN
        |  (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
        |ORDER BY doc_id""".stripMargin,
    // string shingles ≡ the Spark side's 64-bit shingle hashes up to
    // vanishing collision probability (same argument as q_jaccard_pairs)
    "q_contamination" ->
      s"""WITH $duckShingleBody
        |SELECT DISTINCT doc_id FROM idx
        |WHERE doc_id >= 10
        |  AND shingle IN (SELECT DISTINCT shingle FROM idx WHERE doc_id < 10)
        |ORDER BY doc_id""".stripMargin,
    // Bloom pre-pass is output-invisible (false positives removed by
    // the exact verify join) → same oracle as the exact path.
    "q_contamination_bloom" ->
      s"""WITH $duckShingleBody
        |SELECT DISTINCT doc_id FROM idx
        |WHERE doc_id >= 10
        |  AND shingle IN (SELECT DISTINCT shingle FROM idx WHERE doc_id < 10)
        |ORDER BY doc_id""".stripMargin,
    "q_curate" ->
      s"""WITH t AS (SELECT doc_id, source, text, $duckTokens AS tk FROM documents),
        |q AS (SELECT doc_id, source,
        |$duckQuality
        |    AS quality
        |      FROM t),
        |r AS (SELECT doc_id, source, quality,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY quality DESC, doc_id) AS rank
        |      FROM q)
        |SELECT doc_id, source, quality, rank FROM r
        |WHERE rank <= 20
        |ORDER BY source, rank""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_shipped,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_approx_err" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  true AS within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the HLL estimate itself is implementation-defined and never
    // leaves the query; the oracle asserts the 5% bound from the
    // exact side (the q_approx_err pattern) — r18, closing the last
    // no_oracle registry row
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS nd_orders,
        |  true AS within_5pct
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // per-column profile rows; numeric extremes via DECIMAL(18,4) to
    // pin one string rendering across engines
    "q_profile" -> {
      def prow(c: String, numeric: Boolean) = {
        def r(agg: String) =
          if (numeric) s"CAST(CAST($agg($c) AS DECIMAL(18,4)) AS VARCHAR)"
          else s"CAST($agg($c) AS VARCHAR)"
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  ${r("min")} AS min_value, ${r("max")} AS max_value
           |FROM lineitem""".stripMargin
      }
      Seq("l_quantity" -> true, "l_extendedprice" -> true,
        "l_discount" -> true, "l_returnflag" -> false,
        "l_linestatus" -> false)
        .map((prow _).tupled).mkString("", "\nUNION ALL\n",
          "\nORDER BY \"column\"")
    },
    // same bound-query pattern: the sketch value never leaves the
    // query, only the (order-independent) rank guarantee does
    "q_approx_pct" ->
      """SELECT l_returnflag, true AS within_bound
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // decimal(30,15) sums then one double division — the same
    // machinery the k-means iterations use, here under the oracle
    "q_label_centroids" -> {
      val means = (0 until 8).map(i =>
        s"CAST(SUM(CAST(round(v[${i + 1}] * 1e9) AS BIGINT)) AS DOUBLE)" +
          s" / COUNT(*) / 1e9 AS m$i").mkString(",\n        |  ")
      s"""SELECT label, COUNT(*) AS n,
        |  $means
        |FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
        |GROUP BY label
        |ORDER BY label""".stripMargin
    },
    // fixed-centroid squared-distance argmin: centroids = first 8
    // corpus vectors, d2 = −2·ip(v,c) + ip(c,c) (the shared |v|² term
    // cancels under argmin), ties to the lowest cid — bit-identical
    // sequential double sums on both sides, so the literal-projection
    // AND broadcast-expression codegen paths hash-check against the
    // same SQL.
    "q_kmeans_assign" -> kmeansAssignOracle,
    "q_kmeans_assign_expr" -> kmeansAssignOracle,
    // the FULL k-means fixpoint (r17, previously rows-only): three
    // unrolled integer-exact Lloyd iterations — see duckLloydCtes for
    // the lattice/rounding contract with the engine
    "q_embed_cluster" -> embedClusterOracle,
    // SemDeDup keep-list (r17, previously rows-only): Lloyd chain at
    // ⌈√n⌉ cells + integer cosine + recursive min-label closure
    "q_semdedup_keep" -> semdedupKeepOracle,
    "q_pq_assign" -> pqAssignOracle,
    "q_pq_assign_expr" -> pqAssignOracle,
    // IVF ANN: centroids = first ⌈√n⌉ corpus vectors, inner-product
    // assignment, nprobe=2, exact cosine re-rank — all expressible on
    // bit-identical list_inner_product, so cells and ranks reproduce
    // at any n-derived cell count.
    "q_ann_ivf" -> duckAnnIvf,
    // Lloyd-fitted IVF (r17, previously rows-only) — integer-lattice
    // quantizer CTEs + the shared raw-vector cosine tail
    "q_ann_ivf_km" -> annIvfKmOracle,
    // IVF-PQ (r17, previously rows-only) — per-subspace lattice
    // codebooks, exact-integer ADC, raw-cosine re-rank
    "q_ann_pq" -> annPqOracle,
    // the codegen-path twins: the LSH one forces the loop expression
    // against the SAME oracle (identical bits is the point); the IVF
    // one pins k=16 — the literal branch's own domain — so its oracle
    // fixes the same k instead of deriving it
    "q_ann_lsh_lit" -> duckAnnLsh,
    "q_ann_ivf_lit" -> duckAnnIvf16,
    // RRF fusion of the two ANN lists: both oracles ride along as
    // CTEs, the fused score is the identically-computed double
    // Σ 1/(rank+60) (≤ 2 addends — order-free)
    "q_ann_fused" -> duckAnnFused,
    // recall@3 of each ANN path: all three ANN oracles plus an exact
    // brute-force truth CTE compose into one statement; recall is an
    // exact small-integer count / 3.0 — hash-stable
    "q_ann_recall" ->
      s"""WITH lshq AS ($duckAnnLsh),
        |ivfq AS ($duckAnnIvf),
        |fusedq AS ($duckAnnFused),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT q.vec_id AS qid, n.vec_id AS nid,
        |         list_inner_product(q.v, n.v)
        |           / (sqrt(list_inner_product(q.v, q.v))
        |              * sqrt(list_inner_product(n.v, n.v))) AS score
        |       FROM e q JOIN e n ON n.vec_id <> q.vec_id
        |       WHERE q.vec_id < 50),
        |truth AS (SELECT qid, nid FROM (
        |            SELECT qid, nid,
        |              row_number() OVER (PARTITION BY qid
        |                ORDER BY score DESC, nid) AS rank
        |            FROM sc) t
        |          WHERE rank <= 3)
        |SELECT t.qid,
        |  CAST(SUM(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 3.0 AS recall_lsh,
        |  CAST(SUM(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 3.0 AS recall_ivf,
        |  CAST(SUM(CASE WHEN f.nid IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / 3.0 AS recall_fused
        |FROM truth t
        |LEFT JOIN lshq l ON l.qid = t.qid AND l.nid = t.nid
        |LEFT JOIN ivfq i ON i.qid = t.qid AND i.nid = t.nid
        |LEFT JOIN fusedq f ON f.qid = t.qid AND f.nid = t.nid
        |GROUP BY t.qid
        |ORDER BY t.qid""".stripMargin,
    // offsets are SHARD-local (shard = source): PARTITION BY source in
    // both engines, integer `//` matching Spark's `div`
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, len($duckTokens) AS ntk
        |           FROM documents),
        |c AS (SELECT doc_id, source, CAST(ntk AS BIGINT) AS ntk,
        |        CAST(SUM(ntk) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
        |      FROM t)
        |SELECT doc_id, source, ntk, end_off - ntk AS start_off,
        |  (end_off - ntk) // 512 AS seq_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    "q_sql_correlated" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part p
        |WHERE p_retailprice >=
        |  (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
        |          / COUNT(*) * 1.05
        |   FROM part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin,
    "q_topk_grouped" ->
      """SELECT o_orderpriority, rank, o_totalprice, o_orderkey FROM (
        |  SELECT o_orderpriority, o_totalprice, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) t
        |WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,
    "q_source_stats" ->
      s"""WITH t AS (SELECT source, text, $duckTokens AS tk FROM documents),
        |p AS (SELECT source,
        |        CAST(len(tk) AS BIGINT) AS ntk,
        |        CAST(length(text) AS BIGINT) AS nch,
        |$duckQuality
        |    AS q
        |      FROM t)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(ntk) AS BIGINT) AS total_tokens,
        |  CAST(SUM(nch) AS BIGINT) AS total_chars,
        |  MIN(q) AS min_quality,
        |  MAX(q) AS max_quality
        |FROM p
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // same md5 bucketing as q_holdout_split; per-source rate from the
    // trailing (<=2) digits — (n%4+1)*20 percent, 50 when digitless
    // (CASE guards the cast, mirroring the Spark side's `when`)
    "q_train_mix" ->
      """WITH h AS (SELECT doc_id, source,
        |             md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
        |b AS (SELECT doc_id, source,
        |        ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
        |       + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
        |       + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100
        |          AS bucket,
        |        CASE WHEN regexp_extract(source, '([0-9]{1,2})$', 1) = ''
        |             THEN 50
        |             ELSE (CAST(regexp_extract(source, '([0-9]{1,2})$', 1)
        |                     AS INT) % 4 + 1) * 20 END
        |          AS rate
        |      FROM h)
        |SELECT doc_id, source FROM b WHERE bucket < rate
        |ORDER BY doc_id""".stripMargin,
    "q_window_pct" ->
      """SELECT o_orderpriority, o_orderkey,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(CAST(o_orderdate AS DATE)) AS y,
        |  quarter(CAST(o_orderdate AS DATE)) AS qtr,
        |  month(CAST(o_orderdate AS DATE)) AS mo,
        |  day(CAST(o_orderdate AS DATE)) AS dom,
        |  CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
        |    AS VARCHAR) AS month_start,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS days_since,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // TRY_CAST mirrors Spark's null-on-miss cast semantics — a
    // malformed props row must degrade to null in BOTH engines, not
    // error the oracle (same convention as the ingest oracle)
    // json_valid guard mirrors Spark's lenient get_json_object (null
    // on malformed JSON) — DuckDB's json_extract_string RAISES on
    // invalid input, and TRY_CAST only covers cast misses, so without
    // the guard a malformed props row would null in Spark but error
    // the oracle
    "q_json_funcs" ->
      """WITH p AS (SELECT event_type,
        |    TRY_CAST(CASE WHEN json_valid(props)
        |      THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
    // instr↔strpos, regexp_replace needs the 'g' flag to match
    // Spark's replace-all default
    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up,
        |  length(c_name) AS len,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |  substring(c_name, 1, 8) AS prefix,
        |  strpos(c_name, '#') AS hash_at,
        |  regexp_replace(c_name, '[0-9]', '', 'g') AS no_digits,
        |  reverse(c_name) AS rev,
        |  concat_ws('|', c_mktsegment, c_name) AS tagged
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_holdout_split" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
        |           FROM documents),
        |b AS (SELECT doc_id,
        |        CAST(((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100
        |          AS BIGINT) AS bucket
        |      FROM h)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 90 THEN 'train'
        |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    // Leakage-safe split: same cluster chain, group id = cluster
    // label (or the doc itself), the holdout bucket math on the GROUP.
    "q_split_leakage_safe" ->
      s"""WITH RECURSIVE $duckClusterBody,
         |g AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id)
         |        AS group_id
         |      FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
         |h AS (SELECT doc_id, group_id,
         |        md5(CAST(group_id AS VARCHAR)) AS hx FROM g),
         |b AS (SELECT doc_id, group_id,
         |        CAST(((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
         |            + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
         |            + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
         |            + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100
         |          AS BIGINT) AS bucket
         |      FROM h)
         |SELECT doc_id, group_id, bucket,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |FROM b
         |ORDER BY doc_id""".stripMargin,
    "q_token_hist" ->
      s"""WITH t AS (SELECT len($duckTokens) AS ntk FROM documents)
        |SELECT CAST(ntk // 50 * 50 AS BIGINT) AS bin_lo, COUNT(*) AS n_docs
        |FROM t
        |GROUP BY 1
        |ORDER BY bin_lo""".stripMargin,
    // Passage-level dedup: same 10-token chunking, keep-first by
    // (doc_id, pos), reassembled text compared as md5 — coalesce('')
    // matches Spark's array_join-of-empty for all-dropped docs.
    "q_passage_dedup" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |tt AS (SELECT doc_id, tk FROM t WHERE len(tk) > 0),
        |ps AS (SELECT doc_id, list_transform(range(0, (len(tk) + 9) // 10),
        |         i -> array_to_string(tk[i*10+1:i*10+10], ' ')) AS pl
        |       FROM tt),
        |ex AS (SELECT doc_id, unnest(pl) AS passage,
        |         unnest(range(1, len(pl) + 1)) AS pos FROM ps),
        |mk AS (SELECT doc_id, pos, passage,
        |         row_number() OVER (PARTITION BY passage
        |                            ORDER BY doc_id, pos) = 1 AS keep
        |       FROM ex)
        |SELECT doc_id, count(*) AS n_passages,
        |  count(*) FILTER (WHERE keep) AS n_kept,
        |  md5(coalesce(string_agg(passage, ' ' ORDER BY pos)
        |        FILTER (WHERE keep), '')) AS clean_fp
        |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Exact substring dedup: sliding substrLen-token windows (vs the
    // chunked passage oracle above), keep-first by (doc_id, pos) over
    // the window STRING (Spark groups by the fnv1a hash — identical
    // up to the vanishing 64-bit collision bound), non-first instances
    // mark [pos, pos+W) for removal, tokens surviving the span union
    // reassemble per doc. coalesce('') matches Spark's md5 of the
    // empty string for fully-removed docs. The width interpolates
    // from TextOps.substrLen (the engine's tunable) so the oracle
    // cannot drift from it.
    "q_substring_dedup" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |n AS (SELECT doc_id, tk, len(tk) AS nt FROM t WHERE len(tk) > 0),
        |w AS (SELECT doc_id, tk, unnest(range(nt - ${TextOps.substrLen - 1}))
        |        AS pos
        |      FROM n WHERE nt >= ${TextOps.substrLen}),
        |w2 AS (SELECT doc_id, pos,
        |         array_to_string(tk[pos+1:pos+${TextOps.substrLen}], ' ')
        |           AS win FROM w),
        |mk AS (SELECT doc_id, pos,
        |         row_number() OVER (PARTITION BY win
        |                            ORDER BY doc_id, pos) AS rn
        |       FROM w2),
        |rem AS (SELECT doc_id, pos FROM mk WHERE rn > 1),
        |tok AS (SELECT doc_id, nt, tk[j+1] AS tkn, j
        |        FROM (SELECT doc_id, nt, tk, unnest(range(nt)) AS j FROM n)),
        |marked AS (SELECT tok.doc_id, tok.nt, tok.tkn, tok.j,
        |         EXISTS (SELECT 1 FROM rem
        |                 WHERE rem.doc_id = tok.doc_id
        |                   AND rem.pos <= tok.j
        |                   AND tok.j < rem.pos + ${TextOps.substrLen})
        |           AS removed
        |       FROM tok)
        |SELECT doc_id, CAST(max(nt) AS BIGINT) AS n_tokens,
        |  CAST(count(*) FILTER (WHERE removed) AS BIGINT) AS n_removed,
        |  md5(coalesce(string_agg(tkn, ' ' ORDER BY j)
        |        FILTER (WHERE NOT removed), '')) AS clean_fp
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Real BPE over the pinned merge table: the shared recursive CTE
    // re-derives every word's merge sequence in pure SQL; the md5 of
    // the space-joined subword stream pins the SEQUENCE, not just the
    // count.
    "q_bpe_tokens" ->
      s"""WITH RECURSIVE $duckBpeCte,
        |per AS (SELECT tok.doc_id, tok.j, wb.n_bpe, wb.bpe_str
        |        FROM tok JOIN wb USING (word))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
        |  md5(string_agg(bpe_str, ' ' ORDER BY j)) AS bpe_fp
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The BPE TRAINER (r17, previously rows-only): 16 argmax rounds
    // unrolled as CTE stages, each re-deriving the merge winner and
    // replaying the vocabulary rewrite — see duckBpeTrainOracle. The
    // forced-distributed twin is row-identical by construction (shared
    // mergePass), so it carries the same oracle.
    "q_bpe_train" -> duckBpeTrainOracle,
    "q_bpe_train_dist" -> duckBpeTrainOracle,
    // The packing twin on BPE arithmetic — same shard-local window and
    // integer // as q_pack_sequences, counts from the recursive CTE.
    "q_pack_bpe" ->
      s"""WITH RECURSIVE $duckBpeCte,
        |per AS (SELECT tok.doc_id, tok.source,
        |          CAST(sum(wb.n_bpe) AS BIGINT) AS ntk
        |        FROM tok JOIN wb USING (word)
        |        GROUP BY tok.doc_id, tok.source),
        |c AS (SELECT doc_id, source, ntk,
        |        CAST(SUM(ntk) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
        |      FROM per)
        |SELECT doc_id, source, ntk, end_off - ntk AS start_off,
        |  (end_off - ntk) // 512 AS seq_id
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    // Commonness score: integer corpus-frequency sums, one double
    // division at the end — no transcendentals, so hash-exact.
    "q_unigram_score" ->
      s"""WITH tk AS (SELECT doc_id, unnest($duckTokens) AS term FROM documents),
        |tf AS (SELECT term, count(*) AS c FROM tk GROUP BY term),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tf)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(c) AS DOUBLE) / CAST(count(*) * total AS DOUBLE) AS score
        |FROM tk JOIN tf USING (term) CROSS JOIN tot
        |GROUP BY doc_id, total
        |ORDER BY doc_id""".stripMargin,
    // MinHash+LSH candidates are exact-verified, and at the J>=0.8
    // output threshold the 32x2 banding misses a pair with
    // P <= (1-0.64)^32 ~= 5e-15 — so the oracle is the same exact
    // inverted-index Jaccard SQL.
    "q_dedup_minhash" -> duckShingleCte,
    // the MinHash audit oracle: exact inter/union per verified pair,
    // TRUE within_bound — a broken signature flips booleans (the
    // q_cms_err pattern; the estimate itself never leaves the query)
    "q_minhash_err" ->
      s"""WITH $duckShingleBody,
        |iu AS (SELECT c.ida, c.idb, CAST(c.inter AS BIGINT) AS inter,
        |         CAST(na.n + nb.n - c.inter AS BIGINT) AS uni
        |       FROM common c
        |       JOIN sizes na ON na.doc_id = c.ida
        |       JOIN sizes nb ON nb.doc_id = c.idb
        |       JOIN pairs p ON p.ida = c.ida AND p.idb = c.idb)
        |SELECT ida, idb, inter, uni, TRUE AS within_bound FROM iu
        |ORDER BY ida, idb""".stripMargin,
    // the CMS bound oracle is the exact top-30 with TRUE per row —
    // the q_approx_err pattern: a sketch over- or under-count at any
    // term flips a boolean and breaks the hash
    "q_cms_err" ->
      s"""WITH tk AS (SELECT unnest($duckTokens) AS term FROM documents),
        |c AS (SELECT term, count(*) AS exact FROM tk GROUP BY term
        |      ORDER BY exact DESC, term LIMIT 30)
        |SELECT term, exact, TRUE AS within_bound FROM c
        |ORDER BY term""".stripMargin,
    // integer frequency sums; exactly three IEEE divisions at the end
    // (the q_unigram_score convention), so the double hash-matches
    "q_importance_ratio" ->
      s"""WITH tk AS (SELECT doc_id, source, unnest($duckTokens) AS term
        |           FROM documents),
        |tfr AS (SELECT term, count(*) AS cr FROM tk GROUP BY term),
        |tft AS (SELECT term, count(*) AS ct FROM tk
        |        WHERE source = '${TextOps.importanceTargetSource}'
        |        GROUP BY term),
        |tot AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM tfr) AS tr,
        |               (SELECT CAST(sum(ct) AS BIGINT) FROM tft) AS tt),
        |p AS (SELECT tk.doc_id, count(*) AS n_tokens,
        |        CAST(sum(tfr.cr) AS BIGINT) AS sum_cr,
        |        CAST(sum(COALESCE(tft.ct, 0)) AS BIGINT) AS sum_ct
        |      FROM tk JOIN tfr USING (term)
        |      LEFT JOIN tft ON tft.term = tk.term
        |      GROUP BY tk.doc_id)
        |SELECT doc_id, n_tokens,
        |  (CAST(sum_ct AS DOUBLE) / tt) / (CAST(sum_cr AS DOUBLE) / tr)
        |    AS w
        |FROM p CROSS JOIN tot
        |ORDER BY doc_id""".stripMargin,
    // boundary rule re-derived from md5 over the same 4-token window
    // strings; chunk id = running count of earlier boundaries
    "q_cdc_chunk" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |tt AS (SELECT doc_id, tk FROM t WHERE len(tk) > 0),
        |p AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS pos
        |      FROM tt),
        |b AS (SELECT doc_id, pos, tk[pos] AS tok,
        |        CASE WHEN pos >= 4 AND substring(md5(
        |            tk[pos-3] || ' ' || tk[pos-2] || ' ' ||
        |            tk[pos-1] || ' ' || tk[pos]), 32, 1) = '0'
        |          THEN 1 ELSE 0 END AS brk
        |      FROM p),
        |c AS (SELECT doc_id, pos, tok,
        |        COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cid
        |      FROM b)
        |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
        |  CAST(min(pos) AS BIGINT) AS start_tok,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
        |FROM c GROUP BY doc_id, cid
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // the same md5 permutation as the stratified sample; running
    // token sums are integers, so the budget cut is engine-exact
    "q_token_budget_mix" ->
      s"""WITH t AS (SELECT doc_id, source,
        |             md5(CAST(doc_id AS VARCHAR)) AS hx,
        |             CAST(len($duckTokens) AS BIGINT) AS ntk
        |           FROM documents),
        |c AS (SELECT doc_id, source, ntk,
        |        SUM(ntk) OVER (PARTITION BY source ORDER BY hx, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT doc_id, source, ntk, CAST(cum AS BIGINT) AS cum FROM c
        |WHERE cum <= ${TextOps.tokenBudget}
        |ORDER BY doc_id""".stripMargin,
    // Temperature mix: the same md5-window greedy fill under derived
    // isqrt-share budgets (all-integer share arithmetic).
    "q_temperature_mix" ->
      s"""WITH d AS (SELECT doc_id, lang,
        |             md5(CAST(doc_id AS VARCHAR)) AS hx,
        |             CAST(len($duckTokens) AS BIGINT) AS ntk
        |           FROM documents WHERE lang IS NOT NULL),
        |nl AS (SELECT lang, CAST(SUM(ntk) AS BIGINT) AS n_l
        |       FROM d GROUP BY 1),
        |sh AS (SELECT lang, n_l,
        |         CAST(floor(sqrt(CAST(n_l AS DOUBLE))) AS BIGINT) AS s_l
        |       FROM nl),
        |tt AS (SELECT CAST(SUM(s_l) AS BIGINT) AS s_tot,
        |         CAST(SUM(n_l) AS BIGINT) AS n_tot FROM sh),
        |bg AS (SELECT lang, (s_l * (n_tot // 2)) // s_tot AS b_l
        |       FROM sh, tt),
        |c AS (SELECT doc_id, lang, ntk,
        |        SUM(ntk) OVER (PARTITION BY lang ORDER BY hx, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM d)
        |SELECT c.doc_id, c.lang, c.ntk, CAST(c.cum AS BIGINT) AS cum,
        |  b.b_l
        |FROM c JOIN bg b USING (lang)
        |WHERE c.cum <= b.b_l
        |ORDER BY c.doc_id""".stripMargin,
    // md5-hex ordering is identical in both engines (lowercase hex
    // string compare), so the per-source permutation and its first
    // `stratifiedQuota` rows are too
    "q_sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, source,
        |             md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY hx, doc_id) AS rn
        |      FROM h)
        |SELECT doc_id, source, rn FROM r
        |WHERE rn <= ${TextOps.stratifiedQuota}
        |ORDER BY doc_id""".stripMargin,
    // percent_rank = (rank-1)/(n-1): exact rational arithmetic; ties
    // on q share a rank, so no tie-break column is needed
    "q_quality_calibrated" ->
      s"""WITH t AS (SELECT doc_id, source, text, $duckTokens AS tk
        |           FROM documents),
        |qs AS (SELECT doc_id, source,
        |$duckQuality
        |    AS q
        |       FROM t),
        |p AS (SELECT doc_id, source, q,
        |        percent_rank() OVER (PARTITION BY source ORDER BY q) AS pct
        |      FROM qs)
        |SELECT doc_id, source, q, pct FROM p
        |WHERE pct >= ${TextOps.calibratedCut}
        |ORDER BY doc_id""".stripMargin,
    // the histogram-cut twin restates the INTEGER threshold form
    // independently of percent_rank: keep ⟺ 5·cntLess(q) ≥ n−1
    // (exactly pct ≥ 0.2 — the IEEE division cannot disagree below
    // n ~ 4e17), i.e. q ≥ the per-source min value satisfying it;
    // singleton sources have no qualifying value and drop
    "q_quality_calibrated_cut" ->
      s"""WITH t AS (SELECT doc_id, source, text, $duckTokens AS tk
        |           FROM documents),
        |qs AS (SELECT doc_id, source,
        |$duckQuality
        |    AS q
        |       FROM t),
        |c AS (SELECT source, q, count(*) AS c FROM qs GROUP BY source, q),
        |x AS (SELECT source, q,
        |        COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY q
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cum_less,
        |        SUM(c) OVER (PARTITION BY source) AS n
        |      FROM c),
        |th AS (SELECT source, MIN(q) AS t FROM x
        |       WHERE n > 1 AND 5 * cum_less >= n - 1
        |       GROUP BY source)
        |SELECT qs.doc_id, qs.source, qs.q
        |FROM qs JOIN th ON qs.source = th.source AND qs.q >= th.t
        |ORDER BY qs.doc_id""".stripMargin,
    // string-shingle df rebuilt from scratch; the Spark side counts
    // the same sets under the 64-bit FNV hash identity (collision
    // odds ~n²/2⁻⁶⁴ — the q_jaccard_pairs convention)
    "q_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $duckTokens AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |        range(1, len(tk)-1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |      FROM t WHERE len(tk) >= 3),
        |idx AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
        |dfs AS (SELECT shingle, count(*) AS df FROM idx GROUP BY shingle),
        |j AS (SELECT i.doc_id, d.df
        |      FROM idx i JOIN dfs d ON i.shingle = d.shingle)
        |SELECT doc_id, count(*) AS n_sh,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS novelty
        |FROM j GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // the same 4-hex-digit md5 bucket as q_holdout_split selects the
    // change rows; double ×1.1/×0.5 are single IEEE multiplies, so
    // both engines produce the identical repriced values
    "q_merge_upsert" ->
      """WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |           FROM orders),
        |h AS (SELECT o_orderkey,
        |        ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
        |       + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
        |       + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100
        |          AS bucket
        |      FROM (SELECT o_orderkey,
        |              md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM b)),
        |u AS (SELECT b.o_orderkey, b.o_custkey AS c_custkey,
        |        'U' AS c_status, b.o_totalprice * 1.1 AS c_price
        |      FROM b JOIN h USING (o_orderkey) WHERE bucket < 10),
        |i AS (SELECT -b.o_orderkey AS o_orderkey, b.o_custkey AS c_custkey,
        |        'N' AS c_status, b.o_totalprice * 0.5 AS c_price
        |      FROM b JOIN h USING (o_orderkey) WHERE bucket >= 95),
        |c AS (SELECT * FROM u UNION ALL SELECT * FROM i),
        |mk AS (SELECT b.o_orderkey, b.o_custkey,
        |         coalesce(c.c_status, b.o_orderstatus) AS status,
        |         coalesce(c.c_price, b.o_totalprice) AS price,
        |         CASE WHEN c.c_price IS NOT NULL
        |              THEN 'update' ELSE 'keep' END AS op
        |       FROM b LEFT JOIN c ON b.o_orderkey = c.o_orderkey),
        |nm AS (SELECT c.o_orderkey, c.c_custkey AS o_custkey,
        |         c.c_status AS status, c.c_price AS price, 'insert' AS op
        |       FROM c WHERE NOT EXISTS
        |         (SELECT 1 FROM b WHERE b.o_orderkey = c.o_orderkey))
        |SELECT o_orderkey, o_custkey, status, price, op FROM mk
        |UNION ALL
        |SELECT o_orderkey, o_custkey, status, price, op FROM nm
        |ORDER BY o_orderkey""".stripMargin,
    "q_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT qid, e.vec_id AS nid,
        |        list_inner_product(qv, v)
        |          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))) AS score
        |      FROM e, q WHERE e.vec_id <> qid),
        |r AS (SELECT qid, nid, score,
        |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
        |      FROM s)
        |SELECT qid, nid, rank, score FROM r
        |WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,
    // Hard negatives: transitive near-dup closure labels both sides
    // of the scored stream; survivors rank by score.
    "q_hard_negatives" -> {
      val cos = "list_inner_product(%1$s, %2$s) / (sqrt(list_inner_product(%1$s, %1$s)) * sqrt(list_inner_product(%2$s, %2$s)))"
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |       FROM embeddings),
         |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb
         |      FROM e a JOIN e b ON a.vec_id < b.vec_id
         |      WHERE ${cos.format("a.v", "b.v")} >= 0.4),
         |und AS (SELECT ida AS x, idb AS y FROM p
         |        UNION ALL SELECT idb, ida FROM p),
         |reach(x, y) AS (SELECT DISTINCT x, x FROM und
         |                UNION
         |                SELECT r.x, u.y FROM reach r
         |                JOIN und u ON r.y = u.x),
         |lab AS (SELECT x AS id, MIN(y) AS label FROM reach GROUP BY x),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 16),
         |s AS (SELECT qid, e.vec_id AS nid,
         |        ${cos.format("qv", "v")} AS score
         |      FROM e, q WHERE e.vec_id <> qid),
         |f AS (SELECT s.qid, s.nid, s.score FROM s
         |      LEFT JOIN lab ql ON ql.id = s.qid
         |      LEFT JOIN lab nl ON nl.id = s.nid
         |      WHERE ql.label IS NULL OR nl.label IS NULL
         |         OR ql.label <> nl.label),
         |r AS (SELECT qid, nid, score, row_number() OVER
         |        (PARTITION BY qid ORDER BY score DESC, nid) AS rank
         |      FROM f)
         |SELECT qid, nid, rank, score FROM r
         |WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin
    },
    // MMR re-rank: the greedy argmax unrolled into one CTE per step
    // (sel_i picks rank i; selu_i accumulates the selected set) —
    // DuckDB re-derives the full trajectory, so a single divergent
    // comparison anywhere in the greedy walk breaks the hash.
    "q_mmr_rerank" -> {
      val lam = Similarity.mmrLambda
      val mu = Similarity.mmrMu
      val cos = "list_inner_product(%1$s, %2$s) / (sqrt(list_inner_product(%1$s, %1$s)) * sqrt(list_inner_product(%2$s, %2$s)))"
      val steps = (2 to Similarity.mmrK).map { i =>
        s"""sel$i AS (
           |  SELECT qid, nid, score, $i AS rank FROM (
           |    SELECT c.qid, c.nid, c.score,
           |      row_number() OVER (PARTITION BY c.qid
           |        ORDER BY $lam * c.score - $mu * c.mx DESC, c.nid) AS rn
           |    FROM (SELECT sl.qid, sl.nid, sl.score, max(pr.sim) AS mx
           |          FROM sl
           |          JOIN pr ON pr.qid = sl.qid AND pr.na = sl.nid
           |          JOIN selu${i - 1} s
           |            ON s.qid = pr.qid AND s.nid = pr.nb
           |          WHERE NOT EXISTS (SELECT 1 FROM selu${i - 1} x
           |                            WHERE x.qid = sl.qid
           |                              AND x.nid = sl.nid)
           |          GROUP BY 1, 2, 3) c) WHERE rn = 1),
           |selu$i AS (SELECT qid, nid FROM selu${i - 1}
           |           UNION ALL SELECT qid, nid FROM sel$i)""".stripMargin
      }.mkString(",\n")
      val union = (1 to Similarity.mmrK)
        .map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 4),
         |s0 AS (SELECT qid, e.vec_id AS nid,
         |         ${cos.format("qv", "v")} AS score
         |       FROM e, q WHERE e.vec_id <> qid),
         |sl AS (SELECT qid, nid, score FROM (
         |         SELECT qid, nid, score, row_number() OVER
         |           (PARTITION BY qid ORDER BY score DESC, nid) AS rk
         |         FROM s0)
         |       WHERE rk <= ${Similarity.mmrShortlist}),
         |slv AS (SELECT sl.qid, sl.nid, sl.score, e.v
         |        FROM sl JOIN e ON e.vec_id = sl.nid),
         |pr AS (SELECT a.qid, a.nid AS na, b.nid AS nb,
         |         ${cos.format("a.v", "b.v")} AS sim
         |       FROM slv a JOIN slv b
         |         ON a.qid = b.qid AND a.nid <> b.nid),
         |sel1 AS (SELECT qid, nid, score, 1 AS rank FROM (
         |          SELECT qid, nid, score, row_number() OVER
         |            (PARTITION BY qid ORDER BY score DESC, nid) AS rn
         |          FROM sl) WHERE rn = 1),
         |selu1 AS (SELECT qid, nid FROM sel1),
         |$steps
         |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, score
         |FROM ($union)
         |ORDER BY qid, rank""".stripMargin
    },
    // JL projection: each component re-derived against the same
    // embedded plane literals the LSH oracles use; the sqrt(3/k)
    // scale embeds via Double.toString (shortest round-trip, so both
    // engines parse the identical double)
    "q_embed_project" -> {
      val s = math.sqrt(3.0 / Similarity.projDim)
      val comps = (0 until Similarity.projDim).map(i =>
        s"list_inner_product(v, ${duckPlaneLit(Similarity.projPlaneBase + i)}) * $s AS p$i")
        .mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id,
        |  $comps
        |FROM e
        |ORDER BY vec_id""".stripMargin
    },
    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS ida, b.vec_id AS idb,
        |  list_inner_product(a.v, b.v)
        |    / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v)
        |    / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.4
        |ORDER BY ida, idb""".stripMargin,
    // documents text is pure ASCII, so DuckDB's VARCHAR sha256/substring
    // equal Spark's byte-level ops on the UTF-8 payload.
    "q_media_meta" ->
      """SELECT doc_id,
        |  (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |       ELSE 'mp4' END AS fmt,
        |  CAST((doc_id % 8) * 160 + 320 AS INTEGER) AS width,
        |  CAST((doc_id % 8) * 90 + 180 AS INTEGER) AS height,
        |  CAST(n_chars * 100 AS BIGINT) AS duration_ms
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id,
        |  hex(substring(text, 1, 8)) AS f_first,
        |  hex(substring(text, greatest(length(text) // 2, 1), 8)) AS f_mid,
        |  hex(substring(text, greatest(length(text) - 7, 1), 8)) AS f_last
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_media_resize" ->
      """SELECT doc_id,
        |  CAST(32 AS BIGINT) AS n_bytes,
        |  hex(rpad(substring(text, 1, 32), 32, '.')) AS resized_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $duckTokens AS tk FROM documents)
        |SELECT doc_id, lang,
        |$duckQuality
        |    AS quality
        |FROM t
        |WHERE
        |$duckQuality
        |  >= 0.5
        |ORDER BY doc_id""".stripMargin,
    "q_url_canonical" ->
      s"""$duckUrlCte
        |SELECT doc_id,
        |  scheme || '://' || host || portc || pathc ||
        |  CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS url_canon,
        |  host, $duckRegDomain AS domain
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_domain_rollup" ->
      s"""$duckUrlCte,
        |r AS (SELECT $duckRegDomain AS domain, host,
        |        scheme || '://' || host || portc || pathc ||
        |        CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS url_canon
        |      FROM c)
        |SELECT domain, count(*) AS n_urls,
        |  count(DISTINCT url_canon) AS n_distinct_urls,
        |  count(DISTINCT host) AS n_hosts
        |FROM r
        |WHERE domain NOT IN (${UrlOps.blockedDomains
           .map(d => s"'$d'").mkString(", ")})
        |GROUP BY domain ORDER BY domain""".stripMargin,
    "q_url_dedup" ->
      s"""$duckUrlCte
        |SELECT $duckRegDomain AS domain, pathc AS path,
        |  count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM c GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY domain, path""".stripMargin,
  )

  /** Shared canonicalization CTE for the URL-family oracles — rules
    * 1–7 of `UrlOps`' documented canonical form, restated in DuckDB
    * over the same synthetic derivation ([[UrlOps.syntheticUrlSql]]).
    * Ends at relation `c(doc_id, scheme, host, portc, pathc, qc)`. */
  private lazy val duckUrlCte: String =
    s"""WITH u AS (SELECT doc_id, ${UrlOps.syntheticUrlSql} AS url
       |           FROM documents),
       |nf0 AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf
       |        FROM u),
       |p AS (SELECT doc_id, nf,
       |        lower(regexp_extract(nf,
       |          '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |        regexp_replace(regexp_extract(nf,
       |          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
       |          '^[^@]*@', '') AS auth
       |      FROM nf0),
       |h AS (SELECT doc_id, nf, scheme,
       |        regexp_replace(lower(regexp_replace(auth, ':[0-9]+$$', '')),
       |          '^www\\.', '') AS host,
       |        regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
       |        regexp_extract(nf,
       |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
       |        regexp_extract(nf, '\\?(.*)$$', 1) AS q0
       |      FROM p),
       |c AS (SELECT doc_id, scheme, host,
       |        CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |              OR (scheme = 'https' AND port = '443') THEN ''
       |             ELSE ':' || port END AS portc,
       |        CASE WHEN regexp_replace(regexp_replace(path0,
       |               '/{2,}', '/', 'g'), '/$$', '') = '' THEN '/'
       |             ELSE regexp_replace(regexp_replace(path0,
       |               '/{2,}', '/', 'g'), '/$$', '') END AS pathc,
       |        array_to_string(list_sort(list_filter(string_split(q0, '&'),
       |          x -> x <> '' AND NOT regexp_matches(x,
       |            '^(utm_[a-z]+|gclid|fbclid|msclkid|ref|ref_src)='))),
       |          '&') AS qc
       |      FROM h)""".stripMargin

  /** Registered-domain CASE over `host` ([[UrlOps.registeredDomain]]
    * restated: last two labels, or three when the last two are a
    * recognized multi-label public suffix). */
  private lazy val duckRegDomain: String = {
    val suf = UrlOps.multiSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = ''
       |       THEN host
       |     WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) IN ($suf)
       |          AND regexp_extract(host,
       |            '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
       |       THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
       |     ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END"""
      .stripMargin.replace("\n", " ")
  }
}
