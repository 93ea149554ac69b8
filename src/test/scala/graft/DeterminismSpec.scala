package graft

import org.scalatest.funsuite.AnyFunSuite

/** Double-run determinism gate: executing every declared query twice
  * must produce byte-identical rows — catches unsorted collects, ties
  * without tiebreaks, and map-ordering leaks before the driver's
  * hash-compare does.
  */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is run-to-run deterministic at sf0.001") {
      def snapshot(): Seq[String] = {
        // a memoized index must not make the second run vacuous — the
        // build itself is part of what must be deterministic
        graft.tools.IndexCache.clear()
        fn(spark, sf0001).collect().toSeq.map(_.toString)
      }
      assert(snapshot() == snapshot())
    }
  }

  // the float-risky shapes (order-dependent partial aggregation, window
  // sums, cosine folds, collects) also double-run at the graded SF
  for (name <- Seq(
      "agg_stats", "agg_percentiles", "agg_collect_sorted", "win_frame_rows",
      "win_frame_range", "llm_simsearch_topk", "llm_knn_join", "llm_multimodal_join",
      "llm_tfidf_topterms", "udaf_weighted_avg", "llm_dedup_near",
      // round-2 float-risky shapes: regression aggs, rounded-decimal
      // reductions, window stddev, bigram-LM log sums, quantization
      "agg_regr", "llm_zipf_slope", "llm_label_outliers", "llm_bigram_score",
      "llm_doc_entropy", "llm_emb_quantize", "win_moving_stats",
      "agg_weighted_median", "llm_mix_weights", "agg_regr_per_user",
      // round-3: packed argmin/argmax key must stay in exact integer
      // arithmetic (ADVICE r2: double-typed key collapsed near-max
      // balances into 256-wide tie buckets)
      "agg_argminmax",
      // closing batch float-risky shapes: lag-chain smoothing, LM log
      // sums, MI terms, top-10 cosine rank boundaries
      "win_weighted_ma", "win_decayed_sum", "llm_unigram_logprob",
      "llm_mi_lang_source", "llm_ann_recall10",
      // session-3 float-risky shapes: squaring-chain S-curves, double
      // closed forms (Gini, z-stat), decimal-backed YoY doubles,
      // odds-ratio limit boundaries, corr matrix, norm folds,
      // unrounded integer-ratio shares
      "llm_lsh_tuning", "agg_gini_revenue", "agg_ab_conversion",
      "win_yoy_revenue", "llm_idf_drift", "agg_corr_matrix",
      "llm_emb_norm_audit", "agg_seasonality_dow",
      // round-6: the GlobalRank family MUST double-run at sf0.01 —
      // sf0.001 inputs fit RangePartitioner's reservoir sample, so the
      // boundary-divergence class the eager-materialization fix closed
      // (negative/duplicated ranks, CHANGES_r6 §10) is physically
      // unreachable there; only a sample-sized input exercises it
      "win_cume_dist", "win_ntile_pct", "win_pareto_decile",
      "agg_rfm_segments", "agg_mannwhitney", "agg_tail_hill",
      "llm_vocab_growth", "llm_vocab_coverage", "llm_rbo_rankings",
      "topk_diverse_sources", "topk_skyline", "llm_stopword_profile",
      // round-7 GlobalRank riders (runsum CDFs, double rank passes) +
      // the rounded-pow normalizer and rounded-LLR top-k cut
      "agg_ks_test", "agg_spearman", "llm_mix_temperature",
      "llm_keyness_llr", "llm_pmi_collocations",
      "llm_ann_ndcg", "win_rank_delta", "agg_jackknife_nation",
      // wave-4 rank/threshold cuts on rounded doubles: pairwise-slope
      // median selection, DSIR top-25 weight cut, BH step-up on p
      "agg_theil_sen", "llm_dsir_weights", "agg_fdr_bh",
      // waves 7/8: quantized block-R/S pivot, lag-window index pairing
      "agg_hurst_rs", "agg_price_index",
      // round-8: the GK sketch merges partials in shuffle-fetch order —
      // double-running at sf0.01 watches for merge-order sensitivity
      // the sf0.001 run can't see; the iterated BPE replace chain and
      // the bottom-k hash cut ride along
      "agg_approx_quantiles", "llm_bpe_merges", "llm_sample_bottomk",
      // round-8 wave 2: rounded-pow EWMA chains, quantized-ln entropy
      // sums, integer-unit rank cuts
      "win_macd", "agg_theil_u", "llm_rake_keyphrases",
      // round-8 wave 3: GlobalRank-rider rank tests with quantized
      // k-row term sums
      "agg_kruskal_wallis", "agg_levene_bf", "agg_friedman",
      // round-8 wave 4: quantized ln²/dd² sums, decimal covariances
      "win_parkinson_vol", "agg_ljung_box", "win_ulcer_index",
      // round-8 continuation: the new GlobalRank riders (runsum CDFs,
      // midrank blocks, PPS boundary cuts, descending ABC prefix) must
      // double-run at the SF where range boundaries actually sample;
      // the big-decimal→double casts (moments, Bartlett ln terms) and
      // the probe-rank metrics ride along
      "agg_emd_wasserstein", "llm_weighted_sample", "agg_abc_class",
      "agg_ansari_bradley", "agg_skew_kurtosis", "agg_bartlett",
      "llm_ann_mrr", "llm_ann_map", "agg_variance_ratio",
      "llm_dale_chall",
      // round-9 boundary-determinism reworks: the new exact-integer
      // explode-join / broadcast-weight-table shapes (win_macd's
      // contribution join, the EwmaWeights family, the quotient-
      // remainder splits) double-run to pin that the rewired plans
      // carry no run-order sensitivity
      "win_adx", "win_seasonal_decompose", "win_ewma_daily",
      "agg_bootstrap_se", "llm_emb_dim_variance",
      // round-9 surface waves: the new GlobalRank consumers (frequency
      // ranks, degree ranks, runsum Pareto prefix) double-run at the SF
      // where range boundaries actually sample; the 256-sample rank-
      // boundary evals, the ordinal double-cast chains and the
      // quantized-ln ledgers ride along
      "llm_token_gini", "llm_mean_word_rank", "graph_degree_gini",
      "agg_pareto_8020", "llm_ann_dim_truncate", "llm_emb_int8_recall",
      "agg_gk_gamma", "agg_log_return_vol", "agg_markov_entropy_rate",
      // round-10 window-campaign kernels: the fused gaps-and-islands
      // pass (withIslandSeq — exclusive end-max AND island prefix sum
      // off one range materialization), the distinct-value ledger
      // median, the partitioned weighted-quantile runsums and a
      // TopKPerGroup heap cut — double-run where range boundaries and
      // heap-merge order actually vary
      "win_interval_union", "agg_quadrant_corr", "agg_weighted_quantile",
      "agg_jonckheere", "llm_odds_ratio", "agg_median_mad",
      // round-12: bm25's rounded-log score now joins the docfreq
      // ledger — double-run at the SF where the ledger build's
      // shuffle-merge order actually varies (tfidf/idf_drift, the
      // other ledger consumers, are already above)
      "llm_bm25")) {
    test(s"$name is run-to-run deterministic at sf0.01") {
      val fn = SparkEntry.queries(name)
      def snapshot(): Seq[String] = {
        graft.tools.IndexCache.clear()
        fn(spark, sf001).collect().toSeq.map(_.toString)
      }
      assert(snapshot() == snapshot())
    }
  }
}
