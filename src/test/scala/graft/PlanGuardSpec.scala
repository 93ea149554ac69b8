package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan guard: every declared query's FINAL
  * plan is checked against join-shape rules at sf0.001. A lost
  * equi-condition, a dropped broadcast, or an accidental cross join in
  * the inspected plans fails here before it becomes a scale incident.
  *
  * Round 2's honest limitation — `localCheckpoint(true)` queries
  * execute their pre-checkpoint stages at construction, so the final
  * plan showed only a checkpoint scan — is closed: every builder now
  * routes its about-to-be-checkpointed frames through
  * `PlanCapture.stage`, and this guard asserts the SAME rules on each
  * captured pre-checkpoint physical plan. The only BNLJ allowed inside
  * captured stages is the ANN codebook's vectors × centroid-table
  * cross join, whose broadcast side is bounded by K=64 rows by
  * construction (tags `ann_*`).
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._
  import graft.tools.PlanCapture

  /** Queries that legitimately plan a BroadcastNestedLoopJoin — each
    * one broadcasts a PROVABLY tiny side (constant-bounded by
    * construction, never corpus-sized):
    *  - join_cross: the declared cross-join operator (25×5 dims)
    *  - gen_sequence_dates: 31-day calendar densify
    *  - llm_simsearch_topk: broadcast single query vector
    *  - llm_ann_multiprobe: the query row crossed with the 64-row
    *    codebook centroid table to rank probe cells
    *  - llm_bm25 / llm_tfidf_topterms: broadcast scalar corpus totals
    *  - agg_funnel: three 1-row stage counts cross-joined into the
    *    summary row
    *  - tpch_q22: the 1-row global average-balance scalar broadcast
    *    against the filtered customer side
    *
    * Round-3 removals: llm_knn_join and llm_ann_recall no longer plan
    * any BNLJ — their exact sides route through AnnCodebook's
    * triangle-pruned cell joins (verdict items 3/4).
    */
  private val bnljWhitelist = Set(
    "join_cross", "gen_sequence_dates", "llm_simsearch_topk",
    "llm_ann_multiprobe", "llm_bm25", "llm_tfidf_topterms",
    "agg_funnel", "tpch_q22",
    // llm_rank_fusion: broadcast single query vector (as llm_simsearch);
    // llm_contamination_rate: two 1-row counters cross-joined into the
    // summary row (as agg_funnel)
    "llm_rank_fusion", "llm_contamination_rate",
    // agg_chi2_independence: the 1-row corpus total crossed into the
    // contingency cells
    "agg_chi2_independence",
    // llm_entity_cooccur: the 1-row doc-count scalar crossed into the
    // constant-bounded pair table
    "llm_entity_cooccur",
    // llm_unigram_logprob / llm_mi_lang_source: 1-row corpus-total
    // scalar broadcast into the token / cell tables (as llm_bm25)
    "llm_unigram_logprob", "llm_mi_lang_source",
    // llm_ann_recall10: the 256-row eval slice (constant by
    // construction) broadcast against the corpus for the exact side,
    // and the 64-row centroid table for probe ranking
    "llm_ann_recall10",
    // tpch_q11: the 1-row nation-total scalar crossed into the
    // per-part values for the 0.1% threshold (as tpch_q22)
    "tpch_q11",
    // agg_rfm_segments: 1-row corpus-max-date scalar broadcast into the
    // customer aggregate; sub_any_all: the 1-row (max, min) ALL/ANY
    // bound pair broadcast into part; llm_vocab_growth: the 1-row
    // doc-count scalar broadcast into the ranked docs — all
    // provably-constant broadcasts (as tpch_q22)
    "agg_rfm_segments", "sub_any_all", "llm_vocab_growth",
    // llm_idf_drift: the 1-row (na, nb) half-size pair broadcast into
    // the token df table (as llm_vocab_growth)
    "llm_idf_drift")

  // Roundtrip/checkpoint queries execute (part of) their pipeline
  // during DataFrame construction; that is fine at sf0.001 with tmp
  // dirs. Everything else only plans.
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plans no cartesian product and no unexpected BNLJ") {
      PlanCapture.enable()
      val plan =
        try fn(spark, sf0001).queryExecution.executedPlan.toString
        finally PlanCapture.disable()
      val staged = PlanCapture.captured
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!bnljWhitelist.contains(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin but is not whitelisted:\n$plan")
      }
      for ((tag, p) <- staged) {
        val ps = p.toString
        assert(!ps.contains("CartesianProduct"),
          s"$name pre-checkpoint stage '$tag' plans a CartesianProduct:\n$ps")
        if (!tag.startsWith("ann_")) {
          assert(!ps.contains("BroadcastNestedLoopJoin"),
            s"$name pre-checkpoint stage '$tag' plans a BNLJ:\n$ps")
        }
      }
    }
  }
}
