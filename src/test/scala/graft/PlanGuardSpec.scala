package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan guard: every declared query is PLANNED
  * (not executed) at sf0.001 and checked against join-shape rules. A
  * lost equi-condition, a dropped broadcast, or an accidental cross
  * join anywhere in the 167-query surface fails here before it becomes
  * a 100 TB incident.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  /** Queries that legitimately plan a BroadcastNestedLoopJoin — each
    * one broadcasts a provably tiny side:
    *  - join_cross: the declared cross-join operator (25×5 dims)
    *  - gen_sequence_dates: 31-day calendar densify
    *  - llm_simsearch_topk / llm_knn_join: broadcast single query
    *    vector / declared brute-force oracle for the ANN family
    *  - llm_bm25 / llm_tfidf_topterms: broadcast scalar corpus totals
    *  - agg_funnel: three 1-row stage counts cross-joined into the
    *    summary row
    */
  private val bnljWhitelist = Set(
    "join_cross", "gen_sequence_dates", "llm_simsearch_topk",
    "llm_knn_join", "llm_bm25", "llm_tfidf_topterms", "agg_funnel")

  // Queries with side effects (scratch writes) still only PLAN here —
  // queryExecution.executedPlan does not run the job, but the
  // roundtrip queries write during DataFrame construction, which is
  // fine (sf0.001, tmp dirs).
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
