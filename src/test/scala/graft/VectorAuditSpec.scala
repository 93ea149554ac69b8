package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the vector/typed-surface batch — invariants
  * that must hold on any corpus, sf0.001.
  */
class VectorAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_emb_norm_audit: norms bounded and counts nested") {
    val r = SparkEntry.queries("llm_emb_norm_audit")(spark, sf0001).collect().head
    val nVec = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(r.getLong(0) == nVec)
    assert(r.getLong(1) <= r.getLong(2), "zero ⊆ near-zero")
    // mean is r8-rounded, min/max r6-rounded → compare with the
    // coarser rounding's half-ulp tolerance
    assert(r.getDouble(4) <= r.getDouble(3) + 5e-7
      && r.getDouble(3) <= r.getDouble(5) + 5e-7, "min <= mean <= max")
  }

  test("gen_json_tuple: k extracted everywhere, missing always NULL") {
    val rows = SparkEntry.queries("gen_json_tuple")(spark, sf0001).collect()
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.length.toLong == total)
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.exists(!_.isNullAt(1)), "props carry numeric k")
  }

  test("agg_corr_matrix: 6 pairs, all in [-1, 1]") {
    val rows = SparkEntry.queries("agg_corr_matrix")(spark, sf0001).collect()
    assert(rows.length == 6)
    for (r <- rows if !r.isNullAt(1))
      assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("fn_map_hof: repeated set matches a direct recount") {
    val rows = SparkEntry.queries("fn_map_hof")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // recompute: tokens with count >= 2 per doc, value doubled
    val direct = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .groupBy("doc_id", "tok").count()
      .where(col("count") >= 2)
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(2) == direct.getOrElse(r.getLong(0), 0L))
      if (r.getLong(2) > 0) {
        assert(r.getString(1).split(",").length == r.getLong(2))
        assert(r.getString(1).split(",").forall(_.matches(".+:\\d+")))
      } else assert(r.getString(1).isEmpty)
    }
  }
}
