package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the analytics-classics + corpus-model batch —
  * invariants that must hold on any corpus, sf0.001.
  */
class ClassicsModelSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_rfm_segments: quintiles balanced, customer count conserved") {
    val rows = SparkEntry.queries("agg_rfm_segments")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nCust = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    // every score in 1..5, and each dimension's quintile sizes differ
    // by at most 1 (ntile contract)
    for (dim <- 0 to 2) {
      val sizes = rows.groupBy(_.getLong(dim)).map { case (k, g) =>
        assert(k >= 1 && k <= 5); g.map(_.getLong(3)).sum
      }.toSeq
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("agg_grouping_id: bit pattern accounts every aggregation level") {
    val rows = SparkEntry.queries("agg_grouping_id")(spark, sf0001).collect()
    val total = graft.sources.Tables.lineitem(spark, sf0001).count()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    // grand total row is unique and counts everything; detail rows sum
    // to the same; g_rf is exactly the MSB of gid
    assert(byGid(3L).length == 1 && byGid(3L).head.getLong(4) == total)
    assert(byGid(0L).map(_.getLong(4)).sum == total)
    assert(rows.forall(r => r.getLong(3) == (r.getLong(2) >> 1)))
    // subtotal rows have NULL in exactly the aggregated-away column
    assert(byGid(1L).forall(r => r.isNullAt(1) && !r.isNullAt(0)))
    assert(byGid(2L).forall(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("sub_any_all: ALL implies ANY; brand 11 never beats itself") {
    val rows = SparkEntry.queries("sub_any_all")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getBoolean(2) || r.getBoolean(3)))
    val b11Keys = graft.sources.Tables.part(spark, sf0001)
      .where(col("p_brand") === "Brand#11")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(b11Keys.nonEmpty, "probe brand must exist in the corpus")
    assert(rows.filter(r => b11Keys(r.getLong(0))).forall(!_.getBoolean(2)))
  }

  test("agg_seasonality_dow: shares sum to 1 per type, isodow in 1..7") {
    val rows = SparkEntry.queries("agg_seasonality_dow")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 7))
    for (g <- rows.groupBy(_.getString(0)).values)
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("llm_ngram_novelty: rates bounded, fully-novel subset of docs") {
    val rows = SparkEntry.queries("llm_ngram_novelty")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("llm_vocab_growth: cumulative curve reaches the full vocabulary") {
    val rows = SparkEntry.queries("llm_vocab_growth")(spark, sf0001)
      .orderBy("decile").collect()
    assert(rows.nonEmpty)
    val vocab = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").select("t").distinct().count()
    assert(rows.last.getLong(2) == vocab)
    assert(rows.map(_.getLong(1)).sum == vocab)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 10))
  }

  test("llm_ann_cell_balance: shares sum to 1, ranks are a permutation") {
    val rows = SparkEntry.queries("llm_ann_cell_balance")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nVec = graft.sources.Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nVec)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
  }
}
