package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the robust-statistics batch — invariants that
  * must hold on any corpus, sf0.001.
  */
class RobustStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("win_max_drawdown: customers conserved, drawdowns non-negative") {
    val rows = SparkEntry.queries("win_max_drawdown")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nCust = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(4) >= 0.0)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9 || r.getLong(2) <= 1)
    }
  }

  test("llm_lang_overlap: jaccard bounded by min-vocab ratio, pairs ordered") {
    val rows = SparkEntry.queries("llm_lang_overlap")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (va, vb, ni, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(r.getString(0) < r.getString(1))
      assert(ni <= math.min(va, vb))
      assert(j >= 0.0 && j <= math.min(va, vb).toDouble / math.max(va, vb))
    }
  }

  test("agg_percentile_bands: monotone bands, each an actual order total") {
    val rows = SparkEntry.queries("agg_percentile_bands")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val bands = (2 to 6).map(r.getDouble)
      assert(bands.zip(bands.tail).forall { case (a, b) => a <= b })
    }
    val allTotals = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double"))
      .collect().map(_.getDouble(0)).toSet
    assert(rows.forall(r => (2 to 6).forall(i => allTotals(r.getDouble(i)))))
  }

  test("agg_trimmed_mean: keeps n - 2*(n div 10) rows, mean inside band") {
    val rows = SparkEntry.queries("agg_trimmed_mean")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val counts = graft.sources.Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val n = counts(r.getString(0))
      assert(r.getLong(1) == n - 2 * (n / 10))
      assert(r.getDouble(2) >= 0.0)
    }
  }
}
