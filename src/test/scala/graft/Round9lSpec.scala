package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 twelfth-wave anchors at sf0.001. */
class Round9lSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_h_index replays the rank-count definition at sf0.001") {
    val cnt = graft.sources.Tables.lineitem(spark, sf0001)
      .groupBy("l_suppkey", "l_partkey").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("agg_h_index")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((sk, xs) <- cnt.groupBy(_._1)) {
      val sorted = xs.sortBy(x => (-x._3, x._2)).map(_._3)
      val h = sorted.zipWithIndex.count { case (c, i) => c >= i + 1 }.toLong
      assert(got(sk) == ((xs.length.toLong, h)), s"supplier $sk")
      // h-index is bounded by both axes
      assert(h <= xs.length && (sorted.isEmpty || h <= sorted.max))
    }
  }

  test("agg_calendar_gaps is consistent at sf0.001") {
    val got = SparkEntry.queries("agg_calendar_gaps")(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (f, l, p, m, g) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(l - f + 1 == p + m, s"${r.getString(0)} span")
      assert(g <= m, "longest run cannot exceed total missing")
      assert((m == 0) == (g == 0))
    }
  }

  test("agg_apportionment hands out exactly 1000 units at sf0.001") {
    val rows = SparkEntry.queries("agg_apportionment")(spark, sf0001)
      .collect()
    assert(rows.map(_.getLong(3)).sum == 1000L)
    for (r <- rows) {
      val (fl, u) = (r.getLong(2), r.getLong(3))
      assert(u == fl || u == fl + 1, s"${r.getString(0)} topping")
    }
    // Hamilton stays within one unit of the exact quota
    val tot = rows.map(r => BigDecimal(r.getDouble(1))).sum
    for (r <- rows) {
      val quota = BigDecimal(r.getDouble(1)) * 1000 / tot
      assert((BigDecimal(r.getLong(3)) - quota).abs <= 1,
        s"${r.getString(0)} quota deviation")
    }
  }

  test("win_chandelier_exit stops bracket correctly at sf0.001") {
    val rows = SparkEntry.queries("win_chandelier_exit")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (hh, ll, ls, ss) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      assert(hh >= ll)
      assert(ls <= hh + 1e-9 && ss >= ll - 1e-9)
      // both stops offset by the same 3*ATR: (hh-ls) == (ss-ll) exactly
      assert(math.round((hh - ls) * 100) == math.round((ss - ll) * 100))
    }
  }
}
