package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form anchors for the round-7 second wave. */
class Round7bSpec extends AnyFunSuite {
  import TestSpark._

  test("Mann-Kendall: S bounded by the pair count, z sign matches S") {
    val rows = SparkEntry.queries("agg_trend_mann_kendall")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val n = r.getLong(1); val s = r.getLong(2); val z = r.getDouble(3)
      assert(math.abs(s) <= n * (n - 1) / 2, "S exceeds the pair count")
      if (s == 0) assert(z == 0.0)
      else if (s > 0) assert(z >= 0.0, s"S=$s but z=$z")
      else assert(z <= 0.0, s"S=$s but z=$z")
    }
  }

  test("JSD: in [0, ln 2], normalized form in [0, 1]") {
    val rows = SparkEntry.queries("llm_js_divergence")(spark, sf0001).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      assert(r.getDouble(1) >= -1e-9 && r.getDouble(1) <= math.log(2.0) + 1e-9)
      assert(r.getDouble(2) >= -1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("PMI: support floor respected and PMI consistent with counts") {
    val rows = SparkEntry.queries("llm_pmi_collocations")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    for (r <- rows) assert(r.getLong(2) >= 5, "support floor violated")
    // descending by rounded pmi
    val pmis = rows.map(_.getDouble(3))
    for (i <- 1 until pmis.length) assert(pmis(i) <= pmis(i - 1) + 1e-9)
  }

  test("EWMA: first day equals its own value; smoothing stays in range") {
    val rows = SparkEntry.queries("win_ewma_daily")(spark, sf0001).collect()
    val byType = rows.groupBy(_.getString(0))
    for ((_, rs) <- byType) {
      val sorted = rs.sortBy(_.getLong(1))
      // day 1: single-term ratio == the daily value (round-trip of the
      // u/v weighting at s = t)
      assert(math.abs(sorted.head.getDouble(3) - sorted.head.getDouble(2)) < 1e-3)
      // every EWMA lies within the running min/max envelope
      var lo = Double.MaxValue; var hi = Double.MinValue
      for (r <- sorted) {
        lo = math.min(lo, r.getDouble(2)); hi = math.max(hi, r.getDouble(2))
        assert(r.getDouble(3) >= lo - 1e-6 && r.getDouble(3) <= hi + 1e-6)
      }
    }
  }

  test("rich club: N_k and E_k antitone in k, phi in [0, 1]") {
    val rows = SparkEntry.queries("graph_rich_club")(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    for (i <- 1 until rows.length) {
      assert(rows(i).getLong(1) <= rows(i - 1).getLong(1))
      assert(rows(i).getLong(2) <= rows(i - 1).getLong(2))
    }
    for (r <- rows if !r.isNullAt(3))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("char entropy: bounded by ln(distinct chars)") {
    val rows = SparkEntry.queries("llm_char_entropy")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val h = r.getDouble(3)
      assert(h >= 0.0 && h <= math.log(r.getLong(2).toDouble) + 1e-6,
        s"${r.getString(0)}: H=$h exceeds ln(${r.getLong(2)})")
    }
  }
}
