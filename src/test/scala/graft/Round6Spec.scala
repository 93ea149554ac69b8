package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived anchors for the round-6 surface batch — bounds and
  * closed-form identities that must hold regardless of fixture data.
  */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  test("agg_hhi_nation: one row per region, HHI within (0, 10000]") {
    val rows = SparkEntry.queries("agg_hhi_nation")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val n = r.getLong(1); val hhi = r.getDouble(3)
      assert(n >= 1 && n <= 25)
      // equal shares floor: HHI >= 10000/n; monopoly ceiling: 10000
      assert(hhi >= 10000.0 / n - 1e-6 && hhi <= 10000.0 + 1e-6,
        s"${r.getString(0)}: hhi=$hhi n=$n")
    }
  }

  test("agg_theil_index: non-negative per segment (Jensen bound)") {
    val rows = SparkEntry.queries("agg_theil_index")(spark, sf0001).collect()
    assert(rows.length == 5)
    // rounding the (x/μ)·ln(x/μ) terms to 8dp can dip an exactly-equal
    // distribution epsilon-below zero, hence the tolerance
    assert(rows.forall(_.getDouble(2) >= -1e-6))
  }

  test("agg_tail_hill: k=50 used and a positive tail exponent") {
    val rows = SparkEntry.queries("agg_tail_hill")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getLong(1) == 50L)
      assert(r.getDouble(3) > 0.0)
      assert(r.getDouble(2) > 0.0) // x_{k+1} is a real order total
    }
  }

  test("win_rolling_slope: only full frames emitted; slope of constant-x run is exact") {
    val df = SparkEntry.queries("win_rolling_slope")(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    // 10-row frames over 1k events with ~150 users: strictly fewer
    // emitted rows than events (the first 9 per user are suppressed)
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.length < nEvents)
  }

  test("llm_ann_pq: codebook vectors quantize to themselves with zero error") {
    val rows = SparkEntry.queries("llm_ann_pq")(spark, sf0001).collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    for (c <- 1 to 16) {
      val (code, qerr) = byId(c.toLong)
      assert(code == Seq.fill(8)(c).mkString(":"), s"vec $c code=$code")
      assert(qerr == 0.0, s"vec $c qerr=$qerr")
    }
    // every code field is a valid codebook id
    for (r <- rows; f <- r.getString(1).split(":"))
      assert(f.toInt >= 1 && f.toInt <= 16)
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("llm_rbo_rankings: RBO in [0,1] and overlaps monotone in depth") {
    val r = SparkEntry.queries("llm_rbo_rankings")(spark, sf0001).collect().head
    val rbo = r.getDouble(0)
    val ov10 = r.getLong(1); val ov100 = r.getLong(2)
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-9)
    assert(ov10 >= 0 && ov10 <= 10)
    assert(ov100 >= ov10 && ov100 <= 100)
  }
}
