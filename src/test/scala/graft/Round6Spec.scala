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

  test("topk_skyline: frontier rows are mutually non-dominated and complete") {
    val rows = SparkEntry.queries("topk_skyline")(spark, sf0001).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // no frontier row strictly dominated by another frontier row
    for (a <- rows; b <- rows if a != b)
      assert(!(b._1 >= a._1 && b._2 >= a._2 && (b._1 > a._1 || b._2 > a._2)),
        s"$a dominated by $b")
    // the max-price and max-qty rows are always on the frontier
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .selectExpr("max(l_extendedprice)", "max(l_quantity)").collect().head
    assert(rows.exists(_._1 == li.getDouble(0)))
    assert(rows.exists(_._2 == li.getDouble(1)))
  }

  test("llm_ann_pq_adc: 10 hits, non-negative estimated distances, self excluded") {
    val rows = SparkEntry.queries("llm_ann_pq_adc")(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(1) >= 0.0))
    assert(!rows.exists(_.getLong(0) == 0L))
    // ADC estimates are sorted ascending (nearest first)
    val d = rows.map(_.getDouble(1))
    assert(d.zip(d.tail).forall { case (x, y) => x <= y })
  }

  test("stream_topk_window: at most 3 per window, rank 1 is the window max") {
    val rows = SparkEntry.queries("stream_topk_window")(spark, sf0001).collect()
    val byW = rows.groupBy(_.get(0))
    assert(byW.values.forall(_.length <= 3))
    for ((_, g) <- byW) {
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 1L)
      // value is non-increasing down the ranks
      val vs = sorted.map(_.getDouble(4))
      assert(vs.zip(vs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("win_ohlc_daily: high >= open/close >= low, single-event bars degenerate") {
    val rows = SparkEntry.queries("win_ohlc_daily")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, o, c, h, l) = (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(h >= o && h >= c && l <= o && l <= c)
      if (n == 1) assert(o == c && o == h && o == l)
    }
  }

  test("llm_dedup_bloom: sound (every true dup flagged) and counts consistent") {
    val rows = SparkEntry.queries("llm_dedup_bloom")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nf, flag, dup, fp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(flag >= dup, s"${r.getString(0)}: Bloom missed a true duplicate")
      assert(fp == flag - dup)
      assert(flag <= nf && dup <= nf)
    }
  }

  test("agg_cohort_ltv: cumulative revenue non-decreasing within each cohort") {
    val rows = SparkEntry.queries("agg_cohort_ltv")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for ((_, g) <- rows.groupBy(_.get(0))) {
      val s = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(s.zip(s.tail).forall { case (a, b) => b >= a })
      // ltv = cum_rev / n_users exactly
      for (r <- g)
        assert(r.getDouble(4) == r.getDouble(3) / r.getLong(2))
    }
  }

  test("agg_survival_km: survival in [0,1], non-increasing along the grid") {
    val rows = SparkEntry.queries("agg_survival_km")(spark, sf0001).collect()
    assert(rows.length == 25) // 5 segments × 5 grid days
    for ((_, g) <- rows.groupBy(_.getString(0))) {
      val s = g.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(s.forall(x => x >= 0.0 && x <= 1.0))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b },
        s"not monotone: ${s.mkString(",")}")
    }
  }
}
