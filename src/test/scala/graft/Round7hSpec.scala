package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force anchors for the round-7 eighth wave. */
class Round7hSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private def dailyMicro(): Map[String, Seq[(Long, Long)]] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("xu"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap

  test("VaR/CVaR match a driver-side replay; CVaR >= VaR") {
    val got = SparkEntry.queries("agg_var_cvar")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val daily = dailyMicro()
    for (r <- got) {
      val series = daily(r.getString(0))
      val losses = series.sliding(2).collect {
        case Seq((_, x0), (d1, x1)) => (x0 - x1, d1)
      }.toSeq.sortBy(l => (l._1, l._2))
      val n = losses.length
      assert(r.getLong(1) == n)
      val k = (19 * n + 19) / 20
      val tail = losses.drop(k - 1)
      assert(r.getLong(2) == tail.length)
      val var95 = tail.head._1.toDouble / 1e6
      val cvar = tail.map(_._1).sum.toDouble / (tail.length * 1e6)
      assert(math.abs(r.getDouble(3) - var95) < 1e-9)
      assert(math.abs(r.getDouble(4) - cvar) < 1e-9)
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9, "CVaR below VaR")
    }
  }

  test("seasonal MK matches a driver-side replay; |z| <= classic-MK bound") {
    val got = SparkEntry.queries("agg_mk_seasonal")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val daily = dailyMicro()
    for (r <- got) {
      val series = daily(r.getString(0))
      val byDow = series.groupBy(_._1 % 7)
      var s = 0L; var v18 = 0L
      for ((_, sub) <- byDow) {
        val xs = sub.sortBy(_._1).map(_._2)
        for (i <- xs.indices; j <- i + 1 until xs.length)
          s += java.lang.Long.signum(xs(j) - xs(i))
        val n = xs.length.toLong
        v18 += n * (n - 1) * (2 * n + 5)
      }
      assert(r.getLong(1) == s, s"${r.getString(0)} S")
      assert(r.getLong(2) == v18, s"${r.getString(0)} var18")
      val z = if (s > 0) (s - 1.0) / math.sqrt(v18 / 18.0)
        else if (s < 0) (s + 1.0) / math.sqrt(v18 / 18.0) else 0.0
      assert(math.abs(r.getDouble(3) - z) < 5e-7)
    }
  }

  test("hurst R/S matches a driver-side replay and lands in (0, 1.5)") {
    val got = SparkEntry.queries("agg_hurst_rs")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val centi = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq)
      .toMap
    for (r <- got) {
      val series = centi(r.getString(0))
      val mrs = Seq(5L, 10L, 15L).map { sz =>
        val rss = series.groupBy(p => (p._1 - 1) / sz).toSeq
          .filter(_._2.length == sz).sortBy(_._1)
          .flatMap { case (_, blk) =>
            val xs = blk.sortBy(_._1).map(_._2)
            val n = xs.length
            val sx = xs.sum
            val sxx = xs.map(x => x * x).sum
            val varn = n * sxx - sx * sx
            if (varn <= 0) None else {
              val cums = xs.scanLeft(0L)(_ + _).tail
              val devs = cums.zipWithIndex.map { case (c, i) =>
                n * c - (i + 1) * sx
              }
              val rs = (devs.max - devs.min).toDouble / math.sqrt(varn.toDouble)
              Some(BigDecimal(rs).setScale(8, BigDecimal.RoundingMode.HALF_UP))
            }
          }
        (rss.sum * BigDecimal(100000000)).toLong.toDouble / (rss.length * 1e8)
      }
      for ((g, w) <- Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)).zip(mrs))
        assert(math.abs(g - w) < 5e-7, s"${r.getString(0)} mean R/S")
      val xs = Seq(5.0, 10.0, 15.0).map(math.log)
      val ys = mrs.map(math.log)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val slope = (3 * sxy - xs.sum * ys.sum) /
        (3 * xs.map(x => x * x).sum - xs.sum * xs.sum)
      assert(math.abs(r.getDouble(4) - slope) < 5e-5, s"${r.getString(0)} hurst")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.5)
    }
  }

  test("seasonality strength is in [0, 1] and matches a variance replay") {
    val got = SparkEntry.queries("agg_seasonality_strength")(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    val daily = dailyMicro()
    for (r <- got) {
      val series = daily(r.getString(0))
      val f = r.getDouble(2)
      assert(f >= 0.0 && f <= 1.0)
      val n = series.length
      val byDay = series.toMap
      val full = series.filter { case (day, _) =>
        (day - 3 to day + 3).forall(byDay.contains)
      }
      assert(r.getLong(1) == full.length)
      val det = full.map { case (day, xu) =>
        val t7 = (day - 3 to day + 3).map(byDay).sum
        (day % 7, 420L * (7 * xu - t7))
      }
      val seas = det.groupBy(_._1).map { case (dow, v) =>
        dow -> (v.map(_._2).sum, v.length)
      }
      // seas sums the ALREADY x420-scaled ds values, so the seasonal
      // mean at the same scale is sd/cd — exact, since 420 | sd
      val rs2 = det.map { case (dow, ds) =>
        val (sd, cd) = seas(dow); ds - sd / cd
      }
      def varOf(v: Seq[Long]): Double = {
        val m = v.length.toDouble
        val s = v.map(BigDecimal(_)).sum
        val ss = v.map(x => BigDecimal(x) * BigDecimal(x)).sum
        (m * ss.toDouble - s.toDouble * s.toDouble)
      }
      val want = math.max(0.0, 1.0 - varOf(rs2) / varOf(det.map(_._2)))
      assert(math.abs(f - want) < 5e-6, s"${r.getString(0)} F_s")
    }
  }
}
