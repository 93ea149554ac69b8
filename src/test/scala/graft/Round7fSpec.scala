package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form / brute-force anchors for the round-7 sixth wave. */
class Round7fSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("shapley credits are efficient: channel credits sum to total users") {
    val rows = SparkEntry.queries("agg_attribution_shapley")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    val credit = rows.map(_.getDouble(2)).sum
    assert(math.abs(credit - total.toDouble) < 1e-9,
      s"sum of shapley credits $credit != $total users (efficiency axiom)")
    for (r <- rows) assert(r.getDouble(2) <= r.getLong(1).toDouble + 1e-9)
  }

  test("MAD anomalies match a driver-side exact replay at sf0.001") {
    val got = SparkEntry.queries("win_anomaly_mad")(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
    val daily = got.groupBy(_._1._1)
    for ((_, rs) <- daily) {
      val xs = rs.map(_._2._1).sorted
      def med(v: Seq[Double]): Double = {
        val n = v.length
        if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
      }
      val m = med(xs.toSeq)
      val mad = med(rs.map(r => math.abs(r._2._1 - m)).sorted.toSeq)
      for (((_, day), (x, gm, gmad, flag)) <- rs) {
        assert(math.abs(gm - m) < 1e-6, s"day $day med")
        assert(math.abs(gmad - mad) < 1e-6, s"day $day mad")
        assert(flag == math.abs(x - m) > 3.0 * mad + 1e-9 ||
          math.abs(math.abs(x - m) - 3.0 * mad) < 1e-6,
          s"day $day flag $flag inconsistent with |$x-$m| vs 3*$mad")
      }
    }
    assert(got.nonEmpty)
  }

  test("capture-recapture counts match an independent aggregation") {
    val rows = SparkEntry.queries("agg_capture_recapture")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        (QueryUtils.hash60(concat(lit("cr1:"), col("event_id").cast("string")))
          % 10 < 3).as("s1"),
        (QueryUtils.hash60(concat(lit("cr2:"), col("event_id").cast("string")))
          % 10 < 3).as("s2"))
    val ind = ev.groupBy("event_type")
      .agg(count_distinct(when(col("s1"), col("user_id"))).as("n1"),
        count_distinct(when(col("s2"), col("user_id"))).as("n2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- rows) {
      val (n1, n2, m) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert((n1, n2) == ind(r.getString(0)), "sample capture counts")
      assert(m <= math.min(n1, n2) && m >= 0)
      // Chapman is bounded below by each sample and above by n1+n2 <= N̂+m
      val nHat = r.getDouble(5)
      assert(nHat >= math.max(n1, n2) - 1e-9)
      assert(nHat + m + 1 >= n1 + n2 - 1e-9)
      assert(r.getDouble(6) >= 0.0)
    }
  }

  test("bollinger bands match a driver-side replay; breach iff outside") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).multiply(new java.math.BigDecimal(100))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()))
      .groupBy(_._1)
    val got = SparkEntry.queries("win_bollinger_bands")(spark, sf0001).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (et, day) = (r.getString(0), r.getLong(1))
      val series = daily(et).sortBy(_._2)
      val win = series.filter(p => math.abs(p._2 - day) <= 3).map(_._3)
      assert(win.length == 7, s"$et day $day window incomplete in output")
      val xc = series.find(_._2 == day).get._3
      val sx = win.sum; val sxx = win.map(v => v * v).sum
      val ma = sx.toDouble / 700.0
      val sd = math.sqrt((sxx * 7 - sx * sx).toDouble / 42.0) / 100.0
      assert(math.abs(r.getDouble(3) - ma) < 1e-9, s"$et $day ma")
      assert(math.abs(r.getDouble(4) - (ma - 2 * sd)) < 1e-9, s"$et $day lo")
      assert(math.abs(r.getDouble(5) - (ma + 2 * sd)) < 1e-9, s"$et $day hi")
      val breach = 6L * (xc * 7 - sx) * (xc * 7 - sx) > 28L * (sxx * 7 - sx * sx)
      assert(r.getBoolean(6) == breach, s"$et $day breach")
    }
  }
}
