package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force anchors for the round-7 tenth wave. */
class Round7jSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("chow F matches a driver-side two-segment OLS replay") {
    val got = SparkEntry.queries("agg_chow_test")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    def ssr(pts: Seq[(Long, Long)]): Double = {
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val syy = pts.map(p => BigDecimal(p._2) * BigDecimal(p._2)).sum.toDouble
      (syy - sy * sy / n) -
        math.pow(sxy - sx * sy / n, 2) / (sxx - sx * sx / n)
    }
    for (r <- got) {
      val pts = daily(r.getString(0)).map(t => (t._2, t._3))
      val (h1, h2) = pts.partition(_._1 <= 15)
      assert(r.getLong(1) == h1.length && r.getLong(2) == h2.length)
      val f = ((ssr(pts) - ssr(h1) - ssr(h2)) / 2.0) /
        ((ssr(h1) + ssr(h2)) / (pts.length - 4.0))
      assert(math.abs(r.getDouble(3) - f) < 5e-3, s"${r.getString(0)} F")
      assert(r.getDouble(3) >= -1e-9)
    }
  }

  test("runs test matches a replay; runs bounded by dichotomy sizes") {
    val got = SparkEntry.queries("agg_runs_test")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("xu"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for (r <- got) {
      val series = daily(r.getString(0)).sortBy(_._2)
      val xs = series.map(_._3).sorted
      val n = xs.length
      val med2 = if (n % 2 == 1) 2 * xs(n / 2) else xs(n / 2 - 1) + xs(n / 2)
      val flags = series.filter(p => 2 * p._3 != med2)
        .map(p => 2 * p._3 > med2)
      val n1 = flags.count(identity).toLong
      val n2 = flags.count(!_).toLong
      val runs = 1L + flags.toSeq.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n1, n2, runs)))
      assert(runs >= 1 && runs <= n1 + n2)
    }
  }

  test("burstiness matches a replay; VMR >= the Poisson floor for top df") {
    val got = SparkEntry.queries("llm_burstiness")(spark, sf0001).collect()
    assert(got.length == 20)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val nDocs = docs.length.toLong
    for (r <- got) {
      val tok = r.getString(0)
      val counts = docs.map(_._2.count(_ == tok).toLong).filter(_ > 0)
      assert(r.getLong(1) == counts.length, s"$tok df")
      val nTotal = counts.sum
      assert(r.getLong(2) == nTotal, s"$tok n_total")
      val scc = counts.map(c => c * c).sum
      val vmr = (nDocs.toDouble * scc - nTotal.toDouble * nTotal) /
        (nDocs.toDouble * nTotal)
      assert(math.abs(r.getDouble(3) - vmr) < 5e-7, s"$tok vmr")
    }
  }

  test("diversity indices match a replay; Simpson in [0,1], Shannon <= ln k") {
    val got = SparkEntry.queries("llm_simpson_diversity")(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    for (r <- got) {
      val ns = docs(r.getString(0)).map(_._3)
      val nn = ns.sum
      assert(r.getLong(1) == nn && r.getLong(2) == ns.length)
      val lambda = ns.map(n => n * (n - 1)).sum.toDouble / (nn.toDouble * (nn - 1))
      assert(math.abs(r.getDouble(3) - (1.0 - lambda)) < 5e-7)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      val h = ns.map { n =>
        val p = n.toDouble / nn
        BigDecimal(-p * math.log(p)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(r.getDouble(4) - h) < 1e-7)
      assert(r.getDouble(4) <= math.log(ns.length.toDouble) + 1e-9)
    }
  }
}
