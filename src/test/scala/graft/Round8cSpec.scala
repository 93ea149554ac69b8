package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 third-wave anchors: independent driver-side replays of
  * Kruskal–Wallis, Brown–Forsythe, Friedman and the Flesch–Kincaid
  * counters at sf0.001 (BigDecimal half-up quantization mirroring the
  * engines' term rounding; 1e-5 tolerance absorbs the quantization
  * boundary).
  */
class Round8cSpec extends AnyFunSuite {
  import TestSpark._

  private def q4(x: Double): BigDecimal =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def eventVals(): Seq[(String, BigDecimal)] =
    graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value").cast("decimal(18,6)").as("v"))
      .collect().map(r => (r.getString(0), BigDecimal(r.getDecimal(1)))).toSeq

  test("agg_kruskal_wallis matches a driver-side replay at sf0.001") {
    val rows = eventVals()
    val n = rows.size.toLong
    val byV = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    // 2R(v) = 2·hi − cnt + 1 over cumulative counts
    var cum = 0L
    val r2 = sortedV.map { v =>
      cum += byV(v); v -> (2 * cum - byV(v) + 1)
    }.toMap
    val groups = rows.groupBy(_._1)
    val st = groups.values.map { rs =>
      val s2 = rs.map(r => r2(r._2)).sum.toDouble
      val nj = rs.size.toDouble
      q4(s2 * s2 / (4.0 * nj))
    }.sum.toDouble
    val t = byV.values.map(c => c * c * c - c).sum
    val h = 12.0 / (n * (n + 1.0)) * st - 3.0 * (n + 1.0)
    val hc = h / (1.0 - t.toDouble / (n.toDouble * n * n - n))
    val got = SparkEntry.queries("agg_kruskal_wallis")(spark, sf0001).collect()(0)
    assert(got.getLong(0) == n && got.getLong(1) == groups.size.toLong)
    assert(got.getLong(2) == t, s"tie_sum ${got.getLong(2)} vs $t")
    assert(math.abs(got.getDouble(3) - h) <= 1e-5, s"H ${got.getDouble(3)} vs $h")
    assert(math.abs(got.getDouble(4) - hc) <= 1e-5)
  }

  test("agg_levene_bf matches a driver-side replay at sf0.001") {
    val rows = eventVals()
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size.toDouble
    val n = rows.size.toDouble
    def lowMedian(vs: Seq[BigDecimal]): BigDecimal = {
      val s = vs.sorted
      s(((s.size + 1) / 2) - 1) // value at rank ceil(n/2), 1-based
    }
    val perG = groups.values.map { vs =>
      val m = lowMedian(vs)
      val z = vs.map(v => (v - m).abs)
      (vs.size.toDouble, z.sum, z.map(x => x * x).sum)
    }.toSeq
    val st = perG.map { case (nj, sz, _) =>
      q6(sz.toDouble * sz.toDouble / nj)
    }.sum.toDouble
    val szt = perG.map(_._2).sum.toDouble
    val qzt = perG.map(_._3).sum.toDouble
    val w = ((n - k) / (k - 1)) * (st - szt * szt / n) / (qzt - st)
    val got = SparkEntry.queries("agg_levene_bf")(spark, sf0001).collect()(0)
    assert(got.getLong(0) == rows.size.toLong && got.getLong(1) == groups.size.toLong)
    assert(math.abs(got.getDouble(2) - w) <= 1e-5, s"W ${got.getDouble(2)} vs $w")
  }

  test("agg_friedman matches a driver-side replay at sf0.001") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val k = daily.map(_._1).distinct.size
    val byDay = daily.groupBy(_._2).filter(_._2.size == k)
    val nb = byDay.size.toDouble
    val s2 = scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    for ((_, rows) <- byDay) {
      val sorted = rows.sortBy(r => (r._3, r._1))
      val rnOf = sorted.zipWithIndex.map { case (r, i) => r -> (i + 1L) }.toMap
      for (r <- rows) {
        val ties = sorted.filter(_._3 == r._3)
        val lo = ties.map(rnOf).min; val hi = ties.map(rnOf).max
        s2(r._1) += lo + hi
      }
    }
    val st = s2.values.map(v => q4(v.toDouble * v / 4.0)).sum.toDouble
    val chi2 = 12.0 / (nb * k * (k + 1)) * st - 3.0 * nb * (k + 1)
    val got = SparkEntry.queries("agg_friedman")(spark, sf0001).collect()(0)
    assert(got.getLong(0) == nb.toLong && got.getLong(1) == k.toLong)
    assert(math.abs(got.getDouble(2) - chi2) <= 1e-5,
      s"chi2 ${got.getDouble(2)} vs $chi2")
  }

  test("llm_readability_fk matches Java-regex driver-side counters at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val agg = scala.collection.mutable.HashMap[String, (Long, Long, Long, Long)]()
    for ((lang, text) <- docs) {
      val w = text.split(" ").count(_.nonEmpty).toLong
      if (w >= 1) {
        val sent = math.max(1L,
          (text.length - text.replaceAll("[.!?]", "").length).toLong)
        val syl = (text.replaceAll("[aeiouyAEIOUY]+", "#").length
          - text.replaceAll("[aeiouyAEIOUY]+", "").length).toLong
        val (d0, w0, s0, y0) = agg.getOrElse(lang, (0L, 0L, 0L, 0L))
        agg(lang) = (d0 + 1, w0 + w, s0 + sent, y0 + syl)
      }
    }
    val got = SparkEntry.queries("llm_readability_fk")(spark, sf0001).collect()
    for (r <- got) {
      val (nd, w, s, y) = agg(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((nd, w, s, y)), r.getString(0))
      val fk = 0.39 * w.toDouble / s + 11.8 * y.toDouble / w - 15.59
      assert(math.abs(r.getDouble(5) - fk) <= 1e-4, s"${r.getString(0)} fk")
    }
    assert(got.map(_.getString(0)).toSet == agg.keySet)
  }
}
