package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 second-wave anchors: driver-side integer replays of the
  * Page–Hinkley ledger, the Mantel–Haenszel unit sums and Cochran's Q
  * moments, plus closed-form identities for Theil's U, Grubbs, MACD,
  * resource-allocation link prediction and RAKE.
  */
class Round8bSpec extends AnyFunSuite {
  import TestSpark._

  private def dailyCenti(): Seq[(String, Long, Long)] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("agg_page_hinkley matches an integer driver-side replay at sf0.001") {
    val predicted = dailyCenti().groupBy(_._1).map { case (et, rows) =>
      val xs = rows.sortBy(_._2)
      var s = 0L; var u = 0L; var mx = Long.MinValue
      var phMax = Long.MinValue; var alarm: Option[Long] = None
      for (((_, day, xc), i) <- xs.zipWithIndex) {
        val t = i + 1L
        s += xc
        val m = (2 * s + t) / (2 * t) // all positive: / == div == //
        u += xc - m - 500L
        mx = math.max(mx, u)
        val ph = mx - u
        phMax = math.max(phMax, ph)
        if (alarm.isEmpty && ph > 20000L) alarm = Some(day)
      }
      et -> (xs.size.toLong, phMax, alarm)
    }
    val got = SparkEntry.queries("agg_page_hinkley")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == predicted, s"got=$got predicted=$predicted")
  }

  test("agg_mantel_haenszel matches an integer driver-side replay at sf0.001") {
    val cells = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), (col("n_chars") >= 300).as("a"),
        (graft.QueryUtils.nTok >= 55).as("b"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val strata = cells.groupBy(_._1).values.map { rows =>
      val n = rows.size.toLong
      val aa = rows.count(r => r._2 && r._3).toLong
      val bb = rows.count(r => r._2 && !r._3).toLong
      val cc = rows.count(r => !r._2 && r._3).toLong
      val dd = rows.count(r => !r._2 && !r._3).toLong
      ((2 * 100000000L * aa * dd + n) / (2 * n),
        (2 * 100000000L * bb * cc + n) / (2 * n))
    }.toSeq
    val (num, den) = (strata.map(_._1).sum, strata.map(_._2).sum)
    val row = SparkEntry.queries("agg_mantel_haenszel")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == strata.size.toLong)
    assert(row.getLong(1) == num && row.getLong(2) == den,
      s"units got=(${row.getLong(1)},${row.getLong(2)}) want=($num,$den)")
    if (den > 0) {
      assert(math.abs(row.getDouble(3) - num.toDouble / den) < 1e-6)
    }
  }

  test("agg_theil_u entropies satisfy the joint-entropy bounds") {
    val r = SparkEntry.queries("agg_theil_u")(spark, sf001).collect()(0)
    val (hl, hs, hj) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val (ul, us) = (r.getDouble(5), r.getDouble(6))
    val eps = 1e-5
    assert(hj <= hl + hs + eps, s"H(X,Y)=$hj > H(X)+H(Y)=${hl + hs}")
    assert(hj >= math.max(hl, hs) - eps, s"H(X,Y)=$hj < max marginal")
    for (u <- Seq(ul, us)) assert(u >= -eps && u <= 1 + eps, s"U=$u outside [0,1]")
  }

  test("agg_cochran_q matches an integer driver-side replay at sf0.001") {
    val rows = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), (col("n_chars") >= 300).cast("long").as("x1"),
        (graft.QueryUtils.nTok >= 55).cast("long").as("x2"),
        col("text").rlike("[0-9]").cast("long").as("x3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val predicted = rows.groupBy(_._1).map { case (lang, rs) =>
      val g1 = rs.map(_._2).sum; val g2 = rs.map(_._3).sum; val g3 = rs.map(_._4).sum
      val ls = rs.map(r => r._2 + r._3 + r._4)
      val sl = ls.sum; val sl2 = ls.map(l => l * l).sum
      val denom = 3 * sl - sl2
      val q = if (denom == 0) None else Some(BigDecimal(
        2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
          - (g1 + g2 + g3) * (g1 + g2 + g3)).toDouble / denom)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      lang -> (rs.size.toLong, g1, g2, g3, q)
    }
    val got = SparkEntry.queries("agg_cochran_q")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    for ((lang, p) <- predicted) {
      val g = got(lang)
      assert(g._1 == p._1 && g._2 == p._2 && g._3 == p._3 && g._4 == p._4, lang)
      (g._5, p._5) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 1e-6, s"$lang $a vs $b")
        case (a, b) => assert(a == b, lang)
      }
    }
  }

  test("agg_grubbs: G is positive and the outlier is the max-deviation value") {
    for (row <- SparkEntry.queries("agg_grubbs")(spark, sf0001).collect()) {
      val et = row.getString(0)
      val g = row.getDouble(3)
      assert(g > 0, s"$et G=$g")
      // Grubbs G is bounded by (n-1)/sqrt(n)
      val n = row.getLong(1).toDouble
      assert(g <= (n - 1) / math.sqrt(n) + 1e-9, s"$et G=$g exceeds bound")
      // the reported outlier is the sample's farthest point from the mean
      val vals = graft.sources.Tables.events(spark, sf0001)
        .where(col("event_type") === et)
        .select(col("value").cast("decimal(18,6)").cast("double"))
        .collect().map(_.getDouble(0))
      val mean = vals.sum / vals.length
      val maxDev = vals.map(v => math.abs(v - mean)).max
      assert(math.abs(math.abs(row.getDouble(2) - mean) - maxDev) < 1e-4,
        s"$et outlier=${row.getDouble(2)} not at max deviation $maxDev")
    }
  }

  test("win_macd: day-1 macd is zero and hist = macd - signal") {
    val rows = SparkEntry.queries("win_macd")(spark, sf0001).collect()
    val firstDay = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.minBy(_.getLong(1)) }
    for (r <- firstDay) {
      // both EWMAs equal the first observation, so macd starts at 0
      assert(math.abs(r.getDouble(2)) < 1e-9, s"day-1 macd ${r.getDouble(2)}")
    }
    for (r <- rows) {
      val recomputed = BigDecimal(r.getDouble(2) - r.getDouble(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - recomputed) <= 1e-9,
        s"hist ${r.getDouble(4)} != macd-signal $recomputed")
    }
  }

  test("graph_resource_alloc: scores bounded by cn/2 and pairs ordered") {
    val rows = SparkEntry.queries("graph_resource_alloc")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, b, cn, ra) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b, s"pair order $a $b")
      // every shared neighbor touches both endpoints, so deg(z) >= 2
      // and each term <= 1/2
      assert(ra > 0 && ra <= cn / 2.0 + 1e-6, s"ra=$ra cn=$cn")
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y - 1e-12 })
  }

  test("llm_rake_keyphrases: no stopword inside any phrase, sane scores") {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val stop = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(toks).as("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(20)
      .collect().map(_.getString(0)).toSet
    val rows = SparkEntry.queries("llm_rake_keyphrases")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    for (r <- rows) {
      val words = r.getString(0).split(" ")
      assert(words.nonEmpty && !words.exists(stop.contains),
        s"phrase '${r.getString(0)}' contains a stopword")
      assert(r.getLong(1) == words.length.toLong,
        s"n_words ${r.getLong(1)} != ${words.length}")
      // RAKE word score deg/freq >= 1 (deg counts the word's own
      // phrase lengths >= its frequency), so phrase score >= n_words
      assert(r.getDouble(3) >= words.length - 1e-6,
        s"score ${r.getDouble(3)} < n_words ${words.length}")
    }
  }
}
