package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force anchors for the round-7 ninth wave. */
class Round7iSpec extends AnyFunSuite {
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

  test("kendall tau-b matches a driver-side replay and is in [-1, 1]") {
    val got = SparkEntry.queries("agg_kendall_tau")(spark, sf0001).collect()
    val daily = dailyMicro()
    val types = daily.keys.toSeq.sorted
    assert(got.length == types.combinations(2).size)
    for (r <- got) {
      val (ta, tb) = (r.getString(0), r.getString(1))
      val am = daily(ta).toMap
      val bm = daily(tb).toMap
      val days = am.keySet.intersect(bm.keySet).toSeq.sorted
      var conc = 0L; var disc = 0L; var tieA = 0L; var tieB = 0L; var n0 = 0L
      for (i <- days.indices; j <- i + 1 until days.length) {
        val sa = java.lang.Long.signum(am(days(j)) - am(days(i)))
        val sb = java.lang.Long.signum(bm(days(j)) - bm(days(i)))
        n0 += 1
        if (sa * sb == 1) conc += 1
        if (sa * sb == -1) disc += 1
        if (sa == 0) tieA += 1
        if (sb == 0) tieB += 1
      }
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((n0, conc, disc)))
      val tau = (conc - disc).toDouble /
        math.sqrt((n0 - tieA).toDouble * (n0 - tieB).toDouble)
      assert(math.abs(r.getDouble(5) - tau) < 5e-7)
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
  }

  test("stochastic %K/%D match a replay; both inside [0, 100]") {
    val got = SparkEntry.queries("win_stochastic_osc")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val daily = dailyMicro()
    val kByKey = scala.collection.mutable.Map[(String, Long), Long]()
    for ((et, series) <- daily; i <- 13 until series.length) {
      val win = series.slice(i - 13, i + 1).map(_._2)
      val (lo, hi) = (win.min, win.max)
      val xu = series(i)._2
      val ku = if (hi == lo) 500000L
        else (2000000L * (xu - lo) + (hi - lo)) / (2L * (hi - lo))
      kByKey((et, series(i)._1)) = ku
    }
    for (r <- got) {
      val (et, day) = (r.getString(0), r.getLong(1))
      val k = r.getDouble(2); val dp = r.getDouble(3)
      assert(k >= 0.0 && k <= 100.0 && dp >= 0.0 && dp <= 100.0)
      assert(math.abs(k - kByKey((et, day)) / 10000.0) < 1e-9, s"$et $day k")
      val du = (day - 2 to day).map(d2 => kByKey((et, d2))).sum
      assert(math.abs(dp - du / 30000.0) < 1e-9, s"$et $day d")
    }
  }

  test("cohen's kappa matches a replay; po >= pe implies kappa >= 0 here") {
    val got = SparkEntry.queries("agg_cohens_kappa")(spark, sf0001).collect()
    assert(got.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), (col("n_chars") >= 300).as("a"),
        (QueryUtils.nTok >= 55).as("b"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
      .groupBy(_._1)
    for (r <- got) {
      val ds = docs(r.getString(0))
      val n = ds.length.toLong
      val yy = ds.count(d => d._2 && d._3).toLong
      val yn = ds.count(d => d._2 && !d._3).toLong
      val ny = ds.count(d => !d._2 && d._3).toLong
      val nn = ds.count(d => !d._2 && !d._3).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((n, yy, yn, ny, nn)))
      val po = (yy + nn).toDouble / n
      val pe = ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)).toDouble / (n * n)
      if (pe < 1.0) {
        assert(math.abs(r.getDouble(6) - (po - pe) / (1.0 - pe)) < 5e-7)
        assert(r.getDouble(6) <= 1.0 + 1e-9)
      } else assert(r.isNullAt(6))
    }
  }

  test("eccentricity/component labels match a driver-side BFS") {
    val got = SparkEntry.queries("graph_eccentricity")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val pairs = graft.operators.ScaleQueries.queries("llm_dedup_simhash")(
      spark, sf0001).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.keys.toSeq.sorted.map { root =>
      var dist = Map(root -> 0)
      var frontier = Set(root)
      for (d <- 1 to 4) {
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        dist ++= frontier.map(_ -> d)
        ()
      }
      (root, dist.values.max.toLong, dist.count(_._2 >= 1).toLong,
        dist.keys.min)
    }
    assert(got.toSeq == want)
  }
}
