package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 ninth-wave anchors: driver-side replays of the Ansari-
  * Bradley block-score closed form, the Jonckheere pairwise U (brute
  * force over collected rows — the query must match the O(n²)
  * definition it avoids), Bartlett's χ² ledger, and the signed-rank
  * W⁺/z, from sf0.001.
  */
class Round8iSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_ansari_bradley matches a brute-force midscore replay at sf0.001") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
        (col("user_id") % 2 === 0).as("treat"),
        col("value").cast("decimal(18,6)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getDecimal(3)))
    val got = SparkEntry.queries("agg_ansari_bradley")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((et, rows) <- ev.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._4, r._2))
      val n = sorted.length
      // per-row midscores: average of a(r)=min(r, n+1-r) over the tie block
      val scores = sorted.zipWithIndex.map { case (r, i) => (r._4, r._3, i + 1L) }
      val byV = scores.groupBy(_._1)
      var ab = BigDecimal(0)
      var n1 = 0L
      for ((_, blk) <- byV) {
        val s = blk.map(b => math.min(b._3, n + 1 - b._3)).sum
        val tt = blk.count(_._2)
        n1 += tt
        ab += BigDecimal(tt.toDouble * s / blk.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val (gn1, gn2, gab, gmean) = got(et)
      assert(gn1 == n1 && gn2 == n - n1, s"$et arm sizes")
      assert(math.abs(gab - ab.toDouble) <= 1e-6, s"$et ab: $gab vs $ab")
      val mean = if (n % 2 == 0) n1 * (n + 2.0) / 4.0
        else n1 * (n + 1.0) * (n + 1.0) / (4.0 * n)
      assert(math.abs(gmean -
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        <= 1e-9, s"$et mean")
    }
  }

  test("agg_jonckheere matches the O(n²) pairwise-U definition at sf0.001") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        expr("(CAST(l_quantity AS BIGINT) - 1) div 10").as("qb"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long").as("pc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("agg_jonckheere")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((flag, rows) <- li.groupBy(_._1)) {
      var j2 = 0L
      val arr = rows.toArray
      for (a <- arr; b <- arr if a._2 < b._2) {
        if (a._3 < b._3) j2 += 2
        else if (a._3 == b._3) j2 += 1
      }
      val nk = arr.groupBy(_._2).values.map(_.length.toLong)
      val n = arr.length.toLong
      val (gn, gj, gmean) = got(flag)
      assert(gn == n, s"$flag n")
      assert(gj == j2 / 2.0, s"$flag J: $gj vs ${j2 / 2.0}")
      assert(gmean == (n.toDouble * n - nk.map(x => x.toDouble * x).sum) / 4.0,
        s"$flag mean")
    }
  }

  test("agg_bartlett chi2 replays from per-type variances at sf0.001") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value").cast("decimal(18,6)").as("v"))
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val groups = ev.groupBy(_._1).map { case (_, rows) =>
      val n = rows.length.toLong
      val s1 = rows.map(r => BigDecimal(r._2)).sum
      val s2 = rows.map(r => BigDecimal(r._2) * BigDecimal(r._2)).sum
      val v = r6((s2.toDouble - BigDecimal(s1.toDouble * s1.toDouble / n)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) / (n - 1))
      (n, v)
    }.toSeq
    val n = groups.map(_._1).sum
    val k = groups.length.toLong
    val poolNum = groups.map { case (ng, s2) =>
      BigDecimal(r6((ng - 1) * s2)) }.sum.toDouble
    val sp2 = r6(poolNum / (n - k))
    val lnsum = groups.map { case (ng, s2) =>
      BigDecimal(r6((ng - 1.0) * r6(math.log(s2)))) }.sum.toDouble
    val recip = groups.map { case (ng, _) =>
      BigDecimal(1.0 / (ng - 1)).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val c = 1.0 + (recip - 1.0 / (n - k)) / (3.0 * (k - 1))
    val chi2 = BigDecimal(((n - k) * r6(math.log(sp2)) - lnsum) / c)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = SparkEntry.queries("agg_bartlett")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == n && row.getLong(1) == k)
    assert(math.abs(row.getDouble(2) - sp2) <= 1e-9, "pooled var")
    assert(math.abs(row.getDouble(3) - chi2) <= 1e-9, s"chi2 ${row.getDouble(3)} vs $chi2")
    assert(chi2 >= 0.0)
  }

  test("agg_wilcoxon_signedrank W+ and z replay at sf0.001") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("agg_wilcoxon_signedrank")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((et, rows) <- daily.groupBy(_._1)) {
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val diffs = (1L to 15L).flatMap { d =>
        for (a <- byDay.get(d); b <- byDay.get(d + 15); if a != b)
          yield (d, a - b)
      }
      if (diffs.nonEmpty) {
        val sorted = diffs.sortBy(p => (math.abs(p._2), p._1))
        val ranked = sorted.zipWithIndex.map { case ((d, diff), i) =>
          (math.abs(diff), diff > 0, i + 1L)
        }
        var w2 = 0L; var ties = 0L
        for ((_, blk) <- ranked.groupBy(_._1)) {
          val lo = blk.map(_._3).min; val hi = blk.map(_._3).max
          val t = blk.length.toLong
          w2 += blk.count(_._2) * (lo + hi)
          ties += t * t * t - t
        }
        val n = diffs.length.toLong
        val wp = w2 / 2.0
        val z = BigDecimal((wp - n * (n + 1) / 4.0) /
          math.sqrt((2.0 * n * (n + 1) * (2 * n + 1) - ties) / 48.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gn, gwp, gz) = got(et)
        assert(gn == n && gwp == wp, s"$et W+")
        assert(math.abs(gz - z) <= 1e-9, s"$et z: $gz vs $z")
      }
    }
  }
}
