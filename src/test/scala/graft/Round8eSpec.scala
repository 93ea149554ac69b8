package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 fifth-wave anchors: driver-side dominance/ECDF replays of
  * Cliff's delta and the two-sample Cramér–von Mises T, a median +
  * contingency replay of Mood's test, and an exact-deviation replay of
  * the Hoover index — all from the collected sf0.001 rows, plus the
  * closed-form identities each statistic must satisfy.
  */
class Round8eSpec extends AnyFunSuite {
  import TestSpark._

  private def armValues(arm: String): Seq[BigDecimal] =
    graft.sources.Tables.events(spark, sf0001)
      .where(col("event_type") === arm)
      .select(col("value").cast("decimal(18,6)"))
      .collect().map(r => BigDecimal(r.getDecimal(0))).toSeq

  test("agg_cliff_delta matches a pairwise driver replay and its identities") {
    val a = armValues("click")
    val b = armValues("purchase")
    var gt = 0L; var lt = 0L; var ties = 0L
    for (x <- a; y <- b) {
      val c = x.compare(y)
      if (c > 0) gt += 1 else if (c < 0) lt += 1 else ties += 1
    }
    val row = SparkEntry.queries("agg_cliff_delta")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == a.size.toLong && row.getLong(1) == b.size.toLong)
    assert(row.getLong(2) == gt && row.getLong(3) == lt && row.getLong(4) == ties)
    // partition identity + delta from the emitted counts
    assert(row.getLong(2) + row.getLong(3) + row.getLong(4) ==
      row.getLong(0) * row.getLong(1))
    val delta = (gt - lt).toDouble / (a.size.toDouble * b.size.toDouble)
    assert(math.abs(row.getDouble(5) - delta) <= 1e-6)
    assert(row.getDouble(5) >= -1.0 && row.getDouble(5) <= 1.0)
  }

  test("agg_cvm_two_sample matches an ECDF driver replay at sf0.001") {
    val a = armValues("view").sorted
    val b = armValues("signup").sorted
    val n = a.size.toLong; val m = b.size.toLong
    val all = (a ++ b).distinct.sorted
    def cum(xs: Seq[BigDecimal], v: BigDecimal): Long = xs.count(_ <= v).toLong
    var num = BigInt(0)
    for (v <- all) {
      val w = a.count(_ == v) + b.count(_ == v)
      val diff = BigInt(m * cum(a, v) - n * cum(b, v))
      num += BigInt(w) * diff * diff
    }
    val t = num.toDouble / (n.toDouble * m * (n + m).toDouble * (n + m))
    val row = SparkEntry.queries("agg_cvm_two_sample")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == n && row.getLong(1) == m)
    assert(math.abs(row.getDouble(2) - t) <= 1e-6, s"${row.getDouble(2)} vs $t")
    assert(row.getDouble(2) >= 0.0)
  }

  test("agg_mood_median: low-median + contingency replay, chi2 >= 0") {
    val vs = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("value").cast("decimal(18,6)"))
      .collect().map(r => (r.getString(0), BigDecimal(r.getDecimal(1)))).toSeq
    val sorted = vs.map(_._2).sorted
    val med = sorted((sorted.size + 1) / 2 - 1) // low median, 1-based ceil(n/2)
    val above = vs.count(_._2 > med).toLong
    val row = SparkEntry.queries("agg_mood_median")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == vs.size.toLong)
    assert(row.getLong(1) == vs.map(_._1).distinct.size.toLong)
    assert(math.abs(row.getDouble(2) - med.toDouble) <= 1e-9)
    assert(row.getLong(3) == above)
    assert(row.getDouble(4) >= 0.0)
  }

  test("agg_hoover_index matches an exact-deviation replay; 0 <= H < 1") {
    val xs = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(_.getLong(1)).toSeq
    val n = xs.size.toLong
    val s = xs.sum
    val sd = xs.map(x => (BigInt(n) * BigInt(x) - BigInt(s)).abs).sum
    val h = sd.toDouble / (2.0 * n * s)
    val row = SparkEntry.queries("agg_hoover_index")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - s.toDouble / 100.0) <= 1e-6)
    assert(math.abs(row.getDouble(2) - h) <= 1e-6)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }
}
