package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 eighth-wave anchors: forecast ledgers and pivots replayed
  * in plain Scala from the daily centi series at sf0.001.
  */
class Round9hSpec extends AnyFunSuite {
  import TestSpark._

  /** event_type → day-ascending daily revenue centi. */
  private lazy val daily: Map[String, Array[Long]] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.sortBy(_._2).map(_._3) }

  private def shuPos(num: BigInt, den: BigInt): BigInt =
    (2 * num + den) / (2 * den)

  test("agg_smape_naive replays quantized per-day terms at sf0.001") {
    val got = SparkEntry.queries("agg_smape_naive")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((t, a) <- daily) {
      val terms = a.indices.drop(1).map { i =>
        shuPos(BigInt(2000000) * (a(i) - a(i - 1)).abs, BigInt(a(i) + a(i - 1)))
      }
      val sm = shuPos(terms.sum, BigInt(terms.length))
      assert(got(t)._1 == terms.length.toLong)
      assert(got(t)._2 == sm.toDouble / 1e6, s"$t smape")
      assert(got(t)._2 >= 0.0 && got(t)._2 <= 2.0)
    }
  }

  test("agg_mase_seasonal replays the cross-product ratio at sf0.001") {
    val got = SparkEntry.queries("agg_mase_seasonal")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((t, a) <- daily) {
      val s1 = a.indices.drop(1).map(i => BigInt((a(i) - a(i - 1)).abs)).sum
      val n1 = a.length - 1
      val s7 = a.indices.drop(7).map(i => BigInt((a(i) - a(i - 7)).abs)).sum
      val n7 = a.length - 7
      val m = shuPos(BigInt(1000000) * s7 * n1, s1 * n7)
      assert(got(t) == m.toDouble / 1e6, s"$t mase")
    }
  }

  test("agg_forecast_u2 replays the tripled error ledgers at sf0.001") {
    val got = SparkEntry.queries("agg_forecast_u2")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((t, a) <- daily) {
      val idx = a.indices.drop(3)
      val sf = idx.map { i =>
        val e = BigInt(3) * a(i) - (BigInt(a(i - 1)) + a(i - 2) + a(i - 3))
        e * e
      }.sum
      val sn = idx.map { i =>
        val e = BigInt(3) * (a(i) - a(i - 1)); e * e
      }.sum
      assert(got(t)._1 == idx.length.toLong)
      val exp = math.sqrt(sf.toDouble / sn.toDouble)
      assert(math.abs(got(t)._2 - exp) < 1e-4, s"$t u2")
    }
  }

  test("win_pivot_points ladder is ordered and exact at sf0.001") {
    val rows = SparkEntry.queries("win_pivot_points")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (p, r1, s1, r2, s2) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(s2 <= s1 + 1e-9 && s1 <= p + 1e-9 && p <= r1 + 1e-9
        && r1 <= r2 + 1e-9, s"${r.getString(0)} d${r.getLong(1)} ladder order")
      // centi-exact identities: r2−s2 = 2(ph−pl) = 2(r1−s1), and
      // (r2−r1) + (s1−s2) = (ph−p) + (p−pl) = ph−pl = r1−s1
      assert(math.round((r2 - s2) * 100) == 2 * math.round((r1 - s1) * 100))
      assert(math.round((r2 - r1) * 100) + math.round((s1 - s2) * 100)
        == math.round((r1 - s1) * 100))
    }
  }
}
