package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 sixth-wave anchors: decomposition identities and brute
  * replays at sf0.001.
  */
class Round9fSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_price_volume_mix effects add back to the exact delta") {
    val rows = SparkEntry.queries("agg_price_volume_mix")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (r0, r1, ve, pe) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // ve + pe == r1 - r0 exactly in centi units
      assert(math.round(ve * 100) + math.round(pe * 100) ==
        math.round(r1 * 100) - math.round(r0 * 100), s"${r.getString(0)}")
    }
  }

  test("agg_discount_band_lift has lift 1.0 at band 0 and full band set") {
    val rows = SparkEntry.queries("agg_discount_band_lift")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.contains(0L))
    assert(rows(0L)._3 == 1.0, "zero band lifts itself by exactly 1")
    val n = graft.sources.Tables.lineitem(spark, sf0001).count()
    assert(rows.values.map(_._1).sum == n, "bands partition all lines")
    assert(rows.values.forall(v => v._2 > 0 && v._3 > 0))
  }

  test("agg_pareto_8020 matches a hand-rolled cumulative cut at sf0.001") {
    val rev = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)").cast("long").as("revc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (-x._2, x._1))
    val tot = rev.map(x => BigInt(x._2)).sum
    var cum = BigInt(0); var nTop = 0L; var cov = BigInt(0)
    for ((_, rc) <- rev) {
      if (5 * cum < 4 * tot) { nTop += 1; cum += rc; cov = cum }
      else cum += rc
    }
    val row = SparkEntry.queries("agg_pareto_8020")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == rev.length.toLong)
    assert(row.getLong(1) == nTop, "n_top")
    assert(math.abs(row.getDouble(3) - cov.toDouble / tot.toDouble) < 1e-6)
    assert(row.getDouble(3) >= 0.8, "cut covers at least 80%")
  }

  test("agg_repeat_purchase replays (cust, part) order counts at sf0.001") {
    val cp = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.sources.Tables.part(spark, sf0001)
        .select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("o_custkey"), col("l_partkey"),
        col("l_orderkey"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.length }
    val byBrand = cp.groupBy(_._1._1)
    val got = SparkEntry.queries("agg_repeat_purchase")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    for ((b, xs) <- byBrand) {
      val rep = xs.values.count(_ >= 2).toLong
      assert(got(b) == ((xs.size.toLong, rep)), s"brand $b")
    }
  }
}
