package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fourteenth-wave anchors at sf0.001. */
class Round9nSpec extends AnyFunSuite {
  import TestSpark._

  /** (custkey, nationkey, revc) ledger. */
  private lazy val rev: Array[(Long, Int, Long)] =
    graft.sources.Tables.orders(spark, sf0001)
      .join(graft.sources.Tables.customer(spark, sf0001)
        .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey", "c_nationkey")
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)").cast("long").as("revc"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

  private def giniNum(sorted: Array[Long]): BigInt = {
    val n = BigInt(sorted.length)
    val s = sorted.map(BigInt(_)).sum
    val r = sorted.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    2 * r - (n + 1) * s
  }

  test("agg_gini_decomp components add back exactly at sf0.001") {
    val row = SparkEntry.queries("agg_gini_decomp")(spark, sf0001)
      .collect().head
    val n = BigInt(rev.length)
    val s = rev.map(x => BigInt(x._3)).sum
    val numT = giniNum(rev.sortBy(x => (x._3, x._1)).map(_._3))
    val numW = rev.groupBy(_._2).values
      .map(g => giniNum(g.toArray.sortBy(x => (x._3, x._1)).map(_._3))).sum
    val m = rev.groupBy(_._2).map { case (k, g) =>
      k -> ((BigInt(g.size), g.map(x => BigInt(x._3)).sum))
    }
    val numB = (for (a <- m.values; b <- m.values)
      yield (a._2 * b._1 - b._2 * a._1).abs).sum / 2
    val den = n.toDouble * s.toDouble
    assert(row.getLong(0) == rev.length.toLong)
    assert(math.abs(row.getDouble(1) - numT.toDouble / den) < 1e-6)
    assert(math.abs(row.getDouble(2) - numB.toDouble / den) < 1e-6)
    assert(math.abs(row.getDouble(3) - numW.toDouble / den) < 1e-6)
    assert(math.abs(row.getDouble(4)
      - (numT - numB - numW).toDouble / den) < 1e-6)
    // decomposition identity on the rounded values (6dp, tolerance 3 ulp)
    assert(math.abs(row.getDouble(1) - row.getDouble(2) - row.getDouble(3)
      - row.getDouble(4)) < 3e-6)
    assert(row.getDouble(4) >= -1e-12, "overlap term is non-negative")
  }

  test("agg_lorenz_asymmetry replays the cross-multiplied mean cut") {
    val byCust = rev.groupBy(_._1).map { case (c, g) =>
      c -> g.map(_._3).sum
    }
    val n = byCust.size.toLong
    val s = byCust.values.map(BigInt(_)).sum
    val below = byCust.values.filter(v => BigInt(v) * n < s)
    val exp = below.size.toDouble / n + below.map(BigInt(_)).sum.toDouble /
      s.toDouble
    val row = SparkEntry.queries("agg_lorenz_asymmetry")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == n && row.getLong(1) == below.size.toLong)
    assert(math.abs(row.getDouble(2) - exp) < 1e-6)
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) < 2.0)
  }

  test("fn_from_csv roundtrips the packed fields at sf0.001") {
    val exp = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val got = SparkEntry.queries("fn_from_csv")(spark, sf0001).collect()
    assert(got.length == exp.size)
    for (r <- got) {
      val k = r.getLong(0)
      assert(r.getLong(1) == k, "parsed key")
      assert(r.getString(2) == exp(k)._1, "parsed status")
      assert(r.getLong(3) == exp(k)._2, "parsed price (exact centi)")
    }
  }

  test("win_elder_ray brackets the EWMA at sf0.001") {
    val rows = SparkEntry.queries("win_elder_ray")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (ew, bull, bear) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(bull >= bear - 1e-12, "high >= low")
      assert(ew > 0)
      // bull - bear = (hc - lc)/100 exactly in micro units
      assert(math.round((bull - bear) * 1e6) ==
        math.round((bull + ew) * 1e6) - math.round((bear + ew) * 1e6))
    }
  }
}
