package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 twenty-sixth-wave anchors: cohort-first replays, record
  * ledger identities and the digit/ending partitions, at sf0.001.
  */
class Round8zSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_newcomer_share replays cohort firsts at sf0.001") {
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val first = o.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val got = SparkEntry.queries("agg_newcomer_share")(spark, sf0001)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    for ((mi, rows) <- o.groupBy(_._2)) {
      val active = rows.length.toLong
      val nc = rows.count(r => first(r._1) == mi).toLong
      assert(got(mi) == ((active, nc)), s"month $mi")
    }
    // every customer is a newcomer exactly once
    assert(got.values.map(_._2).sum == first.size)
  }

  test("win_record_highs ledger is consistent at sf0.001") {
    val got = SparkEntry.queries("win_record_highs")(spark, sf0001).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getBoolean(2), x.getLong(3)))
    for ((et, rows) <- got.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3, s"$et first day must be a record")
      var cnt = 0L
      for (r <- sorted) {
        if (r._3) cnt += 1
        assert(r._4 == cnt, s"$et d${r._2} running count")
      }
    }
  }

  test("agg_benford_second covers all >=10 orders with digits 0-9 at sf0.001") {
    val n = graft.sources.Tables.orders(spark, sf0001)
      .where(col("o_totalprice") >= 10.0).count()
    val got = SparkEntry.queries("agg_benford_second")(spark, sf0001)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(got.map(_._2).sum == n)
    assert(got.forall(x => x._1.length == 1 && x._1(0).isDigit))
    assert(math.abs(got.map(_._3).sum - 1.0) <= 1e-4)
  }

  test("agg_price_endings partitions all parts at sf0.001") {
    val parts = graft.sources.Tables.part(spark, sf0001)
      .select(((col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long") % 100).as("c"))
      .collect().map(_.getLong(0))
    val exp = parts.groupBy {
      case 0L => "00"; case 50L => "50"; case 95L => "95"; case 99L => "99"
      case _ => "other"
    }.map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("agg_price_endings")(spark, sf0001)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == exp)
    assert(got.values.sum == parts.length)
  }
}
