package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force anchors for the round-7 seventh wave. */
class Round7gSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("price indices match a driver-side replay; Fisher between L and P") {
    val pm = graft.sources.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey"), trunc(col("l_shipdate"), "mm").as("month"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("epc"),
        (sum(col("l_quantity").cast("decimal(18,2)")) * 100)
          .cast("long").as("qc"))
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toLocalDate), (r.getLong(2), r.getLong(3))))
      .toMap
    val pu = pm.map { case (k, (epc, qc)) =>
      k -> ((2 * epc * 1000000 + qc) / (2 * qc), qc)
    }
    val got = SparkEntry.queries("agg_price_index")(spark, sf0001).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val m1 = r.getDate(0).toLocalDate
      val m0 = m1.minusMonths(1)
      val pairs = pu.keys.filter(_._2 == m1).map(_._1)
        .filter(pk => pu.contains((pk, m0))).toSeq
      assert(pairs.size == r.getLong(1), s"$m1 n_parts")
      val lnum = pairs.map(pk => BigInt(pu((pk, m1))._1) * BigInt(pu((pk, m0))._2)).sum
      val lden = pairs.map(pk => BigInt(pu((pk, m0))._1) * BigInt(pu((pk, m0))._2)).sum
      val pnum = pairs.map(pk => BigInt(pu((pk, m1))._1) * BigInt(pu((pk, m1))._2)).sum
      val pden = pairs.map(pk => BigInt(pu((pk, m0))._1) * BigInt(pu((pk, m1))._2)).sum
      val l = lnum.toDouble / lden.toDouble
      val p = pnum.toDouble / pden.toDouble
      assert(math.abs(r.getDouble(2) - l) < 5e-7, s"$m1 laspeyres")
      assert(math.abs(r.getDouble(3) - p) < 5e-7, s"$m1 paasche")
      val f = r.getDouble(4)
      assert(f >= math.min(l, p) - 5e-7 && f <= math.max(l, p) + 5e-7,
        s"$m1 fisher outside [L,P]")
    }
  }

  test("RSI matches a driver-side replay and stays inside [0,100]") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("xu"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val got = SparkEntry.queries("win_rsi")(spark, sf0001).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (et, day, rsi) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(rsi >= 0.0 && rsi <= 100.0)
      val series = daily(et)
      val idx = series.indexWhere(_._2 == day)
      val deltas = (idx - 13 to idx).map(i => series(i)._3 - series(i - 1)._3)
      assert(deltas.length == 14)
      val g = deltas.filter(_ > 0).sum
      val l = deltas.filter(_ < 0).map(-_).sum
      val want = if (l == 0) 100.0
        else 100.0 - 100.0 / (1.0 + g.toDouble / l.toDouble)
      assert(math.abs(rsi - want) < 5e-7, s"$et day $day rsi")
    }
  }

  test("katz walk counts match a driver-side adjacency replay") {
    val pairs = graft.operators.ScaleQueries.queries("llm_dedup_simhash")(
      spark, sf0001).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val w1 = adj.map { case (k, v) => k -> v.size.toLong }
    val w2 = adj.map { case (k, v) => k -> v.map(w1).sum }
    val w3 = adj.map { case (k, v) => k -> v.map(w2).sum }
    val got = SparkEntry.queries("graph_katz_walks")(spark, sf0001).collect()
    assert(got.length == adj.size && got.nonEmpty)
    for (r <- got) {
      val n = r.getLong(0)
      assert(r.getLong(1) == w1(n) && r.getLong(2) == w2(n) &&
        r.getLong(3) == w3(n), s"node $n walk counts")
      val katz = 0.1 * w1(n) + 0.01 * w2(n) + 0.001 * w3(n)
      assert(math.abs(r.getDouble(4) - katz) < 5e-7, s"node $n katz")
    }
  }
}
