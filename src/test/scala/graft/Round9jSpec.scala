package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 tenth-wave anchors at sf0.001. */
class Round9jSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_positional_bias buckets cover each top token consistently") {
    val rows = SparkEntry.queries("llm_positional_bias")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val byTok = rows.groupBy(_._1._1)
    assert(byTok.size == 5, "exactly the top-5 tokens")
    // replay: per-token total across buckets equals its corpus count
    val toks = graft.sources.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val cnt = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top5 = cnt.toSeq.sortBy(x => (-x._2, x._1)).take(5).map(_._1).toSet
    assert(byTok.keySet == top5)
    for ((t, xs) <- byTok)
      assert(xs.map(_._2).sum == cnt(t), s"token $t mass")
    assert(rows.forall(x => x._1._2 >= 0 && x._1._2 <= 2))
  }

  test("llm_dedup_cross_source replays prefix-fingerprint provenance") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("text"), col("source")).collect()
      .map(r => (r.getString(0).split(" ").filter(_.nonEmpty)
        .take(20).mkString(" "), r.getString(1)))
    val clusters = docs.groupBy(_._1).filter(_._2.length >= 2)
    val cross = clusters.values.count(_.map(_._2).distinct.length >= 2).toLong
    val row = SparkEntry.queries("llm_dedup_cross_source")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == clusters.size.toLong)
    assert(row.getLong(1) == cross)
    assert(row.getLong(2) == clusters.values
      .filter(_.map(_._2).distinct.length >= 2).map(_.length.toLong).sum)
  }

  test("agg_log_return_vol replays quantized 8dp ledgers at sf0.001") {
    // replay against the dailyBars closes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val closes = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("ts").cast("string").as("tss"),
        dayofmonth(col("ts")).cast("long").as("day"),
        (col("value").cast("decimal(18,6)") * 100)
          .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (t, xs) =>
        t -> xs.groupBy(_._4).toArray.sortBy(_._1)
          .map { case (_, es) => es.maxBy(e => (e._3, e._2))._5 }
      }
    val got = SparkEntry.queries("agg_log_return_vol")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    for ((t, cs) <- closes) {
      val lr8 = cs.indices.drop(1).map { i =>
        BigDecimal(math.log(cs(i).toDouble / cs(i - 1).toDouble))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      val n = lr8.length
      val s1 = lr8.sum; val s2 = lr8.map(x => x * x).sum
      val mean = (s1.toDouble / n)
      val vol = math.sqrt((n * s2.toDouble - s1.toDouble * s1.toDouble)
        / (n * (n - 1.0)))
      val (gn, gm, gv) = got(t)
      assert(gn == n.toLong)
      assert(math.abs(gm - mean) < 1e-6, s"$t mean")
      assert(math.abs(gv - vol) < 1e-4, s"$t vol")
    }
  }

  test("agg_quadrant_corr counts quadrants around exact medians") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,0)").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    val got = SparkEntry.queries("agg_quadrant_corr")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    for ((flag, xs) <- li.groupBy(_._1)) {
      def med(sel: ((String, Long, Int, Long, Long)) => Long): Long = {
        val sorted = xs.sortBy(e => (sel(e), e._2, e._3)).map(sel)
        sorted(((sorted.length + 1) / 2 - 1))
      }
      val mx = med(_._4); val my = med(_._5)
      val pts = xs.filter(e => e._4 != mx && e._5 != my)
      val nc = pts.count(e => (e._4 > mx) == (e._5 > my)).toLong
      val (gn, gnc, qcc) = got(flag)
      assert(gn == pts.length.toLong && gnc == nc, s"$flag counts")
      assert(math.abs(qcc - (2.0 * nc - pts.length) / pts.length) < 1e-6)
    }
  }
}
