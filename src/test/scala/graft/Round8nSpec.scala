package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 fourteenth-wave anchors: MRR/MAP invariants vs the shipped
  * NDCG/recall metrics, the PPS sampler's mass identities, and a
  * driver DW replay, at sf0.001.
  */
class Round8nSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_ann_mrr and llm_ann_map are consistent with recall10/ndcg10 " +
      "bounds at sf0.001") {
    val mrr = SparkEntry.queries("llm_ann_mrr")(spark, sf0001).collect()(0)
    val map = SparkEntry.queries("llm_ann_map")(spark, sf0001).collect()(0)
    assert(mrr.getLong(0) == 256 && map.getLong(0) == 256)
    val vMrr = mrr.getDouble(1); val vMap = map.getDouble(1)
    assert(vMrr >= 0.0 && vMrr <= 1.0)
    assert(vMap >= 0.0 && vMap <= 1.0)
    // MAP@10 ≤ MRR@10: AP's first term is 1/minrk and later precision
    // terms never exceed it, and AP divides by the full 10.
    assert(vMap <= vMrr + 1e-9, s"map $vMap > mrr $vMrr")
    // both are 0 exactly when recall10 is 0; with the shipped probe
    // recall is well above 0 at sf0.001
    assert(vMrr > 0.0)
  }

  test("llm_weighted_sample crossings sum to k and respect spans at sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val tot = docs.map(_._2).sum
    var cum = 0L
    val expected = docs.flatMap { case (id, w) =>
      val lo = cum * 100 / tot
      cum += w
      val hi = cum * 100 / tot
      if (hi - lo >= 1) Some(id -> (hi - lo)) else None
    }.toMap
    val got = SparkEntry.queries("llm_weighted_sample")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)
    // every boundary lands on exactly one doc: total copies = k
    assert(got.values.sum == 100L)
  }

  test("agg_durbin_watson replays from scaled residuals at sf0.001") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("agg_durbin_watson")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for ((et, rows) <- daily.groupBy(_._1)) {
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val e = xs.map(x => BigInt(n * x - sx)).toIndexedSeq
      val num = (1 until e.length)
        .map(i => (e(i) - e(i - 1)) * (e(i) - e(i - 1))).sum
      val den = e.map(x => x * x).sum
      val dw = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gdw) = got(et)
      assert(gn == n)
      assert(math.abs(gdw - dw) <= 1e-9, s"$et dw $gdw vs $dw")
      assert(gdw >= 0.0 && gdw <= 4.0 + 1e-9)
    }
  }
}
