package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 eleventh-wave anchors at sf0.001. */
class Round9kSpec extends AnyFunSuite {
  import TestSpark._

  private def shu(num: BigInt, den: BigInt): BigInt =
    (2 * num + den) / (2 * den)

  test("agg_markov_entropy_rate replays the quantized ledger at sf0.001") {
    val seqs = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("string"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1)
      .map { case (_, xs) => xs.sortBy(x => (x._2, x._3)).map(_._4) }
    val tr = seqs.flatMap(s => s.zip(s.tail))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ci = tr.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val n = tr.values.sum
    val st = tr.map { case ((p, _), cij) =>
      BigDecimal(cij) * BigDecimal(
        math.log(ci(p).toDouble / cij) / math.log(2.0))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val row = SparkEntry.queries("agg_markov_entropy_rate")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - (st.toDouble / n)) < 1e-5)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= math.log(5.0) / math.log(2.0))
  }

  test("agg_benford_mad replays the fixed-expectation MAD at sf0.001") {
    val digits = graft.sources.Tables.orders(spark, sf0001)
      .where(col("o_totalprice") >= 1.0)
      .select(substring(col("o_totalprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("long"))
      .collect().map(_.getLong(0))
    val nt = digits.length.toLong
    val b8 = Map(1L -> 30103000L, 2L -> 17609126L, 3L -> 12493874L,
      4L -> 9691001L, 5L -> 7918125L, 6L -> 6694679L, 7L -> 5799195L,
      8L -> 5115252L, 9L -> 4575749L)
    val cnt: Map[Long, Long] =
      digits.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val sad = (1L to 9L).map { dg =>
      val s8 = shu(BigInt(100000000L) * BigInt(cnt.getOrElse(dg, 0L)),
        BigInt(nt))
      (s8 - BigInt(b8(dg))).abs
    }.sum
    val mad = shu(sad, 9)
    val row = SparkEntry.queries("agg_benford_mad")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == nt)
    assert(row.getDouble(1) == mad.toDouble / 1e8)
  }

  test("agg_price_dispersion medians are exact discrete picks at sf0.001") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"),
        col("l_quantity").cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brand = graft.sources.Tables.part(spark, sf0001)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sp6 = li.groupBy(_._1).map { case (pk, xs) =>
      val ups = xs.map(x => shu(BigInt(10000) * x._2, BigInt(x._3)))
      val (mn, mx) = (ups.min, ups.max)
      pk -> shu(BigInt(1000000) * (mx - mn), mn)
    }
    val got = SparkEntry.queries("agg_price_dispersion")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    for ((b, parts) <- sp6.toSeq.groupBy(x => brand(x._1))) {
      val sorted = parts.sortBy(x => (x._2, x._1))
      val med = sorted(((sorted.length + 1) / 2) - 1)._2
      assert(got(b) == ((parts.length.toLong, med.toDouble / 1e6)), s"$b")
    }
  }

  test("llm_vocab_stability counts half vocabularies at sf0.001") {
    val v = graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("text")).collect()
      .flatMap(r => r.getString(2).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), r.getLong(1) % 2 == 0, t)))
    val got = SparkEntry.queries("llm_vocab_stability")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    for ((l, xs) <- v.groupBy(_._1)) {
      val ve = xs.filter(_._2).map(_._3).toSet
      val vo = xs.filterNot(_._2).map(_._3).toSet
      val (ge, go, gb, j) = got(l)
      assert(ge == ve.size.toLong && go == vo.size.toLong
        && gb == (ve & vo).size.toLong, s"$l sets")
      assert(math.abs(j - (ve & vo).size.toDouble / (ve | vo).size) < 1e-6)
    }
  }
}
