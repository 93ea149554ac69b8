package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fifteenth-wave anchors at sf0.001. */
class Round9oSpec extends AnyFunSuite {
  import TestSpark._

  /** event_type → quantized 8dp ln-returns on daily closes. */
  private lazy val lr8: Map[String, Array[Long]] =
    graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("ts").cast("string"),
        dayofmonth(col("ts")).cast("long"),
        (col("value").cast("decimal(18,6)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (t, xs) =>
        val closes = xs.groupBy(_._4).toArray.sortBy(_._1)
          .map { case (_, es) => es.maxBy(e => (e._3, e._2))._5 }
        t -> closes.indices.drop(1).map(i =>
          math.round(math.log(closes(i).toDouble / closes(i - 1)) * 1e8))
          .toArray
      }

  test("agg_sortino replays the downside ledger at sf0.001") {
    val got = SparkEntry.queries("agg_sortino")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((t, a) <- lr8) {
      val n = a.length
      val s1 = a.map(BigInt(_)).sum
      val sd2 = a.filter(_ < 0).map(x => BigInt(x) * BigInt(x)).sum
      val exp = (s1.toDouble / 1e8 / n) /
        math.sqrt(sd2.toDouble / 1e16 / n)
      val (gn, v) = got(t)
      assert(gn == n.toLong)
      assert(math.abs(v - exp) < 1e-3, s"$t sortino")
    }
  }

  test("agg_omega_ratio replays the gain/loss split at sf0.001") {
    val got = SparkEntry.queries("agg_omega_ratio")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((t, a) <- lr8) {
      val g = a.filter(_ > 0).map(BigInt(_)).sum
      val l = -a.filter(_ < 0).map(BigInt(_)).sum
      assert(math.abs(got(t) - g.toDouble / l.toDouble) < 1e-5, s"$t omega")
      assert(got(t) > 0)
    }
  }

  test("llm_jaccard_hist bins cover exactly the near-dup pairs") {
    val pairs = SparkEntry.queries("llm_dedup_near")(spark, sf0001)
      .collect().map(_.getDouble(2))
    val got = SparkEntry.queries("llm_jaccard_hist")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == pairs.length.toLong, "bins partition the pairs")
    val exp = pairs.groupBy { j =>
      if (j >= 0.95) "0.95+" else if (j >= 0.90) "0.90"
      else if (j >= 0.85) "0.85" else if (j >= 0.80) "0.80"
      else if (j >= 0.75) "0.75" else if (j >= 0.70) "0.70"
      else if (j >= 0.65) "0.65" else "0.60"
    }.map { case (k, v) => k -> v.length.toLong }
    assert(got == exp)
  }

  test("udaf_geomean merges are order-free and match a serial fold") {
    val prices = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_brand"), col("p_retailprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = SparkEntry.queries("udaf_geomean")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    for ((b, xs) <- prices.groupBy(_._1)) {
      val sum8 = xs.map(x => math.round(math.log(x._2) * 1e8)).map(BigInt(_)).sum
      val ml = sum8.toDouble / (1e8 * xs.length.toDouble)
      val (n, gm, ge) = got(b)
      assert(n == xs.length.toLong)
      assert(math.abs(gm - ml) < 1e-6, s"$b mean ln")
      assert(math.abs(ge - math.exp(ml)) < 1e-3, s"$b geomean")
      // the geometric mean sits below the arithmetic mean (AM-GM)
      assert(ge <= xs.map(_._2).sum / xs.length + 1e-9, s"$b AM-GM")
    }
  }
}
