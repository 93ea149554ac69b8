package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 third-wave anchors: the indicator ledgers are replayed in
  * plain Scala from hand-built daily bars at sf0.001.
  */
class Round9cSpec extends AnyFunSuite {
  import TestSpark._

  /** event_type → day-sorted (day, hc, lc, cc, vol). */
  private lazy val bars: Map[String, Array[(Long, Long, Long, Long, Long)]] = {
    val rows = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
        col("ts").cast("string").as("tss"), dayofmonth(col("ts")).cast("long"),
        (col("value").cast("decimal(18,6)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).map { case (t, xs) =>
      t -> xs.groupBy(_._4).toArray.sortBy(_._1).map { case (day, es) =>
        val close = es.maxBy(e => (e._3, e._2))._5
        (day, es.map(_._5).max, es.map(_._5).min, close, es.length.toLong)
      }
    }
  }

  private def shu(num: Long, den: Long): Long =
    if (num >= 0) (2 * num + den) / (2 * den)
    else -((2 * -num + den) / (2 * den))

  test("win_cmo replays the up/down ledger at sf0.001") {
    val got = SparkEntry.queries("win_cmo")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((t, bs) <- bars) {
      val diffs = bs.indices.drop(1).map(i => bs(i)._4 - bs(i - 1)._4)
      for (i <- bs.indices if i >= 14) {
        val win = (i - 13 to i).map(j => diffs(j - 1))
        val su = win.filter(_ > 0).sum
        val sd = -win.filter(_ < 0).sum
        val exp = 100.0 * (su - sd).toDouble / (su + sd)
        assert(math.abs(got((t, bs(i)._1)) - exp) < 1e-6, s"$t d${bs(i)._1}")
      }
    }
    assert(got.values.forall(v => v >= -100.0 && v <= 100.0))
  }

  test("win_force_index replays exact centi ledgers at sf0.001") {
    val got = SparkEntry.queries("win_force_index")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    for ((t, bs) <- bars) {
      val fi = bs.indices.drop(1)
        .map(i => (bs(i)._4 - bs(i - 1)._4) * bs(i)._5).toArray
      for (i <- bs.indices if i >= 13) {
        val s13 = (i - 12 to i).map(j => fi(j - 1)).sum
        val (gf, gs) = got((t, bs(i)._1))
        assert(gf == fi(i - 1).toDouble / 100.0, s"$t d${bs(i)._1} fi")
        assert(gs == s13.toDouble / 1300.0, s"$t d${bs(i)._1} sma")
      }
    }
  }

  test("win_keltner bands bracket the middle at sf0.001") {
    val got = SparkEntry.queries("win_keltner")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for ((t, bs) <- bars) {
      for (i <- bs.indices if i >= 19) {
        val stp = (i - 19 to i).map(j => bs(j)._2 + bs(j)._3 + bs(j)._4).sum
        val mid = (2 * stp + 60) / 120
        val tr = bs.indices.drop(1).map { j =>
          val pc = bs(j - 1)._4
          math.max(bs(j)._2 - bs(j)._3,
            math.max(math.abs(bs(j)._2 - pc), math.abs(bs(j)._3 - pc)))
        }.toArray
        val str = (i - 9 to i).map(j => tr(j - 1)).sum
        val atr = (2 * str + 10) / 20
        val (gm, gu, gl) = got((t, bs(i)._1))
        assert(gm == mid.toDouble / 100.0, s"$t d${bs(i)._1} mid")
        assert(gu == (mid + 2 * atr).toDouble / 100.0, s"$t upper")
        assert(gl == (mid - 2 * atr).toDouble / 100.0, s"$t lower")
        assert(gl <= gm && gm <= gu)
      }
    }
  }

  test("win_coppock replays the quantized-ROC weighted mean at sf0.001") {
    val got = SparkEntry.queries("win_coppock")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    var checked = 0
    for ((t, bs) <- bars) {
      val roc = bs.indices.map { i =>
        if (i < 14) None
        else {
          val r14 = shu(1000000L * (bs(i)._4 - bs(i - 14)._4), bs(i - 14)._4)
          val r11 = shu(1000000L * (bs(i)._4 - bs(i - 11)._4), bs(i - 11)._4)
          Some(r14 + r11)
        }
      }
      for (i <- bs.indices if i >= 23) {
        val wsum = (0 until 10).map(k => (10L - k) * roc(i - k).get).sum
        val exp = shu(wsum, 55L).toDouble / 1e6
        assert(got((t, bs(i)._1)) == exp, s"$t d${bs(i)._1}")
        checked += 1
      }
    }
    assert(checked > 0, "at least one full Coppock window must exist")
  }
}
