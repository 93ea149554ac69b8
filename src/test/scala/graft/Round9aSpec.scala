package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 first-wave anchors: the ordinal pair ledgers are replayed
  * by brute force over all row pairs at sf0.001 (6k lineitems → ~6M
  * within-flag pairs, trivially affordable in-test), and Kendall's W
  * is replayed from hand-built daily rankings.
  */
class Round9aSpec extends AnyFunSuite {
  import TestSpark._

  /** (flag → (n, C, D, Tx, Ty)) by brute force over row pairs. */
  private lazy val brute: Map[String, (Long, Long, Long, Long, Long)] = {
    val rows = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,0)").cast("long"),
        (col("l_discount").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).map { case (flag, xs) =>
      val a = xs.map(t => (t._2, t._3))
      var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
      for (i <- a.indices; j <- 0 until i) {
        val (xi, yi) = a(i); val (xj, yj) = a(j)
        if (xi == xj && yi != yj) tx += 1
        else if (yi == yj && xi != xj) ty += 1
        else if (xi != xj && yi != yj) {
          if ((xi - xj) * (yi - yj) > 0) c += 1 else d += 1
        }
      }
      flag -> ((a.length.toLong, c, d, tx, ty))
    }
  }

  test("agg_gk_gamma matches the brute-force pair ledger at sf0.001") {
    val got = SparkEntry.queries("agg_gk_gamma")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for ((flag, (n, c, d, _, _)) <- brute) {
      val (gn, gc, gd, gamma) = got(flag)
      assert(gn == n, s"$flag n")
      assert(gc == c.toDouble && gd == d.toDouble, s"$flag pair counts")
      assert(math.abs(gamma - (c - d).toDouble / (c + d)) < 1e-6, s"$flag gamma")
      assert(gamma >= -1.0 && gamma <= 1.0)
    }
  }

  test("agg_somers_d matches brute-force asymmetric ratios at sf0.001") {
    val got = SparkEntry.queries("agg_somers_d")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    for ((flag, (_, c, d, tx, ty)) <- brute) {
      val (dyx, dxy) = got(flag)
      assert(math.abs(dyx - (c - d).toDouble / (c + d + ty)) < 1e-6, s"$flag d_yx")
      assert(math.abs(dxy - (c - d).toDouble / (c + d + tx)) < 1e-6, s"$flag d_xy")
    }
  }

  test("agg_stuart_tau_c matches the brute-force formula at sf0.001") {
    val lv = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,0)").cast("long"),
        (col("l_discount").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("agg_stuart_tau_c")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    for ((flag, (n, c, d, _, _)) <- brute) {
      val m = math.min(lv(flag).map(_._2).distinct.length,
        lv(flag).map(_._3).distinct.length).toLong
      val (gn, gm, tc) = got(flag)
      assert(gn == n && gm == m, s"$flag n/m")
      val exp = 2.0 * m * (c - d) / (n.toDouble * n * (m - 1.0))
      assert(math.abs(tc - exp) < 1e-6, s"$flag tau_c")
      assert(tc >= -1.0 && tc <= 1.0)
    }
  }

  test("agg_kendall_w replays hand-built daily rankings at sf0.001") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = daily.map(_._1).distinct.sorted
    val n = types.length
    val byDay = daily.groupBy(_._2).filter(_._2.length == n)
    val k = byDay.size.toLong
    val ri = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, rows) <- byDay) {
      val ranked = rows.sortBy(t => (-t._3, t._1)).zipWithIndex
      for (((t, _, _), i) <- ranked) ri(t) += (i + 1).toLong
    }
    val s4 = types.map(t => { val r2 = 2 * ri(t) - k * (n + 1); r2 * r2 }).sum
    val expW = 3.0 * s4 / (k.toDouble * k * (n.toLong * n * n - n))
    val row = SparkEntry.queries("agg_kendall_w")(spark, sf0001).collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n.toLong)
    assert(math.abs(row.getDouble(2) - expW) < 1e-6)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0 + 1e-12)
  }
}
