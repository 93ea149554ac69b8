package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 second-wave anchors: quartile picks and the KDE ledger are
  * replayed in plain Scala from the collected centi values at sf0.001.
  */
class Round9bSpec extends AnyFunSuite {
  import TestSpark._

  /** event_type → sorted centi values. */
  private lazy val centi: Map[String, Array[Long]] =
    graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 100)
          .cast("decimal(18,0)").cast("long").as("xc"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) => t -> xs.sortBy(x => (x._2, x._3)).map(_._2) }

  private def q(t: String): (Long, Long, Long, Long) = {
    val a = centi(t); val n = a.length.toLong
    (n, a(((n + 3) / 4 - 1).toInt), a(((n + 1) / 2 - 1).toInt),
      a(((3 * n + 3) / 4 - 1).toInt))
  }

  test("agg_bowley_skew replays discrete-rank quartiles at sf0.001") {
    val got = SparkEntry.queries("agg_bowley_skew")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for (t <- centi.keys) {
      val (n, q1, q2, q3) = q(t)
      assert(got(t)._1 == n)
      val exp = (q1 + q3 - 2 * q2).toDouble / (q3 - q1)
      assert(math.abs(got(t)._2 - exp) < 1e-6, s"$t bowley")
      assert(got(t)._2 >= -1.0 && got(t)._2 <= 1.0)
    }
  }

  test("agg_trimean replays (Q1+2Q2+Q3)/4 at sf0.001") {
    val got = SparkEntry.queries("agg_trimean")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (t <- centi.keys) {
      val (_, q1, q2, q3) = q(t)
      assert(got(t) == (q1 + 2 * q2 + q3).toDouble / 400.0, s"$t trimean")
      // robust location lands inside the quartile hull
      assert(got(t) >= q1 / 100.0 && got(t) <= q3 / 100.0)
    }
  }

  test("agg_qcd replays the quartile dispersion ratio at sf0.001") {
    val got = SparkEntry.queries("agg_qcd")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (t <- centi.keys) {
      val (_, q1, _, q3) = q(t)
      val exp = (q3 - q1).toDouble / (q3 + q1)
      assert(math.abs(got(t) - exp) < 1e-6, s"$t qcd")
      assert(got(t) > 0.0 && got(t) < 1.0)
    }
  }

  test("agg_kde_grid replays the exact kernel ledger at sf0.001") {
    val grid = Seq(2500L, 7500L, 12500L, 17500L, 22500L)
    val h = 5000L
    val got = SparkEntry.queries("agg_kde_grid")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.size == centi.size * grid.size, "complete type x grid")
    for (t <- centi.keys; gc <- grid) {
      val a = centi(t); val n = a.length.toLong
      val s = a.map { xc =>
        val d = xc - gc
        if (math.abs(d) < h) BigInt(h * h - d * d) else BigInt(0)
      }.sum
      val nano = (BigInt(6) * s + BigInt(5) * n) / (BigInt(10) * n)
      val (gn, dens) = got((t, gc / 100.0))
      assert(gn == n)
      assert(dens == nano.toDouble / 1.0e9, s"$t@$gc density")
      assert(dens >= 0.0 && dens < 0.75 / 50.0 * 100)
    }
  }
}
