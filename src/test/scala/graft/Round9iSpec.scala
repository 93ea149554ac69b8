package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 ninth-wave anchors at sf0.001. */
class Round9iSpec extends AnyFunSuite {
  import TestSpark._

  private def shu(num: BigInt, den: BigInt): BigInt =
    if (num >= 0) (2 * num + den) / (2 * den)
    else -((2 * -num + den) / (2 * den))

  test("agg_pacf2 replays the integer Durbin–Levinson chain at sf0.001") {
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.sortBy(_._2).map(_._3) }
    val got = SparkEntry.queries("agg_pacf2")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val R = BigInt(100000000L)
    for ((t, a) <- daily) {
      val n = BigInt(a.length); val sx = a.map(BigInt(_)).sum
      val e = a.map(x => n * x - sx)
      val den = e.map(x => x * x).sum
      def c(k: Int) = e.indices.drop(k).map(i => e(i) * e(i - k)).sum
      val q1 = shu(R * c(1), den); val q2 = shu(R * c(2), den)
      val phi11 = shu(BigInt(1000000) * q1, R)
      val phi22 = shu(BigInt(1000000) * (q2 * R - q1 * q1), R * R - q1 * q1)
      assert(got(t)._1 == phi11.toDouble / 1e6, s"$t phi11")
      assert(got(t)._2 == phi22.toDouble / 1e6, s"$t phi22")
    }
  }

  test("join_snapshot_diff classes partition the customer union") {
    val rows = SparkEntry.queries("join_snapshot_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def keys(lo: String, hi: String) =
      graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= lit(lo + " 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit(hi + " 00:00:00").cast("timestamp"))
        .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val a = keys("1997-01-01", "1997-07-01")
    val b = keys("1997-07-01", "1998-01-01")
    assert(rows.getOrElse("added", 0L) == (b -- a).size.toLong)
    assert(rows.getOrElse("removed", 0L) == (a -- b).size.toLong)
    assert(rows.values.sum == (a ++ b).size.toLong)
  }

  test("win_interval_union merges overlaps exactly at sf0.001") {
    val iv = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp_ltz))").as("tus"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val got = SparkEntry.queries("win_interval_union")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val L = 1800000000L
    for ((t, ts) <- iv) {
      var islands = 0L; var covered = BigInt(0)
      var st = 0L; var en = Long.MinValue
      for (x <- ts) {
        if (en == Long.MinValue || x > en) {
          if (en != Long.MinValue) covered += en - st
          islands += 1; st = x; en = x + L
        } else en = math.max(en, x + L)
      }
      if (en != Long.MinValue) covered += en - st
      assert(got(t) == ((ts.length.toLong, islands, covered.toLong)), s"$t")
    }
  }

  test("agg_poisson_ztest covers all type pairs with consistent signs") {
    val k = graft.sources.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("agg_poisson_ztest")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == k.size * (k.size - 1) / 2)
    for (((a, b), (ka, kb, z)) <- got) {
      assert(a < b && ka == k(a) && kb == k(b))
      val exp = (ka - kb).toDouble / math.sqrt((ka + kb).toDouble)
      assert(math.abs(z - exp) < 1e-4)
    }
  }
}
