package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 fourth-wave anchors: driver-side replays of the Parkinson,
  * Ljung–Box and Ulcer ledgers from the collected daily series, and an
  * adjacency re-check of every reported local bridge.
  */
class Round8dSpec extends AnyFunSuite {
  import TestSpark._

  private def q8(x: Double): BigDecimal =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)

  private def daily(): Seq[(String, Long, Long)] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 100)
        .cast("decimal(18,0)").cast("long").as("xc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("win_parkinson_vol matches a driver-side replay at sf0.001") {
    val hl = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg(max(col("value").cast("decimal(18,6)")).cast("double").as("hi"),
        min(col("value").cast("decimal(18,6)")).cast("double").as("lo"))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
      .filter(_._3 > 0)
    val predicted = hl.groupBy(_._1).map { case (et, rows) =>
      val tu = rows.map { case (_, hi, lo) =>
        val l = math.log(hi / lo); q8(l * l)
      }.sum
      val n = rows.size
      et -> (n.toLong,
        BigDecimal(math.sqrt((tu.toDouble) / (4.0 * n * math.log(2.0))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("win_parkinson_vol")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((et, (n, v)) <- predicted) {
      assert(got(et)._1 == n, et)
      assert(math.abs(got(et)._2 - v) <= 1e-6, s"$et ${got(et)._2} vs $v")
    }
  }

  test("agg_ljung_box matches a driver-side replay at sf0.001") {
    val predicted = daily().groupBy(_._1).map { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.size
      val s = xs.sum
      val dev = xs.map(x => BigInt(n.toLong * x - s))
      val c0 = dev.map(d => d * d).sum
      val q = n.toDouble * (n + 2.0) * (1 to 5).map { k =>
        val ck = (0 until n - k).map(t => dev(t) * dev(t + k)).sum
        val r = ck.toDouble / c0.toDouble
        r * r / (n - k)
      }.sum
      et -> (n.toLong, q)
    }
    val got = SparkEntry.queries("agg_ljung_box")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((et, (n, q)) <- predicted) {
      assert(got(et)._1 == n, et)
      assert(math.abs(got(et)._2 - q) <= 1e-5, s"$et ${got(et)._2} vs $q")
    }
  }

  test("graph_local_bridges: every reported edge has zero common neighbors") {
    val edges = graft.sources.Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp_ntz")
        && col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .join(graft.sources.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap { rows =>
        val ss = rows.map(_._2).distinct.sorted
        for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
      }.toSet
    val adj = scala.collection.mutable.HashMap[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val got = SparkEntry.queries("graph_local_bridges")(spark, sf0001).collect()
    for (r <- got) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(edges.contains((a, b)), s"($a,$b) is not an edge")
      assert((adj(a) & adj(b)).isEmpty, s"($a,$b) shares a neighbor")
      assert(r.getLong(2) == adj(a).size.toLong
        && r.getLong(3) == adj(b).size.toLong, s"($a,$b) degree mismatch")
    }
    // completeness: every triangle-free edge is reported
    val bridges = edges.filter { case (a, b) => (adj(a) & adj(b)).isEmpty }
    assert(got.length == bridges.size,
      s"reported ${got.length} bridges, adjacency says ${bridges.size}")
  }

  test("win_ulcer_index matches a driver-side replay at sf0.001") {
    val predicted = daily().groupBy(_._1).map { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var mx = Long.MinValue
      val terms = xs.flatMap { x =>
        mx = math.max(mx, x)
        if (mx > 0) {
          val dd = 100.0 * (mx.toDouble - x.toDouble) / mx.toDouble
          Some(q8(dd * dd))
        } else None
      }
      val n = terms.size
      et -> (n.toLong,
        BigDecimal(math.sqrt(terms.sum.toDouble / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = SparkEntry.queries("win_ulcer_index")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((et, (n, v)) <- predicted) {
      assert(got(et)._1 == n, et)
      assert(math.abs(got(et)._2 - v) <= 1e-6, s"$et ${got(et)._2} vs $v")
    }
  }
}
