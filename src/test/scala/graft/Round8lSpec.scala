package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 twelfth-wave anchors: PA / knn / triangle participation /
  * reciprocity replayed from a collected edge list at sf0.001.
  */
class Round8lSpec extends AnyFunSuite {
  import TestSpark._

  /** Collected undirected supplier co-occurrence edges (sa < sb),
    * rebuilt from the raw tables exactly as supplierEdges does. */
  private lazy val edges: Seq[(Long, Long)] = {
    val o = graft.sources.Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey")
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { xs =>
      val s = xs.map(_._2).distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.toSet.toSeq
  }

  private lazy val deg: Map[Long, Long] =
    (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }

  private lazy val adj: Map[Long, Set[Long]] = {
    val nb = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
    nb.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
  }

  test("graph_pref_attachment top-20 matches a brute-force replay at sf0.001") {
    val eset = edges.toSet
    val cand = adj.values.flatMap { nbrs =>
      val s = nbrs.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.toSet.filterNot(eset.contains)
    val expected = cand.toSeq
      .map { case (a, b) => (a, b, deg(a) * deg(b)) }
      .sortBy { case (a, b, pa) => (-pa, a, b) }.take(20)
    val got = SparkEntry.queries("graph_pref_attachment")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(got.length == math.min(20, expected.length))
    assert(got.toSeq == expected, "PA ordering")
  }

  test("graph_avg_neighbor_degree matches per-class means at sf0.001") {
    val got = SparkEntry.queries("graph_avg_neighbor_degree")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byClass = deg.keys.groupBy(deg)
    assert(got.keySet == byClass.keySet.map(identity))
    for ((k, vs) <- byClass) {
      val tot = vs.toSeq.map(v => adj(v).toSeq.map(deg).sum).sum
      val exp = BigDecimal(tot.toDouble / (k * vs.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(k)._1 == vs.size && math.abs(got(k)._2 - exp) <= 1e-9,
        s"deg $k")
    }
  }

  test("graph_triangle_participation histogram sums to the vertex count " +
      "and 3x the triangle count at sf0.001") {
    val perNode = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var nTri = 0L
    val eset = edges.toSet
    for ((a, b) <- edges; c <- adj(b) if b < c && eset.contains((a, c))) {
      nTri += 1
      perNode(a) += 1; perNode(b) += 1; perNode(c) += 1
    }
    val got = SparkEntry.queries("graph_triangle_participation")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expHist = deg.keys.toSeq.map(v => perNode(v))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(got == expHist)
    assert(got.values.sum == deg.size)
    assert(got.map { case (t, n) => t * n }.sum == 3 * nTri)
  }

  test("graph_reciprocity replays from transition counts at sf0.001") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val w = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((_, evs) <- ev.groupBy(_._1)) {
      val s = evs.sortBy(e => (e._2, e._3)).map(_._4)
      for (p <- s.sliding(2) if p.length == 2 && p(0) != p(1))
        w((p(0), p(1))) += 1
    }
    val nPairs = w.size.toLong
    val nRecip = w.keys.count { case (a, b) => w.contains((b, a)) }.toLong
    val wtot = w.values.sum
    val wmin = w.map { case ((a, b), x) => math.min(x, w((b, a))) }.sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = SparkEntry.queries("graph_reciprocity")(spark, sf0001).collect()(0)
    assert(row.getLong(0) == nPairs)
    assert(math.abs(row.getDouble(1) - r6(nRecip.toDouble / nPairs)) <= 1e-9)
    assert(math.abs(row.getDouble(2) - r6(wmin.toDouble / wtot)) <= 1e-9)
  }
}
