package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 seventh-wave anchors: adjacency replays of the Jaccard and
  * Salton link-prediction scores against a rebuilt supplier graph, a
  * driver-side BFS replay of bounded closeness, and the structural
  * identities of the path-length distribution.
  */
class Round8gSpec extends AnyFunSuite {
  import TestSpark._

  /** (edges, neighbor sets) of the sf0.001 supplier co-occurrence
    * graph, rebuilt from the raw tables (March-1997 orders, suppliers
    * linked when one order carries lines from both). */
  private lazy val graph: (Set[(Long, Long)], Map[Long, Set[Long]]) = {
    val lines = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
          .where(col("o_orderdate") >= lit("1997-03-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e: Set[(Long, Long)] = lines.groupBy(_._1).values.toSeq.flatMap {
      ls: Seq[(Long, Long)] =>
        val ss = ls.map(_._2).distinct
        for (x <- ss; y <- ss if x < y) yield (x, y)
    }.toSet
    val adj = e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    (e, adj)
  }

  test("graph_jaccard_coeff: replayed scores, non-edges, bounded") {
    val (edges, adj) = graph
    val rows = SparkEntry.queries("graph_jaccard_coeff")(spark, sf0001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    for (r <- rows) {
      val (a, b, cn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b && !edges.contains((a, b)))
      val common = adj(a).intersect(adj(b)).size.toLong
      assert(cn == common, s"($a,$b)")
      assert(r.getLong(3) == adj(a).size.toLong && r.getLong(4) == adj(b).size.toLong)
      val j = cn.toDouble / (adj(a).size + adj(b).size - cn)
      assert(math.abs(r.getDouble(5) - j) <= 1e-8 + 1e-9, s"($a,$b)")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("graph_salton_index: replayed scores, bounded by 1") {
    val (edges, adj) = graph
    val rows = SparkEntry.queries("graph_salton_index")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, b, cn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!edges.contains((a, b)))
      val s = cn.toDouble / math.sqrt(adj(a).size.toDouble * adj(b).size)
      assert(math.abs(r.getDouble(5) - s) <= 1e-6, s"($a,$b)")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0 + 1e-9)
    }
  }

  /** Driver BFS over the simhash dup graph at sf0.001. */
  private lazy val bfsDist: Map[Long, Map[Long, Int]] = {
    val pairs = SparkEntry.queries("llm_dedup_simhash")(spark, sf0001)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    adj.keys.map { root =>
      var frontier = Set(root); var seen = Map(root -> 0)
      for (hop <- 1 to 4) {
        val nxt = frontier.flatMap(adj).diff(seen.keySet)
        seen = seen ++ nxt.map(_ -> hop)
        frontier = nxt
      }
      root -> seen.filter(_._2 >= 1)
    }.toMap
  }

  test("graph_closeness_centrality matches a driver BFS replay") {
    val got = SparkEntry.queries("graph_closeness_centrality")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == bfsDist.keySet)
    for ((root, reached) <- bfsDist) {
      val (n, sd, c) = got(root)
      assert(n == reached.size.toLong, root)
      assert(sd == reached.values.map(_.toLong).sum, root)
      assert(math.abs(c - n.toDouble / sd) <= 1e-6)
      // closeness4 in (0, 1]: every reached node is at distance >= 1
      assert(c > 0.0 && c <= 1.0 + 1e-9)
    }
  }

  test("graph_path_length_dist: shares sum to 1, counts replay, pairs even") {
    val rows = SparkEntry.queries("graph_path_length_dist")(spark, sf0001)
      .collect()
    val byD = bfsDist.values.flatMap(_.values).groupBy(identity)
      .map { case (d, xs) => d.toLong -> xs.size.toLong }
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    for (r <- rows) assert(r.getLong(1) == byD(r.getLong(0)), s"d=${r.getLong(0)}")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) <= 4e-6)
    // the BFS table is symmetric, so every ordered-pair total is even
    assert(rows.map(_.getLong(1)).sum % 2 == 0)
    assert(rows.map(_.getDouble(3)).distinct.length == 1)
  }
}
