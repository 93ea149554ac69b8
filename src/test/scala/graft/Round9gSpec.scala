package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 seventh-wave anchors: HITS replayed iteration-by-iteration
  * in plain Scala; reach/embeddedness replayed from a hand-built
  * adjacency map; tuple-IN checked against a groupBy filter.
  */
class Round9gSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(d: String) = lit(d + " 00:00:00").cast("timestamp")

  /** customer→supplier March-1997 edges. */
  private lazy val be: Set[(Long, Long)] =
    graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= ts("1997-03-01")
          && col("o_orderdate") < ts("1997-04-01"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** supplier-graph adjacency (undirected). */
  private lazy val adj: Map[Long, Set[Long]] = {
    // supplierEdges links suppliers sharing an ORDER: per March-1997
    // order, distinct supplier pairs
    val byOrder = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= ts("1997-03-01")
          && col("o_orderdate") < ts("1997-04-01"))
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap(g => g.map(_._2).distinct.sorted.combinations(2)
        .map(p => (p(0), p(1))))
      .toSet
    val und = byOrder.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    und.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
  }

  test("graph_hits replays two max-normalized integer iterations") {
    def norm(m: Map[Long, BigInt]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> (v * 1000000 / mx).toLong }
    }
    val a1 = norm(be.groupBy(_._2).map { case (s, xs) =>
      s -> BigInt(1000000L) * xs.size })
    // .toSeq before mapping: a Set.map would collapse equal scores
    val h1 = norm(be.groupBy(_._1).map { case (c, xs) =>
      c -> xs.toSeq.map(x => BigInt(a1(x._2))).sum })
    val a2 = norm(be.groupBy(_._2).map { case (s, xs) =>
      s -> xs.toSeq.map(x => BigInt(h1(x._1))).sum })
    val got = SparkEntry.queries("graph_hits")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == a2)
    assert(got.values.max == 1000000L, "normalization pins the max")
  }

  test("graph_two_hop_reach replays the adjacency closure at sf0.001") {
    val got = SparkEntry.queries("graph_two_hop_reach")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == adj.keySet)
    for ((n, nbs) <- adj) {
      val r2 = (nbs ++ nbs.flatMap(adj)) - n
      assert(got(n) == ((nbs.size.toLong, r2.size.toLong)), s"node $n")
    }
  }

  test("graph_edge_embeddedness histogram replays common-neighbor counts") {
    val edges = adj.toSeq.flatMap { case (a, bs) =>
      bs.collect { case b if a < b => (a, b) }
    }
    val hist = edges.map { case (a, b) => (adj(a) & adj(b)).size.toLong }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("graph_edge_embeddedness")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hist)
    assert(got.values.sum == edges.length.toLong)
  }

  test("sub_in_tuple keeps exactly the multi-order (customer, day) rows") {
    val all = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val multi = all.groupBy(x => (x._2, x._3)).filter(_._2.length >= 2)
      .keySet
    val exp = all.filter(x => multi((x._2, x._3))).map(_._1).toSet
    val got = SparkEntry.queries("sub_in_tuple")(spark, sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(got == exp)
  }
}
