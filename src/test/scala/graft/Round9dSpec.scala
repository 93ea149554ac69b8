package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 fourth-wave anchors: the frequency-table statistics are
  * replayed in plain Scala from collected token counts at sf0.001.
  */
class Round9dSpec extends AnyFunSuite {
  import TestSpark._

  /** lang → (token → count). */
  private lazy val tf: Map[String, Map[String, Long]] =
    graft.sources.Tables.documents(spark, sf0001)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
      .groupBy(_._1)
      .map { case (l, xs) =>
        l -> xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong }
      }

  private def gini(sorted: Array[Long]): Double = {
    val n = sorted.length.toLong
    val s0 = sorted.map(BigInt(_)).sum
    val s1 = sorted.zipWithIndex.map { case (c, i) => BigInt(i + 1) * c }.sum
    (2.0 * s1.toDouble - (n + 1).toDouble * s0.toDouble) /
      (n.toDouble * s0.toDouble)
  }

  test("llm_legomena_profile partitions the vocabulary at sf0.001") {
    val got = SparkEntry.queries("llm_legomena_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((l, m) <- tf) {
      val v1 = m.values.count(_ == 1).toLong
      val v2 = m.values.count(_ == 2).toLong
      val v3 = m.values.count(_ >= 3).toLong
      assert(got(l) == ((m.size.toLong, v1, v2, v3)), s"$l classes")
      assert(v1 + v2 + v3 == m.size.toLong)
    }
  }

  test("llm_token_gini matches the sorted-rank closed form at sf0.001") {
    val got = SparkEntry.queries("llm_token_gini")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    for ((l, m) <- tf) {
      // rank order (cnt asc, tok asc); gini depends only on the sorted counts
      val sorted = m.toArray.sortBy(x => (x._2, x._1)).map(_._2)
      val (v, nt, g) = got(l)
      assert(v == m.size.toLong && nt == m.values.sum, s"$l sizes")
      assert(math.abs(g - gini(sorted)) < 1e-6, s"$l gini")
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("llm_mean_word_rank is occurrence-weighted at sf0.001") {
    val got = SparkEntry.queries("llm_mean_word_rank")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    for ((l, m) <- tf) {
      val ranked = m.toArray.sortBy(x => (-x._2, x._1)).zipWithIndex
      val n = m.values.sum
      val sr = ranked.map { case ((_, c), i) => BigInt(i + 1) * c }.sum
      val exp = sr.toDouble / n.toDouble
      assert(got(l)._1 == n)
      assert(math.abs(got(l)._2 - exp) < 1e-6, s"$l mean rank")
      // head-heavy corpora sit far below the uniform mean (V+1)/2
      assert(got(l)._2 >= 1.0 && got(l)._2 <= (m.size + 1).toDouble / 2.0)
    }
  }

  test("graph_degree_gini matches a hand computation at sf0.001") {
    val e = SparkEntry.queries("graph_degree_gini")(spark, sf0001)
      .collect().head
    val edges = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= lit("1997-03-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_suppkey").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap(g => g.map(_._2).distinct.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    assert(e.getLong(0) == deg.size.toLong, "n_nodes")
    assert(e.getLong(1) == deg.values.sum, "total_degree")
    val sorted = deg.toArray.sortBy(x => (x._2, x._1)).map(_._2)
    assert(math.abs(e.getDouble(2) - gini(sorted)) < 1e-6, "gini")
  }
}
