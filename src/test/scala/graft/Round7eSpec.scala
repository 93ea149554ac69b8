package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form / brute-force anchors for the round-7 fifth wave. */
class Round7eSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("harmonic centrality matches a driver-side BFS at sf0.001") {
    val got = SparkEntry.queries("graph_harmonic_centrality")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = graft.operators.ScaleQueries.queries("llm_dedup_simhash")(
      spark, sf0001).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.keys.toSeq.sorted.map { root =>
      var dist = Map(root -> 0)
      var frontier = Set(root)
      for (d <- 1 to 4) {
        frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
        dist ++= frontier.map(_ -> d)
        ()
      }
      val n = Array(0, 0, 0, 0, 0)
      dist.values.foreach(d => n(d) += 1)
      val h = n(1).toDouble + n(2).toDouble / 2.0 +
        n(3).toDouble / 3.0 + n(4).toDouble / 4.0
      (root, dist.count(_._2 >= 1).toLong, h)
    }
    assert(got.length == want.length && got.nonEmpty)
    for ((g, w) <- got.zip(want)) {
      assert(g._1 == w._1 && g._2 == w._2, s"node ${g._1} reach mismatch")
      assert(math.abs(g._3 - w._3) < 5e-7, s"node ${g._1} harmonic mismatch")
    }
  }

  test("bootstrap: exact point stats, positive SE, CI braces the mean") {
    val rows = SparkEntry.queries("agg_bootstrap_se")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val direct = graft.sources.Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(1) == direct(r.getString(0)), "n_orders mismatch")
      val (m, se, lo, hi) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(se > 0.0)
      assert(lo < m && m < hi)
      assert(math.abs((m - lo) - (hi - m)) < 2e-6, "CI not symmetric")
    }
  }

  test("pettitt matches a driver-side exact replay at sf0.001") {
    val got = SparkEntry.queries("agg_pettitt_changepoint")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1)
    val want = daily.toSeq.sortBy(_._1).map { case (et, rs) =>
      val xs = rs.sortBy(_._2).map(r => (r._2, r._3))
      val n = xs.length
      // U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), brute force
      val cands = for (t <- 0 until n - 1) yield {
        val u = (for (i <- 0 to t; j <- t + 1 until n)
          yield xs(i)._2.compareTo(xs(j)._2).sign).sum.toLong
        (xs(t)._1, u)
      }
      val k = cands.map(c => math.abs(c._2)).max
      val cp = cands.filter(c => math.abs(c._2) == k).map(_._1).min
      (et, n.toLong, cp, k)
    }
    assert(got.toSeq == want)
  }

  test("novelty: pooled ratio matches a driver-side shingle replay") {
    val got = SparkEntry.queries("llm_ngram_firstseen")(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(4))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.TextShingles.mkShingles(col("text")).as("sh"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getSeq[String](3).toSet))
      .filter(_._4.nonEmpty)
    val firstDoc = docs.flatMap(d => d._4.map(s => (s, d._1)))
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
    val want = docs.groupBy(d => (d._2, d._3)).map { case (k, ds) =>
      val nSh = ds.map(_._4.size.toLong).sum
      val nSeen = ds.map(d => d._4.count(s => firstDoc(s) < d._1).toLong).sum
      k -> (ds.length.toLong, nSeen.toDouble / nSh.toDouble)
    }
    assert(got.keySet == want.keySet && got.nonEmpty)
    for ((k, (n, pooled)) <- want) {
      assert(got(k)._1 == n, s"$k n_docs mismatch")
      assert(math.abs(got(k)._2 - pooled) < 5e-7, s"$k pooled mismatch")
    }
  }
}
