package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived anchors for the round-6 second-wave batch — bounds and
  * closed-form identities that must hold regardless of fixture data.
  */
class Round6bSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_cross_entropy: CE >= KL >= 0 per lang (Gibbs inequality)") {
    val rows = SparkEntry.queries("llm_cross_entropy")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val ce = r.getDouble(4); val kl = r.getDouble(5)
      // CE(A,B) = H(A) + KL(A||B) and H(A) >= 0, so CE >= KL; Gibbs
      // gives KL >= 0 (8dp term rounding can dip epsilon below)
      assert(kl >= -1e-4, s"${r.getString(0)}: kl=$kl")
      assert(ce >= kl - 1e-4, s"${r.getString(0)}: ce=$ce kl=$kl")
    }
  }

  test("llm_vocab_coverage: monotone non-decreasing coverage, bounded by 1") {
    val rows = SparkEntry.queries("llm_vocab_coverage")(spark, sf0001)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L, 1000L, 10000L))
    val cov = rows.map(_.getDouble(4))
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    assert(cov.sliding(2).forall(p => p(0) <= p(1)), "coverage must grow with k")
    // every row carries the same totals, and covered <= total
    for (r <- rows) assert(r.getLong(3) <= r.getLong(2))
  }

  test("llm_token_fertility: per-lang identities (chars/tok >= 1, exact ratio)") {
    val rows = SparkEntry.queries("llm_token_fertility")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val nDocs = r.getLong(1); val nTok = r.getLong(2); val nCh = r.getLong(3)
      assert(nDocs > 0 && nTok > 0 && nCh >= nTok) // every token >= 1 char
      assert(r.getDouble(4) == nTok.toDouble / nDocs)
      assert(r.getDouble(5) == nCh.toDouble / nTok)
      assert(r.getDouble(5) >= 1.0)
    }
  }

  test("agg_diff_in_diff: cell counts partition each event type; DiD identity") {
    val ev = sources.Tables.events(spark, sf0001)
    val total = ev.count()
    val rows = SparkEntry.queries("agg_diff_in_diff")(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum == total)
    for (r <- rows) {
      val did = (r.getDouble(6) - r.getDouble(5)) - (r.getDouble(8) - r.getDouble(7))
      assert(r.getDouble(9) == did)
    }
  }

  test("agg_cuped_adjust: shared theta; adjustment recentres around the pooled mean") {
    val rows = SparkEntry.queries("agg_cuped_adjust")(spark, sf0001).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L))
    val theta = rows.map(_.getDouble(4)).distinct
    assert(theta.length == 1, "theta is pooled, must be identical across arms")
    assert(!theta.head.isNaN && !theta.head.isInfinite)
    // CUPED preserves the overall mean: Σ n·(pre − pooled-pre-mean) = 0,
    // so Σ n·adj == Σ n·post up to float noise
    val nAdj = rows.map(r => r.getLong(1) * r.getDouble(5)).sum
    val nPost = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(nAdj - nPost) <= 1e-6 * math.max(1.0, math.abs(nPost)))
  }

  test("graph_common_neighbors: top pairs are non-adjacent with valid Jaccard") {
    val rows = SparkEntry.queries("graph_common_neighbors")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // independent edge reconstruction (same March-1997 co-occurrence rule)
    val edges = {
      import org.apache.spark.sql.functions._
      val o = sources.Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= lit("1997-03-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
        .select("o_orderkey")
      val li = sources.Tables.lineitem(spark, sf0001)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("k"), col("l_suppkey").as("s"))
      li.toDF("k", "sa").join(li.toDF("k2", "sb"),
          col("k") === col("k2") && col("sa") < col("sb"))
        .select("sa", "sb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (r <- rows) {
      val a = r.getLong(0); val b = r.getLong(1)
      val cn = r.getLong(2); val da = r.getLong(3); val db = r.getLong(4)
      assert(a < b)
      assert(!edges.contains((a, b)), s"($a,$b) must be non-adjacent")
      assert(cn >= 1 && cn <= math.min(da, db))
      val j = r.getDouble(5)
      assert(j == cn.toDouble / (da + db - cn) && j > 0.0 && j <= 1.0)
    }
    // descending by score under the declared total order
    val scores = rows.map(_.getDouble(5)).toSeq
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("topk_diverse_sources: at most 2 docs per source, sizes descending") {
    val rows = SparkEntry.queries("topk_diverse_sources")(spark, sf0001).collect()
    assert(rows.length == 10)
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 2), "diversity cap violated")
    // the query's declared order is (n_chars desc, doc_id): re-sort must be a no-op
    val pairs = rows.map(r => (-r.getLong(2), r.getLong(0))).toSeq
    assert(pairs == pairs.sorted)
    // every in-cap rank is 1 or 2
    assert(rows.forall(r => r.getLong(3) == 1L || r.getLong(3) == 2L))
  }
}
