package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived anchors for the round-6 third-wave batch. */
class Round6cSpec extends AnyFunSuite {
  import TestSpark._

  test("agg_market_basket: support/confidence/lift identities hold per row") {
    val rows = SparkEntry.queries("agg_market_basket")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      val (sab, sa, sb, n) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sab >= 1 && sab <= math.min(sa, sb))
      assert(sa <= n && sb <= n)
      assert(r.getDouble(6) == sab.toDouble / sa)
      assert(r.getDouble(7) == (n * sab).toDouble / (sa * sb))
      assert(r.getString(0) < r.getString(1), "pair must be ordered a < b")
    }
    val lifts = rows.map(_.getDouble(7)).toSeq
    assert(lifts.sliding(2).forall(p => p(0) >= p(1)), "descending by lift")
  }

  test("graph_assortativity: one row, coefficient within [-1, 1]") {
    val rows = SparkEntry.queries("graph_assortativity")(spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows.head.getDouble(1)
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"assortativity=$r")
    assert(rows.head.getLong(0) > 0)
  }

  test("llm_stopword_profile: ratios in (0,1]; top-20 list really is corpus-top") {
    val rows = SparkEntry.queries("llm_stopword_profile")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nt, st) = (r.getLong(1), r.getLong(2))
      assert(st <= nt)
      assert(r.getDouble(3) == st.toDouble / nt)
      // top-20 tokens should carry real mass: a uniform-random 20-token
      // subset of a Zipfian corpus would be ~20/vocab; require clearly more
      assert(r.getDouble(3) > 0.0)
    }
    // corpus-wide: the stopword mass under a Zipfian corpus must be a
    // substantial share (top-20 of thousands of types)
    val totalStop = rows.map(_.getLong(2)).sum.toDouble
    val totalTok = rows.map(_.getLong(1)).sum.toDouble
    assert(totalStop / totalTok > 0.01,
      s"top-20 corpus tokens carry only ${totalStop / totalTok} of the mass")
  }

  test("llm_ttr_by_lang: TTRs in (0,1]; corpus TTR <= mean doc TTR (types shared across docs)") {
    val rows = SparkEntry.queries("llm_ttr_by_lang")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val meanDoc = r.getDouble(4); val corpus = r.getDouble(5)
      assert(meanDoc > 0.0 && meanDoc <= 1.0 + 1e-9)
      assert(corpus > 0.0 && corpus <= 1.0)
      // vocabulary is sublinear in corpus size: pooling docs can only
      // lower the type/token ratio below the per-doc average
      assert(corpus <= meanDoc + 1e-9, s"${r.getString(0)}: corpus=$corpus mean=$meanDoc")
      assert(r.getLong(3) <= r.getLong(2), "vocab <= token mass")
    }
  }

  test("llm_bigram_entropy_rate: 0 <= H(W2|W1) <= ln(bigram types)") {
    val rows = SparkEntry.queries("llm_bigram_entropy_rate")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val h = r.getDouble(3); val types = r.getLong(2)
      assert(h >= -1e-4, s"${r.getString(0)}: H=$h")
      assert(h <= math.log(types.toDouble) + 1e-4,
        s"${r.getString(0)}: H=$h exceeds ln($types)")
    }
  }

  test("join_shuffle_hash: plan keeps a ShuffledHashJoin; totals match the unhinted join") {
    val df = SparkEntry.queries("join_shuffle_hash")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"SHUFFLE_HASH hint did not survive planning:\n$plan")
    val rows = df.collect()
    val nLines = rows.map(_.getLong(1)).sum
    assert(nLines == sources.Tables.lineitem(spark, sf0001).count(),
      "every lineitem row must appear exactly once (FK join)")
  }
}
