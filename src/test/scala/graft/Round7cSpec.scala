package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form anchors for the round-7 third wave. */
class Round7cSpec extends AnyFunSuite {
  import TestSpark._

  test("NDCG@10: bounded by recall ceiling and positive where recall is") {
    val nd = SparkEntry.queries("llm_ann_ndcg")(spark, sf0001).collect()(0)
    val ndcg = nd.getDouble(1)
    assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
    // binary NDCG can exceed recall per query only through rank
    // placement; on the SAME probe lists, mean NDCG of a query set is
    // 0 iff recall is 0 — cross-check against llm_ann_recall10
    val rec = SparkEntry.queries("llm_ann_recall10")(spark, sf0001).collect()(0)
    val recall = rec.getDouble(2)
    assert((ndcg > 0.0) == (recall > 0.0),
      s"ndcg=$ndcg but recall@10=$recall")
  }

  test("jackknife: SE nonnegative and mean matches the exact decimal mean") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val r = SparkEntry.queries("agg_jackknife_nation")(spark, sf0001).collect()(0)
    assert(r.getDouble(2) >= 0.0)
    val want = graft.sources.Tables.orders(spark, sf0001)
      .join(graft.sources.Tables.customer(spark, sf0001)
        .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .agg(round(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DoubleType) / count(lit(1)), 6))
      .collect()(0).getDouble(0)
    assert(math.abs(r.getDouble(1) - want) < 1e-9)
  }

  test("power means: AM >= GM >= HM for every return flag") {
    val rows = SparkEntry.queries("agg_power_means")(spark, sf0001).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val (am, gm, hm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(am >= gm - 1e-6 && gm >= hm - 1e-6,
        s"${r.getString(0)}: AM=$am GM=$gm HM=$hm violates the means ladder")
    }
  }

  test("recursive reach: depth-0 seeds, monotone frontier, never exceeds graph") {
    val rows = SparkEntry.queries("sub_recursive_reach")(spark, sf0001).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 2L,
      "depth 0 must hold exactly the two seeds")
    assert(rows.forall(_.getLong(1) > 0))
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq,
      "min-depth levels must be contiguous from 0")
  }

  test("rank delta: rank values positive, delta arithmetic consistent") {
    val rows = SparkEntry.queries("win_rank_delta")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      assert(r.getLong(2) >= 1 && r.getLong(3) >= 1)
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), "delta != prev - cur")
    }
    // cut is ordered by |delta| descending
    val ds = rows.map(r => math.abs(r.getLong(4)))
    for (i <- 1 until ds.length) assert(ds(i) <= ds(i - 1))
  }
}
