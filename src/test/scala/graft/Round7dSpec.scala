package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form anchors for the round-7 fourth wave. */
class Round7dSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("theil-sen: n_pairs = C(n_days, 2) and slope inside the slope range") {
    val rows = SparkEntry.queries("agg_theil_sen")(spark, sf0001).collect()
    val days = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), dayofmonth(col("ts")).as("day")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = days(r.getString(0))
      assert(r.getLong(1) == n * (n - 1) / 2,
        s"${r.getString(0)}: n_pairs ${r.getLong(1)} != C($n,2)")
    }
  }

  test("autocorr: acf in [-1,1] and longer lags pair fewer days") {
    val rows = SparkEntry.queries("agg_autocorr_daily")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    for ((_, rs) <- byType) {
      val byLag = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(byLag(7L) < byLag(1L), "lag-7 must pair fewer days than lag-1")
    }
    for (r <- rows; if !r.isNullAt(3))
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
  }

  test("seasonal decompose: resid = daily - trend - seasonal; edges untrended") {
    val rows = SparkEntry.queries("win_seasonal_decompose")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      if (!r.isNullAt(3)) {
        val resid = r.getDouble(2) - r.getDouble(3) - r.getDouble(4)
        assert(math.abs(resid - r.getDouble(5)) < 2e-6,
          s"resid identity broken at ${r.getString(0)} day ${r.getLong(1)}")
      } else assert(r.isNullAt(5), "resid must be null where trend is null")
    }
    // a day with a full 7-day neighborhood must carry a trend
    val interior = rows.filter(r => r.getLong(1) >= 10 && r.getLong(1) <= 20)
    assert(interior.nonEmpty && interior.forall(!_.isNullAt(3)))
  }

  test("dsir: 25 distinct docs, non-increasing weights, target-enriched") {
    val rows = SparkEntry.queries("llm_dsir_weights")(spark, sf0001).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getLong(0)).distinct.length == 25)
    val ws = rows.map(_.getDouble(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // the point of DSIR: the top-25 must be enriched in the target slice
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val topEn = rows.count(r => docs(r.getLong(0)) == "en") / 25.0
    val corpusEn = docs.values.count(_ == "en").toDouble / docs.size
    assert(topEn > corpusEn,
      s"top-25 en share $topEn not above corpus share $corpusEn")
  }

  test("fdr-bh: 35 hypotheses, p in [0,1], rejections are a p-rank prefix") {
    val rows = SparkEntry.queries("agg_fdr_bh")(spark, sf0001).collect()
    assert(rows.length == 35)
    for (r <- rows) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    val rejectedRanks = rows.filter(_.getBoolean(6)).map(_.getLong(5)).sorted
    assert(rejectedRanks.zipWithIndex.forall { case (rk, i) => rk == i + 1 },
      s"rejected set ${rejectedRanks.mkString(",")} is not a rank prefix")
  }

  test("spatial grid: matches brute force exactly at sf0.001") {
    val got = SparkEntry.queries("join_spatial_grid")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def pt(axis: String, key: org.apache.spark.sql.Column) =
      graft.QueryUtils.hash60(concat(lit(axis), key.cast("string"))) % 100000
    val cust = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), pt("x", col("c_custkey")).as("cx"),
        pt("y", col("c_custkey")).as("cy")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000.0, r.getLong(2) / 1000.0))
    val supp = graft.sources.Tables.supplier(spark, sf0001)
      .select(col("s_suppkey"), pt("x", col("s_suppkey")).as("sx"),
        pt("y", col("s_suppkey")).as("sy")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000.0, r.getLong(2) / 1000.0))
    val brute = (for {
      (ck, cx, cy) <- cust
      best = supp.map { case (sk, sx, sy) =>
        (((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)), sk)
      }.filter(_._1 <= 4.0).sorted.headOption
      b <- best
    } yield (ck, b._2, math.sqrt(b._1))).sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq == brute.map(r => (r._1, r._2)).toSeq)
    for ((g, b) <- got.zip(brute))
      assert(math.abs(g._3 - b._3) < 1e-6, s"dist mismatch at cust ${g._1}")
  }
}
