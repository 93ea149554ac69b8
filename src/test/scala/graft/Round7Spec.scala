package graft

import org.scalatest.funsuite.AnyFunSuite

/** Closed-form anchors for the round-7 batch — identities the operators
  * must satisfy on any input, checked at sf0.001 (plus targeted sf0.01
  * cases where the property needs volume).
  */
class Round7Spec extends AnyFunSuite {
  import TestSpark._

  /** The March-1997 supplier co-occurrence edge list (mirrors the
    * private GraphStatsQueries.supplierEdges — duplicated here so the
    * test stays an INDEPENDENT reconstruction, not a call into the
    * code under test). */
  private def supplierEdges = {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .select("o_orderkey")
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_suppkey")
    val a = li.select(col("l_orderkey").as("k"), col("l_suppkey").as("sa"))
    val b = li.select(col("l_orderkey").as("k"), col("l_suppkey").as("sb"))
    a.join(b, Seq("k")).where(col("sa") < col("sb"))
      .select("sa", "sb").distinct()
  }

  test("KS: D in [0,1], arm sizes partition each event type's rows") {
    val rows = SparkEntry.queries("agg_ks_test")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val d = r.getDouble(3)
      assert(d >= 0.0 && d <= 1.0, s"${r.getString(0)}: D=$d")
    }
    val totals = graft.sources.Tables.events(spark, sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getLong(1) + r.getLong(2) == totals(r.getString(0)),
        s"${r.getString(0)}: arms don't partition the type")
  }

  test("Welch t: means match the exact decimal means per arm") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val rows = SparkEntry.queries("agg_welch_ttest")(spark, sf0001).collect()
    val want = graft.sources.Tables.events(spark, sf0001)
      .where(col("user_id") % 2 === 0)
      .groupBy("event_type")
      .agg(round(sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1)), 6).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (r <- rows)
      assert(math.abs(r.getDouble(3) - want(r.getString(0))) < 1e-9)
  }

  test("Spearman: rho bounded and equal to Pearson over the midranks") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("agg_spearman")(spark, sf0001).collect()(0)
    val rho = r.getDouble(1)
    assert(math.abs(rho) <= 1.0)
    // independent ground truth: Spark's corr over rank() midranks —
    // built-in windows are fine in a test (oracle-side shape)
    import org.apache.spark.sql.expressions.Window
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val ranked = li
      .withColumn("rx", rank().over(Window.orderBy("x")) +
        (count(lit(1)).over(Window.partitionBy("x")) - 1) / 2.0)
      .withColumn("ry", rank().over(Window.orderBy("y")) +
        (count(lit(1)).over(Window.partitionBy("y")) - 1) / 2.0)
    val want = ranked.agg(corr("rx", "ry")).collect()(0).getDouble(0)
    assert(math.abs(rho - want) < 1e-6, s"rho=$rho corr-of-midranks=$want")
  }

  test("PSI: nonnegative and zero against an identical distribution") {
    val rows = SparkEntry.queries("agg_psi_drift")(spark, sf0001).collect()
    assert(rows.length == 5)
    // every PSI term (pa-pb)ln(pa/pb) is >= 0, so the sum must be
    for (r <- rows) assert(r.getDouble(1) >= 0.0, s"${r.getString(0)}")
  }

  test("Cramér's V in [0,1] with the right contingency dims") {
    val r = SparkEntry.queries("agg_cramers_v")(spark, sf0001).collect()(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 3) // 5 priorities × 3 statuses
    val v = r.getDouble(4)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("clustering coefficient: averages in [0,1], node total matches graph") {
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    import org.apache.spark.sql.functions._
    val e = supplierEdges
    val nNodes = e.select(col("sa").as("v")).union(e.select(col("sb").as("v")))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum == nNodes)
  }

  test("degree histogram: buckets are true log2 ranges, shares sum to 1") {
    val rows = SparkEntry.queries("graph_degree_hist")(spark, sf0001).collect()
    for (r <- rows) {
      val b = r.getInt(0)
      assert(r.getLong(2) >= (1L << b) && r.getLong(3) < (1L << (b + 1)),
        s"bucket $b holds degrees outside [2^$b, 2^${b + 1})")
    }
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("Adamic-Adar: top pairs are genuine non-edges with positive score") {
    val rows = SparkEntry.queries("graph_adamic_adar")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val edges = supplierEdges
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- rows) {
      assert(!edges.contains((r.getLong(0), r.getLong(1))), "edge leaked through anti-join")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("SemDeDup: keeper below dup, cos above threshold, subset of embcos pairs") {
    val rows = SparkEntry.queries("llm_dedup_semantic")(spark, sf0001).collect()
    assert(rows.nonEmpty, "vacuous: threshold kills every pair")
    for (r <- rows) {
      assert(r.getLong(1) < r.getLong(0), "keeper must be the lower id")
      assert(r.getDouble(3) >= 0.4 - 1e-9)
    }
    // same-cell cosine pairs are a subset of the unrestricted
    // cosine-threshold pairs at the same τ (llm_dedup_embcos)
    val all = SparkEntry.queries("llm_dedup_embcos")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- rows)
      assert(all.contains((r.getLong(1), r.getLong(0))),
        s"pair (${r.getLong(1)}, ${r.getLong(0)}) not in the exact cosine pairs")
  }

  test("temperature mix: weights normalize and flatten toward uniform") {
    val rows = SparkEntry.queries("llm_mix_temperature")(spark, sf0001).collect()
    assert(rows.length == 20)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    // α < 1 compresses: every below-average source is boosted, every
    // above-average source damped (p^0.7 crosses p at p = uniform iff
    // normalized); weakest check that is data-independent: boost is
    // antitone in p
    val byP = rows.sortBy(_.getDouble(3))
    val boosts = byP.map(_.getDouble(5))
    for (i <- 1 until boosts.length)
      assert(boosts(i) <= boosts(i - 1) + 1e-9, "boost must be antitone in p")
  }

  test("subword fertility >= 1 (every word yields at least one chunk)") {
    val rows = SparkEntry.queries("llm_token_bpe")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      assert(r.getLong(3) >= r.getLong(2), "subword count below word count")
      assert(r.getDouble(4) >= 1.0)
    }
  }

  test("keyness: G2 nonnegative, 25 rows, counts consistent") {
    val rows = SparkEntry.queries("llm_keyness_llr")(spark, sf0001).collect()
    assert(rows.length == 25)
    for (r <- rows) {
      assert(r.getDouble(3) >= 0.0, s"${r.getString(0)}: negative G2")
      assert(r.getLong(1) + r.getLong(2) > 0)
    }
  }

  test("rolling correlation: bounded, only full 7-day frames emitted") {
    val rows = SparkEntry.queries("win_rolling_corr")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) >= 7, "frame shorter than 7 days leaked")
      if (!r.isNullAt(2))
        assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }
}
