package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic anchors for the FinalDepthQueries batch — invariants that
  * must hold on any corpus, sf0.001 (the oracle hash-compare at
  * sf0.01/sf0.1 is the driver's job; these pin the *meaning*).
  */
class FinalDepthSpec extends AnyFunSuite {
  import TestSpark._

  test("tpch_q15: returned suppliers are exactly the revenue argmax set") {
    val rows = SparkEntry.queries("tpch_q15")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all returned rows tie at the max revenue")
  }

  test("sub_not_in: a NULL in the list poisons the whole NOT IN") {
    import spark.implicits._
    Seq(1, 2, 3).toDF("k").createOrReplaceTempView("probe_left")
    Seq(Some(2), None).toDF("v").createOrReplaceTempView("probe_null_list")
    val out = spark.sql(
      "SELECT k FROM probe_left WHERE k NOT IN (SELECT v FROM probe_null_list)")
    assert(out.count() == 0, "NULL-bearing NOT IN list yields no rows")
    // and the declared query (null-free list) equals the plain anti join
    val naaj = SparkEntry.queries("sub_not_in")(spark, sf0001).count()
    val anti = graft.sources.Tables.customer(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_totalprice") > 400000.0).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(naaj == anti)
  }

  test("gen_explode_outer: every doc survives; empty arrays become NULL") {
    val out = SparkEntry.queries("gen_explode_outer")(spark, sf0001)
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(out.select("doc_id").distinct().count() == nDocs)
    val nullDocs = out.where(col("long_tok").isNull).count()
    assert(nullDocs > 0, "corpus has docs with no >=8-char token")
    // null rows are exactly the docs contributing no token row
    val tokDocs = out.where(col("long_tok").isNotNull)
      .select("doc_id").distinct().count()
    assert(tokDocs + nullDocs == nDocs)
  }

  test("win_weighted_ma: hand-recompute one user's series") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "event_id", "value").collect()
    val u = ev.head.getLong(0)
    val series = ev.filter(_.getLong(0) == u)
    val got = SparkEntry.queries("win_weighted_ma")(spark, sf0001)
      .where(col("user_id") === u).orderBy("event_id").collect()
    assert(got.length == math.max(0, series.length - 4))
    for ((r, i) <- got.zipWithIndex) {
      val w5 = series.slice(i, i + 5).map(_.getDouble(2))
      val expect = (5 * w5(4) + 4 * w5(3) + 3 * w5(2) + 2 * w5(1) + w5(0)) / 15.0
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"row $i")
    }
  }

  test("win_decayed_sum: first event per user decays to itself") {
    val out = SparkEntry.queries("win_decayed_sum")(spark, sf0001)
    val firsts = graft.sources.Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .where(col("rn") === 1).select("event_id").collect()
      .map(_.getLong(0)).toSet
    val hit = out.where(col("event_id").isin(firsts.toSeq: _*)).collect()
    assert(hit.nonEmpty)
    hit.foreach(r => assert(r.getDouble(2) == r.getDouble(3),
      "no prior events -> decayed == value exactly"))
  }

  test("llm_unigram_logprob: log-probs are negative, token counts agree") {
    val out = SparkEntry.queries("llm_unigram_logprob")(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) < 0.0, "ln p < 0 for p < 1"))
    val nTokTotal = out.map(_.getLong(1)).sum
    val expect = graft.sources.Tables.documents(spark, sf0001)
      .select(QueryUtils.nTok.as("n")).agg(sum("n")).collect()(0).getLong(0)
    assert(nTokTotal == expect)
  }

  test("llm_mi_lang_source: MI is non-negative (up to term rounding)") {
    val r = SparkEntry.queries("llm_mi_lang_source")(spark, sf0001).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= -1e-6)
  }

  test("llm_dedup_editdist: pairs ordered, verified within threshold") {
    val rows = SparkEntry.queries("llm_dedup_editdist")(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= 8L && r.getLong(2) >= 0L)
    }
    // exact duplicates (the corpus has them) must appear with dist 0
    val dups = graft.sources.Tables.documents(spark, sf0001)
      .groupBy(lower(col("text"))).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).count()
    if (dups > 0) assert(rows.exists(_.getLong(2) == 0L))
  }

  test("stream_late_drop: drops exist and watermark monotonicity holds") {
    val out = SparkEntry.queries("stream_late_drop")(spark, sf0001).collect()
    val kept = out.map(_.getLong(2)).sum
    val late = out.map(_.getLong(3)).sum
    assert(kept > 0 && late > 0, "jittered replay must both keep and drop")
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(kept + late == total, "every event is either kept or late")
  }

  test("llm_ann_recall10: recall bounded, hits consistent") {
    val r = SparkEntry.queries("llm_ann_recall10")(spark, sf0001).collect()(0)
    val (nVecs, nHits, rec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nVecs > 0 && nHits >= 0 && nHits <= 10L * nVecs)
    assert(rec >= 0.0 && rec <= 1.0)
    // 3-probe must beat or match the own-cell recall@1 regime's floor
    assert(nHits > 0, "probing 3 cells finds at least one true neighbor")
  }

  test("fn_string_advanced: spot-check the string kernel on one part") {
    val r = SparkEntry.queries("fn_string_advanced")(spark, sf0001)
      .orderBy("p_partkey").limit(1).collect()(0)
    val name = graft.sources.Tables.part(spark, sf0001)
      .orderBy("p_partkey").limit(1).collect()(0).getString(1)
    assert(r.getString(1) == name.map(c => if ("aeiou".contains(c)) c.toUpper else c))
    assert(r.getString(2) == name.take(2) * 2)
    assert(r.getString(5) == name.reverse)
  }
}
