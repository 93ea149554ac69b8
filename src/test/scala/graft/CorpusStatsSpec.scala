package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusStatsQueries
import graft.sources.Tables

/** Property checks for the corpus-statistics operators — assertions
  * independent of the DuckDB oracle.
  */
class CorpusStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_pii_redact removes every planted PII token and only those") {
    val got = CorpusStatsQueries.queries("llm_pii_redact")(spark, sf0001)
    // redacted text never contains a live email or phone
    assert(got.where(col("redacted").rlike("@example\\.com")).count() == 0)
    assert(got.where(col("redacted").rlike("\\b\\d{3}-\\d{4}\\b")).count() == 0)
    // planted payloads are counted exactly
    assert(got.where(col("doc_id") % 7 === 0 && col("n_email") =!= 1).count() == 0)
    assert(got.where(col("doc_id") % 7 =!= 0 && col("n_email") =!= 0).count() == 0)
    assert(got.where(col("doc_id") % 11 === 0 && col("n_phone") =!= 1).count() == 0)
    assert(got.where(col("doc_id") % 11 =!= 0 && col("n_phone") =!= 0).count() == 0)
    // clean docs pass through byte-identical
    val orig = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val clean = got.join(orig, "doc_id")
      .where(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0)
    assert(clean.where(col("redacted") =!= col("text")).count() == 0)
  }

  test("llm_mix_weights shares sum to 1 and weights are monotone in share") {
    val got = CorpusStatsQueries.queries("llm_mix_weights")(spark, sf0001).cache()
    val sums = got.agg(sum("doc_share"), sum("token_share"), sum("n_docs")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-3)
    assert(sums.getLong(2) == Tables.documents(spark, sf0001).count())
    // temperature scaling preserves the share ordering
    val rows = got.orderBy(col("doc_share")).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("weight_t07") <= b.getAs[Double]("weight_t07") + 1e-9)
    }
    got.unpersist()
  }

  test("llm_length_buckets bucket bounds are consistent powers of two") {
    val got = CorpusStatsQueries.queries("llm_length_buckets")(spark, sf0001)
    // every (min_tok, max_tok) sits inside [2^bucket, 2^(bucket+1))
    assert(got.where(col("min_tok") < pow(lit(2.0), col("bucket")).cast("long"))
      .count() == 0)
    assert(got.where(col("max_tok") >= pow(lit(2.0), col("bucket") + 1).cast("long"))
      .count() == 0)
    // doc counts add back up to the corpus
    assert(got.agg(sum("n_docs")).head().getLong(0) ==
      Tables.documents(spark, sf0001).count())
  }

  test("llm_domain_stats ranks at most 3 sources per lang by true counts") {
    val got = CorpusStatsQueries.queries("llm_domain_stats")(spark, sf0001).cache()
    assert(got.groupBy("lang").count().where(col("count") > 3).count() == 0)
    // rk=1 really is the per-lang max count
    val truth = Tables.documents(spark, sf0001)
      .groupBy("lang", "source").count()
      .groupBy("lang").agg(max("count").as("max_n"))
    val top = got.where(col("rk") === 1).join(truth, "lang")
    assert(top.where(col("n_docs") =!= col("max_n")).count() == 0)
    got.unpersist()
  }

  test("win_fill_forward fills every gap with the previous value per user") {
    val got = CorpusStatsQueries.queries("win_fill_forward")(spark, sf0001).cache()
    // non-gap rows: filled == sparse
    assert(got.where(col("v_sparse").isNotNull &&
      col("v_filled") =!= col("v_sparse")).count() == 0)
    // gap rows are filled unless they open the partition
    val rows = got.join(Tables.events(spark, sf0001).select("event_id", "ts"), "event_id")
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "v_sparse", "v_filled").collect()
    var prevUser = Long.MinValue
    var lastSeen: Option[Double] = None
    rows.foreach { r =>
      val u = r.getLong(0)
      if (u != prevUser) { prevUser = u; lastSeen = None }
      val sparse = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val filled = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val expect = sparse.orElse(lastSeen)
      assert(filled == expect, s"user $u: got $filled want $expect")
      lastSeen = expect
    }
    got.unpersist()
  }
}
