package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the pipeline-tuning batch — invariants that
  * must hold on any corpus, sf0.001.
  */
class TuningSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_lsh_tuning: S-curve monotone in rows-per-band at high j") {
    val rows = SparkEntry.queries("llm_lsh_tuning")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("32x2", "16x4", "8x8", "4x16"))
    val byCfg = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    // all verified pairs have j >= 0.6; detection probability must be
    // within [0,1] and weakly DEcreasing as rows-per-band grows
    // (narrower bands catch high-j pairs more easily)
    assert(rows.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) <= 1))
    assert(byCfg("32x2") >= byCfg("16x4") && byCfg("16x4") >= byCfg("8x8") &&
      byCfg("8x8") >= byCfg("4x16"))
    // every config sees the same pair count
    assert(rows.map(_.getLong(1)).distinct.length == 1)
  }

  test("llm_oov_rate: top-1000 vocab bounds the rate") {
    val rows = SparkEntry.queries("llm_oov_rate")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // the synthetic corpus vocabulary is far under 1000 tokens, so
    // everything is in-vocab here — rates must be exactly 0
    val nVocab = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").select("t").distinct().count()
    if (nVocab <= 1000) {
      assert(rows.forall(_.getDouble(2) == 0.0))
      assert(rows.forall(_.getLong(3) == 0L))
    }
  }

  test("join_asof_tolerance: subset of join_asof, never staler than 30d") {
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf0001)
    val plain = SparkEntry.queries("join_asof")(spark, sf0001)
    val t = tol.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val p = plain.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // where both match an event, the match is the same order (the
    // tolerance only removes too-stale matches, never changes the best)
    for ((e, ok) <- t) assert(p(e) == ok)
    assert(t.size <= p.size)
    // staleness bound holds on the output
    val bad = SparkEntry.queries("join_asof_tolerance")(spark, sf0001)
      .join(graft.sources.Tables.events(spark, sf0001)
        .select(col("event_id"), col("ts")), "event_id")
      .where(col("asof_orderdate") < col("ts") - expr("INTERVAL 30 DAY"))
      .count()
    assert(bad == 0L)
  }

  test("llm_seq_len_tradeoff: waste identities hold per (lang, len)") {
    val rows = SparkEntry.queries("llm_seq_len_tradeoff")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (maxLen, nDocs, nOver, trunc, pad) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nOver <= nDocs)
      assert(pad >= 0 && pad < maxLen, s"tail pad $pad out of [0, $maxLen)")
      if (nOver == 0) assert(trunc == 0L)
      if (trunc > 0) assert(nOver > 0)
    }
    // larger budget never truncates more
    for (g <- rows.groupBy(_.getString(0)).values) {
      val byLen = g.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(byLen.zip(byLen.tail).forall { case (a, b) => b <= a })
    }
  }
}
