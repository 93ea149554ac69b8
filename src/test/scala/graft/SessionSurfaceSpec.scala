package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the session/attribution batch — invariants
  * that must hold on any corpus, sf0.001.
  */
class SessionSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("stream_session_native: events conserved; sessions align with gap-islands") {
    val rows = SparkEntry.queries("stream_session_native")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total)
    // same session count as the hand-built stream_session unless an
    // exact-boundary event exists (then native splits one more)
    val handBuilt = SparkEntry.queries("stream_session")(spark, sf0001).count()
    assert(rows.length.toLong >= handBuilt)
  }

  test("join_attribution_first_touch: touch precedes purchase within 7 days") {
    val rows = SparkEntry.queries("join_attribution_first_touch")(spark, sf0001)
    val n = rows.count()
    assert(n > 0)
    val bad = rows
      .join(graft.sources.Tables.events(spark, sf0001)
        .select(col("event_id").as("buy_id"), col("ts").as("bts")), "buy_id")
      .join(graft.sources.Tables.events(spark, sf0001)
        .select(col("event_id").as("first_touch_id"), col("ts").as("tts")),
        "first_touch_id")
      .where(col("tts") > col("bts")
        || col("tts") < col("bts") - expr("INTERVAL 7 DAY"))
      .count()
    assert(bad == 0)
    assert(rows.collect().forall(r =>
      Set("click", "view")(r.getString(3))))
  }

  test("llm_char_trigrams: ranks 1..20 per lang, grams are 3 chars") {
    val rows = SparkEntry.queries("llm_char_trigrams")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).length == 3))
    for (g <- rows.groupBy(_.getString(0)).values) {
      val rks = g.map(_.getLong(3)).sorted.toSeq
      assert(rks == (1L to rks.length))
      assert(rks.length <= 20)
      val cnts = g.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    }
  }

  test("fn_try_cast: failures are NULL, roundtrips are not") {
    val rows = SparkEntry.queries("fn_try_cast")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.isNullAt(1), "event_type is never numeric")
      assert(r.isNullAt(3), "trailing junk must fail")
      assert(r.isNullAt(4), "month 13 must fail")
      assert(!r.isNullAt(5), "numeric string roundtrip must succeed")
    }
  }

  test("source_csv_pipe: nulls and values survive the pipe round trip") {
    val rt = SparkEntry.queries("source_csv_pipe")(spark, sf0001)
    val src = graft.sources.Tables.part(spark, sf0001)
    assert(rt.count() == src.count())
    val nNull = src.where(col("p_brand") === "Brand#11").count()
    assert(rt.where(col("brand_or_null").isNull).count() == nNull)
    assert(rt.exceptAll(src.select(col("p_partkey"), col("p_name"),
      col("p_type"), nullif(col("p_brand"), lit("Brand#11")),
      col("p_retailprice"))).count() == 0)
  }
}
