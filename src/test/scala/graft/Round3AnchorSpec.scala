package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic anchors for the round-3 TPC-H and pipeline-depth batches —
  * invariants that must hold on any corpus, sf0.001.
  */
class Round3AnchorSpec extends AnyFunSuite {
  import TestSpark._

  test("chunking covers every token exactly once per 40-token stride") {
    val chunks = SparkEntry.queries("llm_chunk_stride")(spark, sf0001).collect()
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"), graft.QueryUtils.nTok.as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc chunks")
    for ((d, cs) <- byDoc) {
      val n = docs(d)
      val expected = ((n - 1) / 40 + 1).toInt // ceil(n/40) starts
      assert(cs.length == expected, s"doc $d: ${cs.length} chunks, want $expected")
      // chunk i starts at 40i+1 and holds min(50, n-40i) tokens
      for (c <- cs) {
        val idx = c.getInt(1); val nt = c.getLong(2)
        assert(nt == math.min(50L, n - 40L * idx), s"doc $d chunk $idx size $nt")
        assert(c.getString(3).split(" ").count(_.nonEmpty) == nt)
      }
    }
  }

  test("rank fusion: both-list docs sum both reciprocal terms") {
    val rows = SparkEntry.queries("llm_rank_fusion")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows; if !r.isNullAt(1) && !r.isNullAt(2)) {
      val expect = 1.0 / (60 + r.getLong(1)) + 1.0 / (60 + r.getLong(2))
      assert(math.abs(r.getDouble(3) - expect) < 1e-6)
    }
    // descending fused score (ties broken by doc_id upstream)
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("winsorized stats: p5 <= p95 and clipped mean inside the clip band") {
    for (r <- SparkEntry.queries("llm_quality_winsorize")(spark, sf0001).collect()) {
      val (p5, p95, m) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(p5 <= p95)
      assert(m >= p5 - 1e-9 && m <= p95 + 1e-9, s"${r.getString(0)}: $m outside [$p5,$p95]")
    }
  }

  test("mixture resample: kept fraction <= 1 and smallest language kept whole") {
    val rows = SparkEntry.queries("llm_mix_resample")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(3) <= 1.0 + 1e-9))
    // the binding language has threshold 2^60 → every doc kept
    val perLang = graft.sources.Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLangKeptAll = rows.exists(r => r.getLong(1) == perLang(r.getString(0)))
    assert(minLangKeptAll, "no language kept in full — threshold arithmetic broken")
  }

  test("contamination rate is a valid fraction of the benchmark slice") {
    val r = SparkEntry.queries("llm_contamination_rate")(spark, sf0001).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("Pareto deciles: shares monotone to 1.0, head-counts total customers") {
    val rows = SparkEntry.queries("win_pareto_decile")(spark, sf0001).collect()
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    val nCust = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("tpch_q1 averages are exactly sum/count per group") {
    for (r <- SparkEntry.queries("tpch_q1")(spark, sf0001).collect()) {
      val cnt = r.getLong(9).toDouble
      assert(math.abs(r.getDouble(6) - r.getDouble(2) / cnt) < 1e-9) // avg_qty
      assert(math.abs(r.getDouble(7) - r.getDouble(3) / cnt) < 1e-6) // avg_price
    }
  }

  test("tpch_q13 distribution accounts for every customer") {
    val rows = SparkEntry.queries("tpch_q13")(spark, sf0001).collect()
    val nCust = graft.sources.Tables.customer(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("schema-evolution read: value present on exactly the v2 half") {
    val r = SparkEntry.queries("source_parquet_evolve")(spark, sf0001).collect()(0)
    val ev = graft.sources.Tables.events(spark, sf0001)
    assert(r.getLong(0) == ev.count())
    assert(r.getLong(1) == ev.where(
      org.apache.spark.sql.functions.col("event_id") % 2 === 1).count())
  }
}
