package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived anchors for the round-6 fourth-wave batch, plus the
  * GlobalRank branch-divergence regression this batch uncovered.
  */
class Round6dSpec extends AnyFunSuite {
  import TestSpark._

  test("GlobalRank: ranks are exactly 1..n per group on a sample-sized input " +
    "(two-branch boundary-divergence regression)") {
    // 10k rows exceed RangePartitioner's per-split reservoir sample, and
    // the extra pruned column (treat) prevented exchange reuse between
    // the offsets and stream branches — before the eager checkpoint fix
    // the branches sampled DIFFERENT range boundaries and ranks came out
    // negative / duplicated (observed round 6). sf0.001's 1k rows fit in
    // the sample and can never trip this, hence sf0.01 here.
    val ev = sources.Tables.events(spark, sf001).select(col("event_type"),
      col("event_id"), (col("user_id") % 2 === 0).as("treat"),
      col("value").cast("decimal(18,6)").as("v"))
    val ranked = operators.GlobalRank.withSeqAndCount(ev, "rn", "n_all",
      Seq("event_type"), Seq(col("v").asc, col("event_id").asc))
    val g = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("rn").as("nd"),
        min("rn").as("lo"), max("rn").as("hi"))
      .collect()
    assert(g.nonEmpty)
    for (r <- g) {
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)}: duplicate ranks")
      assert(r.getLong(3) == 1L, s"${r.getString(0)}: min rank ${r.getLong(3)}")
      assert(r.getLong(4) == r.getLong(1), s"${r.getString(0)}: max rank != n")
    }
  }

  test("GlobalRank.withRunningMaxBefore: matches the single-partition reference " +
    "on a sample-sized input (same divergence class as withSeqAndCount)") {
    val ev = sources.Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("value"))
    val got = operators.GlobalRank.withRunningMaxBefore(ev, col("value"),
        "pmax", Seq(col("ts"), col("event_id")))
      .select(col("event_id"), col("pmax")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // reference: sort locally, exclusive running max (ts is NTZ →
    // LocalDateTime; key on epoch-day·ns_per_day + nano-of-day)
    val ref = ev.collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getDouble(2)))
      .sortBy(t => (t._2.toLocalDate.toEpochDay * 86400000000000L +
        t._2.toLocalTime.toNanoOfDay, t._1))
    var best: Option[Double] = None
    for ((id, _, v) <- ref) {
      assert(got(id) == best, s"event $id: got ${got(id)} want $best")
      best = Some(best.fold(v)(math.max(_, v)))
    }
  }

  test("llm_hard_negatives: negatives share the cell, differ in label, ranked by cosine") {
    val rows = SparkEntry.queries("llm_hard_negatives")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byAnchor = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byAnchor) {
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(6)).sorted.toSeq == (1L to rs.length).toSeq)
      // within an anchor, cosine is non-increasing with rank
      val byRank = rs.sortBy(_.getLong(6)).map(_.getDouble(5)).toSeq
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    for (r <- rows) {
      assert(r.getInt(3) != r.getInt(4), "negative must have a different label")
      assert(r.getLong(0) != r.getLong(1))
      assert(r.getDouble(5) >= -1.0 - 1e-9 && r.getDouble(5) <= 1.0 + 1e-9)
    }
  }

  test("graph_kcore: monotone shrinking core across peel rounds") {
    val rows = SparkEntry.queries("graph_kcore")(spark, sf0001)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val nodes = rows.map(_.getLong(1)); val edges = rows.map(_.getLong(2))
    assert(nodes.sliding(2).forall(p => p(0) >= p(1)), "nodes must shrink")
    assert(edges.sliding(2).forall(p => p(0) >= p(1)), "edges must shrink")
    // a surviving 3-core needs at least 4 nodes and 6 edges — or nothing
    val (nL, eL) = (nodes.last, edges.last)
    assert((nL == 0 && eL == 0) || (nL >= 4 && eL >= math.max(6L, 3 * nL / 2)),
      s"final core nodes=$nL edges=$eL violates k-core degree bound")
  }

  test("agg_mannwhitney: U within [0, n1*n2] and the rank-sum identity") {
    val rows = SparkEntry.queries("agg_mannwhitney")(spark, sf0001).collect()
    assert(rows.length == 5)
    for (r <- rows) {
      val n1 = r.getLong(1); val n2 = r.getLong(2); val u = r.getDouble(3)
      assert(n1 > 0 && n2 > 0)
      assert(u >= 0.0 && u <= (n1 * n2).toDouble,
        s"${r.getString(0)}: U=$u outside [0, ${n1 * n2}]")
      assert(!r.getDouble(4).isNaN)
    }
  }

  test("llm_dedup_paragraph: chunk accounting per source") {
    val rows = SparkEntry.queries("llm_dedup_paragraph")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nd, nc, dup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nc >= nd, "every doc contributes at least one chunk")
      assert(dup <= nc)
      assert(r.getDouble(4) == dup.toDouble / nc)
    }
    // total chunk count equals sum over docs of ceil(n_tok / 20)
    val expected = sources.Tables.documents(spark, sf0001)
      .select(QueryUtils.nTok.as("nt")).where(col("nt") >= 1)
      .select(expr("(nt + 19) div 20").as("c")).agg(sum("c")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == expected)
  }
}
