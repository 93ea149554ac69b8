package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anchors for the depth batch (DepthQueries). */
class DepthSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned source actually prunes partitions in the scan") {
    val df = SparkEntry.queries("source_partitioned_pruned")(spark, sf0001)
    df.count() // materialize the scratch write so the read plan is real
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"expected a partitioned scan:\n$plan")
    // the lang predicate must be a partition filter, not a data filter
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("lang"), s"lang not pruned via partitions: $pf")
  }

  test("bigram LM score: templated corpus scores below zero, bounded by log2") {
    val rows = SparkEntry.queries("llm_bigram_score")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val avg = r.getDouble(2)
      // MLE probabilities are <= 1 so mean log2 P is <= 0; a bigram seen
      // once in a corpus of this size cannot be rarer than 1/total
      assert(avg <= 1e-9, s"doc ${r.getLong(0)}: positive avg log-prob $avg")
      assert(avg >= -40, s"doc ${r.getLong(0)}: impossible log-prob $avg")
    }
  }

  test("argminmax: packed-key winners carry the extreme balances") {
    val rows = SparkEntry.queries("agg_argminmax")(spark, sf0001).collect()
    val cust = graft.sources.Tables.customer(spark, sf0001)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- rows) {
      assert(cust(r.getLong(1)) == r.getDouble(2),
        s"${r.getString(0)}: richest custkey's balance != max_bal")
      assert(cust(r.getLong(3)) == r.getDouble(4),
        s"${r.getString(0)}: poorest custkey's balance != min_bal")
    }
  }

  test("incremental dedup: kept docs are new-batch and text-unique vs index") {
    val kept = SparkEntry.queries("llm_dedup_incremental")(spark, sf0001)
      .collect().map(_.getLong(0))
    assert(kept.forall(_ % 3 == 0), "kept docs must be from the new batch")
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "md5(text) h").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val indexHashes = docs.collect { case (id, h) if id % 3 != 0 => h }.toSet
    val keptSet = kept.toSet
    for ((id, h) <- docs if id % 3 == 0) {
      assert(keptSet.contains(id) == !indexHashes.contains(h),
        s"doc $id kept=${keptSet.contains(id)} but hash-in-index=${indexHashes.contains(h)}")
    }
  }

  test("tz conversion: Tokyo wall clock is UTC+9 for these timestamps") {
    import java.time.LocalDateTime
    val rows = SparkEntry.queries("fn_datetime_tz")(spark, sf0001)
      .limit(50).collect()
    assert(rows.nonEmpty)
    // fetch exactly the keys the query returned, so every collected row
    // is asserted (an unordered limit on the orders side could pick a
    // disjoint subset and silently assert nothing)
    val keys = rows.map(_.getLong(0))
    val ord = graft.sources.Tables.orders(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("o_orderkey").isin(keys.map(Long.box): _*))
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[LocalDateTime](1)).toMap
    assert(ord.size == rows.length)
    for (r <- rows) {
      // tokyo_wall is a plain TIMESTAMP (session tz = UTC), so reading
      // its instant as UTC wall clock yields the Tokyo local time
      val wall = r.getAs[java.sql.Timestamp](1).toInstant
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      assert(wall == ord(r.getLong(0)).plusHours(9),
        s"order ${r.getLong(0)}: tokyo_wall is not UTC+9h")
    }
  }
}
