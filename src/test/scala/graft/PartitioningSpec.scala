package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewUtils

/** The storage-layout levers the 100 TB story leans on: partition
  * pruning, bucketed (shuffle-free) joins, and salted skew joins.
  */
class PartitioningSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned write + filtered read prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft-part").toString + "/orders_by_status"
    val orders = graft.sources.Tables.orders(spark, sf0001)
    orders.write.partitionBy("o_orderstatus").parquet(out)
    val f = spark.read.parquet(out).where(col("o_orderstatus") === "F")
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "expected partition filters in scan")
    assert(f.count() == orders.where(col("o_orderstatus") === "F").count())
    // pruning is real: only the F partition directory is listed
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("o_orderstatus"), scanLine.take(200))
  }

  test("bucketed tables join without an exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.sources.Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    graft.sources.Tables.customer(spark, sf0001)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle:\n" + plan.take(800))
    assert(joined.count() ==
      graft.operators.JoinQueries.queries("join_inner_equi")(spark, sf0001).count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("salted join equals the plain join") {
    val o = graft.sources.Tables.orders(spark, sf0001)
    val c = graft.sources.Tables.customer(spark, sf0001)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey")
      .collect().toSeq
    val salted = SkewUtils.saltedJoin(o, c, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey")
      .collect().toSeq
    assert(salted == plain)
  }
}
