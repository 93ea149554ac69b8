package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftOps

class TopKPerGroupSpec extends AnyFunSuite {
  import TestSpark._

  private def orders = graft.sources.Tables.orders(spark, sf0001)
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("plan uses the custom TopKPerGroupExec operator") {
    val df = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("matches the row_number window formulation exactly") {
    val custom = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(custom == viaWindow)
  }

  test("k larger than every group keeps all rows") {
    val all = GraftOps.topKPerGroup(orders, Seq("o_custkey"),
      Seq("o_orderkey" -> true), 1000000)
    assert(all.count() == orders.count())
  }

  test("empty group list = global top-k") {
    val top5 = GraftOps.topKPerGroup(orders, Seq.empty,
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
      .orderBy(col("o_totalprice").desc).collect().toSeq
    val expected = orders.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(5).collect().toSeq
    assert(top5 == expected)
  }

  test("float group keys: -0.0 groups with 0.0 (SQL semantics)") {
    import spark.implicits._
    val df = Seq((0.0, 1), (-0.0, 2), (1.0, 3)).toDF("g", "id")
    val got = GraftOps.topKPerGroup(df, Seq("g"), Seq("id" -> true), 1)
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    // one group for {0.0, -0.0} -> keeps id=1 only; plus id=3's group
    assert(got == Seq(1, 3))
  }

  test("group columns resolve case-insensitively") {
    val df = GraftOps.topKPerGroup(orders, Seq("O_CUSTKEY"),
      Seq("O_TOTALPRICE" -> false, "o_orderkey" -> true), 1)
    assert(df.count() > 0)
  }

  test("duplicate order values are tiebroken deterministically") {
    import spark.implicits._
    val df = Seq((1, 10, 5.0), (1, 11, 5.0), (1, 12, 5.0), (2, 20, 1.0))
      .toDF("g", "id", "v")
    val got = GraftOps.topKPerGroup(df, Seq("g"),
      Seq("v" -> false, "id" -> true), 2)
      .orderBy("g", "id").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 10), (1, 11), (2, 20)))
  }
}
