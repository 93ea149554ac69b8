package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SurfaceQueries

/** Plan-shape proof for `join_bucketed`: with both fact tables written
  * bucketed+sorted on the join key, the sort-merge join AND the
  * follow-up per-key aggregation plan with no shuffle — the only
  * exchange in the whole physical plan is the final presentation sort.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join plans zero exchanges below the final sort") {
    val df = SurfaceQueries.queries("join_bucketed")(spark, sf0001)
    df.count() // materialize (also writes the bucketed tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    // exactly one exchange: the rangepartitioning for the final orderBy
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).toList
    assert(exchanges.length == 1 && exchanges.head.contains("rangepartitioning"),
      s"expected only the final sort's range exchange, got $exchanges in:\n$plan")
    // the scan really is bucket-aware
    assert(plan.contains("SelectedBucketsCount"), "scan is not bucketed")
  }

  test("bucketed join result equals the plain parquet join") {
    val got = SurfaceQueries.queries("join_bucketed")(spark, sf0001)
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val ord = graft.sources.Tables.orders(spark, sf0001)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val want = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
