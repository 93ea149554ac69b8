package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{UdfQueries, WeightedAvgAgg}

class UdafSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("WeightedAvgAgg computes sum(x*w)/sum(w) exactly") {
    val df = Seq(
      ("a", 100.0, 0.10), ("a", 200.0, 0.30), ("b", 50.0, 0.05))
      .toDF("k", "x", "w")
    val wavg = udaf(WeightedAvgAgg)
    val got = df.groupBy("k").agg(wavg(col("x"), col("w")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - (100.0 * 0.10 + 200.0 * 0.30) / 0.40) < 1e-12)
    assert(math.abs(got("b") - 50.0) < 1e-12)
  }

  test("WeightedAvgAgg merge order cannot change the result (integer buffer)") {
    val rows = (1 to 1000).map(i => ("k", i * 1.01, (i % 10) * 0.01))
    val one = rows.toDF("k", "x", "w").repartition(1)
    val many = rows.toDF("k", "x", "w").repartition(16)
    val wavg = udaf(WeightedAvgAgg)
    def v(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy("k").agg(wavg(col("x"), col("w"))).head.getDouble(1)
    assert(v(one) == v(many)) // bit-identical despite different partial merges
  }

  test("bigram jaccard UDF basic identities") {
    spark.udf.register("jaccard_test", udf((a: String, b: String) => {
      def bg(s: String): Set[String] = if (s == null || s.length < 2) Set.empty else s.sliding(2).toSet
      val x = bg(a); val y = bg(b)
      val i = (x & y).size; val u = x.size + y.size - i
      if (u == 0) 1.0 else i.toDouble / u
    }))
    val r = spark.sql(
      "SELECT jaccard_test('abcd','abcd') a, jaccard_test('abcd','wxyz') b, jaccard_test('x','y') c")
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0) // both bigram-less -> defined as 1
  }

  test("udf_scalar_jaccard query jaccard values in [0,1]") {
    val vals = UdfQueries.queries("udf_scalar_jaccard")(spark, sf0001)
      .collect().map(_.getDouble(3))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }
}
