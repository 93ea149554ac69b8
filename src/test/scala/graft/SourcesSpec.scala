package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond the parquet test corpus: CSV and JSON
  * round-trips with explicit schemas, plus loader schema asserts.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves rows and schema") {
    val out = tmpDir() + "/nation_csv"
    val nation = graft.sources.Tables.nation(spark, sf0001)
    nation.write.option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    assert(back.count() == nation.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json lines round-trip preserves values incl. nulls") {
    val out = tmpDir() + "/orders_json"
    val o = graft.sources.Tables.orders(spark, sf0001)
      .withColumn("st", nullif(col("o_orderstatus"), lit("P")))
      .select("o_orderkey", "st", "o_totalprice")
    o.write.json(out)
    val back = spark.read
      .schema("o_orderkey bigint, st string, o_totalprice double")
      .json(out)
    assert(back.count() == o.count())
    assert(back.where(col("st").isNull).count() == o.where(col("st").isNull).count())
  }

  test("orc round-trip preserves rows, schema and timestamps") {
    val out = tmpDir() + "/orders_orc"
    val o = graft.sources.Tables.orders(spark, sf0001)
    o.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == o.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      o.orderBy("o_orderkey").collect().toSeq)
  }

  test("text source reads raw lines") {
    val out = tmpDir() + "/docs_text"
    val d = graft.sources.Tables.documents(spark, sf0001).select("text")
    d.write.text(out)
    val back = spark.read.text(out)
    assert(back.count() == d.count())
    assert(back.columns.toSeq == Seq("value"))
  }

  test("events loader recovers microsecond timestamps from nanos") {
    val e = graft.sources.Tables.events(spark, sf0001)
    assert(e.schema("ts").dataType == TimestampNTZType)
    val bounds = e.agg(min("ts"), max("ts")).head()
    assert(bounds.getAs[java.time.LocalDateTime](0).getYear == 2024)
  }

  test("loader fails fast on missing columns") {
    val out = tmpDir() + "/bad_region"
    spark.range(3).selectExpr("id AS wrong_col").write.parquet(out + "/region.parquet")
    val err = intercept[IllegalArgumentException] {
      graft.sources.Tables.region(spark, out)
    }
    assert(err.getMessage.contains("region"))
  }
}
