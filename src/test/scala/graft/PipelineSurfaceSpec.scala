package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PipelineQueries, SurfaceQueries}
import graft.sources.Tables

/** Semantics checks for the pipeline (sampling / n-gram dedup / salted
  * join) and surface (struct / try / inline / source round-trip)
  * additions — property-style assertions independent of the DuckDB
  * oracle, which only proves cross-engine equality.
  */
class PipelineSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_sample_hash keeps only buckets < 10 and is deterministic") {
    val a = PipelineQueries.queries("llm_sample_hash")(spark, sf0001)
    assert(a.where(col("bucket") < 0 || col("bucket") >= 10).count() == 0)
    val n = a.count()
    assert(n > 0 && n < Tables.documents(spark, sf0001).count())
    // rerun selects the identical id set (pure function of doc_id)
    val b = PipelineQueries.queries("llm_sample_hash")(spark, sf0001)
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0)
  }

  test("llm_sample_stratified caps every language stratum at 20") {
    val got = PipelineQueries.queries("llm_sample_stratified")(spark, sf0001)
    val perLang = got.groupBy("lang").count()
    assert(perLang.where(col("count") > 20).count() == 0)
    assert(got.where(col("rk") > 20 || col("rk") < 1).count() == 0)
    // every stratum with >= 20 docs is filled to exactly 20
    val bigLangs = Tables.documents(spark, sf0001)
      .groupBy("lang").count().where(col("count") >= 20).select("lang")
    val filled = perLang.join(bigLangs, "lang").where(col("count") === 20)
    assert(filled.count() == bigLangs.count())
  }

  test("llm_dedup_ngram jaccards are within [0.7, 1] with a < b") {
    val got = PipelineQueries.queries("llm_dedup_ngram")(spark, sf0001)
    assert(got.where(col("jaccard") < 0.7 || col("jaccard") > 1.0).count() == 0)
    assert(got.where(col("doc_a") >= col("doc_b")).count() == 0)
    assert(got.count() > 0) // corpus is seeded with near-dups
  }

  test("join_skew_salted equals the plain unsalted join+agg") {
    val got = PipelineQueries.queries("join_skew_salted")(spark, sf0001)
    val sup = Tables.supplier(spark, sf0001).select("s_suppkey", "s_nationkey")
    val plain = Tables.lineitem(spark, sf0001)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
    val bad = got.join(plain, "s_nationkey")
      .where(got("revenue") =!= plain("revenue") || got("n_lines") =!= plain("n_lines"))
    assert(bad.count() == 0 && got.count() == plain.count())
  }

  test("fn_struct tuple comparison matches its scalar expansion") {
    val got = SurfaceQueries.queries("fn_struct")(spark, sf0001)
    // (price, key) > (400000.0, 1000) ⇔ price > 400000 ∨ (price = 400000 ∧ key > 1000)
    val bad = got.where(col("above_mark") =!=
      (col("st_price") > 400000.0 ||
        (col("st_price") === 400000.0 && col("o_orderkey") > 1000L)))
    assert(bad.count() == 0 && got.count() > 0)
    assert(got.where(col("st_price") < 300000.0).count() == 0)
  }

  test("fn_try_arith nulls exactly where the operation is undefined") {
    val got = SurfaceQueries.queries("fn_try_arith")(spark, sf0001)
    assert(got.where(col("tdiv").isNull =!= (pmod(col("o_orderkey"), lit(3)) === 0)).count() == 0)
    assert(got.where(col("pr_whole").isNotNull).count() == 0)
    assert(got.where(col("pr_num").isNull).count() == 0)
    assert(got.where(col("oob").isNotNull).count() == 0)
  }

  test("gen_inline emits exactly two typed rows per order") {
    val got = SurfaceQueries.queries("gen_inline")(spark, sf0001)
    val orders = Tables.orders(spark, sf0001)
    assert(got.count() == 2 * orders.count())
    val k2 = got.where(col("kind") === "key2x")
    assert(k2.where(col("val") =!= (col("o_orderkey") * 2).cast("double")).count() == 0)
  }

  test("CSV and JSON round trips reproduce the parquet contents") {
    val csv = SurfaceQueries.queries("source_csv_roundtrip")(spark, sf0001)
    val cSrc = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    assert(csv.exceptAll(cSrc).count() == 0 && cSrc.exceptAll(csv).count() == 0)

    val json = SurfaceQueries.queries("source_json_roundtrip")(spark, sf0001)
    val oSrc = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    assert(json.exceptAll(oSrc).count() == 0 && oSrc.exceptAll(json).count() == 0)
  }

  test("char_grams SQL registration plans the codegen'd expression") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql("SELECT char_grams('abcdefghijklmnopqrstuv') AS g").head().getSeq[String](0)
    assert(r == Seq("abcdefghijklmnopqrst", "bcdefghijklmnopqrstu", "cdefghijklmnopqrstuv"))
    // distinct + too-short inputs
    val r2 = spark.sql("SELECT char_grams('aaaaaaaaaaaaaaaaaaaaa') AS g").head().getSeq[String](0)
    assert(r2 == Seq("aaaaaaaaaaaaaaaaaaaa"))
    assert(spark.sql("SELECT char_grams('short') AS g").head().getSeq[String](0).isEmpty)
  }
}
