package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNGrams._

/** r14 optimization contract: each codegen'd n-gram kernel must emit
  * BIT-IDENTICAL output to the `transform(sequence(...))` higher-order
  * expression it replaced (the declared queries' results ride on it).
  * Each test evaluates kernel and reference form side by side over a
  * fixture that exercises the edge cases the kernels special-case:
  * multi-space runs (empty tokens), leading/trailing spaces, strings
  * shorter than the window, the empty string, supplementary-plane
  * code points (substr counts code points, not UTF-16 units), and the
  * real sf0.001 corpus.
  */
class TextNGramsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val fixtures = Seq(
    "a b c d e f g h i j k l m n",
    "a  b   c d  ",                 // empty tokens in the raw stream
    " leading and trailing ",
    "ab",                            // shorter than every window
    "",
    "one",
    "x y",                           // exactly one bigram
    "😀 emoji 😁 pair here",  // supplementary plane
    "same same same same same",     // duplicate grams
    "word " * 25 + "tail"           // > 20 tokens (chunk boundary)
  ).toDF("text")

  private def corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("text")).limit(200)

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.where(!(col("got") <=> col("want"))).count()
    assert(bad === 0, s"kernel diverges from transform(sequence(...)) on $bad rows")
  }

  test("CharNGramList(3) == transform(sequence(1, length-2), substr(i, 3))") {
    for (d <- Seq(fixtures, corpus)) {
      assertSame(d.select(
        mkCharNGrams(col("text"), 3).as("got"),
        when(length(col("text")) >= 3,
          transform(sequence(lit(1), length(col("text")) - 2),
            i => col("text").substr(i, lit(3))))
          .otherwise(array().cast("array<string>")).as("want")))
    }
  }

  test("WordNGramSet(13) == sorted distinct of concat_ws-joined 13-token slices") {
    for (d <- Seq(fixtures, corpus)) {
      val tok = filter(split(col("text"), " "), t => t =!= "")
      assertSame(d.select(
        mkWordNGramSet(col("text"), 13).as("got"),
        when(size(tok) >= 13,
          array_sort(array_distinct(
            transform(sequence(lit(0), size(tok) - 13),
              i => concat_ws(" ", slice(tok, i + 1, lit(13)))))))
          .otherwise(array().cast("array<string>")).as("want")))
    }
  }

  test("WordChunkList(20) == transform-generated 20-token chunks") {
    for (d <- Seq(fixtures, corpus)) {
      val tok = filter(split(col("text"), " "), t => t =!= "")
      assertSame(d.select(
        mkWordChunks(col("text"), 20).as("got"),
        when(size(tok) >= 1,
          transform(sequence(lit(0), ((size(tok) + 19) / 20).cast("int") - 1),
            i => concat_ws(" ", slice(tok, (i * 20 + 1).cast("int"), lit(20)))))
          .otherwise(array().cast("array<string>")).as("want")))
    }
  }

  test("SkipGramList(3) == nested transform (w1, w2, dist) stream") {
    for (d <- Seq(fixtures, corpus)) {
      val tok = filter(split(col("text"), " "), t => t =!= "")
      assertSame(d.select(
        mkSkipGrams(col("text"), 3).as("got"),
        when(size(tok) >= 2,
          flatten(transform(sequence(lit(1), size(tok) - 1), i =>
            transform(sequence(lit(1), least(lit(3), size(tok) - i)), dd =>
              struct(element_at(tok, i).as("w1"),
                element_at(tok, (i + dd).cast("int")).as("w2"),
                dd.cast("long").as("dist"))))))
          .otherwise(array().cast("array<struct<w1:string,w2:string,dist:bigint>>"))
          .as("want")))
    }
  }

  test("SkipGramList(1) == adjacent-pair stream") {
    for (d <- Seq(fixtures, corpus)) {
      val tok = filter(split(col("text"), " "), t => t =!= "")
      assertSame(d.select(
        transform(mkSkipGrams(col("text"), 1),
          p => struct(p("w1").as("w1"), p("w2").as("w2"))).as("got"),
        when(size(tok) >= 2,
          transform(sequence(lit(1), size(tok) - 1),
            i => struct(element_at(tok, i).as("w1"),
              element_at(tok, (i + 1).cast("int")).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
          .as("want")))
    }
  }

  test("TokenBucketCounts == posexplode + (3*pos) div len, re-aggregated") {
    // the kernel pre-counts per doc; equality is at the (bucket, tok,
    // total) grain after re-aggregation (row order inside the doc is
    // not part of the contract — the ledger groupBy follows)
    for (d <- Seq(fixtures, corpus)) {
      val withId = d.withColumn("__id", monotonically_increasing_id())
      val tok = filter(split(col("text"), " "), t => t =!= "")
      val got = withId.select(col("__id"),
          explode(mkTokenBucketCounts(col("text"))).as("e"))
        .groupBy(col("__id"), col("e.bucket").as("bucket"),
          col("e.tok").as("tok"))
        .agg(sum(col("e.cnt")).as("cnt"))
      val want = withId.select(col("__id"), size(tok).as("len"),
          posexplode(tok).as(Seq("pos", "tok")))
        .withColumn("bucket", expr("(3 * pos) div len"))
        .groupBy("__id", "bucket", "tok")
        .agg(count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
    }
  }

  test("RawBigramList == concat over the RAW (empties kept) token stream") {
    for (d <- Seq(fixtures, corpus)) {
      val tok = split(col("text"), " ")
      assertSame(d.select(
        mkRawBigrams(col("text")).as("got"),
        when(size(tok) >= 2,
          transform(sequence(lit(1), size(tok) - 1),
            i => concat(element_at(tok, i), lit(" "),
              element_at(tok, (i + 1).cast("int")))))
          .otherwise(array().cast("array<string>")).as("want")))
    }
  }
}
