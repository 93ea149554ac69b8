package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.TokenArtifacts

/** Contract tests for the build-once unigram ledger behind the ~15
  * lexical-statistic queries (round 11): every rollup of the ledger
  * must equal the DIRECT corpus tokenization it replaced, cell for
  * cell — the property that lets a consumer switch to the ledger
  * without touching its oracle. Also pins the ledger's grain keys to
  * their catalog bounds (the scale contract: ledger rows ≤
  * |langs|·|sources|·6 × vocabulary) and the build-once memo
  * semantics future consumers rely on.
  */
class TokenArtifactsSpec extends AnyFunSuite {
  import TestSpark._

  private def toks = filter(split(col("text"), " "), t => t =!= "")
  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** Row-set equality via anti-joins both ways (schema-aligned). */
  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = a.columns.sorted.map(col).toSeq
    val aa = a.select(cols: _*)
    val bb = b.select(cols: _*)
    assert(aa.exceptAll(bb).isEmpty && bb.exceptAll(aa).isEmpty,
      s"$what: ledger rollup disagrees with direct tokenization")
  }

  test("byLang rollup equals direct (lang, tok) counts") {
    val direct = docs
      .select(col("lang"), explode(toks).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    assertSameRows(TokenArtifacts.byLang(spark, sf0001), direct, "byLang")
  }

  test("bySource rollup equals direct (source, tok) counts") {
    val direct = docs
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    assertSameRows(TokenArtifacts.bySource(spark, sf0001), direct, "bySource")
  }

  test("global rollup equals direct corpus token counts") {
    val direct = docs
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    assertSameRows(TokenArtifacts.global(spark, sf0001), direct, "global")
  }

  test("half and bucket slices equal their direct split counts") {
    // the two extra grain keys exist for llm_cross_entropy (half) and
    // llm_positional_bias (bucket) — prove each slice exactly
    val lg = TokenArtifacts.unigram(spark, sf0001)
    val directHalf = docs
      .select(col("lang"), (col("doc_id") % 2).as("half"),
        explode(toks).as("tok"))
      .groupBy("lang", "half", "tok").agg(count(lit(1)).as("cnt"))
    assertSameRows(
      lg.groupBy("lang", "half", "tok").agg(sum("cnt").as("cnt")),
      directHalf, "half slice")
    val directBucket = docs
      .select(size(toks).as("len"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("bucket", expr("(3 * pos) div len"))
      .groupBy("bucket", "tok").agg(count(lit(1)).as("cnt"))
    assertSameRows(
      lg.groupBy("bucket", "tok").agg(sum("cnt").as("cnt")),
      directBucket, "bucket slice")
  }

  test("grain keys stay catalog-bounded (the ledger-size contract)") {
    val lg = TokenArtifacts.unigram(spark, sf0001)
    val r = lg.agg(
      countDistinct("lang").as("nl"), countDistinct("source").as("ns"),
      countDistinct("half").as("nh"), countDistinct("bucket").as("nb"),
      min("half").as("h0"), max("half").as("h1"),
      min("bucket").as("b0"), max("bucket").as("b1"),
      count(lit(1)).as("rows"), countDistinct("tok").as("vocab"))
      .collect()(0)
    assert(r.getLong(2) <= 2 && r.getLong(0) >= 1 && r.getLong(1) >= 1)
    assert(r.getLong(3) <= 3, s"bucket cardinality ${r.getLong(3)} > 3")
    assert(r.getLong(4) >= 0L && r.getLong(5) <= 1L, "half outside {0,1}")
    assert(r.getLong(6) >= 0L && r.getLong(7) <= 2L, "bucket outside {0,1,2}")
    // rows ≤ |langs|·|sources|·|half|·|bucket| × vocab — the
    // Heaps-sublinear bound the 100 TB story quotes
    assert(r.getLong(8) <=
      r.getLong(0) * r.getLong(1) * 2 * 3 * r.getLong(9),
      "ledger larger than its catalog-bounded grain allows")
  }

  test("docfreq rollups equal direct distinct-doc counts (df grain, r12)") {
    // ndoc counts documents CONTAINING tok — not occurrences — so it
    // has its own array_distinct pass; every doc occupies exactly one
    // (lang, source, half) cell, so rollups over ignored keys must be
    // bit-exact vs the direct count. This is the contract that lets
    // the df family (tfidf / bm25 / idf_drift) read the ledger without
    // touching their oracles.
    val e = docs.select(col("lang"), col("source"),
      (col("doc_id") % 2).as("half"), col("doc_id"),
      explode(array_distinct(toks)).as("tok"))
    assertSameRows(
      TokenArtifacts.docfreq(spark, sf0001),
      e.groupBy("lang", "source", "half", "tok")
        .agg(countDistinct("doc_id").as("ndoc")),
      "docfreq full grain")
    assertSameRows(
      TokenArtifacts.dfByHalf(spark, sf0001),
      e.groupBy("half", "tok").agg(countDistinct("doc_id").as("ndoc")),
      "dfByHalf")
    assertSameRows(
      TokenArtifacts.dfGlobal(spark, sf0001),
      e.groupBy("tok").agg(countDistinct("doc_id").as("ndoc")),
      "dfGlobal")
  }

  test("docfreq grain keys stay catalog-bounded and ndoc <= doc count") {
    val lg = TokenArtifacts.docfreq(spark, sf0001)
    val nDocs = docs.count()
    val r = lg.agg(
      countDistinct("lang").as("nl"), countDistinct("source").as("ns"),
      min("half").as("h0"), max("half").as("h1"),
      max("ndoc").as("maxdoc"), count(lit(1)).as("rows"),
      countDistinct("tok").as("vocab")).collect()(0)
    assert(r.getLong(0) >= 1 && r.getLong(1) >= 1)
    assert(r.getLong(2) >= 0L && r.getLong(3) <= 1L, "half outside {0,1}")
    assert(r.getLong(4) <= nDocs, "ndoc exceeds the document count")
    // rows ≤ |langs|·|sources|·|half| × vocab — Heaps-sublinear, same
    // bound class as the unigram grain
    assert(r.getLong(5) <= r.getLong(0) * r.getLong(1) * 2 * r.getLong(6),
      "df ledger larger than its catalog-bounded grain allows")
  }

  test("memo returns the same frame instance per (session, dir)") {
    graft.tools.IndexCache.clear()
    val a = TokenArtifacts.unigram(spark, sf0001)
    val b = TokenArtifacts.unigram(spark, sf0001)
    assert(a eq b, "second call must be a cache hit (build-once)")
    graft.tools.IndexCache.clear()
    val c = TokenArtifacts.unigram(spark, sf0001)
    assert(!(a eq c), "clear() must force a rebuild")
  }
}
