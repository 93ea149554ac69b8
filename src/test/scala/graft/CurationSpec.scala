package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationQueries
import graft.sources.Tables

/** Semantics checks for the curation operators (decontamination,
  * repetition quality, normalization, canonical selection) —
  * property-style assertions independent of the DuckDB oracle.
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("llm_decontaminate flags only non-benchmark docs, with positive hit counts") {
    val got = CurationQueries.queries("llm_decontaminate")(spark, sf0001)
    assert(got.where(col("doc_id") % 97 === 0).count() == 0)
    assert(got.where(col("n_hits") <= 0).count() == 0)
    // a doc that IS an exact copy of a benchmark doc must be flagged:
    // build one synthetic check from the data — any non-benchmark doc
    // sharing full text with a benchmark doc
    val d = Tables.documents(spark, sf0001).select("doc_id", "text")
    val bench = d.where(col("doc_id") % 97 === 0).select(col("text").as("bt"))
    val copies = d.where(col("doc_id") % 97 =!= 0)
      .join(bench, col("text") === col("bt"))
      .select("doc_id").distinct()
    val flagged = got.select("doc_id")
    assert(copies.exceptAll(flagged).count() == 0)
  }

  test("llm_quality_repetition ratios are bounded and exact on a known doc") {
    val got = CurationQueries.queries("llm_quality_repetition")(spark, sf0001)
    assert(got.where(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1).count() == 0)
    assert(got.where(col("top_token_frac") <= 0 || col("top_token_frac") > 1).count() == 0)
    assert(got.where(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") >= 1).count() == 0)
    // hand-check the first doc
    val first = Tables.documents(spark, sf0001)
      .orderBy("doc_id").select("doc_id", "text").head()
    val toks = first.getString(1).split(' ').filter(_.nonEmpty)
    val bigs = toks.sliding(2).map(_.mkString(" ")).toSeq
    val row = got.where(col("doc_id") === first.getLong(0)).head()
    assert(row.getLong(1) == toks.length)
    assert(row.getDouble(2) ==
      BigDecimal(toks.distinct.length.toDouble / toks.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(4) ==
      BigDecimal(1.0 - bigs.distinct.length.toDouble / bigs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("llm_normalize output is idempotent and token counts match") {
    val got = CurationQueries.queries("llm_normalize")(spark, sf0001)
    // normalizing a normalized text is a no-op
    val renorm = got.select(col("doc_id"), col("norm_text"), col("n_tokens"),
      trim(regexp_replace(
        regexp_replace(lower(col("norm_text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("again"))
    assert(renorm.where(col("norm_text") =!= col("again")).count() == 0)
    assert(renorm.where(col("n_tokens") =!=
      when(col("norm_text") === "", 0)
        .otherwise(size(split(col("norm_text"), " ")))).count() == 0)
  }

  test("llm_bm25 partial scores match a hand computation for one doc") {
    val got = CurationQueries.queries("llm_bm25")(spark, sf0001)
    assert(got.where(!col("term").isin("data", "table", "row")).count() == 0)
    assert(got.where(col("tf") <= 0).count() == 0)
    // recompute one (doc, term) row from raw text
    val row = got.orderBy("doc_id", "term").head()
    val docId = row.getLong(0)
    val term = row.getString(1)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toDouble).sum / nDocs
    val dl = docs.find(_._1 == docId).get._2.length.toDouble
    val tf = docs.find(_._1 == docId).get._2.count(_ == term).toDouble
    val dfreq = docs.count(_._2.contains(term)).toDouble
    val idf = math.log((nDocs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    val expect = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(row.getLong(2) == tf.toLong)
    assert(math.abs(row.getDouble(3) - expect) < 5e-4)
  }

  test("llm_centroid covers every (label, pos) cell with the element mean") {
    val got = CurationQueries.queries("llm_centroid")(spark, sf0001)
    val emb = Tables.embeddings(spark, sf0001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val labels = emb.select(countDistinct(col("label"))).head().getLong(0)
    assert(got.count() == labels * dim)
    // n_vecs per label matches the table, independent of pos
    val counts = emb.groupBy("label").count()
      .withColumnRenamed("count", "true_n")
    assert(got.join(counts, "label")
      .where(col("n_vecs") =!= col("true_n")).count() == 0)
    // hand-check one cell
    val r = got.orderBy("label", "pos").head()
    val vs = emb.where(col("label") === r.getInt(0))
      .select(col("embedding").getItem(r.getLong(1).toInt).cast("double"))
      .collect().map(_.getDouble(0))
    val expect = BigDecimal(vs.sum / vs.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - expect) < 2e-4)
  }

  test("llm_dedup_canonical keeps one row per distinct text and prefers longer docs") {
    val got = CurationQueries.queries("llm_dedup_canonical")(spark, sf0001)
    val distinctTexts = Tables.documents(spark, sf0001)
      .select(md5(col("text"))).distinct().count()
    assert(got.count() == distinctTexts)
    // keep_id really has the group-max n_chars
    val d = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("keep_id"), col("n_chars").as("kept_chars"))
    val joined = got.join(d, "keep_id")
    assert(joined.where(col("kept_chars") =!= col("max_chars")).count() == 0)
    assert(got.agg(sum("n_copies")).head().getLong(0) ==
      Tables.documents(spark, sf0001).count())
  }
}
