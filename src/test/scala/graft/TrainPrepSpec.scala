package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic anchors for the training-prep batch (TrainPrepQueries):
  * invariants that must hold on any corpus, checked at sf0.001.
  */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark._

  test("pack_sequences: chunk ranges are contiguous per language") {
    val rows = SparkEntry.queries("llm_pack_sequences")(spark, sf0001)
      .orderBy("lang", "doc_id").collect()
    assert(rows.nonEmpty)
    var prevLang = ""
    var prevLast = -1L
    for (r <- rows) {
      val (lang, nTok, first, last) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(first <= last, s"doc ${r.getLong(0)}: first > last")
      assert(nTok >= 1)
      // a doc spanning k chunks needs > (k-1) * capacity... at least the
      // loose bound: chunks spanned never exceeds tokens/capacity + 1
      assert(last - first <= nTok / 2048 + 1)
      if (lang == prevLang) {
        // the next doc starts in the chunk where the previous ended
        // (concat-and-chunk leaves no gaps)
        assert(first == prevLast || first == prevLast + 1,
          s"gap in $lang at doc ${r.getLong(0)}: prev last $prevLast, first $first")
      } else {
        assert(first == 0, s"$lang stream must start at chunk 0")
      }
      prevLang = lang; prevLast = last
    }
  }

  test("shard_assign: every doc lands in exactly one of 16 shards") {
    val rows = SparkEntry.queries("llm_shard_assign")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).forall(s => s >= 0 && s < 16))
    val totalDocs = rows.map(_.getLong(1)).sum
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    assert(totalDocs == nDocs, "shards must partition the corpus")
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }

  test("split_train: splits partition the corpus, ~90/5/5 by bucket") {
    val rows = SparkEntry.queries("llm_split_train")(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total == graft.sources.Tables.documents(spark, sf0001).count())
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    // md5 buckets are uniform: train must dominate
    assert(bySplit("train") > bySplit.getOrElse("valid", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("emb_quantize: reconstruction error bounded by half a quantization step") {
    val rows = SparkEntry.queries("llm_emb_quantize")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (scale, maxErr) = (r.getDouble(2), r.getDouble(3))
      assert(scale > 0)
      // |x - q*scale| <= scale/2 by construction of round-to-nearest
      assert(maxErr <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: max_err $maxErr > scale/2 ${scale / 2}")
    }
  }

  test("doc_entropy: 0 <= entropy <= log2(n_types) and ttr in (0, 1]") {
    val rows = SparkEntry.queries("llm_doc_entropy")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nTok, nTypes, ttr, ent) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nTypes <= nTok)
      assert(ttr > 0 && ttr <= 1)
      // uniform-over-types is the max; allow the r4 rounding slack
      assert(ent >= -1e-4 && ent <= math.log(nTypes.toDouble) / math.log(2) + 1e-4,
        s"doc ${r.getLong(0)}: entropy $ent outside [0, log2($nTypes)]")
    }
  }

  test("emb_quantize plan: no shuffle before the final sort") {
    val df = SparkEntry.queries("llm_emb_quantize")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one exchange: the range partitioning of the final ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected map-only plan + 1 sort exchange:\n$plan")
  }
}
