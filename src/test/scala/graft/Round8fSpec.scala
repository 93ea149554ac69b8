package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 sixth-wave anchors: a driver-side text-counting replay of
  * all four readability/richness indices from the raw sf0.001
  * documents, plus the closed-form identities that tie each emitted
  * index to its emitted integer totals.
  */
class Round8fSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs: Seq[(String, String)] =
    graft.sources.Tables.documents(spark, sf0001)
      .select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  private def words(t: String): Seq[String] =
    t.split(" ").filter(_.nonEmpty).toSeq
  private def sentences(t: String): Long =
    math.max(1L, t.count(c => c == '.' || c == '!' || c == '?').toLong)
  private def vowelGroups(t: String): Int =
    "[aeiouyAEIOUY]+".r.findAllIn(t).size

  test("llm_coleman_liau matches a driver text-counting replay") {
    val got = SparkEntry.queries("llm_coleman_liau")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    for ((lang, ds) <- docs.groupBy(_._1)) {
      val kept = ds.map(_._2).filter(t => words(t).nonEmpty)
      val w = kept.map(t => words(t).size.toLong).sum
      val s = kept.map(sentences).sum
      val l = kept.map(_.count(_.isLetter).toLong).sum
      val (gn, gw, gs, gl, cli) = got(lang)
      assert((gn, gw, gs, gl) == (kept.size.toLong, w, s, l), lang)
      val expect = 0.0588 * (100.0 * l / w) - 0.296 * (100.0 * s / w) - 15.8
      assert(math.abs(cli - expect) <= 1e-4, s"$lang $cli vs $expect")
    }
  }

  test("llm_lix_rix: emitted indices tie to emitted totals; replay long words") {
    val rows = SparkEntry.queries("llm_lix_rix")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val lwByLang = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ds.map(_._2).filter(t => words(t).nonEmpty)
        .map(t => words(t).count(_.length > 6).toLong).sum
    }
    for (r <- rows) {
      val (w, s, lw) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lw == lwByLang(r.getString(0)), r.getString(0))
      assert(math.abs(r.getDouble(5) -
        (w.toDouble / s + 100.0 * lw / w)) <= 1e-4)
      assert(math.abs(r.getDouble(6) - lw.toDouble / s) <= 1e-4)
    }
  }

  test("llm_yule_k matches a driver frequency-spectrum replay") {
    val got = SparkEntry.queries("llm_yule_k")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((lang, ds) <- docs.groupBy(_._1)) {
      val freq = ds.flatMap(d => words(d._2)).groupBy(identity)
        .map(_._2.size.toLong).toSeq
      val n = freq.sum
      val s2 = freq.map(c => c * c).sum
      val v2 = freq.count(_ == 2L).toLong
      val (gn, gv, k, sich) = got(lang)
      assert(gn == n && gv == freq.size.toLong, lang)
      assert(math.abs(k - 10000.0 * (s2 - n).toDouble / (n.toDouble * n)) <= 1e-3)
      assert(math.abs(sich - v2.toDouble / freq.size) <= 1e-6)
      assert(k >= 0.0 && sich >= 0.0 && sich <= 1.0)
    }
  }

  test("llm_gunning_fog matches a driver complex-word replay") {
    val got = SparkEntry.queries("llm_gunning_fog")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    for ((lang, ds) <- docs.groupBy(_._1)) {
      val kept = ds.map(_._2).filter(t => words(t).nonEmpty)
      val w = kept.map(t => words(t).size.toLong).sum
      val s = kept.map(sentences).sum
      val cw = kept.map(t => words(t).count(vowelGroups(_) >= 3).toLong).sum
      val (gw, gs, gcw, fog) = got(lang)
      assert((gw, gs, gcw) == (w, s, cw), lang)
      val expect = 0.4 * (w.toDouble / s + 100.0 * cw / w)
      assert(math.abs(fog - expect) <= 1e-4, s"$lang $fog vs $expect")
      // fog is bounded below by the sentence-length term alone
      assert(fog >= 0.4 * w.toDouble / s - 1e-9)
    }
  }
}
