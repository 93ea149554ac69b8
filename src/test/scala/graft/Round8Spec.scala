package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 anchors: error bounds for the approximate-sketch statistics
  * family (mirroring the agg_approx_distinct ±5% precedent) and a
  * driver-side replay of the 3-round BPE trainer.
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  // ---- agg_approx_quantiles: rank error vs the exact percentile --------
  // The GK sketch contract is RANK accuracy (≤ 1/accuracy = 1e-4 here);
  // assert a generous 0.5% at every SF: the fraction of rows ≤ the
  // approximated p-quantile must sit within p ± 0.005.
  for (sf <- Seq(sf0001, sf001, sf01)) {
    test(s"agg_approx_quantiles rank error <= 0.5% at ${sf.split('/').last}") {
      val approx = SparkEntry.queries("agg_approx_quantiles")(spark, sf)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val li = graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"))
      for ((flag, (n, p50, p90, p99)) <- approx;
           (q, est) <- Seq(0.50 -> p50, 0.90 -> p90, 0.99 -> p99)) {
        val rank = li.where(col("flag") === flag && col("v") <= est).count()
        val err = math.abs(rank.toDouble / n - q)
        assert(err <= 0.005, s"$flag q=$q est=$est rank=$rank/$n err=$err")
      }
    }
  }

  // ---- agg_quantile_grid: value error <= one bucket width --------------
  test("agg_quantile_grid is within one 1024-bucket width of the exact percentile") {
    for (sf <- Seq(sf0001, sf001)) {
      val grid = SparkEntry.queries("agg_quantile_grid")(spark, sf)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val exact = graft.sources.Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("e50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").as("e90"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("e99"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      for ((flag, (g50, g90, g99)) <- grid) {
        val (lo, hi, e50, e90, e99) = exact(flag)
        val width = (hi - lo) / 1024.0 + 0.01 // one bucket + centi rounding
        for ((g, e, q) <- Seq((g50, e50, 50), (g90, e90, 90), (g99, e99, 99))) {
          assert(math.abs(g - e) <= width,
            s"$sf $flag p$q grid=$g exact=$e width=$width")
        }
      }
    }
  }

  // ---- llm_bpe_merges: driver-side replay predicts every round ---------
  // Independent reimplementation: tokens collected to the driver, the
  // framed-string merge replayed with java.lang.String.replace (the
  // same leftmost-non-overlapping semantics the engines use), winners
  // ordered by (n DESC, a, b) under UTF-8-byte string order (matching
  // Spark's UTF8String / DuckDB's binary collation).
  test("llm_bpe_merges matches a driver-side BPE replay at sf0.001") {
    val byteOrd: Ordering[String] = (x: String, y: String) => {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      var i = 0; var c = 0
      while (c == 0 && i < a.length && i < b.length) {
        c = (a(i) & 0xff) - (b(i) & 0xff); i += 1
      }
      if (c != 0) c else a.length - b.length
    }
    val tokens = graft.sources.Tables.documents(spark, sf0001)
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    var seqs = scala.collection.mutable.HashMap[String, Long]()
    tokens.foreach { t =>
      val framed = t.replaceAll("([^ ])", " $1 ")
      seqs(framed) = seqs.getOrElse(framed, 0L) + 1L
    }
    val predicted = (1 to 3).map { round =>
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((seq, cnt) <- seqs) {
        val syms = seq.trim.split("  ")
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      // winner: max n, ties by (a, b) ascending byte order
      val winner = pc.toSeq.sortWith { case (((a1, b1), n1), ((a2, b2), n2)) =>
        if (n1 != n2) n1 > n2
        else if (byteOrd.compare(a1, a2) != 0) byteOrd.compare(a1, a2) < 0
        else byteOrd.compare(b1, b2) < 0
      }.head
      val ((wa, wb), wn) = winner
      if (round < 3) {
        val next = scala.collection.mutable.HashMap[String, Long]()
        for ((seq, cnt) <- seqs) {
          val merged = seq.replace(" " + wa + "  " + wb + " ", " " + wa + wb + " ")
          next(merged) = next.getOrElse(merged, 0L) + cnt
        }
        seqs = next
      }
      (round.toLong, wa, wb, wn)
    }
    // the fold must actually change the stream: rounds 2 and 3 were
    // chosen from merged streams, so at least one winner must involve a
    // multi-char symbol or the counts must differ round-to-round
    assert(predicted.map(w => (w._2, w._3)).distinct.size == 3,
      s"replay produced duplicate winners: $predicted")
    val got = SparkEntry.queries("llm_bpe_merges")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == predicted, s"got=$got predicted=$predicted")
  }

  // ---- llm_sample_bottomk: fixed size and in-range audit ---------------
  test("llm_sample_bottomk draws exactly min(1000, corpus) docs with sane means") {
    val rows = SparkEntry.queries("llm_sample_bottomk")(spark, sf001).collect()
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.sources.Tables.documents(spark, sf001).count()
    assert(total == math.min(1000L, nDocs), s"sample size $total of $nDocs docs")
    val (mn, mx) = {
      val r = graft.sources.Tables.documents(spark, sf001)
        .agg(min("n_chars"), max("n_chars")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    rows.foreach { r =>
      assert(r.getDouble(2) >= mn && r.getDouble(2) <= mx,
        s"${r.getString(0)} mean_chars ${r.getDouble(2)} outside [$mn, $mx]")
    }
  }
}
