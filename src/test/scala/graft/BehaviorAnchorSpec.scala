package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic anchors for the behavioral/corpus-health/containment
  * batches — invariants that must hold on any corpus, sf0.001.
  */
class BehaviorAnchorSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel stages are monotone non-increasing with valid ratios") {
    val r = SparkEntry.queries("agg_funnel")(spark, sf0001).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    if (v > 0) assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    if (c > 0) assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
  }

  test("retention week 0 covers every user exactly once") {
    val rows = SparkEntry.queries("win_retention_cohort")(spark, sf0001).collect()
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    // every user is active in their own cohort week
    assert(week0 == users, s"week-0 sum $week0 != distinct users $users")
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("cluster stats size distribution accounts for every clustered doc") {
    val stats = SparkEntry.queries("llm_cluster_stats")(spark, sf0001).collect()
    val docsFromStats = stats.map(_.getLong(2)).sum
    val clustered = SparkEntry.queries("llm_dedup_cluster")(spark, sf0001).count()
    assert(docsFromStats == clustered,
      s"stats cover $docsFromStats docs, cluster table has $clustered")
    // n_docs = size * n_clusters per row
    for (r <- stats)
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
  }

  test("containment pairs recompute exactly from shingle sets") {
    import graft.functions.TextShingles.mkShingles
    import org.apache.spark.sql.functions.col
    val pairs = SparkEntry.queries("llm_dedup_contain")(spark, sf0001).collect()
    val sh = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), mkShingles(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // every reported pair satisfies the threshold on the raw sets
    for (r <- pairs) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val inter = (sh(a) & sh(b)).size
      assert(inter * 10 >= sh(a).size * 9,
        s"pair ($a,$b): containment below threshold on recompute")
      assert(math.abs(r.getDouble(2) - inter.toDouble / sh(a).size) < 1e-12)
    }
    // and brute force finds no pair the query missed
    val ids = sh.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a != b
      if sh(a).nonEmpty && (sh(a) & sh(b)).size * 10 >= sh(a).size * 9
    } yield (a, b)).toSet
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
