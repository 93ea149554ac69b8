package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** Direct contract tests for the GlobalRank idioms (the range-
  * partitioned replacements for single-task global windows, used by 9
  * declared queries): seeded random datasets compared row-for-row
  * against the single-partition window ground truth, across empty /
  * single-row / fewer-rows-than-partitions / heavy-tie shapes.
  */
class GlobalRankSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Seeded random frame: id is the unique tiebreak, grp a low-card
    * group, k a heavily-tied sort key, v a payload. */
  private def randDf(seed: Long, n: Int, keys: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, ("g" + r.nextInt(4)), r.nextInt(keys), r.nextDouble()))
      .toDF("id", "grp", "k", "v")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("withSeqAndCount matches the single-partition window (global order)") {
    for (seed <- Seq(1L, 2L); n <- Seq(0, 1, 5, 1000)) {
      val df = randDf(seed, n, 7)
      val got = GlobalRank.withSeqAndCount(df, "rn", "cnt", Seq.empty,
        Seq(col("k"), col("id")), partitions = 7).select("id", "rn", "cnt")
      val w = Window.orderBy("k", "id")
      val want = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("id", "rn", "cnt")
      assert(rows(got) == rows(want), s"seed=$seed n=$n")
    }
  }

  test("withSeqAndCount matches the partitioned window (few-group order)") {
    for (seed <- Seq(3L, 4L); n <- Seq(1, 9, 800)) {
      val df = randDf(seed, n, 5)
      val got = GlobalRank.withSeqAndCount(df, "rn", "cnt", Seq("grp"),
        Seq(col("k"), col("id")), partitions = 5).select("id", "rn", "cnt")
      val w = Window.partitionBy("grp").orderBy("k", "id")
      val want = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select("id", "rn", "cnt")
      assert(rows(got) == rows(want), s"seed=$seed n=$n")
    }
  }

  test("withRunningMaxBefore matches the strictly-before prefix max") {
    for (seed <- Seq(5L, 6L); n <- Seq(0, 1, 4, 1000)) {
      val df = randDf(seed, n, 9)
      val got = GlobalRank.withRunningMaxBefore(df, col("k"), "pm",
        Seq(col("id")), partitions = 7).select("id", "pm")
      val want = df.withColumn("pm", max("k").over(
          Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)))
        .select("id", "pm")
      assert(rows(got) == rows(want), s"seed=$seed n=$n")
    }
  }

  test("default (derived) partition count follows the session's shuffle parallelism") {
    // r6 verdict item 1: no caller-visible fixed 32 — omitting
    // `partitions` must derive the range width from
    // spark.sql.shuffle.partitions, and ranks must be identical to the
    // ground truth at ANY width (boundary-invariance under total order)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      val df = randDf(21L, 700, 7)
      val got = GlobalRank.withSeqAndCount(df, "rn", "cnt", Seq.empty,
        Seq(col("k"), col("id")))
      // the ranked stream side keeps its range partitioning (broadcast
      // join adds no shuffle), so the width is observable here
      assert(got.rdd.getNumPartitions == 11,
        s"derived width ${got.rdd.getNumPartitions}, want 11 from session conf")
      val w = Window.orderBy("k", "id")
      val want = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      assert(rows(got.select("id", "rn", "cnt")) ==
        rows(want.select("id", "rn", "cnt")))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("ntileFromSeq matches Spark's ntile for every bucket count") {
    for (n <- Seq(1, 4, 37, 200); b <- Seq(1, 3, 4, 10)) {
      val df = randDf(11L, n, 13)
      val w = Window.orderBy("k", "id")
      val base = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val got = base.select(col("id"),
        GlobalRank.ntileFromSeq("rn", "cnt", b).cast("int").as("nt"))
      val want = base.select(col("id"), ntile(b).over(w).as("nt"))
      assert(rows(got) == rows(want), s"n=$n buckets=$b")
    }
  }

  test("percentRank/cumeDist closed forms match Spark on a tie-free order") {
    val df = randDf(12L, 300, 9)
    val w = Window.orderBy("id") // id is unique → tie-free by construction
    val base = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // tie-free: the tie-group min/max rank is the row's own rank
    val got = base.select(col("id"),
      GlobalRank.percentRankFromSeq(col("rn"), col("cnt")).as("pr"),
      GlobalRank.cumeDistFromSeq(col("rn"), col("cnt")).as("cd"))
    val want = base.select(col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    assert(rows(got) == rows(want))
  }
}
