package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the ScaleDryRun MinHash-LSH super-linear step
  * (r6 verdict item 2: 3.04 s at 4× → 9.30 s at 8×).
  *
  * Hypothesis under test: the 1×..K× replica generator appended only a
  * 3-token suffix per replica, but shingles are word TRIGRAMS — a doc
  * with S shingles shares ~S of them with its own replicas, so
  * cross-replica Jaccard ≈ S/(S+6) ≥ 0.6 for any doc longer than ~15
  * shingles. Replicas of one doc are then MUTUAL true near-dups and
  * the true-pair count grows as C(k,2)·docs — quadratic in k. The
  * plan is fine; the generator was measuring the data.
  *
  * The probe prints candidate and verified pair counts per k for both
  * generators: `suffix` (the old 3-token perturbation) and `bijection`
  * (every token tagged with the replica id — a per-replica token
  * bijection, so intra-replica Jaccard is EXACTLY preserved and
  * cross-replica shingle overlap is zero; true pairs grow k-linearly
  * by construction).
  *
  * Run: sbt "runMain graft.tools.LshScaleProbe"
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)

    def repSuffix(k: Int) = Seq.range(0, k).map(i => docs
        .withColumn("doc_id", col("doc_id") * k + i)
        .withColumn("text", concat(col("text"), lit(s" replica$i marker$i pad$i"))))
      .reduce(_ unionAll _)

    def repBijection(k: Int) = Seq.range(0, k).map(i => docs
        .withColumn("doc_id", col("doc_id") * k + i)
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1~r$i")))
      .reduce(_ unionAll _)

    for (k <- Seq(1, 2, 4, 8); (gen, d) <- Seq(
        "suffix" -> repSuffix(k), "bijection" -> repBijection(k))) {
      val t0 = System.nanoTime()
      val (cand, sh, _) = graft.operators.ScaleQueries.minhashParts(spark, d)
      val nCand = cand.count()
      val nTrue = graft.functions.TextShingles
        .verifyJaccard06(cand, sh).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"k=$k%d gen=$gen%-9s cand=$nCand%9d verified=$nTrue%9d time=$sec%7.2f s")
    }
    spark.stop()
  }
}
