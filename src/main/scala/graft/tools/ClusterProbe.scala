package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch: pair count / convergence behavior of llm_dedup_cluster. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val pairs = graft.operators.ScaleQueries.queries("llm_dedup_simhash")(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
        .localCheckpoint(true)
      var labels = edges.select(col("a").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint(true)
      var changed = 1L; var iter = 0
      while (changed > 0 && iter < 100) {
        val nbr = edges.join(labels.withColumnRenamed("node", "b"), "b")
          .select(col("a").as("node"), col("label"))
        val next = labels.union(nbr).groupBy("node").agg(min("label").as("label"))
          .localCheckpoint(true)
        changed = next.join(labels.withColumnRenamed("label", "prev"), "node")
          .where(col("label") < col("prev")).count()
        labels = next; iter += 1
      }
      val nClusters = labels.select("label").distinct().count()
      println(s"== $dir pairs=${pairs.count()} nodes=${labels.count()} clusters=$nClusters itersToConverge=$iter")
    }
    spark.stop()
  }
}
