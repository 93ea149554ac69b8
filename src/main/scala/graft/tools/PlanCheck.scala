package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector for the dedup family: counts shingle-kernel
  * evaluations and broadcast exchanges in the physical plan, so scale
  * regressions (pinned corpus broadcasts, duplicated kernels via pushed
  * filters) are visible without reading full explain output.
  * Run: sbt "runMain graft.tools.PlanCheck [query ...]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("llm_dedup_near", "llm_dedup_minhash_lsh", "llm_dedup_simhash", "llm_dedup_embcos")
    for (name <- names) {
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val nShingle = "shinglearray".r.findAllIn(plan.toLowerCase).size
      val nBcastJoin = "BroadcastHashJoin".r.findAllIn(plan).size
      val nBcastExch = "BroadcastExchange".r.findAllIn(plan).size
      val nLoop = "CartesianProduct|BroadcastNestedLoop".r.findAllIn(plan).size
      println(s"== $name shingleArray=$nShingle bcastHashJoin=$nBcastJoin " +
        s"bcastExchange=$nBcastExch nestedLoopOrCartesian=$nLoop")
    }
    spark.stop()
  }
}
