package graft.tools
import org.apache.spark.sql.SparkSession
object PlanNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.PipelineQueries.queries("llm_dedup_ngram")(spark, "/root/testdata/sf0.01")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(p).length)
    println("EXCHANGE_COUNT=" + "Exchange".r.findAllIn(p).length)
    println("GRAM_KERNEL_COUNT=" + "chargramarray".r.findAllIn(p.toLowerCase).length)
    spark.stop()
  }
}
