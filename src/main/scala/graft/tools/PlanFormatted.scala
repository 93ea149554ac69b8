package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for a list of declared queries
  * to files — the plan evidence for optimization rounds
  * (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.PlanFormatted <outDir> <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32) — matches Bench's session shape
  *      so the captured plan is the one the bench executes.
  */
object PlanFormatted {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        // "formatted" on the ANALYZED frame; for AQE plans this is the
        // initial physical plan (isFinalPlan=false), which is the plan
        // shape evidence the round docs reference
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(
          new java.io.File(outDir, s"$name.txt"), "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[plans] wrote $outDir/$name.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
