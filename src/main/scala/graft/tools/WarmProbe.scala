package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: does an sf0.001 warm-up warm the sf0.1 run of a query? */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(args(0))
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1", "/root/testdata/sf0.1", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"== $dir ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
