package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: candidate volumes in the prefix-filter near-dup join
  * (lexicographic vs frequency-ordered prefixes). */
object CandStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.TextShingles.mkShingles
    val sh = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), mkShingles(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
    val ex = sh.select(col("doc_id"), col("n"), explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull)
    val dfs = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
    val pref = ex.join(dfs, "s")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("n") - ceil(col("n") * lit(0.6)).cast("int") + 1)
      .select("doc_id", "s")
    println("prefix_rows=" + pref.count())
    val pa = pref.select(col("doc_id").as("a_id"), col("s"))
    val pb = pref.select(col("doc_id").as("b_id"), col("s"))
    val raw = pa.join(pb, "s").where(col("a_id") < col("b_id"))
    println("raw_cand=" + raw.count())
    println("dist_cand=" + raw.select("a_id", "b_id").distinct().count())
    spark.stop()
  }
}
