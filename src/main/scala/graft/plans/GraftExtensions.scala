package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharGramArray, FloatVecDot, ShingleArray, SortedIntersectCount}

/** Registers graft's custom Catalyst expressions as SQL functions.
  *
  * Two entry points:
  *  - config-time: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard SparkSessionExtensions hook), or
  *  - runtime: `GraftFunctions.register(spark)` on an existing session.
  *
  * After either, `spark.sql("SELECT vec_dot(a, b) ...")` plans the
  * codegen'd expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.vecDotDescriptor)
    e.injectFunction(GraftFunctions.sortedIntersectDescriptor)
    e.injectFunction(GraftFunctions.shinglesDescriptor)
    e.injectFunction(GraftFunctions.charGramsDescriptor)
    // isnotnull(kernel(x)) → isnotnull(x): keeps inferred constraints
    // from re-evaluating the text kernels inside parquet scan filters
    e.injectOptimizerRule(_ => KernelNullRule)
  }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<float> vectors as double"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1)))

  val sortedIntersectDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |a ∩ b| for sorted distinct array<string>"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1)))

  val shinglesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("shingles"),
      info("shingles",
        "shingles(text) - sorted distinct 3-token shingles (UTF-8 byte order) as array<string>"),
      (exprs: Seq[Expression]) => ShingleArray(exprs(0)))

  val charGramsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("char_grams"),
      info("char_grams",
        "char_grams(text) - sorted distinct character 20-grams (code-point windows, UTF-8 byte order) as array<string>"),
      (exprs: Seq[Expression]) => CharGramArray(exprs(0)))

  /** Runtime registration on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles", exprs => ShingleArray(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_grams", exprs => CharGramArray(exprs(0)), "scala_udf")
  }
}
