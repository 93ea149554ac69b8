package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.sortedIntersectCount

/** Shared shingling + exact-Jaccard verification kernel for the
  * near-dup family (prefix-filter join, MinHash-LSH, banded SimHash).
  */
object TextShingles {

  /** Sorted distinct 3-token shingles per doc, as a compiled Scala UDF.
    *
    * Why a UDF and not `transform(sequence(...))`: higher-order builtins
    * interpret their lambda per element, and — worse — the generator's
    * implicit `size(...)>0` filter gets predicate-pushed below the
    * projection, duplicating the whole shingle expression ~4× per row
    * (measured 5 s vs 0.2 s on sf0.1). The UDF runs compiled string ops
    * and is marked non-deterministic solely to stop the optimizer from
    * duplicating it into pushed-down filters; its output is deterministic.
    */
  val mkShingles: UserDefinedFunction = udf { text: String =>
    val t = text.split(' ')
    if (t.length < 3) Array.empty[String]
    else Array.range(0, t.length - 2)
      .map(i => t(i) + " " + t(i + 1) + " " + t(i + 2))
      .distinct.sorted
  }.asNondeterministic()

  /** Verify candidate pairs against exact shingle Jaccard >= 0.6.
    *
    * `cand` = (a_id, b_id) candidate pairs; `sh` = (doc_id, sh: sorted
    * distinct shingles, n: size). The shingle table is broadcast (small
    * dim vs the pair stream); verification is one merge-pass
    * SortedIntersectCount per candidate, and the 0.6 threshold is the
    * integer-exact `10·|∩| >= 6·|∪|` so no float boundary can diverge
    * from the DuckDB oracle. Output: (doc_a, doc_b, jaccard), totally
    * ordered in a single partition (the result is tiny; a global orderBy
    * would range-sample and re-run the whole pipeline).
    */
  def verifyJaccard06(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sa = sh.select(col("doc_id").as("a_id"), col("sh").as("a_sh"), col("n").as("na"))
    val sb = sh.select(col("doc_id").as("b_id"), col("sh").as("b_sh"), col("n").as("nb"))
    cand.join(broadcast(sa), "a_id").join(broadcast(sb), "b_id")
      .select(col("a_id"), col("b_id"),
        sortedIntersectCount(col("a_sh"), col("b_sh")).as("inter"),
        col("na"), col("nb"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter") * 10 >= col("uni") * 6)
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .repartition(1).sortWithinPartitions("doc_a", "doc_b")
  }

  /** DuckDB CTE producing the same per-doc shingle sets (oracle side). */
  val duckShingleCte: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') tok FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tok) - 2),
      |        i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) sh FROM t)""".stripMargin
}
