package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; this
  * utility is the explicit fallback for pathological producer-side skew
  * (one key = 10% of a 100 TB fact table): the fact side gets a
  * deterministic per-row salt in [0, n), the dimension side is exploded
  * n×, and the join key becomes (key, salt) — spreading one hot key over
  * n reducers at the cost of replicating the smaller side n times.
  */
object SkewUtils {

  /** Equi-join `left ⋈ right` on leftKey = rightKey with an n-way salt.
    * Result equals the plain inner join (row-for-row, up to order).
    *
    * The salt is a deterministic hash over the salting columns (default:
    * every left column), so replays are reproducible — no rand().
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      n: Int, saltOn: Seq[Column] = Seq.empty): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // default salt: every hashable left column (maps are not hashable);
    // note that fully identical duplicate rows still share a salt — pass
    // an explicit high-cardinality saltOn if the hot key's rows are
    // byte-identical
    val saltCols =
      if (saltOn.nonEmpty) saltOn
      else left.schema.fields
        .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(f => col(f.name)).toSeq
    require(saltCols.nonEmpty, "no hashable columns to salt on; pass saltOn explicitly")
    val l = left.withColumn("__salt", pmod(xxhash64(saltCols: _*), lit(n.toLong)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), "inner")
      .drop("__salt")
  }
}
