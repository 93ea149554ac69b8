package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

/** Exact integer weights for the unbounded daily 5/4-growth EWMA
  * family (win_ewma_daily, win_trix — win_macd carries its own
  * truncated-window table): day d ∈ 1..31 → 5^d·4^(31−d), the integer
  * image of (5/4)^d with the common denominator 4^31 cleared.
  *
  * r9 boundary hardening: the old form rounded `x·pow(1.25, day)`
  * per term — but 5^d·x with x an exact 6dp decimal is a TERMINATING
  * rational over a power-of-2 denominator, so the 6dp term rounds
  * land exactly on half boundaries systematically (the BoundaryGuard
  * FRAGILE class), and past day 22 `pow` itself is libm-drift-exposed
  * (the win_macd r8 driver failure). With these weights the window
  * sums are exact DECIMAL(38,0) integers and each EWMA is one signed
  * half-up integer division — no float link at all. Max weight
  * 5^31 ≈ 4.66e21; a micro-unit-weighted 31-term sum stays inside
  * DECIMAL(38,0)/HUGEINT up to daily sums ≈ 1e15 µu (≈ sf1000). */
object EwmaWeights {

  val L = 31

  val rows: Seq[(Long, BigInt)] =
    (1 to L).map(d => (d.toLong, BigInt(5).pow(d) * BigInt(4).pow(L - d)))

  /** (day, w: DECIMAL(38,0)) weight frame — broadcast it. */
  def df(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.map { case (d, w) => (d, w.toString) }.toDF("day", "w0")
      .select(col("day"), col("w0").cast(DecimalType(38, 0)).as("w"))
  }

  /** The same table as DuckDB VALUES rows (HUGEINT), margin-aligned
    * for a stripMargin oracle. */
  val valuesSql: String = rows.map { case (d, w) =>
    s"($d, CAST('$w' AS HUGEINT))"
  }.mkString(",\n      |    ")
}
