package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine determinism helpers (SURVEY.md §7.2).
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL, so every declared query must be bit-deterministic across
  * engines:
  *  - money/quantity sums go through decimal(18,2) (exact, order-free)
  *    and come back out as double (identical nearest-double on both sides);
  *  - averages are exact-decimal-sum / count in double (one IEEE division);
  *  - inherently inexact stats (stddev, corr, cosine) are round(x, 4);
  *  - every query ends in a total ORDER BY with a unique tiebreak.
  */
object QueryUtils {
  /** The harness query signature: (session, sfDir) => result. */
  type QFn = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a double money column, as double. */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact-sum average: decimal sum / count, one double division. */
  def decAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))

  /** round to 4 for inherently order-dependent float aggregates. */
  def r4(c: Column): Column = round(c, 4)

  /** md5-derived 60-bit non-negative int of a key column — THE shared
    * deterministic-hash idiom (sampling, sharding, splits). Engine-
    * portable: DuckDB computes the same via
    * `('0x'||substr(md5(x),1,15))::BIGINT`. One definition on purpose:
    * llm_sample_hash / llm_shard_assign / llm_split_train /
    * llm_curate_e2e must stay bit-identical to each other — a drifted
    * copy would silently desynchronize split assignment across
    * operators while each still matches its own oracle. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** Whitespace token count of the `text` column, empty tokens dropped
    * (matches the DuckDB `len(list_filter(string_split(text,' '),
    * x -> x <> ''))` oracle idiom). */
  def nTok: Column =
    size(filter(split(col("text"), " "), t => t =!= "")).cast("long")

  /** Runtime guard for the bounded-broadcast-ledger idiom (r11 ADVICE):
    * passes `value` through while the enclosing frame stays within
    * `bound` rows, raises a loud error otherwise. The count rides an
    * unpartitioned window — legal ONLY over a bounded AGGREGATED
    * intermediate (the PlanGuard-permitted class; data-scaled inputs
    * must never flow through this) — and the guard is folded into the
    * value column itself. The bound is on the frame's TOTAL row count,
    * not a per-group domain size (the window is unpartitioned by
    * design — it must pull the whole frame into one task, which is
    * exactly why only bounded intermediates may flow through it);
    * callers guarding a per-group assumption must size `bound` as
    * groups × per-group domain. CALLER CONTRACT: the guarded column
    * must be LOAD-BEARING (consumed downstream, as agg_quadrant_corr
    * sums its ledger count) — Catalyst prunes a guarded column nothing
    * reads, guard included (pinned in QueryUtilsSpec). The contract is
    * ENFORCED per query by PlanGuardSpec (r12 ADVICE): every guard
    * built during a declared query's construction registers its marker
    * here, and the spec asserts the marker survives into the final or
    * a staged physical plan — a pruned guard fails the suite. On a
    * live column, a violated domain assumption fails at
    * materialization (broadcast build) time instead of silently
    * inflating an O(d²) join. */
  def boundedLedgerGuard(value: Column, bound: Int, what: String): Column = {
    import org.apache.spark.sql.expressions.Window
    synchronized { guardMarkers += what }
    val ndom = count(lit(1)).over(Window.partitionBy())
    when(ndom <= lit(bound), value)
      .otherwise(raise_error(lit(
        s"$what: bounded-ledger assumption exceeded (> $bound rows)")))
  }

  // Construction-time registry of guard markers: PlanGuardSpec drains
  // this around each declared query's build and asserts every marker
  // registered during the build is still present in an inspected plan
  // (guard-liveness — the load-bearing-column contract, enforced).
  private val guardMarkers = scala.collection.mutable.ArrayBuffer[String]()

  /** Markers of every [[boundedLedgerGuard]] constructed since the
    * last drain, oldest first; clears the registry. */
  def drainGuardMarkers(): Seq[String] =
    synchronized { val r = guardMarkers.toList; guardMarkers.clear(); r }
}
