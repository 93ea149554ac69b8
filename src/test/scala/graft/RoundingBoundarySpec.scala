package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BoundaryGuard

/** Rounding-boundary hazard gate (VERDICT r8 item 2).
  *
  * Every declared query's `round(double, n)` sites are rewritten into
  * boundary-measuring expressions and executed end-to-end at sf0.001;
  * a pre-round value landing within the margin of a `.5×10⁻ⁿ` boundary
  * (0.5 ulp for exact IEEE chains, 16 ulp for libm-tainted chains —
  * see BoundaryGuard's scaladoc for the derivation) fails the suite.
  * The r9 build additionally runs the full sweep at sf0.01 and sf0.1
  * via `graft.tools.BoundarySweep` each round (recorded in
  * SCALING.md); this spec is the per-build regression gate.
  *
  * The five r9 refactors this gate forced (win_adx,
  * win_seasonal_decompose, graph_modularity, llm_dsir_weights,
  * agg_bootstrap_se) were all the SYSTEMATIC class: a terminating
  * rational (÷2/4/5, an 8dp decimal sum, mean±1.96·se) landing exactly
  * on a 6dp half boundary, where Spark's shortest-string rounding and
  * DuckDB's binary rounding may disagree on the same double.
  */
class RoundingBoundarySpec extends AnyFunSuite {
  import TestSpark._

  test("no declared query rounds a double within hazard distance of a " +
    "half boundary at sf0.001") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    var executed = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val (sites, _) = BoundaryGuard.sweep(spark, name, fn(spark, sf0001))
        if (sites > 0) executed += 1
      } catch {
        case e: Throwable =>
          val msg = (Option(e.getMessage) ++
            Option(e.getCause).flatMap(c => Option(c.getMessage)))
            .mkString(" | ")
          failures += s"$name: ${msg.linesIterator.take(1).mkString}"
      }
    }
    assert(failures.isEmpty,
      s"boundary hazards in ${failures.size} queries:\n${failures.mkString("\n")}")
    // the guard only bites if it actually executes rewritten plans
    assert(executed > 100, s"only $executed queries had Round(double) sites")
  }
}
