package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression, Round, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Round-boundary hazard detection (VERDICT r8 item 2).
  *
  * The r8 driver run proved that `round(<raw double>, N)` on an emitted
  * column is environment-sensitive. Two distinct failure modes:
  *
  *  1. **String-vs-binary rounding of the SAME double.** Spark rounds
  *     the shortest-decimal string (`BigDecimal.valueOf`), DuckDB the
  *     binary value; they can disagree only when the double sits within
  *     ~0.5 ulp of a `.5×10⁻ᴺ` boundary. This happens SYSTEMATICALLY
  *     when the true rational is exactly on the boundary (e.g. a /2 of
  *     an odd 6dp value rounded at 6dp) — the double then lands
  *     sub-ulp-close every time. Margin tier: [[BoundaryGuard.MarginUlpsExact]].
  *  2. **libm drift upstream.** Java Math.pow/log vs DuckDB's libm are
  *     only ≤1-ulp-accurate (not correctly rounded), so a chain through
  *     pow/ln/exp can shift the pre-round double by a few ulps across
  *     engines — win_macd's r8 failure. Sqrt and all +−×/ are IEEE
  *     correctly rounded and carry NO cross-engine drift. Margin tier:
  *     [[BoundaryGuard.MarginUlpsLibm]] for any round whose input
  *     dataflow contains a libm function.
  *
  * [[BoundaryGuard.sweep]] rewrites every `Round(child: double, n)` in
  * a query's analyzed plan into a [[BoundaryGuardedRound]] that
  * measures, per evaluated row, the EXACT decimal distance from the
  * pre-round double to the nearest half boundary and throws when the
  * distance is positive but below the site's margin tier. Distance
  * exactly zero is SAFE: the double then represents the boundary
  * exactly and both engines round half away from zero. libm taint is
  * propagated bottom-up through plan aliases (Project/Aggregate/Window
  * all bind computed columns via Alias), so a `round(col("t"), 6)`
  * whose `t` was produced by an earlier pow-bearing withColumn is
  * correctly classified into the libm tier.
  */
object BoundaryGuard {

  /** Margin (in ulps of the boundary-scaled value) for rounds with no
    * libm link. Without libm every op in the chain is IEEE correctly
    * rounded, so both engines hold the IDENTICAL double; divergence
    * then requires the shortest-decimal string to sit on the other
    * side of (or exactly on) the boundary, which is possible iff the
    * boundary lies inside the double's 0.5-ulp rounding interval.
    * dist ≥ 0.5 ulp is therefore PROVABLY safe; below it, the true
    * rational is in practice exactly on the boundary (the systematic
    * win_macd class). */
  val MarginUlpsExact = 0.5

  /** Margin for rounds whose input dataflow passes through a libm
    * function (pow/ln/exp/trig — NOT sqrt): realistic cross-engine
    * drift is 1–2 ulp per libm link through a short fixed-order chain;
    * 16 ulp gives 8–16× headroom. */
  val MarginUlpsLibm = 16.0

  /** Catalyst expression classes evaluated via libm (≤1-ulp accurate,
    * engine-build-dependent). Sqrt is correctly rounded — excluded. */
  private val LibmClasses = Set(
    "Pow", "Logarithm", "Log", "Log2", "Log10", "Log1p",
    "Exp", "Expm1", "Sin", "Cos", "Tan", "Asin", "Acos", "Atan",
    "Atan2", "Sinh", "Cosh", "Tanh", "Hypot", "Cbrt")

  private val Half = new java.math.BigDecimal("0.5")

  /** Throws if x is hazardously close to (but not exactly on) a
    * half-up rounding boundary at `scale` decimal places. */
  def check(x: Double, scale: Int, marginUlps: Double, tag: String): Unit = {
    if (!java.lang.Double.isFinite(x)) return
    // exact decimal image of the binary double, shifted to boundary units
    val y = new java.math.BigDecimal(x).movePointRight(scale)
    val frac = y.remainder(java.math.BigDecimal.ONE).abs
    val dist = frac.subtract(Half).abs
    if (dist.signum == 0) return // exactly on the boundary: both engines agree
    val ulp = math.ulp(math.abs(x) * math.pow(10, scale))
    val margin = marginUlps * ulp
    if (dist.doubleValue() < margin)
      throw new IllegalStateException(
        f"rounding-boundary hazard [$tag]: x=$x%.17g dp=$scale " +
          f"dist=${dist.doubleValue()}%.3e (${dist.doubleValue() / ulp}%.2f ulp) " +
          f"margin=$marginUlps%.2f ulp")
  }

  private def usesLibm(e: Expression, tainted: mutable.Set[Long]): Boolean =
    e.exists {
      case a: AttributeReference => tainted.contains(a.exprId.id)
      case other => LibmClasses.contains(other.getClass.getSimpleName)
    }

  /** Rewrites double-typed Rounds in `df`'s plan to guarded rounds and
    * executes the result end-to-end; returns (sites, libmSites). */
  def sweep(spark: SparkSession, name: String, df: DataFrame): (Int, Int) = {
    var sites = 0
    var libmSites = 0
    val tainted = mutable.Set.empty[Long]
    val guarded = df.queryExecution.analyzed.transformUp { case node =>
      val rewritten = node.transformExpressionsUp {
        case r: Round if r.child.dataType == DoubleType =>
          r.scale match {
            case Literal(s: Int, _) =>
              sites += 1
              val libm = usesLibm(r.child, tainted)
              if (libm) libmSites += 1
              BoundaryGuardedRound(
                r.child, s,
                if (libm) MarginUlpsLibm else MarginUlpsExact, name)
            case _ => r
          }
      }
      // propagate libm taint through this node's named outputs
      rewritten.expressions.foreach { e =>
        e.foreach {
          case a: Alias if usesLibm(a.child, tainted) =>
            tainted += a.exprId.id
          case _ => ()
        }
      }
      rewritten
    }
    if (sites > 0) spark.sessionState.executePlan(guarded).toRdd.count()
    (sites, libmSites)
  }
}

/** Drop-in Round(child: double, scale) replacement that measures the
  * exact boundary distance of every evaluated input before emitting the
  * same shortest-decimal-string half-up result Spark's Round produces.
  * CodegenFallback on purpose — this runs only in the guard sweep, not
  * in any declared query path. */
case class BoundaryGuardedRound(
    child: Expression, scale: Int, marginUlps: Double, tag: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Double]
    if (!java.lang.Double.isFinite(x)) x
    else {
      BoundaryGuard.check(x, scale, marginUlps, tag)
      java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    }
  }
}

/** CLI sweep over declared queries: `BoundarySweep <sfDir> [name ...]`
  * (no names = the full surface). Prints one line per query with
  * Round(double) site counts and exits non-zero on any hazard. */
object BoundarySweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var hazards = 0
    var executed = 0
    for (n <- names) {
      try {
        val (sites, libm) =
          BoundaryGuard.sweep(spark, n, graft.SparkEntry.queries(n)(spark, sfDir))
        if (sites > 0) {
          executed += 1
          println(s"[boundary] OK $n sites=$sites libm=$libm")
        }
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("") +
            Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
          hazards += 1
          println(s"[boundary] HAZARD $n: ${msg.linesIterator.take(1).mkString}")
      }
    }
    println(s"[boundary] swept=${names.size} executed=$executed hazards=$hazards")
    spark.stop()
    if (hazards > 0) sys.exit(1)
  }
}
