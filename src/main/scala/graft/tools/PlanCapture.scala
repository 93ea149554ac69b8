package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Pre-checkpoint plan capture for the plan-shape guard.
  *
  * The heavy dedup / ANN builders eagerly `localCheckpoint(true)` their
  * reused intermediates, which makes the final query plan show only a
  * checkpoint scan — PlanGuardSpec's no-cartesian/no-BNLJ assertions
  * could not see inside those stages (round-2 verdict item 6). Builders
  * now route every about-to-be-checkpointed DataFrame through
  * [[Materialize.eager]] (which calls `stage(tag, df)` before the
  * checkpoint): a no-op in production, and under an enabled
  * capture (PlanGuardSpec) it records the stage's PHYSICAL plan before
  * the checkpoint erases it, so the guard asserts on exactly the plan
  * that executes at construction time.
  *
  * Capture cost when enabled is planning only (executedPlan), never
  * execution; when disabled the field read is the whole overhead.
  */
object PlanCapture {

  @volatile private var enabled = false
  private val buf = scala.collection.mutable.ArrayBuffer[(String, SparkPlan)]()

  // clearing IndexCache guarantees capture sees fresh builds — a
  // pre-built memoized index would otherwise skip its staged plans
  def enable(): Unit = synchronized { enabled = true; buf.clear(); IndexCache.clear() }
  def disable(): Unit = synchronized { enabled = false }

  /** Record `df`'s physical plan under `tag` if capture is on; returns
    * `df` unchanged. Builders normally reach this through
    * `Materialize.eager("x", df)`, which stages then checkpoints. */
  def stage(tag: String, df: DataFrame): DataFrame = {
    if (enabled) {
      val plan = df.queryExecution.executedPlan
      synchronized { buf += ((tag, plan)) }
    }
    df
  }

  /** Stages recorded since the last enable(). */
  def captured: Seq[(String, SparkPlan)] = synchronized(buf.toList)
}
