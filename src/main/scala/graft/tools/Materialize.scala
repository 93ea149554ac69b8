package graft.tools

import org.apache.spark.sql.DataFrame

/** Eager materialization of a reused pipeline intermediate — the one
  * idiom behind every "build once, consume N times" stage in the
  * engine (GlobalRank's ranged frame, the dedup shingle/prefix tables,
  * the ANN cell assignment, the iterative-graph frontier).
  *
  * Semantics: records the about-to-be-erased physical plan for
  * [[PlanCapture]] (so PlanGuardSpec can assert join/window shape on
  * the stage that actually executes), then checkpoints eagerly so the
  * stage runs exactly ONCE no matter how many lazy consumers branch
  * off it (two consumers of one `repartitionByRange` can otherwise
  * re-sample different boundaries — see GlobalRank's scaladoc).
  *
  * Durability: the default `localCheckpoint(true)` truncates lineage
  * to NON-REPLICATED executor-local blocks. On a real cluster that is
  * a deliberate trade: losing an executor (failure OR dynamic
  * allocation scale-in) after the checkpoint makes the blocks
  * unrecoverable and fails the job instead of recomputing. The
  * production form for a 100 TB run is a persisted intermediate table
  * or a reliable checkpoint; setting `spark.graft.reliableCheckpoint=
  * true` (with `SparkContext.setCheckpointDir` pointing at durable
  * storage) routes every eager stage through `Dataset.checkpoint`,
  * which survives executor loss. The single-JVM harness keeps the
  * local default — there is no executor to lose, and the reliable
  * path's extra write+read would only add noise to the bench.
  * SCALING.md §"Checkpoint durability" carries the full discussion;
  * ReliableCheckpointSpec executes the reliable path against all three
  * eager-stage families and pins byte-identical output.
  */
object Materialize {

  /** Session conf key: route eager stages through reliable
    * `checkpoint` instead of `localCheckpoint`. Requires a checkpoint
    * dir on durable storage. */
  val ReliableFlag = "spark.graft.reliableCheckpoint"

  /** Capture `df`'s physical plan under `tag`, then materialize it
    * eagerly (exactly-once execution for all downstream consumers). */
  def eager(tag: String, df: DataFrame): DataFrame = {
    val staged = PlanCapture.stage(tag, df)
    val reliable = df.sparkSession.conf
      .getOption(ReliableFlag).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) staged.checkpoint(eager = true)
    else staged.localCheckpoint(eager = true)
  }
}
