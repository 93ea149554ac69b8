package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-(session, data-dir) memo for build-once INDEX artifacts.
  *
  * The ANN family (llm_ann_ivf / llm_ann_multiprobe / llm_ann_recall /
  * llm_knn_join) shares one k-means coarse quantizer. At 100 TB that
  * index is built once and persisted (cells as a partition key of the
  * stored table); every query is a probe against it. Rebuilding the
  * codebook inside each declared query — the round-3 state before this
  * cache — is the one place the single-process test harness diverged
  * from the production shape. This memo restores build-once semantics:
  * the first query against a data dir builds and checkpoints the index,
  * later queries probe the materialized artifact.
  *
  * Scope: artifacts that a production pipeline would PERSIST and probe
  * rather than recompute per query — the ANN codebook (centroids, cell
  * assignments, per-vector angle table), verified pair lists
  * ([[PairArtifacts]]), and the converged duplicate-cluster label
  * table. A query family's FIRST consumer in a session pays the full
  * build; derived consumers read the materialized artifact, the same
  * access pattern they would have against the stored table at 100 TB.
  *
  * Bench interplay: the warm-up pass populates this memo, so `Bench`
  * calls [[clear]] between its warm-up and timed loops — the first
  * TIMED consumer of each artifact then pays the full build, making
  * every declared computation measured exactly once in the timed loop
  * (without the clear, every timed consumer would be a cache hit and
  * the builds would never be measured at all).
  *
  * Guard interplay: `PlanCapture.enable()` clears this cache, so plan
  * capture always observes a fresh build (the guard can never be
  * blinded by a pre-built index), and DeterminismSpec's double-run
  * clears it between runs so run 2 re-executes the build.
  */
object IndexCache {

  private val cache =
    scala.collection.mutable.HashMap[(SparkSession, String), AnyRef]()
  // wall-clock seconds each artifact's build took since the last
  // clear() — Bench reads this to attribute build cost separately from
  // query cost in bench_out.json (r6 verdict item 3: 17.4 s for
  // graph_bfs_hops must read as "near-pair build + 1.7 s query")
  private val buildSecs =
    scala.collection.mutable.LinkedHashMap[String, Double]()

  /** Build-or-reuse `key`'s artifact for session `s`. The lock is held
    * across the build (eager checkpoint included) — correct and simple;
    * builders are reentrant on the same thread (JVM monitors). */
  def cached[T <: AnyRef](s: SparkSession, key: String)(build: => T): T =
    synchronized {
      cache.get((s, key)) match {
        case Some(v) => v.asInstanceOf[T]
        case None =>
          val t0 = System.nanoTime()
          val v = build
          buildSecs(key) = (System.nanoTime() - t0) / 1e9
          cache.put((s, key), v.asInstanceOf[AnyRef])
          v
      }
    }

  /** Build wall-clock seconds per artifact key since the last clear(),
    * in build order. */
  def buildTimes: Seq[(String, Double)] = synchronized(buildSecs.toSeq)

  /** Drop every cached artifact (plan-capture and determinism tests)
    * and the build-time ledger. */
  def clear(): Unit = synchronized { cache.clear(); buildSecs.clear() }
}
