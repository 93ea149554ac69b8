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
  * Scope is deliberately narrow: ONLY infrastructure whose output is
  * not itself a declared query result may be cached here (codebook
  * centroids, cell assignments, the per-vector angle table). A declared
  * query's own output (e.g. llm_dedup_cluster's converged labels) must
  * never be memoized — its bench timing has to measure the computation
  * it declares, not a cache hit.
  *
  * Guard interplay: `PlanCapture.enable()` clears this cache, so plan
  * capture always observes a fresh build (the guard can never be
  * blinded by a pre-built index), and DeterminismSpec's double-run
  * clears it between runs so run 2 re-executes the build.
  */
object IndexCache {

  private val cache =
    scala.collection.mutable.HashMap[(SparkSession, String), AnyRef]()

  /** Build-or-reuse `key`'s artifact for session `s`. The lock is held
    * across the build (eager checkpoint included) — correct and simple;
    * builders are reentrant on the same thread (JVM monitors). */
  def cached[T <: AnyRef](s: SparkSession, key: String)(build: => T): T =
    synchronized {
      cache.getOrElseUpdate((s, key), build.asInstanceOf[AnyRef])
        .asInstanceOf[T]
    }

  /** Drop every cached artifact (plan-capture and determinism tests). */
  def clear(): Unit = synchronized(cache.clear())
}
