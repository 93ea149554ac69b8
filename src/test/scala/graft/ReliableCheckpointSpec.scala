package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the shipped cluster-durability switch
  * (`spark.graft.reliableCheckpoint=true`, tools/Materialize.scala) —
  * the r7 verdict's top item: the flag routed every eager stage through
  * `Dataset.checkpoint(eager = true)` but no spec, tool, or bench run
  * had ever actually executed that path. A cluster user flipping the
  * documented production flag must not be the first execution.
  *
  * Coverage spans every Materialize.eager family:
  *  - `win_ntile_pct` — GlobalRank.withSeqAndCount's ranged frame;
  *  - `agg_ks_test` — GlobalRank.withRunningSums (per-group CDFs);
  *  - `llm_cluster_stats` — the converged dedup-cluster label artifact
  *    (IndexCache-memoized, so the cache is cleared first to force the
  *    build itself through the reliable path);
  *  - `llm_yule_k` — the r11 `tokens.unigram` frequency ledger;
  *  - `llm_idf_drift` — the r12 `tokens.docfreq` document-frequency
  *    ledger (both ledger BUILDS run through Dataset.checkpoint here).
  *
  * Contract: byte-identical rows vs the default localCheckpoint run,
  * and the checkpoint dir must actually receive RDD checkpoint data
  * (proving the reliable branch ran, not silently fell back).
  */
class ReliableCheckpointSpec extends AnyFunSuite {
  import TestSpark._

  private val names = Seq("win_ntile_pct", "agg_ks_test", "llm_cluster_stats",
    "llm_yule_k", "llm_idf_drift")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001).collect().map(_.toString).toSeq.sorted

  private def deleteRec(p: java.io.File): Unit = {
    val fs = p.listFiles
    if (fs != null) fs.foreach(deleteRec)
    p.delete()
  }

  test("reliableCheckpoint=true output is byte-identical to the localCheckpoint default") {
    // default path first, from a cold artifact memo
    graft.tools.IndexCache.clear()
    val local = names.map(n => n -> rows(n)).toMap

    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toFile
    try {
      spark.conf.set(graft.tools.Materialize.ReliableFlag, "true")
      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      // cold memo again: the artifact BUILDS (not just the final query
      // stages) must run through Dataset.checkpoint too
      graft.tools.IndexCache.clear()
      for (n <- names) {
        assert(rows(n) == local(n), s"$n diverged under reliableCheckpoint=true")
      }
      // the reliable branch must have written durable checkpoint data —
      // an empty dir would mean the flag silently fell back to local
      def countFiles(p: java.io.File): Int = {
        val fs = p.listFiles
        if (fs == null) 0 else fs.map(f => if (f.isDirectory) countFiles(f) else 1).sum
      }
      assert(countFiles(dir) > 0,
        "reliableCheckpoint=true wrote nothing to the checkpoint dir")
    } finally {
      spark.conf.unset(graft.tools.Materialize.ReliableFlag)
      // reliable-built artifacts must not leak into other suites' runs
      graft.tools.IndexCache.clear()
      deleteRec(dir)
    }
  }
}
