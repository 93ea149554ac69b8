package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once memo for VERIFIED PAIR-LIST artifacts consumed by eval
  * and tuning queries.
  *
  * At 100 TB the dedup pipeline's outputs — the PPJoin-verified
  * near-dup truth set, the simhash/minhash candidate sets — are
  * persisted tables: precision/recall evals and banding-shape tuning
  * PROBE those artifacts, they do not re-run the pipeline per eval.
  * This memo gives the single-process harness the same shape: the
  * first consumer materializes the pair list (its internal
  * localCheckpoint already holds the heavy stages), later consumers
  * reuse the frame.
  *
  * Scope discipline (same contract as [[IndexCache]]'s scaladoc): a
  * DECLARED query never serves its own result from this cache —
  * llm_dedup_near / llm_dedup_simhash / llm_dedup_minhash_lsh build
  * their pipelines on every invocation, so their bench timings measure
  * the declared computation. Only DERIVED consumers (llm_dedup_pr,
  * llm_dedup_lsh_recall, llm_lsh_tuning, llm_dedup_degree,
  * graph_bfs_hops, and the cluster-label build shared by
  * llm_dedup_cluster / llm_cluster_stats) read the artifact, exactly
  * as the ANN probes read the memoized codebook. `PlanCapture.enable()`
  * clears the underlying cache, so the plan guard always audits fresh
  * builds, and DeterminismSpec's double-run re-executes them.
  */
object PairArtifacts {

  /** The artifact for `name`'s pair list over `dir`, built on first
    * use via `build` (the declared query's own pipeline). With
    * `spark.graft.artifactRoot` set the verified pair list persists as
    * a versioned parquet table ([[ArtifactStore]]) — the production
    * shape, where evals probe the STORED truth set across jobs. */
  def of(s: SparkSession, dir: String, name: String)
        (build: => DataFrame): DataFrame =
    IndexCache.cached(s, s"pairs.$name:$dir") {
      ArtifactStore.durable(s, dir, s"pairs.$name")(build)
    }
}
