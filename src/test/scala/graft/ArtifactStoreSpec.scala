package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{ArtifactStore, IndexCache}

/** The durable-artifact contract (r12 verdict item 3): with
  * `spark.graft.artifactRoot` set, the build-once artifact family —
  * the unigram/docfreq token ledgers, the verified pair lists, the ANN
  * index — persists as versioned parquet, and a SECOND SparkSession
  * reads the persisted form (building NOTHING) while producing
  * hash-identical consumer output. This is the cross-session
  * amortization a 100 TB pipeline relies on: tokenize/verify/Lloyd
  * once, then every later JOB probes the stored tables.
  *
  * Proven consumers span all four artifact families:
  *  - `llm_yule_k`          — tokens.unigram (byLang rollup)
  *  - `llm_tfidf_topterms`  — tokens.docfreq (dfGlobal rollup)
  *  - `llm_dedup_pr`        — pairs.near (the PPJoin truth set)
  *  - `llm_ann_ivf`         — ann.index.vectors + ann.index.centroids
  *  - `llm_cluster_stats`   — cluster.labels (+ pairs.simhash, its input)
  */
class ArtifactStoreSpec extends AnyFunSuite {
  import TestSpark._

  private val names =
    Seq("llm_yule_k", "llm_tfidf_topterms", "llm_dedup_pr", "llm_ann_ivf",
      "llm_cluster_stats")

  private def rows(s: SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(s, sf0001).collect().map(_.toString).toSeq.sorted

  private def deleteRec(p: java.io.File): Unit = {
    val fs = p.listFiles
    if (fs != null) fs.foreach(deleteRec)
    p.delete()
  }

  test("a second SparkSession reads persisted artifacts load-only with hash-identical output") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-artifact-store").toFile
    try {
      // Reference: the default path — no store, fresh in-session builds.
      IndexCache.clear()
      ArtifactStore.drainActions()
      val fresh = names.map(n => n -> rows(spark, n)).toMap
      assert(ArtifactStore.drainActions().isEmpty,
        "with no artifactRoot configured the store must stay inert")

      // Session 1: builds and persists (its consumers already read the
      // re-read persisted frames — the round trip is proven on first use).
      val s1 = spark.newSession()
      s1.conf.set(ArtifactStore.RootFlag, root.getAbsolutePath)
      val viaBuild = names.map(n => n -> rows(s1, n)).toMap
      val acts1 = ArtifactStore.drainActions().toMap
      val families1 = acts1.keySet.map(_.split(':')(0))
      assert(Set("tokens.unigram", "tokens.docfreq", "pairs.near",
        "ann.index.vectors", "ann.index.centroids", "cluster.labels",
        "pairs.simhash").subsetOf(families1),
        s"session 1 should persist every artifact family, got $families1")
      assert(acts1.values.forall(_ == "built"),
        s"session 1 starts from an empty store — everything builds: $acts1")
      assert(viaBuild == fresh,
        "consumer output through the freshly-persisted store diverged from the default path")

      // Session 2: a distinct SparkSession (own conf, own IndexCache
      // keys) — must LOAD every artifact and build none.
      val s2 = spark.newSession()
      s2.conf.set(ArtifactStore.RootFlag, root.getAbsolutePath)
      val viaLoad = names.map(n => n -> rows(s2, n)).toMap
      val acts2 = ArtifactStore.drainActions().toMap
      assert(acts2.nonEmpty && acts2.values.forall(_ == "loaded"),
        s"the second session must be load-only, got $acts2")
      assert(acts2.keySet.map(_.split(':')(0)) == families1,
        s"the second session should read exactly what the first persisted: $acts2")
      assert(viaLoad == fresh,
        "persisted-artifact consumer output diverged from the fresh-build output")
    } finally {
      // durable-built artifacts must not leak into other suites' runs
      IndexCache.clear()
      ArtifactStore.drainActions()
      deleteRec(root)
    }
  }

  test("store paths are versioned and corpus-keyed") {
    val p = ArtifactStore.path("/store", "/root/testdata/sf0.1", "tokens.unigram")
    assert(p == s"/store/root_testdata_sf0.1/tokens.unigram/${ArtifactStore.Version}")
    // two corpora never collide under one root
    assert(ArtifactStore.path("/store", "/root/testdata/sf0.01", "tokens.unigram") != p)
  }
}
