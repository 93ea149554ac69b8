package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, versioned parquet store for build-once artifacts — the
  * cross-SESSION completion of the amortization story [[IndexCache]]
  * (per-JVM memo) and [[Materialize]] (per-session checkpoint) start
  * (r12 verdict item 3).
  *
  * At 100 TB the vocabulary ledgers ([[TokenArtifacts]] unigram /
  * docfreq), the verified pair lists ([[PairArtifacts]]) and the ANN
  * index ([[graft.functions.AnnCodebook]]) are PERSISTED TABLES: a
  * pipeline materializes each once, and every later JOB — not merely
  * every later query in one session — reads the stored form. This
  * object is that path: point `spark.graft.artifactRoot` at a durable
  * directory (local, HDFS or object store — resolution goes through
  * the Hadoop FileSystem API) and every artifact build routes through
  * [[durable]]: present → read parquet, absent → build once, write,
  * and hand consumers the re-read persisted frame (so even the
  * building session consumes exactly what later sessions will read —
  * the round trip is proven on first use, not deferred).
  *
  * Layout: `<root>/<sanitized data dir>/<artifact name>/<version>/`.
  * The corpus directory is part of the key — one root can hold
  * artifacts for several scale factors without collision. `Version`
  * is bumped whenever an artifact's schema or build semantics change
  * (e.g. the tokenizer rule); old versions stay readable side-by-side,
  * so a pinned pipeline never has a stored table change under it.
  *
  * Default OFF: with no root configured, [[durable]] is the identity
  * — Bench, the plan guards and the determinism suite keep measuring
  * and auditing the real builds. Cross-session hash-identity of
  * consumer output (fresh build vs persisted read in a SECOND
  * SparkSession) is pinned by ArtifactStoreSpec.
  */
object ArtifactStore {

  /** Session conf key: root directory of the durable artifact store.
    * Unset (the default) = no persistence, builds run per-session. */
  val RootFlag = "spark.graft.artifactRoot"

  /** Store format version — bump on any artifact schema/semantics
    * change; see scaladoc. */
  val Version = "v1"

  // (key -> "built" | "loaded") since the last drain, in order —
  // observability for ArtifactStoreSpec's load-only proof and for
  // operators auditing which sessions paid which builds.
  private val acts =
    scala.collection.mutable.LinkedHashMap[String, String]()

  /** Actions since the last drain, oldest first; clears the log. */
  def drainActions(): Seq[(String, String)] =
    synchronized { val r = acts.toList; acts.clear(); r }

  private def record(key: String, what: String): Unit =
    synchronized { acts(key) = what }

  /** Store path for artifact `name` over corpus `dir` under `root`. */
  def path(root: String, dir: String, name: String): String = {
    val corpus = dir.replaceAll("[^A-Za-z0-9._-]", "_").replaceAll("^_+", "")
    s"$root/$corpus/$name/$Version"
  }

  /** Load-or-build-and-persist `name` for corpus `dir`: the identity
    * over `build` when no store root is configured; otherwise reads
    * the persisted parquet if present (committed `_SUCCESS` marker),
    * else runs `build` exactly once, writes it, and returns the
    * RE-READ persisted frame — consumers always see the stored form. */
  def durable(s: SparkSession, dir: String, name: String)
             (build: => DataFrame): DataFrame =
    s.conf.getOption(RootFlag).map(_.trim).filter(_.nonEmpty) match {
      case None => build
      case Some(root) =>
        val p = path(root, dir, name)
        val hp = new Path(p, "_SUCCESS")
        val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) {
          record(s"$name:$dir", "loaded")
          s.read.parquet(p)
        } else {
          val df = build
          df.write.mode("overwrite").parquet(p)
          record(s"$name:$dir", "built")
          s.read.parquet(p)
        }
    }
}
