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

  /** Store path for artifact `name` over corpus `dir` under `root`.
    * The sanitized corpus segment carries a short stable hash of the
    * RAW dir string (r13 ADVICE): sanitization alone is not injective
    * (`/a/b.c`, `/a_b.c`, `/a/b_c` all sanitize to `a_b.c`), and two
    * corpora must never share artifacts under one root.
    *
    * Corpus directories are treated as IMMUTABLE once an artifactRoot
    * points at them: the key does not fingerprint file contents, so
    * regenerating data at the same path requires a Version bump or a
    * fresh root. */
  def path(root: String, dir: String, name: String): String = {
    val corpus = dir.replaceAll("[^A-Za-z0-9._-]", "_").replaceAll("^_+", "")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"$root/$corpus-$tag/$name/$Version"
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
          // Atomic publish (r13 ADVICE, medium): build into a private
          // temp directory and RENAME into place, so two sessions
          // racing on one artifactRoot can never interleave part files
          // under a single _SUCCESS marker. Exactly one rename wins;
          // the loser discards its temp build and reads the winner's
          // committed table.
          val df = build
          val tmp = new Path(s"$p.tmp-${s.sparkContext.applicationId}" +
            s"-${java.util.UUID.randomUUID.toString.take(8)}")
          df.write.mode("overwrite").parquet(tmp.toString)
          val dst = new Path(p)
          fs.mkdirs(dst.getParent)
          // clear uncommitted debris (a crashed pre-commit build left a
          // directory without _SUCCESS); if a racer committed between
          // the outer check and here, the rename below simply loses
          if (fs.exists(dst) && !fs.exists(hp)) fs.delete(dst, true)
          val won = fs.rename(tmp, dst)
          if (won) record(s"$name:$dir", "built")
          else {
            fs.delete(tmp, true)
            if (!fs.exists(hp))
              sys.error(s"ArtifactStore: publish of $name:$dir lost the " +
                s"rename race but no committed table exists at $p")
            record(s"$name:$dir", "loaded")
          }
          s.read.parquet(p)
        }
    }
}
