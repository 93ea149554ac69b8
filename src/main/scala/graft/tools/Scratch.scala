package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared scratch-directory scheme for source round-trip queries
  * (json/csv/xml/text write-then-read-back paths).
  *
  * java.io.tmpdir + the FULL sanitized sf path (distinct corpora that
  * share a basename can never clobber each other) + the Spark
  * application id, so two concurrent runs against the same dataset —
  * e.g. Bench and the test harness — never race on one directory with
  * mode=overwrite (ADVICE r8). Within one session the path is stable,
  * so repeated invocations of the same query still reuse/overwrite
  * their own scratch. */
object Scratch {
  def dir(s: SparkSession, kind: String, dataDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
      dataDir.replaceAll("[^A-Za-z0-9.]", "_") + "_" +
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9.-]", "_")
}
