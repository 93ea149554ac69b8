package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryUtils._
import graft.sources.Tables

/** Depth batch (round 2, batch 6): bigram language-model scoring (the
  * statistical perplexity proxy for corpus quality), a partitioned
  * parquet source with partition pruning, timezone-aware datetime
  * conversion, and argmin/argmax aggregates.
  *
  * Scale notes (100 TB):
  *  - `llm_bigram_score` is the classic two-pass count-then-score LM
  *    build: bigram occurrences (corpus-linear), two counting shuffles
  *    keyed by bigram/context (map-side combined), one join back to
  *    occurrences (shuffle on the same keys — co-partitioned with the
  *    counts), and a final per-doc aggregation. Everything grows
  *    linearly with the corpus; the model tables (distinct bigrams)
  *    grow sub-linearly and would be the broadcast side when they fit.
  *  - `source_partitioned_pruned` writes lang-partitioned parquet and
  *    reads two partitions back: the scan must show PartitionFilters
  *    (asserted in DepthSpec) — at 100 TB partition pruning IS the
  *    difference between scanning 2 TB and 100 TB.
  *  - `fn_datetime_tz` / `agg_argminmax` are map-only / one bounded
  *    aggregation respectively.
  */
object DepthQueries {

  /** Per-sfdir, app-id-salted scratch dir for the partitioned write
    * (shared scheme, see graft.tools.Scratch). */
  private def scratch(s: SparkSession, kind: String, dir: String): String =
    graft.tools.Scratch.dir(s, "depth_" + kind, dir)

  val queries: Map[String, QFn] = Map(

    // ---- bigram LM quality score ---------------------------------------
    // Per-doc mean log2 P(w_i | w_{i-1}) under the corpus's own MLE
    // bigram model (P = c(w1 w2) / c(w1 ·)) — the perplexity-proxy
    // quality score: templated/repeated text scores near 0, anomalous
    // word salad goes strongly negative. Per-bigram terms are rounded
    // to 6 places then summed as decimal(18,6), so the per-doc sum is
    // exact and order-free on both engines.
    // Bigram generation is the codegen'd BigramArray kernel (one tight
    // loop per row, order + duplicates preserved); the left context w1
    // is recovered from the bigram string itself (tokens cannot contain
    // the split character), saving a struct explode. explode_outer: no
    // inferred size(...) > 0 generator filter for the optimizer to push
    // below the projection (same move as the shingle call sites).
    "llm_bigram_score" -> ((s, dir) => {
      import graft.functions.TextShingles.mkBigrams
      val occ = Tables.documents(s, dir)
        .select(col("doc_id"), explode_outer(mkBigrams(col("text"))).as("bg"))
        .where(col("bg").isNotNull)
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val bgc = occ.groupBy("bg").agg(count(lit(1)).as("c2"))
      val ugc = occ.groupBy("w1").agg(count(lit(1)).as("c1"))
      occ.join(bgc, "bg").join(ugc, "w1")
        .select(col("doc_id"),
          round(log2(col("c2")) - log2(col("c1")), 6)
            .cast(DecimalType(18, 6)).as("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("term").as("s"))
        // avg as an EXACT signed half-up 1e-4 integer (BoundaryGuard
        // r9: s/n_bigrams with a 2-5-smooth bigram count terminates
        // and lands exactly on 4dp half boundaries)
        .withColumn("s6",
          (col("s") * 1000000).cast(DecimalType(38, 0)).cast("long"))
        .select(col("doc_id"), col("n_bigrams"),
          (expr("CASE WHEN s6 >= 0 " +
            "THEN (2 * s6 + 100 * n_bigrams) div (200 * n_bigrams) " +
            "ELSE -((2 * (-s6) + 100 * n_bigrams) div (200 * n_bigrams)) END")
            .cast("double") / 10000.0).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // ---- lang-partitioned parquet + partition pruning -------------------
    // Writes the corpus hive-partitioned by language, reads exactly two
    // partitions back, and aggregates. Correctness = equality with the
    // oracle over the canonical parquet; the plan-level guarantee (the
    // scan prunes to lang=en/fr via PartitionFilters, not a full scan +
    // filter) is asserted in DepthSpec.
    "source_partitioned_pruned" -> ((s, dir) => {
      val out = scratch(s, "part", dir)
      Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .where(col("lang").isin("en", "fr"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("lang", "source")
    }),

    // ---- timezone conversion --------------------------------------------
    // UTC order timestamps rendered as Tokyo wall clock, re-anchored
    // from New-York wall clock, and bucketed by Tokyo calendar date —
    // the multi-region reporting primitives. Order dates are midnight
    // UTC, so neither conversion ever lands in a DST gap.
    "fn_datetime_tz" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          from_utc_timestamp(col("o_orderdate"), "Asia/Tokyo").as("tokyo_wall"),
          to_utc_timestamp(col("o_orderdate"), "America/New_York").as("utc_of_ny"),
          to_date(from_utc_timestamp(col("o_orderdate"), "Asia/Tokyo"))
            .as("tokyo_date"))
        .orderBy("o_orderkey")
    }),

    // ---- incremental-crawl dedup -----------------------------------------
    // New-batch docs (doc_id % 3 == 0) are kept only if their exact text
    // hash is absent from the already-indexed corpus (doc_id % 3 != 0) —
    // the anti-join every recurring crawl runs before appending. One
    // shuffle co-partitioned on the md5 key; at 100 TB the index side
    // would first pass through a bloom filter, with this anti-join as
    // the exact confirm.
    "llm_dedup_incremental" -> ((s, dir) => {
      val hashed = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      val indexed = hashed.where(col("doc_id") % 3 =!= 0).select("h")
      val fresh = hashed.where(col("doc_id") % 3 === 0)
      fresh.join(indexed, Seq("h"), "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- rolling per-user window statistics ------------------------------
    // Trailing 7-event mean/min/max/stddev of the event value per user in
    // (ts, event_id) order — the moving-aggregate anomaly-detection
    // primitive. The mean is an exact decimal sum over the frame divided
    // once; stddev is r4 (both engines accumulate the same 7 doubles).
    "win_moving_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType => DT, DoubleType}
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-6, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          (sum(col("value").cast(DT(18, 4))).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("mavg7"),
          min("value").over(w).as("mmin7"),
          max("value").over(w).as("mmax7"),
          round(stddev_samp(col("value")).over(w), 4).as("msd7"))
        .orderBy("event_id")
    }),

    // ---- argmin / argmax aggregates -------------------------------------
    // Richest and poorest customer per market segment. The argmax key
    // packs (balance, custkey) into one bigint — balances are 2-decimal
    // money in [-999.99, 9999.99] (20 bits scaled), so
    // round(bal*100)*2^40 + custkey is a total order for any custkey
    // below 2^40 (~1.1e12, comfortably past 100 TB-scale key ranges;
    // max |pk| ~ 1e6*2^40 ≈ 1.1e18 < Long.Max) and the tie on equal
    // balances breaks deterministically on the key (the plain
    // max_by(x, bal) would be free to pick either duplicate).
    // The scaled balance is cast to LONG *before* the 2^40 shift so the
    // whole key stays in exact integer arithmetic — the packed value
    // needs ~60 significant bits, past double's 53, so a double-typed
    // round(bal*100)*(1L<<40) would collapse equal-balance custkeys in
    // the same ~256-wide bucket back into a nondeterministic tie.
    "agg_argminmax" -> ((s, dir) => {
      val packed = round(col("c_acctbal") * 100).cast("long") * (1L << 40) +
        col("c_custkey")
      Tables.customer(s, dir)
        .withColumn("pk", packed)
        .groupBy("c_mktsegment")
        .agg(
          max_by(col("c_custkey"), col("pk")).as("richest_custkey"),
          max(col("c_acctbal")).as("max_bal"),
          min_by(col("c_custkey"), col("pk")).as("poorest_custkey"),
          min(col("c_acctbal")).as("min_bal"))
        .orderBy("c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(

    "llm_bigram_score" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tok
        |  FROM documents),
        |occ0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(tok) - 1),
        |      i -> struct_pack(w1 := tok[i], bg := tok[i] || ' ' || tok[i+1]))) AS x
        |  FROM t WHERE len(tok) >= 2),
        |occ AS (SELECT doc_id, x.w1 AS w1, x.bg AS bg FROM occ0),
        |bgc AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg),
        |ugc AS (SELECT w1, count(*) AS c1 FROM occ GROUP BY w1),
        |per AS (SELECT doc_id,
        |    CAST(round(log2(c2) - log2(c1), 6) AS DECIMAL(18,6)) AS term
        |  FROM occ JOIN bgc USING (bg) JOIN ugc USING (w1)),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(term) * 1000000 AS BIGINT) AS s6
        |  FROM per GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST(CASE WHEN s6 >= 0
        |       THEN (2 * s6 + 100 * n_bigrams) // (200 * n_bigrams)
        |       ELSE -((2 * (-s6) + 100 * n_bigrams) // (200 * n_bigrams)) END
        |    AS DOUBLE) / 10000.0 AS avg_logp
        |FROM agg ORDER BY doc_id""".stripMargin,

    "source_partitioned_pruned" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // tz-independent oracle: the inner timezone('UTC', ts) anchors the
    // naive timestamp as a UTC instant and the outer timezone(tz, tstz)
    // renders a naive wall clock — neither consults DuckDB's session
    // TimeZone, so the oracle is correct on any host (a bare
    // ts::TIMESTAMPTZ cast would resolve via the session zone and
    // silently break off-UTC)
    "fn_datetime_tz" ->
      """SELECT o_orderkey,
        |  timezone('Asia/Tokyo', timezone('UTC', o_orderdate)) AS tokyo_wall,
        |  timezone('UTC', timezone('America/New_York', o_orderdate)) AS utc_of_ny,
        |  CAST(timezone('Asia/Tokyo', timezone('UTC', o_orderdate)) AS DATE) AS tokyo_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "llm_dedup_incremental" ->
      """WITH hashed AS (SELECT doc_id, lang, md5(text) AS h FROM documents),
        |indexed AS (SELECT h FROM hashed WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT * FROM hashed WHERE doc_id % 3 = 0)
        |SELECT doc_id, lang FROM fresh
        |WHERE h NOT IN (SELECT h FROM indexed)
        |ORDER BY doc_id""".stripMargin,

    "win_moving_stats" ->
      """SELECT event_id, user_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS mavg7,
        |  min(value) OVER w AS mmin7,
        |  max(value) OVER w AS mmax7,
        |  round(stddev_samp(value) OVER w, 4) AS msd7
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "agg_argminmax" ->
      """WITH p AS (SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(round(c_acctbal * 100) AS BIGINT) * 1099511627776 + c_custkey AS pk
        |  FROM customer)
        |SELECT c_mktsegment,
        |  max_by(c_custkey, pk) AS richest_custkey, max(c_acctbal) AS max_bal,
        |  min_by(c_custkey, pk) AS poorest_custkey, min(c_acctbal) AS min_bal
        |FROM p GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
