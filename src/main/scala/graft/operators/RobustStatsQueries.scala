package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils._
import graft.sources.Tables

/** §2.N — robust-statistics batch: max drawdown over per-customer
  * order sequences, cross-language vocabulary overlap, exact discrete
  * percentile bands, and trimmed means.
  *
  * Determinism notes (§7.2 conventions): every statistic here is
  * either pure integer arithmetic (ranks, counts, Jaccard numerators/
  * denominators), exact decimal (order totals, trimmed sums), or a
  * single final division — no interpolation, no non-correctly-rounded
  * libm calls. Percentile bands and trims pick elements at INTEGER
  * ranks under total orders, so the band edges are corpus elements,
  * not interpolated floats.
  */
object RobustStatsQueries {

  private val toks: org.apache.spark.sql.Column =
    filter(split(col("text"), " "), t => t =!= "")
  private val duckToks = "list_filter(string_split(text, ' '), x -> x <> '')"

  val queries: Map[String, QFn] = Map(

    // ---- max drawdown of order-value sequences --------------------------
    // Per customer, orders in (date, key) sequence: drawdown = running
    // peak order total minus current total; the customer's max
    // drawdown is the deepest drop after a peak ("biggest downgrade").
    // Summarized per market segment with exact decimal sums. Both
    // windows are customer-keyed; the segment aggregate is dim-sized.
    "win_max_drawdown" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_custkey"),
          col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = o.withColumn("peak", max("p").over(w))
        .withColumn("dd", col("peak") - col("p"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(max("dd").as("max_dd"))
      dd.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          count_if(col("max_dd") > 0).as("n_with_drawdown"),
          sum(col("max_dd")).cast(DoubleType).as("sum_max_dd"),
          max(col("max_dd")).cast(DoubleType).as("worst_dd"))
        .orderBy("c_mktsegment")
    }),

    // ---- cross-language vocabulary overlap ------------------------------
    // Token-vocabulary Jaccard for every language pair — "how much of
    // the corpus is shared/borrowed vocabulary". One distinct
    // (lang, token) table; pair counts via a token-keyed self-join
    // (lang_a < lang_b), vocab sizes broadcast back; everything past
    // the distinct is bounded by vocab × langs, not the corpus.
    "llm_lang_overlap" -> ((s, dir) => {
      // the distinct (lang, token) vocabulary IS the shared unigram
      // ledger's lang-level key set (r10 verdict item 6) — no corpus
      // re-pass; the vocab×vocab overlap join below is unchanged
      val lt = graft.tools.TokenArtifacts.byLang(s, dir)
        .select("lang", "tok")
      val inter = lt.select(col("lang").as("la"), col("tok"))
        .join(lt.select(col("lang").as("lb"), col("tok")), Seq("tok"))
        .where(col("la") < col("lb"))
        .groupBy("la", "lb").agg(count(lit(1)).as("n_inter"))
      val sizes = lt.groupBy("lang").agg(count(lit(1)).as("v"))
      inter
        .join(broadcast(sizes.select(col("lang").as("la"), col("v").as("va"))),
          Seq("la"))
        .join(broadcast(sizes.select(col("lang").as("lb"), col("v").as("vb"))),
          Seq("lb"))
        .select(col("la"), col("lb"), col("va"), col("vb"), col("n_inter"),
          (col("n_inter").cast(DoubleType)
            / (col("va") + col("vb") - col("n_inter"))).as("jaccard"))
        .orderBy("la", "lb")
    }),

    // ---- exact discrete percentile bands --------------------------------
    // p10/p25/p50/p75/p90 of order totals per market segment, each the
    // ELEMENT at integer rank ceil(q·n) under the total order
    // (total, orderkey) — the exact-decile profile, no interpolation.
    // One GlobalRank rank per segment over the order rows, one conditional
    // aggregate.
    "agg_percentile_bands" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
      // per-segment rank over the corpus-scaled order rows: GlobalRank
      // (5 segments), not a 5-task partitioned window
      val rk = GlobalRank.withSeqAndCount(o, "rn", "n",
        Seq("c_mktsegment"), Seq(col("p").asc, col("o_orderkey").asc),
        groupsHint = 5)
      def band(q: Int): org.apache.spark.sql.Column =
        max(when(col("rn") === expr(s"CAST(ceil(n * $q / 100.0) AS BIGINT)"),
          col("p"))).cast(DoubleType)
      rk.groupBy("c_mktsegment")
        .agg(max("n").as("n_orders"),
          band(10).as("p10"), band(25).as("p25"), band(50).as("p50"),
          band(75).as("p75"), band(90).as("p90"))
        .orderBy("c_mktsegment")
    }),

    // ---- trimmed mean ---------------------------------------------------
    // 10%-trimmed mean of event values per type: drop the bottom and
    // top decile BY INTEGER RANK (ties broken by event_id — a total
    // order, so exactly n − 2·floor(n/10) rows survive on both
    // engines), then the rounded-decimal-sum mean of the middle. The
    // robust-location complement of llm_quality_winsorize (which
    // clips instead of dropping).
    "agg_trimmed_mean" -> ((s, dir) => {
      // per-type rank over corpus-scaled events: GlobalRank (5 groups)
      val rk = GlobalRank.withSeqAndCount(
        Tables.events(s, dir)
          .select(col("event_type"), col("value"), col("event_id")),
        "rn", "n", Seq("event_type"),
        Seq(col("value").asc, col("event_id").asc), groupsHint = 5)
      rk.where(col("rn") > expr("n DIV 10")
          && col("rn") <= col("n") - expr("n DIV 10"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"),
          (sum(round(col("value"), 8).cast(DecimalType(18, 8)))
            .cast(DoubleType) / count(lit(1))).as("trimmed_mean"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(

    "win_max_drawdown" ->
      """WITH o AS (SELECT c_mktsegment, o_custkey, o_orderkey, o_orderdate,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |d AS (SELECT c_mktsegment, o_custkey,
        |    max(p) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - p AS dd
        |  FROM o),
        |m AS (SELECT c_mktsegment, o_custkey, max(dd) AS max_dd
        |  FROM d GROUP BY c_mktsegment, o_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(count(*) FILTER (max_dd > 0) AS BIGINT) AS n_with_drawdown,
        |  CAST(sum(max_dd) AS DOUBLE) AS sum_max_dd,
        |  CAST(max(max_dd) AS DOUBLE) AS worst_dd
        |FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "llm_lang_overlap" -> s"""
      |WITH lt AS (SELECT DISTINCT lang, unnest($duckToks) AS tok
      |  FROM documents),
      |inter AS (SELECT a.lang AS la, b.lang AS lb, count(*) AS n_inter
      |  FROM lt a JOIN lt b ON a.tok = b.tok AND a.lang < b.lang
      |  GROUP BY a.lang, b.lang),
      |sz AS (SELECT lang, count(*) AS v FROM lt GROUP BY lang)
      |SELECT la, lb, CAST(sa.v AS BIGINT) AS va, CAST(sb.v AS BIGINT) AS vb,
      |  CAST(n_inter AS BIGINT) AS n_inter,
      |  CAST(n_inter AS DOUBLE) / (sa.v + sb.v - n_inter) AS jaccard
      |FROM inter JOIN sz sa ON la = sa.lang JOIN sz sb ON lb = sb.lang
      |ORDER BY la, lb""".stripMargin,

    "agg_percentile_bands" ->
      """WITH o AS (SELECT c_mktsegment, o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |rk AS (SELECT c_mktsegment, p,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY p, o_orderkey) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM o)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n_orders,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n * 10 / 100.0) AS BIGINT) THEN p END) AS DOUBLE) AS p10,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n * 25 / 100.0) AS BIGINT) THEN p END) AS DOUBLE) AS p25,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n * 50 / 100.0) AS BIGINT) THEN p END) AS DOUBLE) AS p50,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n * 75 / 100.0) AS BIGINT) THEN p END) AS DOUBLE) AS p75,
        |  CAST(max(CASE WHEN rn = CAST(ceil(n * 90 / 100.0) AS BIGINT) THEN p END) AS DOUBLE) AS p90
        |FROM rk GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_trimmed_mean" ->
      """WITH rk AS (SELECT event_type, value,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(CAST(round(value, 8) AS DECIMAL(18,8))) AS DOUBLE)
        |    / count(*) AS trimmed_mean
        |FROM rk WHERE rn > n // 10 AND rn <= n - n // 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
