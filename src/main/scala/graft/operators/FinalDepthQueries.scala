package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.QueryUtils.QFn
import graft.sources.Tables

/** §2.N — round-3 closing batch: the last expressible TPC-H query
  * (Q15 — the others still missing need the absent `partsupp` table),
  * null-aware NOT IN, outer generators, two deterministic smoothing
  * windows, a corpus unigram language model, mutual information
  * between document facets, and a banded edit-distance near-dup pass.
  *
  * Determinism contracts follow the repo-wide idioms (QueryUtils):
  * money through decimal(18,4) partials, order-dependent float terms
  * rounded-then-decimal-summed, every query ending in a total order.
  *
  * Scale notes (100 TB):
  *  - `tpch_q15` aggregates lineitem once on l_suppkey (one shuffle);
  *    the max-revenue scalar is a 1-row broadcast, the supplier join a
  *    dimension join AQE can broadcast. No window over an unpartitioned
  *    frame.
  *  - `llm_unigram_logprob` is tf-idf-shaped: explode → (token) agg →
  *    token-keyed back-join, all map-side-combinable; the corpus total
  *    is a 1-row broadcast. Vocabulary is the shuffle key, not docs².
  *  - `llm_dedup_editdist` buckets candidates by (8-char normalized
  *    prefix) with a ±16 length guard — candidate volume is bounded by
  *    per-bucket size like the minhash/simhash band joins, never
  *    all-pairs; the Levenshtein verify runs on 64-char heads so the
  *    per-pair cost is a constant O(64²) regardless of document size.
  *  - the two smoothing windows are per-user frames (user_id is the
  *    partition key) built from lag() chains — no unbounded frame, no
  *    single-partition window.
  *  - `llm_mi_lang_source` reduces to a |langs|×|sources| cell table;
  *    everything after the first keyed count is broadcast-sized.
  */
object FinalDepthQueries {

  private def ts(d: String) = lit(d + " 00:00:00").cast("timestamp")

  /** Order-free exact sum of a 4-decimal money product, as double
    * (same contract as TpchQueries.decSum). */
  private def decSum4(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Whitespace tokens with empties dropped — the shared idiom. */
  private def toks = filter(split(col("text"), " "), t => t =!= "")

  val queries: Map[String, QFn] = Map(

    // ---- TPC-H Q15: top supplier(s) by quarterly revenue ----------------
    // Revenue per supplier over Q1-1997 shipments; return every supplier
    // tied at the maximum. The classic formulation is a view + scalar
    // subquery; here the scalar max is a 1-row aggregate joined back
    // (cross-join broadcast), which is exactly how Catalyst decorrelates
    // the subquery form.
    "tpch_q15" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(decSum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val rev2 = graft.tools.Materialize.eager("q15_revenue", rev) // reuse one computation for max + filter
      val mx = rev2.agg(max(col("total_revenue")).as("mx"))
      rev2.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(Tables.supplier(s, dir),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // ---- advanced string functions --------------------------------------
    "fn_string_advanced" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr_vowels"),
          repeat(substring(col("p_name"), 1, 2), 2).as("rep2"),
          lpad(expr("right(p_name, 3)"), 6, "*").as("pad_tail"),
          ascii(col("p_name")).as("first_code"),
          reverse(col("p_name")).as("rev"))
        .orderBy("p_partkey")
    }),

    // ---- null-aware NOT IN ----------------------------------------------
    // NOT IN over a subquery plans as a null-aware anti join — the
    // variant a plain LEFT ANTI cannot express when the list side is
    // nullable. (o_custkey is non-null here so results equal the anti
    // join; the NAAJ plan shape is the declared surface, and the
    // null-poisoned behavior is spec-tested.)
    "sub_not_in" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_custkey, c_name
              |FROM customer_v
              |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v
              |                        WHERE o_totalprice > 400000.0)
              |ORDER BY c_custkey""".stripMargin)
    }),

    // ---- explode_outer: rows with empty arrays survive as NULL ----------
    "gen_explode_outer" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode_outer(filter(toks, t => length(t) >= 8)).as("long_tok"))
        .orderBy(col("doc_id"), col("long_tok")) // Spark default: nulls first
    }),

    // ---- 5-tap linear-weighted moving average ---------------------------
    // WMA with weights 5..1 over each user's last five events. The five
    // taps are exact decimal(18,6) copies of the double values, the
    // weighted sum is exact decimal arithmetic (order-free), and the
    // single /15 division is the only rounding step — bit-identical on
    // both engines by construction.
    "win_weighted_ma" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val v = col("value").cast(DecimalType(18, 6))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("wsum",
          v * 5 + lag(v, 1).over(w) * 4 + lag(v, 2).over(w) * 3 +
            lag(v, 3).over(w) * 2 + lag(v, 4).over(w))
        .where(col("rn") >= 5)
        .select(col("user_id"), col("event_id"), col("value"),
          (col("wsum").cast(DoubleType) / 15.0).as("wma5"))
        .orderBy("user_id", "event_id")
    }),

    // ---- exponential-decay running sum (alpha = 1/2) --------------------
    // decayed(t) = v(t) + v(t-1)/2 + ... + v(t-7)/128. Halving a double
    // is an exact exponent shift, and the addition chain is written in
    // one fixed left-to-right order on both engines, so the result is
    // bit-deterministic with no rounding helper at all.
    "win_decayed_sum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      def tap(k: Int) =
        coalesce(lag(col("value"), k).over(w), lit(0.0)) * lit(math.pow(0.5, k))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("decayed",
          tap(0) + tap(1) + tap(2) + tap(3) + tap(4) + tap(5) + tap(6) + tap(7))
        .select(col("user_id"), col("event_id"), col("value"), col("decayed"))
        .orderBy("user_id", "event_id")
    }),

    // ---- corpus unigram language model: per-doc mean log-probability ----
    // The classic LM quality filter: score each document by the average
    // corpus-unigram log-likelihood of its tokens (low = rare/garbled
    // text, high = stereotyped text). Per-token terms are rounded to 6
    // then decimal-summed, so partial-aggregation order cannot move the
    // result.
    "llm_unigram_logprob" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(toks).as("tok"))
      val tf = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      val n = tf.agg(sum("c").as("nn"))
      tok.join(tf, "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(round(log(col("c") / col("nn")), 6).cast(DecimalType(18, 6)))
            .as("s_lp"))
        // avg as an EXACT signed half-up 1e-4 integer (BoundaryGuard
        // r9: s_lp/n_tok with a 2-5-smooth token count terminates and
        // lands exactly on 4dp half boundaries)
        .withColumn("s6",
          (col("s_lp") * 1000000).cast(DecimalType(38, 0)).cast("long"))
        .select(col("doc_id"), col("n_tok"),
          (expr("CASE WHEN s6 >= 0 THEN (2 * s6 + 100 * n_tok) div (200 * n_tok) " +
            "ELSE -((2 * (-s6) + 100 * n_tok) div (200 * n_tok)) END")
            .cast(DoubleType) / 10000.0).as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // ---- mutual information between document facets ---------------------
    // I(lang; source) in nats over the joint (lang, source) histogram —
    // the corpus-health number that says whether sources are language-
    // skewed. Cell terms rounded to 9 then decimal-summed: exact under
    // any aggregation order.
    "llm_mi_lang_source" -> ((s, dir) => {
      val j = graft.tools.Materialize.eager("mi_cells",
        Tables.documents(s, dir)
          .groupBy("lang", "source").agg(count(lit(1)).as("c"))) // tiny |langs|x|sources| table, reused 3x
      val tot = j.agg(sum("c").as("n"))
      val px = j.groupBy("lang").agg(sum("c").as("cx"))
      val py = j.groupBy("source").agg(sum("c").as("cy"))
      j.join(px, "lang").join(py, "source").crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("c"), col("cx"), col("cy"), col("n"),
          round((col("c") / col("n")) *
            log((col("c") * lit(1.0) * col("n")) / (col("cx") * lit(1.0) * col("cy"))), 9)
            .cast(DecimalType(18, 9)).as("term"))
        .agg(count(lit(1)).as("n_cells"),
          round(sum(col("term")).cast(DoubleType), 4).as("mi_nats"))
    }),

    // ---- banded edit-distance near-dup ----------------------------------
    // Levenshtein complement to the Jaccard/minhash/simhash family:
    // candidates bucketed by the 8-char normalized prefix with a ±16
    // length guard, verified by edit distance over 64-char heads (cost
    // capped at 64² per pair regardless of document length).
    "llm_dedup_editdist" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), lower(col("text")).as("norm"),
          length(col("text")).as("len"))
        .select(col("doc_id"), col("len"),
          substring(col("norm"), 1, 8).as("pfx"),
          substring(col("norm"), 1, 64).as("head"))
      val a = d.select(col("doc_id").as("a_id"), col("pfx"),
        col("len").as("a_len"), col("head").as("a_head"))
      val b = d.select(col("doc_id").as("b_id"), col("pfx"),
        col("len").as("b_len"), col("head").as("b_head"))
      a.join(b, Seq("pfx"))
        .where(col("a_id") < col("b_id") &&
          abs(col("a_len") - col("b_len")) <= 16)
        .withColumn("dist",
          levenshtein(col("a_head"), col("b_head")).cast("long"))
        .where(col("dist") <= 8)
        .select(col("a_id"), col("b_id"), col("dist"))
        .orderBy("a_id", "b_id")
    }),

    // ---- watermark late-data drop, replayed at microbatch granularity ---
    // Structured Streaming's watermark contract, modeled exactly: each
    // event ARRIVES at event-time + a deterministic md5-derived network
    // delay (0–30 min — the corpus itself is time-ordered, so without
    // modeled jitter nothing is ever late); arrivals group into 5-min
    // microbatches; after each batch the watermark advances to
    // max(event-time seen) − 10 min, and an event is DROPPED iff its
    // event time is below the watermark its batch started with (the max
    // over STRICTLY EARLIER batches). Per tumbling hour and type:
    // survivors, drops, kept sum. The only unpartitioned window runs
    // over the per-batch max table — #microbatches rows, exactly the
    // cardinality the real streaming driver tracks.
    "stream_late_drop" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("jit", graft.QueryUtils.hash60(col("event_id").cast("string")) % 1800)
        .withColumn("arr", expr("timestampadd(SECOND, jit, ts)"))
        .withColumn("batch", // UTC session; ntz→ltz cast is offset-free
          expr("unix_micros(cast(arr as timestamp_ltz)) div 300000000"))
      val bm = ev.groupBy("batch").agg(max("ts").as("mt"))
      val wb = Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wm = bm
        .withColumn("wmk", max("mt").over(wb) - expr("INTERVAL 10 MINUTES"))
        .select("batch", "wmk")
      ev.join(broadcast(wm), "batch")
        .withColumn("late", col("wmk").isNotNull && col("ts") < col("wmk"))
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
        .agg(count_if(!col("late")).as("n_kept"),
          count_if(col("late")).as("n_late"),
          sum(when(!col("late"), col("value")).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("kept_sum"))
        .orderBy("ws", "event_type")
    }),

    // ---- ANN recall@10: 3-probe IVF vs exact slice ----------------------
    // The standard ANN eval beside recall@1: for the deterministic
    // 256-vector slice, exact cosine top-10 (corpus × broadcast slice —
    // pair volume bounded by 256·n, the broadcast side constant) vs the
    // index's top-10 probing each query's 3 best codebook cells (the
    // llm_ann_multiprobe regime). recall@10 = |exact∩probed| / |exact|.
    "llm_ann_recall10" -> ((s, dir) => {
      import graft.functions.AnnCodebook
      import graft.functions.VectorFunctions.vecDot
      val (e, cent) = AnnCodebook.indexed(s, dir)
      val sample = AnnCodebook.hashSample(e, 256)
      val aS = e.select(col("vec_id").as("a_id"),
        col("embedding").as("a_v"), col("nrm").as("a_n"))
        .join(broadcast(sample), Seq("a_id"))
      def top10(pairs: DataFrame): DataFrame = pairs
        .withColumn("rk", row_number().over(Window.partitionBy("a_id")
          .orderBy(col("cos_sim").desc, col("b_id").asc)))
        .where(col("rk") <= 10).select("a_id", "b_id")
      val cos = (vecDot(col("a_v"), col("b_v")) /
        (col("a_n") * col("b_n"))).as("cos_sim")
      val ex10 = top10(
        e.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
          col("nrm").as("b_n"))
          .crossJoin(broadcast(aS))
          .where(col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id"), cos))
      val cn = cent.select(col("cell").as("pcell"), col("csum"))
      val probes = aS
        .withColumn("qv", AnnCodebook.quantize(col("a_v")))
        .crossJoin(broadcast(cn))
        .withColumn("sc", AnnCodebook.score(col("qv"), col("csum")))
        .withColumn("rk", row_number().over(Window.partitionBy("a_id")
          .orderBy(col("sc").desc, col("pcell").asc)))
        .where(col("rk") <= 3).select("a_id", "pcell")
      val ann10 = top10(probes.join(aS, "a_id")
        .join(e.select(col("cell").as("pcell"), col("vec_id").as("b_id"),
          col("embedding").as("b_v"), col("nrm").as("b_n")), "pcell")
        .where(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), cos))
      ex10.join(ann10.withColumn("hit", lit(1L)), Seq("a_id", "b_id"), "left")
        .agg(countDistinct(col("a_id")).as("n_vecs"),
          count(lit(1)).as("n_pairs"), count(col("hit")).as("n_hits"))
        // recall as an EXACT half-up 1e-4 integer (BoundaryGuard r9:
        // hits/(10·n_vecs) with a 2-5-smooth denominator terminates
        // and lands exactly on 4dp half boundaries)
        .select(col("n_vecs"), col("n_hits"),
          (expr("(2 * 10000 * n_hits + n_pairs) div (2 * n_pairs)")
            .cast(DoubleType) / 10000.0).as("recall_at_10"))
    })
  )

  val oracles: Map[String, String] = Map(

    "tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "fn_string_advanced" ->
      """SELECT p_partkey,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr_vowels,
        |  repeat(substr(p_name, 1, 2), 2) AS rep2,
        |  lpad(right(p_name, 3), 6, '*') AS pad_tail,
        |  ascii(p_name) AS first_code,
        |  reverse(p_name) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "sub_not_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "gen_explode_outer" ->
      """SELECT doc_id,
        |  unnest(CASE WHEN len(lst) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE lst END) AS long_tok
        |FROM (SELECT doc_id,
        |        list_filter(string_split(text, ' '), x -> x <> '' AND len(x) >= 8) AS lst
        |      FROM documents)
        |ORDER BY doc_id, long_tok NULLS FIRST""".stripMargin,

    "win_weighted_ma" ->
      """SELECT user_id, event_id, value,
        |  CAST(5*v0 + 4*v1 + 3*v2 + 2*v3 + v4 AS DOUBLE) / 15.0 AS wma5
        |FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER w AS rn,
        |    CAST(value AS DECIMAL(18,6)) AS v0,
        |    lag(CAST(value AS DECIMAL(18,6)), 1) OVER w AS v1,
        |    lag(CAST(value AS DECIMAL(18,6)), 2) OVER w AS v2,
        |    lag(CAST(value AS DECIMAL(18,6)), 3) OVER w AS v3,
        |    lag(CAST(value AS DECIMAL(18,6)), 4) OVER w AS v4
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE rn >= 5
        |ORDER BY user_id, event_id""".stripMargin,

    "win_decayed_sum" ->
      """SELECT user_id, event_id, value,
        |  value * 1.0
        |  + coalesce(lag(value, 1) OVER w, 0.0) * 0.5
        |  + coalesce(lag(value, 2) OVER w, 0.0) * 0.25
        |  + coalesce(lag(value, 3) OVER w, 0.0) * 0.125
        |  + coalesce(lag(value, 4) OVER w, 0.0) * 0.0625
        |  + coalesce(lag(value, 5) OVER w, 0.0) * 0.03125
        |  + coalesce(lag(value, 6) OVER w, 0.0) * 0.015625
        |  + coalesce(lag(value, 7) OVER w, 0.0) * 0.0078125 AS decayed
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "llm_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        |n AS (SELECT sum(c) AS nn FROM tf),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |    CAST(sum(CAST(round(ln(c / nn), 6) AS DECIMAL(18,6))) * 1000000
        |      AS BIGINT) AS s6
        |  FROM tok JOIN tf USING (tok) CROSS JOIN n
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tok,
        |  CAST(CASE WHEN s6 >= 0 THEN (2 * s6 + 100 * n_tok) // (200 * n_tok)
        |       ELSE -((2 * (-s6) + 100 * n_tok) // (200 * n_tok)) END
        |    AS DOUBLE) / 10000.0 AS avg_logprob
        |FROM agg
        |ORDER BY doc_id""".stripMargin,

    "llm_mi_lang_source" ->
      """WITH j AS (SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
        |tot AS (SELECT sum(c) AS n FROM j),
        |px AS (SELECT lang, sum(c) AS cx FROM j GROUP BY 1),
        |py AS (SELECT source, sum(c) AS cy FROM j GROUP BY 1)
        |SELECT count(*) AS n_cells,
        |  round(CAST(sum(CAST(round((c / n) * ln((c * 1.0 * n) / (cx * 1.0 * cy)), 9)
        |                      AS DECIMAL(18,9))) AS DOUBLE), 4) AS mi_nats
        |FROM j JOIN px USING (lang) JOIN py USING (source) CROSS JOIN tot""".stripMargin,

    "llm_dedup_editdist" ->
      """WITH d AS (
        |  SELECT doc_id, length(text) AS len,
        |    substr(lower(text), 1, 8) AS pfx,
        |    substr(lower(text), 1, 64) AS head
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  levenshtein(a.head, b.head) AS dist
        |FROM d a JOIN d b ON a.pfx = b.pfx
        |WHERE a.doc_id < b.doc_id AND abs(a.len - b.len) <= 16
        |  AND levenshtein(a.head, b.head) <= 8
        |ORDER BY a_id, b_id""".stripMargin,

    "stream_late_drop" ->
      """WITH b AS (SELECT *,
        |    epoch_us(ts + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 1800)
        |             * INTERVAL 1 SECOND) // 300000000 AS batch
        |  FROM events),
        |bm AS (SELECT batch, max(ts) AS mt FROM b GROUP BY batch),
        |wm AS (SELECT batch,
        |    max(mt) OVER (ORDER BY batch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - INTERVAL 10 MINUTE AS wmk
        |  FROM bm),
        |e AS (SELECT b.*, (wmk IS NOT NULL AND ts < wmk) AS late
        |  FROM b JOIN wm USING (batch))
        |SELECT date_trunc('hour', ts) AS ws, event_type,
        |  count(*) FILTER (NOT late) AS n_kept,
        |  count(*) FILTER (late) AS n_late,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (NOT late) AS DOUBLE)
        |    AS kept_sum
        |FROM e GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "llm_ann_recall10" -> (
      s"WITH ${graft.functions.AnnCodebook.oracleCtes}," +
      s"""
        |ke AS (SELECT e.vec_id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
        |    kcells.cell AS cell
        |  FROM embeddings e JOIN kcells ON e.vec_id = kcells.vec_id),
        |n AS (SELECT vec_id, ev, cell,
        |    sqrt(list_aggregate(list_transform(ev, x -> x * x), 'sum')) AS nrm
        |  FROM ke),
        |ksmp AS (SELECT vec_id AS a_id FROM (
        |    SELECT vec_id, row_number() OVER (ORDER BY
        |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT, vec_id) AS rk
        |    FROM embeddings) WHERE rk <= 256),
        |asd AS (SELECT a_id, ev AS a_v, nrm AS a_n
        |  FROM n JOIN ksmp ON n.vec_id = ksmp.a_id),
        |kqs AS (SELECT a_id, qv FROM kq JOIN ksmp ON kq.vec_id = ksmp.a_id),
        |kpr AS (SELECT a_id, cell AS pcell FROM (
        |    SELECT q.a_id, c.cell, row_number() OVER (PARTITION BY q.a_id
        |      ORDER BY ${graft.functions.AnnCodebook.oracleScore("q.qv", "c.csum")} DESC,
        |        c.cell ASC) AS rn
        |    FROM kqs q CROSS JOIN ${graft.functions.AnnCodebook.oracleFinalCent} c)
        |  WHERE rn <= 3),
        |p AS (SELECT a.a_id, b.vec_id AS b_id, b.cell AS bcell,
        |    list_aggregate(list_transform(list_zip(a.a_v, b.ev), z -> z[1] * z[2]), 'sum')
        |      / (a.a_n * b.nrm) AS cos_sim
        |  FROM asd a JOIN n b ON b.vec_id <> a.a_id),
        |ex10 AS (SELECT a_id, b_id FROM (
        |    SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos_sim DESC, b_id ASC) AS rk FROM p) WHERE rk <= 10),
        |an10 AS (SELECT a_id, b_id, 1 AS hit FROM (
        |    SELECT p.a_id, p.b_id, row_number() OVER (PARTITION BY p.a_id
        |      ORDER BY cos_sim DESC, b_id ASC) AS rk
        |    FROM p JOIN kpr ON p.a_id = kpr.a_id AND p.bcell = kpr.pcell)
        |  WHERE rk <= 10)
        |SELECT CAST(count(DISTINCT a_id) AS BIGINT) AS n_vecs,
        |  CAST(count(hit) AS BIGINT) AS n_hits,
        |  CAST((2 * 10000 * count(hit) + count(*)) // (2 * count(*))
        |    AS DOUBLE) / 10000.0 AS recall_at_10
        |FROM ex10 LEFT JOIN an10 USING (a_id, b_id)""".stripMargin)
  )
}
